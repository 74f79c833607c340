"""Utilities: metrics, meters, logging, checkpointing, profiling."""

from .metrics import psnr, msssim, AverageMeter
from .logging import setup_logger
from .checkpoint import (save_checkpoint, restore_checkpoint, latest_step,
                         save_params_export, restore_params_export,
                         restore_params_only,
                         restore_params_export_partial, warm_start_params,
                         save_npz_export, restore_npz_export,
                         restore_any_params)
from .compile_retry import retry_flaky_compile

__all__ = [
    "psnr",
    "msssim",
    "AverageMeter",
    "setup_logger",
    "save_checkpoint",
    "restore_checkpoint",
    "latest_step",
    "save_params_export",
    "restore_params_export",
    "restore_params_only",
    "retry_flaky_compile",
    "save_npz_export",
    "restore_npz_export",
    "restore_any_params",
    "restore_params_export_partial",
    "warm_start_params",
]
