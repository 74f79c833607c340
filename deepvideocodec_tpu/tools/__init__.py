"""Interop tools: importing reference (PyTorch) artifacts."""

from .torch_import import (  # noqa: F401
    import_dmc_state_dict,
    import_cheng2020_transforms,
    load_reference_checkpoint,
    merge_params,
)

__all__ = [
    "import_dmc_state_dict",
    "import_cheng2020_transforms",
    "load_reference_checkpoint",
    "merge_params",
]
