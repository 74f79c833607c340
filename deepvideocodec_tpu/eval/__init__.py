"""Evaluation: bitstream container, real-codec drivers, GOP loop, metrics."""

from .bitstream import write_body, read_body, write_uints, read_uints
from .codec import DmcCodec, DvcCodec, DcvcCodec, IntraCodec
from .evaluator import evaluate_video, pad_to_multiple, crop_to
from .pipeline import code_sequence_pipelined
from .gop_parallel import (
    replicate_codecs,
    evaluate_video_gop_parallel,
    decode_video_gop_parallel,
    scan_gop_offsets,
)
from .bdrate import bd_rate, bd_psnr

__all__ = [
    "code_sequence_pipelined",
    "replicate_codecs",
    "evaluate_video_gop_parallel",
    "decode_video_gop_parallel",
    "scan_gop_offsets",
    "bd_rate",
    "bd_psnr",
    "write_body",
    "read_body",
    "write_uints",
    "read_uints",
    "DmcCodec",
    "DvcCodec",
    "DcvcCodec",
    "IntraCodec",
    "evaluate_video",
    "pad_to_multiple",
    "crop_to",
]
