"""Evaluation: bitstream container, real-codec drivers, GOP loop, metrics."""

from .bitstream import write_body, read_body, write_uints, read_uints
from .codec import DmcCodec, DvcCodec, DcvcCodec, IntraCodec
from .evaluator import evaluate_video, pad_to_multiple, crop_to
from .pipeline import code_sequence_pipelined

__all__ = [
    "code_sequence_pipelined",
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
