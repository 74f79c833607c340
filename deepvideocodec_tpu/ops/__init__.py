"""Low-level ops for the TPU video codec: warping, resizing, quantization.

All ops use NHWC layout (TPU-native). Flow fields are (B, H, W, 2) with
channel 0 = horizontal displacement (x, pixels) and channel 1 = vertical (y),
matching the reference's pixel-unit flow convention
(/root/reference/dmc/models/layers.py:185-186).
"""

from .warp import flow_warp
from .resize import (
    bilinear_downsample_x2,
    bilinear_upsample_x2,
    avg_pool_2x2,
    max_pool_2x2,
)
from .pixel_shuffle import depth_to_space, space_to_depth
from .quant import quantize_ste, additive_uniform_noise
from .bound import lower_bound, LOWER_BOUND_LIKELIHOOD

__all__ = [
    "flow_warp",
    "bilinear_downsample_x2",
    "bilinear_upsample_x2",
    "avg_pool_2x2",
    "max_pool_2x2",
    "depth_to_space",
    "space_to_depth",
    "quantize_ste",
    "additive_uniform_noise",
    "lower_bound",
    "LOWER_BOUND_LIKELIHOOD",
]
