"""Depth-to-space / space-to-depth (the TPU form of torch PixelShuffle).

Channel ordering matches torch's PixelShuffle so that weights verified against
the reference transfer exactly: for upscale factor r, input channel
c*r*r + i*r + j maps to output channel c at spatial offset (i, j)
(/root/reference/dmc/models/layers.py:45-56 uses nn.PixelShuffle after a conv).
On TPU this is a pure reshape/transpose that XLA fuses into the producing conv.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """NHWC depth-to-space with torch PixelShuffle channel order.

    x: (B, H, W, C*r*r) -> (B, H*r, W*r, C).
    """
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r_i, W, r_j, C
    return x.reshape(B, H * r, W * r, C)


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """Inverse of depth_to_space: (B, H*r, W*r, C) -> (B, H, W, C*r*r)."""
    B, Hr, Wr, C = x.shape
    H, W = Hr // r, Wr // r
    x = x.reshape(B, H, r, W, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H, W, C, r_i, r_j
    return x.reshape(B, H, W, C * r * r)
