"""Backward bilinear warping (the TPU equivalent of torch grid_sample).

Semantics match the reference's `torch_warp` (/root/reference/dmc/models/
layers.py:175-193): `grid_sample(mode='bilinear', padding_mode='border',
align_corners=True)` over a base grid plus a pixel-unit flow. With
align_corners=True and flow normalized by (W-1)/2 / (H-1)/2, the composed
mapping is simply

    src_x = x + flow_x,   src_y = y + flow_y   (pixel units)

with source coordinates clamped to the image border ('border' padding) and
bilinear interpolation between the four neighbouring texels.

Implementation notes (TPU-first):
  * The op is a dynamic gather — we flatten H*W and issue a single XLA gather
    of C-channel rows (NHWC keeps each gathered row contiguous in HBM), which
    XLA lowers to an efficient TPU gather. The four bilinear taps share the
    row computation.
  * Gradients: d/d(image) is the transpose scatter-add (handled by XLA's
    gather VJP); d/d(flow) flows through the fractional weights (floor() has
    zero gradient, so `x - floor(x)` carries gradient 1), and clamping gives
    zero flow-gradient at the border, matching grid_sample's border behaviour.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_warp(image: jax.Array, flow: jax.Array) -> jax.Array:
    """Warp `image` backward by `flow`.

    Args:
      image: (B, H, W, C) source to sample from.
      flow:  (B, H, W, 2) pixel-unit displacements; flow[..., 0] is horizontal
             (x), flow[..., 1] vertical (y).

    Returns:
      (B, H, W, C) warped image: out[b, y, x] = image[b, y + fy, x + fx]
      (bilinear, border-clamped).
    """
    B, H, W, C = image.shape
    dtype = image.dtype
    # Sample positions in pixel units.
    base_y = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    base_x = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    sx = base_x[None] + flow[..., 0].astype(jnp.float32)
    sy = base_y[None] + flow[..., 1].astype(jnp.float32)
    # Border clamp *before* splitting into integer/fractional parts: this is
    # what makes the flow gradient vanish once a tap is pinned to the border.
    sx = jnp.clip(sx, 0.0, W - 1.0)
    sy = jnp.clip(sy, 0.0, H - 1.0)

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0  # gradient 1 w.r.t. sx (floor has zero cotangent)
    wy = sy - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = jnp.minimum(x0i + 1, W - 1)
    y1i = jnp.minimum(y0i + 1, H - 1)

    flat = image.reshape(B, H * W, C)

    def tap(yi, xi):
        idx = yi * W + xi  # (B, H, W) int32
        return jnp.take_along_axis(
            flat, idx.reshape(B, H * W, 1), axis=1
        ).reshape(B, H, W, C)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x1i)
    v10 = tap(y1i, x0i)
    v11 = tap(y1i, x1i)

    wx = wx[..., None].astype(dtype)
    wy = wy[..., None].astype(dtype)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy
