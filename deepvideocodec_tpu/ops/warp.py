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
  * The op is a dynamic gather — we flatten H*W and issue XLA gathers of
    contiguous NHWC rows. TPU gather cost is per-fetched-row dominated
    (measured v5e: ~9 ns/row + ~0.04 ns/byte), so the fast path *pairs the
    two x-neighbours into one row*: the source is viewed as (H, W/2, 2C)
    in two column phases (even = free reshape, odd = one edge-shifted
    copy), and a single fetch returns both (x0, x0+1) corners. That
    halves the fetch count: measured 117 -> 79 ms for a 64ch 1088x1920
    warp (-32%), 41 -> 36 ms at 3ch, bit-exact vs the 4-tap form (same
    texel values, same lerp order). A y-paired variant (all 4 corners in
    one fetch) measured no better — the 4x-duplicated source loses the
    win to copy bandwidth and cache locality. A Pallas formulation is
    parked with measurements in docs/PERFORMANCE.md (Mosaic's
    take_along_axis lowering is ~200x slower at these shapes).
  * Gradients: d/d(image) is the transpose scatter-add (handled by XLA's
    gather VJP; the odd-phase pad/slice and the even-phase reshape both
    pass cotangents straight through); d/d(flow) flows through the
    fractional weights (floor() has zero gradient, so `x - floor(x)`
    carries gradient 1), and clamping gives zero flow-gradient at the
    border, matching grid_sample's border behaviour. At x0 == W-1 the
    paired fetch's right texel is the edge-replicated pad, which equals
    the left texel exactly — the same value (and zero wx weight) the
    4-tap form produces there.
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
    y1i = jnp.minimum(y0i + 1, H - 1)

    if W % 2 == 0 and W >= 2:
        v00, v01, v10, v11 = _corners_xpaired(image, y0i, y1i, x0i)
    else:
        v00, v01, v10, v11 = _corners_4tap(image, y0i, y1i, x0i)

    wx = wx[..., None].astype(dtype)
    wy = wy[..., None].astype(dtype)
    top = v00 + (v01 - v00) * wx
    bot = v10 + (v11 - v10) * wx
    return top + (bot - top) * wy


def _corners_xpaired(image, y0i, y1i, x0i):
    """Bilinear corner fetch, x-neighbours paired into one gathered row.

    Requires even W. One fetch of a 2C-row returns both (x0, x0+1) texels;
    the even column phase is a free reshape of the NHWC layout, the odd
    phase one edge-shifted copy. At x0 == W-1 the fetched right texel is
    the edge replica — identical to the 4-tap form's clamped x1 texel.
    """
    B, H, W, C = image.shape
    even = image.reshape(B, H * (W // 2), 2 * C)
    odd = jnp.concatenate(
        [image[:, :, 1:, :], image[:, :, -1:, :]], axis=2
    ).reshape(B, H * (W // 2), 2 * C)
    src = jnp.concatenate([even, odd], axis=1)
    phase_off = (x0i & 1) * (H * (W // 2))
    col = x0i >> 1

    def pair_tap(yi):
        idx = phase_off + yi * (W // 2) + col  # (B, H, W) int32
        return jnp.take_along_axis(
            src, idx.reshape(B, H * W, 1), axis=1
        ).reshape(B, H, W, 2 * C)

    top_pair = pair_tap(y0i)
    bot_pair = pair_tap(y1i)
    return (top_pair[..., :C], top_pair[..., C:],
            bot_pair[..., :C], bot_pair[..., C:])


def _corners_4tap(image, y0i, y1i, x0i):
    """Bilinear corner fetch, one gathered C-row per corner (any W)."""
    B, H, W, C = image.shape
    x1i = jnp.minimum(x0i + 1, W - 1)
    flat = image.reshape(B, H * W, C)

    def tap(yi, xi):
        idx = yi * W + xi  # (B, H, W) int32
        return jnp.take_along_axis(
            flat, idx.reshape(B, H * W, 1), axis=1
        ).reshape(B, H, W, C)

    return (tap(y0i, x0i), tap(y0i, x1i), tap(y1i, x0i), tap(y1i, x1i))
