"""YUV 4:2:0 <-> RGB conversion for the video ingestion path.

Production video sources deliver 8-bit YUV 4:2:0 (half the bytes of RGB);
the codec operates on [0, 1] RGB. The host keeps frames in YUV planes and
the device converts after upload — at 1080p this halves the largest
host->device transfer of the serving loop (6.3 -> 3.1 MB/frame).

Full-range BT.601 ("JPEG") matrix; chroma is box-downsampled 2x2 on the
host and nearest-upsampled on device (the cheap, standard fast path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_yuv420_np(rgb_u8: np.ndarray):
    """(B, H, W, 3) uint8 RGB -> (y, u, v) uint8 planes; H, W even.

    y: (B, H, W, 1); u, v: (B, H/2, W/2, 1).
    """
    rgb = rgb_u8.astype(np.float32)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = (b - y) * 0.564 + 128.0
    v = (r - y) * 0.713 + 128.0

    def sub(c):
        B, H, W = c.shape
        c = c.reshape(B, H // 2, 2, W // 2, 2).mean(axis=(2, 4))
        return c

    to_u8 = lambda c: np.clip(np.round(c), 0, 255).astype(np.uint8)
    return (to_u8(y)[..., None], to_u8(sub(u))[..., None],
            to_u8(sub(v))[..., None])


def yuv420_to_rgb(y_u8: jax.Array, u_u8: jax.Array, v_u8: jax.Array):
    """uint8 YUV 4:2:0 planes -> (B, H, W, 3) float32 RGB in [0, 1].

    Jittable device-side inverse of rgb_to_yuv420_np (nearest-neighbor
    chroma upsampling).
    """
    y = y_u8[..., 0].astype(jnp.float32)
    u = u_u8[..., 0].astype(jnp.float32) - 128.0
    v = v_u8[..., 0].astype(jnp.float32) - 128.0

    def up(c):
        b, h2, w2 = c.shape
        c = jnp.broadcast_to(c[:, :, None, :, None], (b, h2, 2, w2, 2))
        return c.reshape(b, h2 * 2, w2 * 2)

    u = up(u)
    v = up(v)
    r = y + v / 0.713
    b = y + u / 0.564
    g = (y - 0.299 * r - 0.114 * b) / 0.587
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(rgb / 255.0, 0.0, 1.0)
