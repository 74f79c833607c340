"""Quality metrics (PSNR, MS-SSIM) and running meters."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 1.0) -> float:
    """-10 log10(MSE) over [0, max_val] images (reference: test.py:205-207)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * math.log10(max_val ** 2 / max(mse, 1e-12))


def _ssim_components(a, b, max_val=1.0):
    """Per-level SSIM luminance/contrast terms with an 11x11 Gaussian."""
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    sigma, size = 1.5, 11
    g = jnp.exp(
        -0.5 * ((jnp.arange(size) - size // 2) / sigma) ** 2)
    g = g / jnp.sum(g)
    kernel = jnp.outer(g, g)[:, :, None, None]

    def filt(x):
        # depthwise 11x11 Gaussian blur, valid padding
        c = x.shape[-1]
        k = jnp.tile(kernel, (1, 1, 1, c))
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )

    mu_a, mu_b = filt(a), filt(b)
    saa = filt(a * a) - mu_a * mu_a
    sbb = filt(b * b) - mu_b * mu_b
    sab = filt(a * b) - mu_a * mu_b
    l_term = (2 * mu_a * mu_b + c1) / (mu_a ** 2 + mu_b ** 2 + c1)
    cs = (2 * sab + c2) / (saa + sbb + c2)
    return jnp.mean(l_term * cs), jnp.mean(cs)


def msssim_value(a, b, max_val: float = 1.0):
    """Multi-scale SSIM (5 levels, standard weights) on (B, H, W, C).

    Jittable: returns a scalar jnp array (see `msssim` for the float
    convenience wrapper). Requires min(H, W) >= 176 (the 11x11 window
    must fit at the coarsest of the 5 scales)."""
    if min(a.shape[1], a.shape[2]) < 11 * 2 ** 4:
        raise ValueError(
            f"MS-SSIM needs min(H, W) >= {11 * 2 ** 4}; got "
            f"{a.shape[1]}x{a.shape[2]}")
    weights = jnp.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333])
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    vals = []
    for i in range(5):
        ssim_val, cs = _ssim_components(a, b, max_val)
        vals.append(ssim_val if i == 4 else cs)
        if i < 4:
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) * 0.25
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) * 0.25
    vals = jnp.stack([jnp.maximum(v, 0.0) for v in vals])
    return jnp.prod(vals ** weights)


def msssim(a, b, max_val: float = 1.0) -> float:
    """Float-returning convenience wrapper over msssim_value."""
    return float(msssim_value(a, b, max_val))


class AverageMeter:
    """Running average (reference: train.py:214-227)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        v = float(val)
        self.val = v
        self.sum += v * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)
