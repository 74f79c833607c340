"""Conditional Gaussian entropy model (likelihoods + index building).

On-device replacement for compressai's GaussianConditional (imported by the
reference at /root/reference/dmc/models/video_model.py:7). Stateless pure
functions: the model predicts (means, scales); the likelihood of the
quantized value is Phi((0.5-|v-mu|)/sigma) - Phi((-0.5-|v-mu|)/sigma), scales
floored at SCALES_MIN, likelihoods floored at 1e-9.

fp32 only — the erf difference underflows quickly in bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.bound import lower_bound, LOWER_BOUND_LIKELIHOOD, LOWER_BOUND_SCALE
from ..ops.quant import additive_uniform_noise


def _standardized_cumulative(x: jax.Array) -> jax.Array:
    """Phi(x) computed as 0.5 * erfc(-x / sqrt(2)) for upper-tail stability."""
    const = -(2.0 ** -0.5)
    return 0.5 * jax.lax.erfc(const * x)


def gaussian_likelihood(
    values: jax.Array, scales: jax.Array, means: jax.Array | None = None
) -> jax.Array:
    """P(round(v) | mu, sigma) for unit-width bins around v.

    values/scales/means broadcastable; computed in fp32.
    """
    v = values.astype(jnp.float32)
    if means is not None:
        v = v - means.astype(jnp.float32)
    s = lower_bound(scales.astype(jnp.float32), LOWER_BOUND_SCALE)
    v = jnp.abs(v)
    upper = _standardized_cumulative((0.5 - v) / s)
    lower = _standardized_cumulative((-0.5 - v) / s)
    return lower_bound(upper - lower, LOWER_BOUND_LIKELIHOOD)


def quantize_gaussian(
    x: jax.Array,
    training: bool,
    means: jax.Array | None = None,
    noise_key: jax.Array | None = None,
) -> jax.Array:
    """Noisy surrogate during training; round-around-means at eval."""
    if training:
        if noise_key is None:
            raise ValueError("training=True requires a noise_key")
        return additive_uniform_noise(noise_key, x)
    if means is None:
        return jnp.round(x)
    return jnp.round(x - means) + means


def build_indexes(scales: jax.Array, scale_table: jax.Array) -> jax.Array:
    """Map each scale to its quantized-scale-table bucket.

    index = smallest i with scale <= table[i] (last bucket catches the rest),
    the bucketing the reference's coder uses to pick per-symbol CDF rows
    (/root/reference/dmc/models/video_model.py:248-249).
    """
    s = lower_bound(scales.astype(jnp.float32), LOWER_BOUND_SCALE)
    # count of table[:-1] entries strictly below s == searchsorted-left.
    # uint8 (the table has 64 rows): index planes cross the device->host
    # boundary every frame, and the PCIe/tunnel link is the codec's
    # bottleneck — 4x smaller than int32.
    return jnp.searchsorted(scale_table[:-1], s, side="left").astype(jnp.uint8)
