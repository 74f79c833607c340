"""Quantization surrogates used in rate-distortion training.

`quantize_ste` is the straight-through rounding trick of the reference
(/root/reference/dmc/models/utils.py:149-152): forward rounds, backward passes
gradients unchanged. `additive_uniform_noise` is the Balle noisy-quantization
surrogate used on the likelihood path during training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_ste(x: jax.Array) -> jax.Array:
    """Straight-through rounding: round(x) forward, identity backward."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def additive_uniform_noise(key: jax.Array, x: jax.Array) -> jax.Array:
    """x + U(-0.5, 0.5), the differentiable quantization surrogate."""
    noise = jax.random.uniform(
        key, x.shape, dtype=x.dtype, minval=-0.5, maxval=0.5)
    return x + noise
