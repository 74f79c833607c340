"""Generalized Divisive Normalization (GDN / IGDN).

The canonical learned-image-compression nonlinearity:
    y_i = x_i / sqrt(beta_i + sum_j gamma_ij * x_j^2)        (forward)
    y_i = x_i * sqrt(beta_i + sum_j gamma_ij * x_j^2)        (inverse)

On TPU the cross-channel mix is a 1x1 conv over x^2 — pure MXU work that XLA
fuses with the surrounding rsqrt/multiply, so no custom kernel is needed.
Parameters are kept positive through a sqrt reparameterization (stored as
sqrt(value + pedestal), squared on use) with projection lower bounds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

_PEDESTAL = 2.0 ** -18
_BETA_MIN = 1e-6


class GDN(nn.Module):
    """Channel-wise divisive normalization over NHWC."""

    inverse: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        beta_init = jnp.sqrt(jnp.ones(c) + _PEDESTAL)
        gamma_init = jnp.sqrt(0.1 * jnp.eye(c) + _PEDESTAL)
        beta_r = self.param("beta", lambda k, s: beta_init, (c,))
        gamma_r = self.param("gamma", lambda k, s: gamma_init, (c, c))

        beta_bound = (_BETA_MIN + _PEDESTAL) ** 0.5
        gamma_bound = _PEDESTAL ** 0.5
        beta = jnp.square(jnp.maximum(beta_r, beta_bound)) - _PEDESTAL
        gamma = jnp.square(jnp.maximum(gamma_r, gamma_bound)) - _PEDESTAL

        norm = jnp.einsum("bhwj,ji->bhwi", jnp.square(x), gamma) + beta
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm
