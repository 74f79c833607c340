"""Lower bound with a gradient that can still push values upward.

Entropy models clamp likelihoods/scales from below; a plain `maximum` would
zero all gradients for clamped entries and the density could never recover.
Following the standard learned-compression formulation, the bound passes the
cotangent through when either the input is above the bound or the gradient
would *increase* the input (cotangent < 0 under minimization). Mirrors the
bounding used by the reference's entropy models (imported from compressai at
/root/reference/dmc/models/base_model.py:37).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Likelihood floor used by all entropy models.
LOWER_BOUND_LIKELIHOOD = 1e-9
# Scale floor for the conditional Gaussian (matches SCALES_MIN).
LOWER_BOUND_SCALE = 0.11


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def lower_bound(x: jax.Array, bound: float) -> jax.Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), x


def _lower_bound_bwd(bound, x, g):
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0),)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)
