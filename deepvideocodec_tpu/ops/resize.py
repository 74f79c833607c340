"""Fixed-factor bilinear resizes and poolings used by the codec.

The reference uses `F.interpolate(..., mode='bilinear', align_corners=False)`
for exact x2 / ÷2 resizes (/root/reference/dmc/models/layers.py:201-214). With
half-pixel centers these have closed forms:

  * ÷2: each output texel lands exactly between a 2x2 input block -> the
    resize *is* 2x2 average pooling (weights 0.25 each). We implement it as a
    reduce_window mean, which XLA fuses well on TPU.
  * x2: output texel 2k samples src k-0.25 (weights .75/.25 toward k / k-1),
    texel 2k+1 samples k+0.25 (.75/.25 toward k / k+1), edges clamped. We
    build the even/odd phases with pad-and-shift adds and interleave — no
    gather, pure VPU work.

Both match torch's align_corners=False convention bit-for-float on even sizes
(validated in tests/test_ops.py against torch.nn.functional.interpolate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 average pooling over NHWC."""
    s = jax.lax.reduce_window(
        x, 0.0 if x.dtype != jnp.bfloat16 else jnp.bfloat16(0),
        jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )
    return s * jnp.asarray(0.25, x.dtype)


def max_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2/stride-2 max pooling over NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf if x.dtype != jnp.bfloat16 else jnp.bfloat16(-jnp.inf),
        jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
    )


def bilinear_downsample_x2(x: jax.Array) -> jax.Array:
    """Bilinear ÷2 with align_corners=False == 2x2 mean (even sizes)."""
    return avg_pool_2x2(x)


def _upsample_axis_x2(x: jax.Array, axis: int) -> jax.Array:
    """Double one spatial axis with half-pixel bilinear weights."""
    # Neighbours with edge clamp.
    n = x.shape[axis]
    idx_prev = jnp.concatenate(
        [jnp.array([0]), jnp.arange(0, n - 1)])  # k-1 clamped
    idx_next = jnp.concatenate(
        [jnp.arange(1, n), jnp.array([n - 1])])  # k+1 clamped
    prev = jnp.take(x, idx_prev, axis=axis)
    nxt = jnp.take(x, idx_next, axis=axis)
    even = 0.75 * x + 0.25 * prev   # output index 2k
    odd = 0.75 * x + 0.25 * nxt     # output index 2k+1
    stacked = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return stacked.reshape(new_shape).astype(x.dtype)


def bilinear_upsample_x2(x: jax.Array) -> jax.Array:
    """Bilinear x2 upsample, align_corners=False, NHWC."""
    x = _upsample_axis_x2(x, axis=1)
    x = _upsample_axis_x2(x, axis=2)
    return x
