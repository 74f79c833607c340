"""Dual-optimizer setup: main Adam + auxiliary Adam on quantile params.

The reference runs two Adams — one over all parameters except the entropy
bottlenecks' `.quantiles`, one over only the quantiles at a 10x higher LR
(/root/reference/dmc/train.py:251-282), with grad-clip 1.0 on the main step.
Here both losses are computed in a single backward (they touch disjoint
parameter sets by construction: the aux loss freezes the density, the main
path stop-gradients the medians) and a single optax.multi_transform applies
the right transform per partition — one fused update instead of two
sequential host round-trips.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def partition_labels(params: Any) -> Any:
    """'aux' for quantile leaves of entropy bottlenecks, 'main' otherwise."""

    def label(path, _leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "aux" if "quantiles" in names else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def clip_by_global_norm_safe(max_norm: float) -> optax.GradientTransformation:
    """Overflow-proof global-norm clip.

    optax.clip_by_global_norm squares leaves in fp32; a gradient spike past
    ~1e19 (easy at RD-loss scale lambda=2048 early in training) overflows the
    sum to inf, the scale becomes 0, and the whole update silently vanishes.
    Here the norm is computed on max-rescaled gradients — norm = M *
    ||g / M|| with M the global absmax — which cannot overflow, so a spike
    step clips to `max_norm` instead of stalling. Non-finite gradients still
    produce a non-finite norm (surfaced in metrics), never a fake zero.
    """

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        leaves = jax.tree_util.tree_leaves(updates)
        absmax = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(g.astype(jnp.float32))) for g in leaves]))
        m = jnp.maximum(absmax, 1e-30)
        sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32) / m))
                 for g in leaves)
        norm = m * jnp.sqrt(sq)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-30))
        return (jax.tree_util.tree_map(
            lambda g: (g.astype(jnp.float32) * scale).astype(g.dtype),
            updates), state)

    return optax.GradientTransformation(init_fn, update_fn)


def global_norm_safe(tree: Any) -> jax.Array:
    """Overflow-proof global L2 norm (same max-rescaled form as the clip).

    optax.global_norm overflows to inf past ~1e19 — early RD-loss spikes
    reach that, so a metrics readout built on it reports inf while the
    safe clip is in fact clipping a finite norm.
    """
    leaves = jax.tree_util.tree_leaves(tree)
    absmax = jnp.max(jnp.stack(
        [jnp.max(jnp.abs(g.astype(jnp.float32))) for g in leaves]))
    m = jnp.maximum(absmax, 1e-30)
    sq = sum(jnp.sum(jnp.square(g.astype(jnp.float32) / m))
             for g in leaves)
    return m * jnp.sqrt(sq)


def make_optimizer(
    learning_rate,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
) -> optax.GradientTransformation:
    """learning_rate may be a float or an optax schedule (MultiStep-style)."""
    main_chain = []
    if clip_max_norm and clip_max_norm > 0:
        main_chain.append(clip_by_global_norm_safe(clip_max_norm))
    main_chain.append(optax.adam(learning_rate))
    return optax.multi_transform(
        {"main": optax.chain(*main_chain), "aux": optax.adam(aux_learning_rate)},
        partition_labels,
    )


def multistep_lr(
    base_lr: float, milestones=(300,), gamma: float = 0.1
) -> optax.Schedule:
    """MultiStepLR equivalent (reference: train.py:585, milestone [300]).

    `milestones` are in optimizer steps — callers convert epoch milestones
    via steps_per_epoch (the reference steps its scheduler once per epoch).
    Each boundary multiplies the LR by `gamma`.
    """
    boundaries = {int(m): gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)
