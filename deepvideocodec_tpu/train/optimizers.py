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
import optax


def partition_labels(params: Any) -> Any:
    """'aux' for quantile leaves of entropy bottlenecks, 'main' otherwise."""

    def label(path, _leaf):
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return "aux" if "quantiles" in names else "main"

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    learning_rate,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
) -> optax.GradientTransformation:
    """learning_rate may be a float or an optax schedule (MultiStep-style)."""
    main_chain = []
    if clip_max_norm and clip_max_norm > 0:
        main_chain.append(optax.clip_by_global_norm(clip_max_norm))
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
