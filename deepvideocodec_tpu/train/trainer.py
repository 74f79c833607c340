"""Jitted train/eval steps and training state.

One fused XLA program per curriculum stage: forward (all P-frames unrolled —
max_frames is 2-3), RD loss + aux loss in a single backward, partitioned
Adam update. The whole step runs on device; only scalar metrics return to
host. Mirrors the reference's train_one_epoch inner loop
(/root/reference/dmc/train.py:285-346) minus its Python-side graph swaps —
stage flags are static so each stage is its own compiled step.

Multi-chip: steps are sharding-agnostic pure functions; parallel/mesh.py
wraps them with NamedSharding constraints for data-parallel execution.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .curriculum import Stage
from .loss import rate_distortion_loss
from .optimizers import make_optimizer, global_norm_safe


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt_state,
        )


def create_train_state(
    model,
    rng: jax.Array,
    example_batch: jax.Array,
    learning_rate=1e-4,
    aux_learning_rate: float = 1e-3,
    clip_max_norm: float = 1.0,
) -> TrainState:
    del example_batch  # param shapes don't depend on the batch geometry
    params_rng, noise_rng = jax.random.split(rng)
    # Stage-wise init: one small jitted program per codec stage instead of
    # a monolithic init graph (XLA whole-program compile is superlinear —
    # see models/init.py). Values are bit-identical to model.init.
    from ..models.init import fast_init

    variables = fast_init(
        model, {"params": params_rng, "noise": noise_rng})
    tx = make_optimizer(learning_rate, aux_learning_rate, clip_max_norm)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables,
        opt_state=tx.init(variables),
        tx=tx,
    )


def _model_aux_loss(model, params):
    return model.apply(params, method=model.aux_loss)


def make_train_step(
    model,
    stage: Stage,
    lmbda: float,
    intra_model=None,
    intra_params=None,
    scan_frames: bool = False,
) -> Callable:
    """Build the jitted train step for one curriculum stage.

    Stage 'e2e_intra' replaces the clean I-frame with the frozen intra
    codec's reconstruction before the inter pass (reference
    train.py:323-330); the intra params are closed over as constants
    (no gradient).
    """
    if stage.use_intra_iframe and intra_model is None:
        raise ValueError("intra stage requires an intra model")

    # lambda rides as a TRACED scalar argument (not a baked constant) so
    # every lambda shares ONE compiled program per stage — on TPU a stage
    # compile is minutes through a flaky remote helper, and an RD
    # campaign sweeps several lambdas. (intra_params stay closed over:
    # campaigns share one frozen intra codec.)
    lmbda_arr = jnp.asarray(lmbda, jnp.float32)
    # scan_frames is a DMC-only __call__ kwarg (O(1)-trace long-cascade
    # path); only forward it when requested so other families' signatures
    # stay untouched.
    extra = {"scan_frames": True} if scan_frames else {}

    def loss_fn(params, batch, noise_rng, lmbda_t):
        frames = batch
        if stage.use_intra_iframe:
            intra_out = intra_model.apply(
                intra_params, frames[:, 0], training=False)
            iframe = jax.lax.stop_gradient(intra_out["x_hat"])
            frames = frames.at[:, 0].set(iframe)
        out = model.apply(
            params, frames,
            motion_pretrain=stage.motion_pretrain,
            frame_pretrain=stage.frame_pretrain,
            training=True,
            rngs={"noise": noise_rng},
            **extra,
        )
        metrics = rate_distortion_loss(out, frames[:, 1:], lmbda_t)
        aux = _model_aux_loss(model, params)
        metrics["aux_loss"] = aux
        # single fused backward: the two losses touch disjoint param sets
        total = metrics[stage.loss_key] + aux
        return total, metrics

    @jax.jit
    def _step(state: TrainState, batch, rng, lmbda_t):
        noise_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(
            loss_fn, has_aux=True)(state.params, batch, noise_rng, lmbda_t)
        metrics["grad_norm"] = global_norm_safe(grads)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    def train_step(state: TrainState, batch, rng):
        return _step(state, batch, rng, lmbda_arr)

    return train_step


def make_eval_step(
    model, stage: Stage, lmbda: float, intra_model=None, intra_params=None,
    scan_frames: bool = False,
) -> Callable:
    """Deterministic eval mirror of the stage (round quantization)."""
    lmbda_arr = jnp.asarray(lmbda, jnp.float32)  # traced: see train step
    extra = {"scan_frames": True} if scan_frames else {}

    @jax.jit
    def _eval(params, batch, lmbda_t):
        frames = batch
        if stage.use_intra_iframe:
            intra_out = intra_model.apply(
                intra_params, frames[:, 0], training=False)
            frames = frames.at[:, 0].set(intra_out["x_hat"])
        out = model.apply(
            params, frames,
            motion_pretrain=stage.motion_pretrain,
            frame_pretrain=stage.frame_pretrain,
            training=False,
            **extra,
        )
        metrics = rate_distortion_loss(out, frames[:, 1:], lmbda_t)
        metrics["aux_loss"] = _model_aux_loss(model, params)
        return metrics

    def eval_step(params, batch):
        return _eval(params, batch, lmbda_arr)

    return eval_step
