"""Data-parallel scaling over a JAX device mesh.

The reference's only parallelism is single-process multi-GPU DataParallel
(/root/reference/dmc/train.py:230-237, 598-600 — replicate/scatter/gather
each step). The TPU-native equivalent is SPMD over a 1-D `data` mesh axis:
the batch is sharded across chips, parameters are replicated, and XLA
inserts the gradient all-reduce (psum) over ICI automatically from the
sharding annotations — no hand-written collectives.

The models carry no attention and are O(10-40M) params, so tensor/pipeline
parallelism buys nothing (SURVEY.md §2.8); scale comes from batch data
parallelism (training) and sequence-level sharding of independent GOPs
(eval). For 4K+ single-frame latency work, spatial (H) sharding with halo
exchange is the natural extension — not a reference capability, tracked as
future work.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.trainer import TrainState
from ..train.curriculum import Stage
from ..train.loss import rate_distortion_loss
from ..train.optimizers import make_optimizer, global_norm_safe

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D data-parallel mesh over the given (or all) devices.

    Multi-host (pod-scale): call `init_multihost()` first; jax.devices()
    then spans every host's chips, the mesh covers the pod, and the
    gradient psum rides ICI within a slice / DCN across slices — the
    batch-parallel layout needs no per-topology changes (no attention,
    no TP/PP: SURVEY.md section 2.8).
    """
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def init_multihost(**kwargs) -> None:
    """Initialize the JAX distributed runtime for multi-host training.

    Call once per process before any jax op (TPU pods: no arguments —
    coordinator/process ids come from the TPU environment; elsewhere pass
    coordinator_address/num_processes/process_id). Single-process callers
    can skip this entirely.
    """
    jax.distributed.initialize(**kwargs)


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-indexed batch: with per-host data
    loading, each process feeds only its shard of the global batch."""
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch sharding: leading (batch) axis split across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (parameters, optimizer state)."""
    return NamedSharding(mesh, P())


def make_parallel_train_step(
    model,
    stage: Stage,
    lmbda: float,
    mesh: Mesh,
    intra_model=None,
    intra_params=None,
    scan_frames: bool = False,
) -> Callable:
    """Data-parallel train step: batch sharded on `data`, params replicated.

    jit + output shardings make XLA insert the cross-chip gradient psum over
    ICI; the returned step takes (state, batch, rng) exactly like the
    single-chip step.
    """
    if stage.use_intra_iframe and intra_model is None:
        raise ValueError("intra stage requires an intra model")

    batch_sharding = shard_batch(mesh)
    repl = replicate(mesh)
    # lambda is a TRACED scalar argument so every lambda of an RD sweep
    # shares one compiled program per stage (trainer.py has the full
    # rationale).
    import jax.numpy as jnp

    lmbda_arr = jnp.asarray(lmbda, jnp.float32)
    # DMC-only O(1)-trace long-cascade path (trainer.py has the note)
    extra = {"scan_frames": True} if scan_frames else {}

    def loss_fn(params, batch, noise_rng, lmbda_t):
        frames = batch
        if stage.use_intra_iframe:
            intra_out = intra_model.apply(
                intra_params, frames[:, 0], training=False)
            frames = frames.at[:, 0].set(
                jax.lax.stop_gradient(intra_out["x_hat"]))
        out = model.apply(
            params, frames,
            motion_pretrain=stage.motion_pretrain,
            frame_pretrain=stage.frame_pretrain,
            training=True,
            rngs={"noise": noise_rng},
            **extra,
        )
        metrics = rate_distortion_loss(out, frames[:, 1:], lmbda_t)
        aux = model.apply(params, method=model.aux_loss)
        metrics["aux_loss"] = aux
        return metrics[stage.loss_key] + aux, metrics

    def step(state: TrainState, batch, rng, lmbda_t):
        noise_rng = jax.random.fold_in(rng, state.step)
        grads, metrics = jax.grad(
            loss_fn, has_aux=True)(state.params, batch, noise_rng, lmbda_t)
        metrics["grad_norm"] = global_norm_safe(grads)
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    if mesh.size == 1:
        # Trivial mesh: skip the sharding annotations so XLA compiles the
        # single-device program directly. Semantically identical (every
        # spec is degenerate at size 1), and the SPMD-partitioner pipeline
        # the annotations force is what the axon remote-compile helper
        # cannot survive on the big training graphs (subprocess SIGKILL,
        # measured: same graph compiles fine un-annotated).
        jitted = jax.jit(step)
    else:
        jitted = jax.jit(
            step,
            in_shardings=(repl, batch_sharding, repl, repl),
            out_shardings=(repl, repl),
        )

    def train_step(state: TrainState, batch, rng):
        return jitted(state, batch, rng, lmbda_arr)

    # AOT hooks: callers that need ahead-of-time compilation artifacts
    # (e.g. __graft_entry__'s dryrun serialized-executable cache) can
    # lower/compile the underlying jitted fn with the full argument list
    # (state, batch, rng, *static_args).
    train_step.jitted = jitted
    train_step.static_args = (lmbda_arr,)
    return train_step


def device_put_batch(batch, mesh: Mesh):
    """Place a host batch sharded across the data axis.

    Single-host: `batch` is the global batch. Multi-host: `batch` is this
    process's shard (fed by a Loader constructed with
    num_shards=process_count, shard_index=process_index — deterministic
    disjoint slices of one global order) and the global array is assembled
    from the per-process locals.
    """
    sharding = shard_batch(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sharding, batch)
    return jax.device_put(batch, sharding)
