"""Orbax checkpointing: params + optimizer state + step, best-loss tracking.

The TPU-native replacement for the reference's torch.save checkpoints
(/root/reference/dmc/train.py:400-403): step-keyed Orbax directories holding
the full TrainState pytree (params, both optimizer partitions, step) plus
epoch/loss metadata; `best` mirrors checkpoint_best_loss. Unlike the torch
state-dict path there are no dynamically-sized CDF buffers to resize on load
(utils.py:35-125) — CDF tables are rebuilt from params at codec construction.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


def save_checkpoint(
    directory,
    step: int,
    state: Any,
    metrics: Optional[dict] = None,
    is_best: bool = False,
) -> None:
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(directory / f"step_{step:08d}", state, force=True)
    ckpt.wait_until_finished()
    if metrics is not None:
        (directory / f"step_{step:08d}.json").write_text(
            json.dumps(metrics))
    if is_best:
        (directory / "best.json").write_text(
            json.dumps({"step": step, **(metrics or {})}))


def latest_step(directory) -> Optional[int]:
    directory = Path(directory)
    if not directory.is_dir():
        return None
    steps = sorted(
        int(p.name.split("_")[1])
        for p in directory.glob("step_*")
        if p.is_dir()
    )
    return steps[-1] if steps else None


def restore_checkpoint(directory, step: int, target: Any) -> Any:
    """Restore into the structure of `target` (a concrete TrainState)."""
    directory = Path(directory).absolute()
    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(directory / f"step_{step:08d}", target)


def save_params_export(directory, params: Any) -> None:
    """Save a params-only export (what inference consumers restore —
    no optimizer state, so the reader needs no training setup)."""
    directory = Path(directory).absolute()
    directory.mkdir(parents=True, exist_ok=True)
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(directory / "params_export", params, force=True)
    ckpt.wait_until_finished()


def restore_params_only(directory, step: int, target: Any) -> Any:
    """Restore just the `params` field of a saved TrainState checkpoint.

    Inference consumers (cli/evaluate.py, bench) must not need to
    reconstruct the training optimizer to read a checkpoint: the saved
    opt_state's pytree shape depends on training-only settings (e.g.
    whether the LR was a schedule — optax.adam stores ScaleByScheduleState
    vs EmptyState), so restoring into a full TrainState template built
    without those settings fails structurally. Orbax restores the raw tree
    without a template; the params subtree is then validated + dtype-cast
    against `target` (tree_map raises on any structure mismatch).
    """
    import jax
    import jax.numpy as jnp

    directory = Path(directory).absolute()
    raw = ocp.StandardCheckpointer().restore(directory / f"step_{step:08d}")
    return jax.tree.map(
        lambda t, r: jnp.asarray(r, dtype=t.dtype), target, raw["params"])


def restore_params_export(directory, target: Any) -> Optional[Any]:
    """Restore a params-only export; None if the export doesn't exist."""
    path = Path(directory).absolute() / "params_export"
    if not path.is_dir():
        return None
    return ocp.StandardCheckpointer().restore(path, target)


def warm_start_params(target: Any, raw: Any, _path: str = "") -> tuple:
    """Merge a raw restored params tree into `target`, leaf by leaf.

    Topology-changing fine-tunes (e.g. a narrower recon UNet as a
    speed/RD trade — docs/PERFORMANCE.md roadmap) can't use the strict
    template restore: the donor checkpoint matches most of the new
    model's tree but not all of it. This takes every donor leaf whose
    path exists in `target` with the same shape (cast to the target
    dtype) and keeps the target's fresh init elsewhere — the pytree
    analog of torch's load_state_dict(strict=False), which the
    reference relies on compressai's buffer-resize machinery for
    (/root/reference/dmc/models/utils.py:35-125).

    Returns (merged, restored_paths, skipped_paths).
    """
    import jax.numpy as jnp
    import numpy as np

    restored, skipped = [], []

    def merge(t, r, path):
        if isinstance(t, dict):
            if not isinstance(r, dict):
                skipped.append(path or "/")
                return t
            out = {}
            for k, v in t.items():
                if k in r:
                    out[k] = merge(v, r[k], f"{path}/{k}")
                else:
                    skipped.append(f"{path}/{k}")
                    out[k] = v
            return out
        r_arr = np.asarray(r)
        t_arr = jnp.asarray(t)
        if r_arr.shape == t_arr.shape:
            restored.append(path)
            return jnp.asarray(r_arr, t_arr.dtype)
        skipped.append(f"{path} (shape {r_arr.shape} != {t_arr.shape})")
        return t

    merged = merge(target, raw, _path)
    return merged, restored, skipped


def restore_params_export_partial(directory, target: Any):
    """Shape-tolerant restore for warm starts across topology changes.

    Accepts a params_export directory or a .npz export file (the
    committed ckpts/*.npz artifacts). Returns (params, restored_paths,
    skipped_paths) or None if no export exists.
    """
    import re

    p = Path(directory).absolute()
    if p.is_file() and p.suffix == ".npz":
        import numpy as np

        raw: dict = {}
        with np.load(p) as data:
            for key in data.files:
                node = raw
                parts = re.findall(r"\['([^']+)'\]", key)
                for part in parts[:-1]:
                    node = node.setdefault(part, {})
                node[parts[-1]] = data[key]
        return warm_start_params(target, raw)
    path = p / "params_export"
    if not path.is_dir():
        return None
    raw = ocp.StandardCheckpointer().restore(path)
    return warm_start_params(target, raw)


# Entropy-model density/offset params where f16 storage rounding would
# shift CDF tables more than necessary; everything else tolerates f16
# (codec bit-exactness never depends on storage precision — both codec
# sides build tables from the same stored values). The tokens match the
# FactorizedEntropyBottleneck param names matrix_{i}/bias_{i}/factor_{i}/
# quantiles (entropy/factorized.py) without catching conv 'bias' leaves.
_F32_PATH_TOKENS = ("quantiles", "matrix_", "bias_", "factor_")


def save_npz_export(path, params: Any) -> None:
    """Single-file compressed params export (checked into the repo so the
    driver's bench can run trained weights anywhere). f16 storage except
    entropy-critical leaves; restore casts back to the target dtypes."""
    import jax
    import numpy as np

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for p, leaf in flat:
        key = jax.tree_util.keystr(p)
        a = np.asarray(leaf)
        if (a.dtype == np.float32
                and not any(t in key for t in _F32_PATH_TOKENS)):
            a = a.astype(np.float16)
        arrays[key] = a
    np.savez_compressed(path, **arrays)


def restore_any_params(path, target: Any) -> Any:
    """Restore params from any trained-weights artifact form:

    - a ``.npz`` file written by :func:`save_npz_export` (the committed
      ``ckpts/*.npz`` exports),
    - a run directory containing a ``params_export``, or
    - an Orbax checkpoint directory (latest ``step_*`` is used).

    One dispatch for every CLI's --checkpoint/--intra-checkpoint/--init-
    from flag, so the committed single-file exports are accepted anywhere
    a checkpoint directory is.
    """
    p = Path(path)
    if p.is_file() and p.suffix == ".npz":
        return restore_npz_export(str(p), target)
    restored = restore_params_export(p, target)
    if restored is not None:
        return restored
    step = latest_step(p)
    if step is None:
        raise FileNotFoundError(
            f"{path}: no .npz export, params_export, or checkpoint steps")
    return restore_params_only(p, step, target)


def restore_npz_export(path, target: Any) -> Any:
    """Restore a save_npz_export file into `target`'s structure/dtypes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    with np.load(path) as data:
        def pick(p, leaf):
            key = jax.tree_util.keystr(p)
            if key not in data:
                raise KeyError(f"npz export missing param {key}")
            arr = data[key]
            if tuple(arr.shape) != tuple(np.shape(leaf)):
                # Fail HERE with the param path — a silently-loaded
                # topology mismatch (e.g. wrong --unet-width) otherwise
                # surfaces as an opaque XLA conv error far from the cause.
                raise ValueError(
                    f"npz export {path}: param {key} has shape "
                    f"{tuple(arr.shape)} but the target model expects "
                    f"{tuple(np.shape(leaf))} — wrong topology/variant "
                    "for these weights?")
            return jnp.asarray(arr, dtype=leaf.dtype)

        return jax.tree_util.tree_map_with_path(pick, target)
