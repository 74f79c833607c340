"""Fast parameter initialization via per-stage jitted init programs.

Why this exists: `jax.jit(model.init)` over a full training forward compiles
ONE monolithic XLA program covering the whole multi-frame codec graph, and
XLA's whole-program passes scale superlinearly — measured 408s on CPU for the
small-config DMC, while the same compute split into its real-codec stage
programs compiles in well under a minute. Eager (op-by-op) init is even worse
(hundreds of per-primitive dispatches). So we initialize the way we execute:
one small jitted `model.init` per codec stage, then merge the param trees.

Correctness: flax.linen derives each parameter's init RNG by folding the seed
with the parameter's *module path* (not call order), so every stage-wise init
call produces bit-identical values for the modules it touches, and the merged
tree equals the monolithic `model.init` result exactly (tested in
tests/test_models.py against `jax.eval_shape` structure + a direct value
check on a small model).

The stage lists below intentionally mirror eval/codec.py's jitted programs —
the plans must touch every param-bearing submodule (setup()-declared params
materialize on any method call; @nn.compact params require the module to be
called).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp


def _merge(dst: Dict[str, Any], src: Dict[str, Any]) -> None:
    for k, v in src.items():
        if k in dst and isinstance(dst[k], dict) and isinstance(v, dict):
            _merge(dst[k], v)
        else:
            dst[k] = v


def _run_plan(model, rngs, plan) -> Dict[str, Any]:
    variables: Dict[str, Any] = {}
    for method_name, args, static_kwargs in plan:
        method = getattr(model, method_name)
        fn = functools.partial(model.init, method=method, **static_kwargs)
        tree = jax.jit(fn)(rngs, *args)
        _merge(variables, jax.tree_util.tree_map(lambda x: x, tree))
    return variables


def _f32(*shape):
    return jnp.zeros(shape, jnp.float32)


def _i32(*shape):
    return jnp.zeros(shape, jnp.int32)


def _dmc_plan(model, h, w):
    from .dmc import empty_dpb

    cfg = model.cfg
    hh, ww = h // 16, w // 16
    zh, zw = hh // 4, ww // 4  # hyper latent z lives at /64
    x = _f32(1, h, w, 3)
    dpb = empty_dpb(1, h, w, cfg)
    z_mv = _i32(1, zh, zw, cfg.ch_mv)
    mv_full = _f32(1, hh, ww, cfg.ch_mv)
    mv_half = _f32(1, hh, ww, cfg.ch_mv // 2)
    mv_half_i = _i32(1, hh, ww, cfg.ch_mv // 2)
    # ctx_half mines/consumes context1 at /2 (models/dmc.py)
    c1 = (_f32(1, h // 2, w // 2, cfg.n) if getattr(cfg, "ctx_half", False)
          else _f32(1, h, w, cfg.n))
    c2 = _f32(1, h // 2, w // 2, cfg.n)
    c3 = _f32(1, h // 4, w // 4, cfg.n)
    z_f = _i32(1, zh, zw, cfg.n)
    f_full = _f32(1, hh, ww, cfg.m)
    f_half = _f32(1, hh, ww, cfg.m // 2)
    f_half_i = _i32(1, hh, ww, cfg.m // 2)
    y_mv_hat = _f32(1, hh, ww, cfg.ch_mv)
    return [
        ("encode_motion", (x, dpb), {}),
        ("multi_scale_feature_extractor", (dpb,), {"first_p": True}),
        ("decode_motion_prior", (z_mv, dpb), {"first_p": False}),
        ("decode_motion_spatial", (mv_half_i, mv_full, mv_full), {}),
        ("decode_motion_combine_contexts",
         (mv_half, mv_half, mv_half, mv_half, mv_half_i, dpb),
         {"first_p": False}),
        ("encode_frame", (x, c1, c2, c3), {}),
        ("decode_frame_prior", (z_f, dpb, c3), {"first_p": False}),
        ("decode_frame_spatial", (f_half_i, f_full, f_full), {}),
        ("decode_frame_reconstruct",
         (f_half, f_half, f_half, f_half, f_half_i, y_mv_hat, c1, c2, c3),
         {}),
    ]


def _dvc_plan(model, h, w):
    hh, ww = h // 16, w // 16
    zh, zw = hh // 4, ww // 4
    x = _f32(1, h, w, 3)
    x_ref = _f32(1, h, w, 3)
    return [
        ("encode_motion", (x, x_ref), {}),
        ("decode_motion_prior", (_i32(1, zh, zw, model.n),), {}),
        ("decode_prediction",
         (_i32(1, hh, ww, model.ch_mv), _f32(1, hh, ww, model.ch_mv), x_ref),
         {}),
        ("encode_residual", (x, x_ref), {}),
        ("decode_residual_prior", (_i32(1, zh, zw, model.n),), {}),
        ("decode_reconstruct",
         (_i32(1, hh, ww, model.ch_res), _f32(1, hh, ww, model.ch_res),
          x_ref),
         {}),
    ]


def _dcvc_plan(model, h, w):
    hh, ww = h // 16, w // 16
    zh, zw = hh // 4, ww // 4
    x = _f32(1, h, w, 3)
    x_ref = _f32(1, h, w, 3)
    context = _f32(1, h, w, model.n)
    ctx_small = _f32(1, h // 4, w // 4, model.n)
    return [
        ("encode_motion", (x, x_ref), {}),
        ("decode_motion_prior", (_i32(1, zh, zw, model.n),), {}),
        ("decode_context",
         (_i32(1, hh, ww, model.ch_mv), _f32(1, hh, ww, model.ch_mv), x_ref),
         {}),
        ("encode_frame", (x, context), {}),
        ("decode_frame_prior", (_i32(1, zh, zw, model.n), ctx_small), {}),
        ("decode_reconstruct",
         (_i32(1, hh, ww, model.m), _f32(1, hh, ww, model.m), context), {}),
    ]


def _checkerboard_intra_plan(model, h, w, y_channels=None):
    hh, ww = h // 16, w // 16
    zh, zw = hh // 4, ww // 4
    m = y_channels or model.m
    y = _f32(1, hh, ww, m)
    full = _f32(1, hh, ww, m)
    half = _f32(1, hh, ww, m // 2)
    half_i = _i32(1, hh, ww, m // 2)
    return [
        ("encode_latent", (_f32(1, h, w, 3),), {}),
        ("encode_z", (y,), {}),
        ("decode_prior", (_i32(1, zh, zw, model.n),), {}),
        ("decode_spatial", (half_i, full, full), {}),
        ("decode_combine", (half, half, half, half, half_i), {}),
        ("decode_reconstruct", (y,), {}),
    ]


def _single_stage_plan(model, h, w):
    return [("encode_stage", (_f32(1, h, w, 3),), {})]


_PLANS = {
    "DMC": _dmc_plan,
    "DVC": _dvc_plan,
    "DCVC": _dcvc_plan,
    "CheckerboardImageCodec": _checkerboard_intra_plan,
    # cheng2020 topology: y has N (not M) channels, same staged API
    "Cheng2020CheckerboardCodec": (
        lambda model, h, w: _checkerboard_intra_plan(
            model, h, w, y_channels=model.n)),
    "FactorizedImageCodec": _single_stage_plan,
    "HyperpriorImageCodec": _single_stage_plan,
}


def fast_init(model, rng, height: int = 64, width: int = 64):
    """Initialize `model`'s full variable tree via per-stage jitted inits.

    Bit-identical to `model.init(rngs, ...)` over the training forward (the
    param RNG folding is path-based), but compiles a handful of small stage
    programs instead of one monolithic graph. `rng` may be a single key (it
    is used for both the 'params' and 'noise' streams, matching the
    `{"params": k, "noise": k}` convention used throughout) or a dict of
    rngs.

    Spatial size only needs to satisfy the model's stride structure (/64);
    parameter shapes do not depend on it.
    """
    if isinstance(rng, dict):
        rngs = rng
    else:
        rngs = {"params": rng, "noise": rng}
    kind = type(model).__name__
    if kind not in _PLANS:
        raise ValueError(f"no staged-init plan for model class {kind!r}")
    plan = _PLANS[kind](model, height, width)
    return _run_plan(model, rngs, plan)
