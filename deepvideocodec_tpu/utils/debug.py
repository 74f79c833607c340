"""Debug/NaN-check configuration (SURVEY.md §5 "race detection" row).

The reference has no sanitizer story at all; under jit the purity rules
already preclude data races, so the remaining debug surface is numeric:
a non-finite value born deep inside a fused multi-stage program normally
surfaces only as a garbage loss many steps later. `enable_debug_checks`
turns on jax's traced NaN/Inf checking, which re-runs the offending
program op-by-op and raises FloatingPointError AT the producing op.

Costs (why this is a config, not a default): every jitted call gains a
host-side result scan, and on a NaN hit the de-optimized re-execution is
orders of magnitude slower — strictly a debugging mode. Enable with
`--debug-nan` on the train CLIs or DVC_TPU_DEBUG_NANS=1 in the env.
"""

from __future__ import annotations

import os


def enable_debug_checks(nans: bool = True, infs: bool = True,
                        disable_jit: bool = False) -> None:
    """Turn on numeric sanitizers process-wide (before tracing programs).

    disable_jit additionally runs everything op-by-op (slowest, but stack
    traces point at exact Python lines instead of re-run approximations).
    """
    import jax

    if nans:
        jax.config.update("jax_debug_nans", True)
    if infs:
        jax.config.update("jax_debug_infs", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def maybe_enable_from_env() -> bool:
    """Honor DVC_TPU_DEBUG_NANS=1 (and DVC_TPU_DISABLE_JIT=1); returns
    whether debug checks were enabled. Called by the CLIs at startup so
    a stuck production run can be re-launched in debug mode without a
    code edit."""
    on = os.environ.get("DVC_TPU_DEBUG_NANS") == "1"
    if on:
        enable_debug_checks(
            disable_jit=os.environ.get("DVC_TPU_DISABLE_JIT") == "1")
    return on
