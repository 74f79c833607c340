"""Debug/NaN-check config (utils/debug.py — SURVEY §5 sanitizer row)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepvideocodec_tpu.utils.debug import (
    enable_debug_checks,
    maybe_enable_from_env,
)


def _restore():
    jax.config.update("jax_debug_nans", False)
    jax.config.update("jax_debug_infs", False)
    jax.config.update("jax_disable_jit", False)


def test_nan_raises_at_producing_op():
    try:
        enable_debug_checks()

        @jax.jit
        def f(x):
            return jnp.log(x) * 2.0  # log(-1) -> NaN

        with pytest.raises(FloatingPointError):
            jax.block_until_ready(f(jnp.asarray(-1.0)))
        # clean values still pass through
        assert np.isfinite(float(f(jnp.asarray(1.0))))
    finally:
        _restore()


def test_env_gate(monkeypatch):
    try:
        monkeypatch.delenv("DVC_TPU_DEBUG_NANS", raising=False)
        assert maybe_enable_from_env() is False
        assert not jax.config.jax_debug_nans
        monkeypatch.setenv("DVC_TPU_DEBUG_NANS", "1")
        assert maybe_enable_from_env() is True
        assert jax.config.jax_debug_nans
    finally:
        _restore()
