"""Test configuration: run everything on a virtual 8-device CPU mesh.

The machine environment pins JAX_PLATFORMS=axon (remote TPU) and a
sitecustomize imports jax at interpreter startup, so by the time pytest
loads this file the env var has already been latched into jax's config —
plain os.environ edits are too late. `jax.config.update` before any backend
is instantiated is the reliable switch; XLA_FLAGS is still read at backend
init so setting it here works.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = flags + " --xla_force_host_platform_device_count=8"
if "xla_backend_optimization_level" not in flags:
    # Compile-time matters far more than runtime for the suite (1-core CPU
    # host; LLVM codegen per conv dominates): -O0 compiles ~3x faster.
    flags = flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", (
    f"tests must run on cpu, got {jax.devices()}")

# Persistent compilation cache: the suite is compile-dominated (dozens of
# jitted codec programs); repeat runs hit the cache instead of XLA.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _reset_compute_dtype():
    """The codec-wide compute dtype is a module global set by each model's
    setup(); a bf16-model test must not leak bf16 into later tests that
    build bare layers (e.g. the torch golden tests)."""
    from deepvideocodec_tpu.models.layers import set_compute_dtype

    set_compute_dtype("float32")
    yield
    set_compute_dtype("float32")
