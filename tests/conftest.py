"""Test env: force CPU with 8 virtual devices BEFORE jax initializes, so
collective/sharding tests run with full psum/all_gather/ppermute semantics
and zero TPUs (SURVEY.md section 4.2 'distributed without a real cluster')."""

import os

# NOTE: this image's sitecustomize imports jax at interpreter start, so the
# JAX_PLATFORMS env var is consumed before this file runs — use
# jax.config.update("jax_platforms", ...) instead (it wins as long as no
# backend has been initialized yet).  XLA_FLAGS is still read lazily.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# x64 available for the f64 oracle/verification paths; production arrays are
# created float32 explicitly (datagen default), matching the TPU setup.
jax.config.update("jax_enable_x64", True)

# persistent compilation cache — recompiling tiny CPU executables dominates
# test wall-clock otherwise
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_co_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
