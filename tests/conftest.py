"""Test harness: 8 virtual CPU devices so multi-chip sharding tests run
without a TPU pod (the capability the reference could never test without a
cluster — SURVEY.md §4)."""

import os

# Force CPU with 8 virtual devices. NOTE: the harness boots every
# interpreter through an axon sitecustomize that programmatically sets
# jax_platforms="axon,cpu" (env vars are overridden), so we must update the
# config AFTER import and clear any already-initialized backends.
os.environ["JAX_PLATFORMS"] = "cpu"
# Persistent compile cache: the sandbox has 1 CPU core, XLA compiles dominate
# test wall-clock without it.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
try:
    from jax._src import xla_bridge as _xb

    _xb._clear_backends()
except Exception:
    pass
assert jax.device_count() == 8, f"expected 8 CPU devices, got {jax.devices()}"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
