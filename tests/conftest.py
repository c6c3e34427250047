"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: this image preloads a TPU PJRT plugin via sitecustomize, so jax is
already imported when conftest runs; the platform must be switched through
jax.config before any backend is initialized (env vars alone are too late).
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + jax.devices()[0].platform)
    assert jax.device_count() == 8
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# The XLA:CPU JIT aborts (SIGABRT/SIGSEGV inside backend_compile_and_load)
# once a single process accumulates the whole suite's compiled executables
# (reproducible at ~117 tests; each half of the suite passes alone).
# Releasing compiled artifacts between modules keeps the JIT healthy at the
# cost of some per-module recompilation.
@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
