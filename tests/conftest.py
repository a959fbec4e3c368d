"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the fake-backend capability the
reference lacks — SURVEY.md §4).

This environment's sitecustomize imports jax at interpreter start, so env
vars alone are too late for platform selection — but backend *creation* is
lazy, so ``jax.config.update('jax_platforms', ...)`` here still wins as
long as no computation ran yet."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# full-precision matmuls in tests: parity comparisons against torch/numpy
# need f32 accumulation, not the bf16-pass default
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: multi-minute compile-heavy tests")


# the collective-timeout + compile-cache setup the dryrun uses also
# benefits the in-suite multi-device tests on this single-core host
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_slotvps")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass
