"""Test config: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (the fake-backend capability the
reference lacks — SURVEY.md §4)."""

import os

# must run before jax is imported anywhere
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

# full-precision matmuls in tests: parity comparisons against torch/numpy
# need f32 accumulation, not the bf16-pass default
jax.config.update("jax_default_matmul_precision", "float32")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
