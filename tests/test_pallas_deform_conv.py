"""Pallas DCN kernel vs the XLA gather implementation (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.ops.deform_conv import deform_conv2d
from slotvps_tpu.ops.pallas.deform_conv import deform_conv2d_pallas

ON_TPU = jax.default_backend() not in ("cpu",)


@pytest.fixture(autouse=True)
def _interpret_on_cpu():
    if not ON_TPU:
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            yield
    else:
        yield


@pytest.mark.parametrize("shape", [
    (1, 8, 128, 128, 128),   # one column tile
    (2, 6, 256, 128, 64),    # two tiles, batched
    (1, 8, 64, 128, 128),    # small width (P5-like tile=64)
])
def test_matches_xla_within_halo(rng, shape):
    b, h, w, c, co = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 1.5, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    ref = deform_conv2d(x, off, wt, padding=1, max_displacement=4)
    ours = deform_conv2d_pallas(x, off, wt, halo=4,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_offsets_is_plain_conv(rng):
    import torch
    import torch.nn.functional as F

    b, h, w, c, co = 1, 8, 128, 128, 64
    x = rng.standard_normal((b, h, w, c), dtype=np.float32)
    wt = rng.standard_normal((3, 3, c, co), dtype=np.float32) * 0.1
    off = np.zeros((b, h, w, 18), np.float32)
    ours = np.asarray(deform_conv2d_pallas(
        jnp.asarray(x), jnp.asarray(off), jnp.asarray(wt),
        compute_dtype=jnp.float32))
    t = F.conv2d(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                 torch.from_numpy(wt.transpose(3, 2, 0, 1)), padding=1)
    np.testing.assert_allclose(ours, t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)


def test_bf16_mode_close(rng):
    b, h, w, c, co = 1, 8, 128, 128, 128
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    ref = np.asarray(deform_conv2d(x, off, wt, padding=1,
                                   max_displacement=4))
    ours = np.asarray(deform_conv2d_pallas(x, off, wt, halo=4,
                                           compute_dtype=jnp.bfloat16))
    denom = np.abs(ref).max()
    assert np.abs(ours - ref).max() / denom < 2e-2
