"""Deformable conv parity: XLA impl vs slow reference, and vs a plain conv
at zero offsets (where DCN must reduce to standard convolution)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slotvps_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_reference


def _rand_inputs(rng, b=1, h=9, w=11, c_in=4, c_out=6, k=3, off_scale=2.0):
    x = rng.standard_normal((b, h, w, c_in), dtype=np.float32)
    offset = (rng.standard_normal((b, h, w, 2 * k * k), dtype=np.float32)
              * off_scale)
    weight = rng.standard_normal((k, k, c_in, c_out), dtype=np.float32) * 0.1
    return x, offset, weight


def test_zero_offset_equals_plain_conv(rng):
    x, _, weight = _rand_inputs(rng)
    offset = np.zeros((1, 9, 11, 18), np.float32)
    ours = np.asarray(deform_conv2d(x, offset, weight, padding=1))
    t_x = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    t_w = torch.from_numpy(np.transpose(weight, (3, 2, 0, 1)))
    theirs = F.conv2d(t_x, t_w, padding=1).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_matches_slow_reference(rng):
    x, offset, weight = _rand_inputs(rng)
    ours = np.asarray(deform_conv2d(x, offset, weight, padding=1))
    ref = deform_conv2d_reference(x, offset, weight, padding=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_matches_slow_reference_stride2(rng):
    x, offset, weight = _rand_inputs(rng, h=10, w=12)
    offset = offset[:, ::2, ::2]
    ours = np.asarray(deform_conv2d(x, offset, weight, stride=2, padding=1))
    ref = deform_conv2d_reference(x, offset, weight, stride=2, padding=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_modulated_matches_slow_reference(rng):
    x, offset, weight = _rand_inputs(rng)
    mask = rng.random((1, 9, 11, 9), dtype=np.float32)
    ours = np.asarray(deform_conv2d(x, offset, weight, mask=mask, padding=1))
    ref = deform_conv2d_reference(x, offset, weight, mask=mask, padding=1)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_large_offsets_clamped_not_nan(rng):
    # beyond the halo the op clamps (documented approximation): outputs
    # must stay finite and valid-rule samples outside the image are zero
    x, offset, weight = _rand_inputs(rng, off_scale=50.0)
    out = np.asarray(deform_conv2d(x, offset, weight, padding=1,
                                   max_displacement=4))
    assert np.isfinite(out).all()


def test_boundary_rule_partial_corner(rng):
    # a sample at y=-0.5 has its top corners outside: they read as zero,
    # but the sample still contributes (CUDA rule: -1 < p < size)
    x = np.ones((1, 4, 4, 1), np.float32)
    weight = np.zeros((3, 3, 1, 1), np.float32)
    weight[0, 0, 0, 0] = 1.0  # only tap (0,0)
    offset = np.zeros((1, 4, 4, 18), np.float32)
    offset[0, 0, 0, 0] = 0.5  # tap(0,0) at (y,x)=(-1,-1)+(0.5,0) = (-0.5,-1)
    out = np.asarray(deform_conv2d(x, offset, weight, padding=1))
    ref = deform_conv2d_reference(x, offset, weight, padding=1)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_gradients_flow(rng):
    import jax
    import jax.numpy as jnp

    x, offset, weight = _rand_inputs(rng, h=5, w=5)

    def loss(w_, o_):
        return jnp.sum(deform_conv2d(jnp.asarray(x), o_, w_, padding=1) ** 2)

    gw, go = jax.grad(loss, argnums=(0, 1))(jnp.asarray(weight),
                                            jnp.asarray(offset))
    assert np.isfinite(np.asarray(gw)).all()
    assert np.isfinite(np.asarray(go)).all()
    assert np.abs(np.asarray(go)).sum() > 0  # offsets get gradient (bilinear)


def test_large_offset_gradients_finite(rng):
    """Regression: offsets beyond the halo clamp produced NaN gradients
    through an off-by-one out-of-range gather (finite forward, NaN
    backward) — this killed full-model training after one optimizer step."""
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(rng.standard_normal((1, 16, 32, 8)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    for scale in (1.0, 10.0, 2000.0):
        off = jnp.asarray(rng.standard_normal((1, 16, 32, 18)) * scale,
                          jnp.float32)
        g = jax.jit(jax.grad(lambda o: jnp.sum(
            deform_conv2d(x, o, wt, padding=1))))(off)
        assert np.isfinite(np.asarray(g)).all(), scale
