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


@pytest.mark.parametrize("halo", [2, 3, 6])
def test_matches_xla_at_other_halos(rng, halo):
    """Per-level halos (config dcn_halo tuples) compile the kernel at
    halos other than the tuned 4 — each must match the XLA path run at
    the same max_displacement."""
    b, h, w, c, co = 1, 8, 128, 64, 64
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * (halo / 2.0),
                      jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    ref = deform_conv2d(x, off, wt, padding=1, max_displacement=halo)
    ours = deform_conv2d_pallas(x, off, wt, halo=halo,
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


@pytest.mark.parametrize("bias,inside", [(3.5, True), (4.5, False),
                                         (5.0, False)])
def test_halo_boundary_clamp_semantics(rng, bias, inside):
    """Offsets straddling the +-4 halo (VERDICT r2 ask #5c): inside the
    halo the kernel is exact vs the unbounded reference convention (the
    numpy reference mirrors the CUDA ``deformable_im2col`` and is itself
    golden-matched against torch in test_golden_model.py); beyond it the
    sample position clamps to rigid+-halo — equivalent to clamping the
    offset — and that is the ONLY divergence."""
    from slotvps_tpu.ops.deform_conv import deform_conv2d_reference

    b, h, w, c, co = 1, 32, 128, 8, 4
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    # bias-driven offsets: constant `bias` plus small per-pixel noise
    off = jnp.asarray(bias + 0.1 * rng.standard_normal((b, h, w, 18)),
                      jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    ours = np.asarray(deform_conv2d_pallas(x, off, wt, halo=4,
                                           compute_dtype=jnp.float32))
    # contract pinned here: (1) both TPU paths clamp identically — sample
    # position clips to rigid+-halo but VALIDITY is evaluated at the true
    # position, so out-of-image taps contribute 0 exactly like the CUDA
    # kernel's (-1, size) rule even when the clamped position is in-image
    xla = np.asarray(deform_conv2d(x, off, wt, padding=1,
                                   max_displacement=4))
    np.testing.assert_allclose(ours, xla, rtol=1e-4, atol=1e-4)
    unclamped = deform_conv2d_reference(x, off, wt)
    if inside:
        # (2) inside the halo: exact vs the unbounded reference convention
        np.testing.assert_allclose(ours, unclamped, rtol=1e-4, atol=1e-4)
    else:
        # (3) beyond the halo, away from image borders (where validity
        # cannot differ), clamping == clipping the offsets to +-halo
        clamped = deform_conv2d_reference(x, jnp.clip(off, -4, 4), wt)
        m = 7  # bias + halo + bilinear corner < 7 px
        np.testing.assert_allclose(ours[:, m:-m, m:-m],
                                   clamped[:, m:-m, m:-m],
                                   rtol=1e-4, atol=1e-4)
        # (4) the divergence from the unbounded reference is real (the
        # halo contract stays honest), and a wide-halo XLA run recovers
        # the unbounded semantics
        assert np.abs(unclamped - ours).max() > 1e-3
        wide = np.asarray(deform_conv2d(x, off, wt, padding=1,
                                        max_displacement=8))
        np.testing.assert_allclose(wide, unclamped, rtol=1e-4, atol=1e-4)


def test_offset_clamp_stats(rng):
    from slotvps_tpu.ops.deform_conv import offset_clamp_stats

    off = np.zeros((1, 4, 4, 18), np.float32)
    off[0, 0, 0, 0] = 5.0    # tap 0 dy beyond halo 4
    off[0, 1, 1, 3] = -3.0   # tap 1 dx inside
    mx, rate = offset_clamp_stats(jnp.asarray(off), halo=4)
    assert float(mx) == 5.0
    # one of 4*4*9 taps exceeds the halo
    np.testing.assert_allclose(float(rate), 1 / (4 * 4 * 9), rtol=1e-6)
    _, rate8 = offset_clamp_stats(jnp.asarray(off), halo=8)
    assert float(rate8) == 0.0


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


@pytest.mark.parametrize("shape", [
    (1, 8, 128, 128, 64),
    (2, 6, 256, 64, 64),
])
def test_rowfuse_matches_default(rng, shape):
    """rowfuse=True (one one-hot contraction per (subtile, ky) spanning
    the whole row block) is numerically identical to the default layout."""
    b, h, w, c, co = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 2.5, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    base = deform_conv2d_pallas(x, off, wt, halo=4,
                                compute_dtype=jnp.float32)
    fused = deform_conv2d_pallas(x, off, wt, halo=4,
                                 compute_dtype=jnp.float32, rowfuse=True)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Backward (custom vjp) — the Pallas backward kernel vs jax.grad of the XLA
# path at the same halo (reference col2im analogs:
# deform_conv_cuda_kernel.cu deformable_col2im / deformable_col2im_coord).
# ---------------------------------------------------------------------------

def _grads(fn, x, off, wt, rng):
    r = jnp.asarray(rng.standard_normal(fn(x, off, wt).shape), jnp.float32)
    return jax.grad(lambda *a: jnp.sum(fn(*a) * r), argnums=(0, 1, 2))(
        x, off, wt)


@pytest.mark.parametrize("shape", [
    (1, 8, 128, 64, 64),    # one column tile
    pytest.param((2, 8, 256, 32, 64),   # two tiles, batched, Cin != Cout
                 marks=pytest.mark.slow),
])
def test_grad_matches_xla(rng, shape):
    b, h, w, c, co = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 1.5, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    rng2 = np.random.default_rng(0)
    ref = _grads(lambda *a: deform_conv2d(*a, padding=1,
                                          max_displacement=4),
                 x, off, wt, rng2)
    rng2 = np.random.default_rng(0)
    ours = _grads(lambda *a: deform_conv2d_pallas(
        *a, halo=4, compute_dtype=jnp.float32), x, off, wt, rng2)
    for g_ref, g_ours, name in zip(ref, ours, ["dx", "doffset", "dweight"]):
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.slow
def test_grad_clamped_offsets(rng):
    """Fully-clamped taps: zero offset gradient, dx/dW still match the
    XLA path's autodiff at the same halo."""
    b, h, w, c, co = 1, 8, 128, 32, 32
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(5.0 + 0.1 * rng.standard_normal((b, h, w, 18)),
                      jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    rng2 = np.random.default_rng(1)
    ref = _grads(lambda *a: deform_conv2d(*a, padding=1,
                                          max_displacement=4),
                 x, off, wt, rng2)
    rng2 = np.random.default_rng(1)
    ours = _grads(lambda *a: deform_conv2d_pallas(
        *a, halo=4, compute_dtype=jnp.float32), x, off, wt, rng2)
    assert float(jnp.abs(ours[1]).max()) == 0.0
    for g_ref, g_ours, name in zip(ref, ours, ["dx", "doffset", "dweight"]):
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("shape", [
    (1, 25, 50, 32, 16),    # P5 at the 800x1600 training crop
    (1, 8, 200, 32, 32),    # width padded to 256
])
def test_nonmultiple_width_fwd_and_grad(rng, shape):
    """Widths that don't divide into column tiles are padded+sliced — the
    wrapper must stay exact vs the XLA path, forward and backward."""
    b, h, w, c, co = shape
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    off = jnp.asarray(rng.standard_normal((b, h, w, 18)) * 1.5, jnp.float32)
    wt = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.05, jnp.float32)
    ref = deform_conv2d(x, off, wt, padding=1, max_displacement=4)
    ours = deform_conv2d_pallas(x, off, wt, halo=4,
                                compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    rng2 = np.random.default_rng(2)
    gref = _grads(lambda *a: deform_conv2d(*a, padding=1,
                                           max_displacement=4),
                  x, off, wt, rng2)
    rng2 = np.random.default_rng(2)
    gours = _grads(lambda *a: deform_conv2d_pallas(
        *a, halo=4, compute_dtype=jnp.float32), x, off, wt, rng2)
    for g_ref, g_ours, name in zip(gref, gours,
                                   ["dx", "doffset", "dweight"]):
        np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dcn_block_grad_pallas_vs_jax(rng):
    """The semantic-tower block (offset conv -> DCN -> GN -> ReLU) trains
    through the Pallas custom vjp: full parameter + input grads match the
    XLA implementation at the same halo."""
    from slotvps_tpu.models.semantic_head import _dcn_block, _init_dcn_block

    c = 8
    params = _init_dcn_block(jax.random.PRNGKey(0), c, c)
    # non-zero offset head so doffset actually flows
    params["offset"]["w"] = jnp.asarray(
        rng.standard_normal((3, 3, c, 18)) * 0.05, jnp.float32)
    params["offset"]["b"] = jnp.asarray(
        rng.standard_normal(18) * 0.5, jnp.float32)
    x = jnp.asarray(rng.standard_normal((1, 8, 32, c)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((1, 8, 32, c)), jnp.float32)

    def loss(p, xx, impl):
        return jnp.sum(_dcn_block(p, xx, 4, impl=impl, halo=4) * r)

    g_jax = jax.grad(loss, argnums=(0, 1))(params, x, "jax")
    g_pal = jax.grad(loss, argnums=(0, 1))(params, x, "pallas_f32")
    flat_j, _ = jax.tree_util.tree_flatten_with_path(g_jax)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pal)
    for (path, a), (_, b) in zip(flat_j, flat_p):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=5e-4, atol=5e-4,
                                   err_msg=str(path))
