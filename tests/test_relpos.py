"""Relative-position encoding variants vs the reference module
(reference mmdet/models/detectors/position_encoding.py:15-218 —
FullRelPos / SwinRelPos / RelPos / DPSConvPos).  These are config-unused
upstream (no shipped config instantiates them); provided + golden-tested
for API completeness."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_shim  # noqa: E402

ref_shim.install()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from slotvps_tpu.models import position_encoding as pe  # noqa: E402


def _ref_mod():
    from mmdet.models.detectors import position_encoding as ref
    return ref


def test_full_rel_pos_golden(rng):
    ref = _ref_mod()
    h = w = 4
    dim = 8
    m = ref.FullRelPos(h, w, dim)
    params = {
        "rel_emb_h": jnp.asarray(m.rel_emb_h.detach().numpy()),
        "rel_emb_w": jnp.asarray(m.rel_emb_w.detach().numpy()),
    }
    b, p, g = 2, 3, 2
    q = rng.standard_normal((b, h * w, p, g, dim)).astype(np.float32)
    attn = rng.standard_normal((b, g, h * w, h * w, p)).astype(np.float32)
    with torch.no_grad():
        # the reference adds its logits to ``attn`` IN PLACE through
        # the shared from_numpy buffer — pass a copy or the jax call
        # below would see the already-biased attn
        ref_out = m(torch.from_numpy(q.copy()),
                    torch.from_numpy(attn.copy())).numpy()
    ours = np.asarray(pe.full_rel_pos_attn(params, jnp.asarray(q),
                                           jnp.asarray(attn), h, w))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_swin_rel_pos_golden():
    ref = _ref_mod()
    h, w, nh = 3, 5, 2
    m = ref.SwinRelPos(h, w, num_heads=nh)
    with torch.no_grad():
        m.relative_position_bias_table.normal_(std=0.5)
        ref_out = m(None).numpy()
    params = {"bias_table": jnp.asarray(
        m.relative_position_bias_table.detach().numpy())}
    ours = np.asarray(pe.swin_rel_pos_bias(params, h, w))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-6, atol=1e-6)


def test_rel_pos_golden(rng):
    ref = _ref_mod()
    q_len = k_len = 4
    dim, win = 8, 2
    m = ref.RelPos(k_len, q_len, dim, win_len=win)
    params = {
        "rel_emb_h": jnp.asarray(m.rel_emb_h.detach().numpy()),
        "rel_emb_w": jnp.asarray(m.rel_emb_w.detach().numpy()),
    }
    b, p, g = 2, 2, 2
    q = rng.standard_normal((b, q_len * q_len, p, g, dim)) \
        .astype(np.float32)
    attn = rng.standard_normal((b, g, q_len * q_len, k_len * k_len, p)) \
        .astype(np.float32)
    with torch.no_grad():
        # the reference adds its logits to ``attn`` IN PLACE through
        # the shared from_numpy buffer — pass a copy or the jax call
        # below would see the already-biased attn
        ref_out = m(torch.from_numpy(q.copy()),
                    torch.from_numpy(attn.copy())).numpy()
    ours = np.asarray(pe.rel_pos_attn(params, jnp.asarray(q),
                                      jnp.asarray(attn), q_len, k_len,
                                      win_len=win))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_dps_conv_pos_golden(rng):
    ref = _ref_mod()
    dim, k, h, w = 6, 3, 4, 5
    m = ref.DPSConvPos(dim, k)
    params = {"w": jnp.asarray(
        m.conv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    b = 2
    v = rng.standard_normal((b, h * w, dim)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(v), h).numpy()
    ours = np.asarray(pe.dps_conv_pos(params, jnp.asarray(v), h))
    np.testing.assert_allclose(ours, ref_out, rtol=1e-5, atol=1e-5)


def test_init_shapes():
    k = jax.random.PRNGKey(0)
    p = pe.init_full_rel_pos(k, 4, 6, 16)
    assert p["rel_emb_h"].shape == (7, 8) and p["rel_emb_w"].shape == (11, 8)
    p = pe.init_swin_rel_pos(k, 3, 5, num_heads=2)
    assert p["bias_table"].shape == (5 * 9, 2)
    p = pe.init_rel_pos(k, 16, win_len=2)
    assert p["rel_emb_h"].shape == (4, 8)
    p = pe.init_dps_conv_pos(k, 8, 3)
    assert p["w"].shape == (3, 3, 1, 8)
