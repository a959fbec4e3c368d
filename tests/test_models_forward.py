"""Forward-shape and sanity tests for the full detector on tiny inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.config import Config, ModelConfig
from slotvps_tpu.models.detector import (
    extract_features, forward_frame, init_model)

CFG = ModelConfig()

_forward_jit = jax.jit(lambda p, img, ref: forward_frame(p, CFG, img, ref))


@pytest.fixture(scope="module")
def params():
    return init_model(jax.random.PRNGKey(0), CFG)


def test_extract_features_shapes(params):
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    feats = extract_features(params, CFG, img)
    # coarsest first: P5 (1/32) .. P2 (1/4)
    assert [f.shape for f in feats.feat_trans] == [
        (1, 2, 4, 128), (1, 4, 8, 128), (1, 8, 16, 128), (1, 16, 32, 128)]
    assert feats.fcn_output.shape == (1, 64, 128, 19)


def test_forward_frame_shapes(params):
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 128, 3)).astype(np.float32))
    outs = _forward_jit(params, img, img)
    assert outs.pred_logits.shape == (1, 100, 20)
    assert outs.pred_masks.shape == (1, 100, 16, 32)
    assert outs.embeddings.shape == (1, 100, 256)
    assert outs.fcn_output.shape == (1, 64, 128, 19)
    for arr in outs:
        assert np.isfinite(np.asarray(arr)).all()


def test_forward_ref_changes_outputs(params):
    """The Video Retriever couples frames: a different reference frame must
    change the current frame's logits."""
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 64, 128, 3)).astype(np.float32))
    ref_a = img
    ref_b = jnp.asarray(rng.standard_normal((1, 64, 128, 3)
                                            ).astype(np.float32))
    out_a = _forward_jit(params, img, ref_a)
    out_b = _forward_jit(params, img, ref_b)
    assert not np.allclose(np.asarray(out_a.pred_logits),
                           np.asarray(out_b.pred_logits))


def test_swin_backbone_shapes():
    from slotvps_tpu.config import SwinConfig
    from slotvps_tpu.models.swin import apply_swin, init_swin

    cfg = SwinConfig(embed_dim=32, depths=(1, 1, 2, 1), num_heads=(2, 2, 2, 2),
                     window_size=4)
    params = init_swin(jax.random.PRNGKey(0), cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    outs = apply_swin(params, img, cfg)
    assert [o.shape for o in outs] == [
        (1, 16, 24, 32), (1, 8, 12, 64), (1, 4, 6, 128), (1, 2, 3, 256)]


def test_swin_stage_scan_matches_unrolled(rng):
    """Deep stages run as lax.scan over block pairs (swin._stage_scan,
    the fix for the full-res Swin-L compile blow-up); the scan must be
    numerically identical to the unrolled block sequence the golden
    conversion test verifies against the reference."""
    from slotvps_tpu.models import swin as S

    dim, heads, window, depth = 32, 2, 4, 4
    keys = jax.random.split(jax.random.PRNGKey(7), depth)
    blocks = [S._init_block(k, dim, heads, window, 4.0, True)
              for k in keys]
    rel = S._rel_pos_index(window)
    # non-multiple-of-window spatial dims to exercise the pad branch
    x = jnp.asarray(rng.standard_normal((2, 10, 13, dim)), jnp.float32)

    y_ref = x
    for bi, bp in enumerate(blocks):
        shift = 0 if bi % 2 == 0 else window // 2
        y_ref = S._block(bp, y_ref, heads, window, shift, rel)
    y_scan = S._stage_scan(blocks, x, heads, window, rel)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)

    # drop-path variant: same per-block keys => same bernoulli draws
    dkeys = jax.random.split(jax.random.PRNGKey(9), depth)
    rates = [0.0, 0.1, 0.2, 0.3]
    y_ref = x
    for bi, bp in enumerate(blocks):
        shift = 0 if bi % 2 == 0 else window // 2
        drop = (dkeys[bi], rates[bi]) if rates[bi] > 0 else None
        y_ref = S._block(bp, y_ref, heads, window, shift, rel, drop=drop)
    drops = (dkeys.reshape(depth // 2, 2, *dkeys.shape[1:]),
             jnp.asarray(rates, jnp.float32).reshape(depth // 2, 2))
    y_scan = S._stage_scan(blocks, x, heads, window, rel, drops=drops)
    np.testing.assert_allclose(np.asarray(y_scan), np.asarray(y_ref),
                               atol=1e-6, rtol=1e-6)


def test_context_block(rng):
    from slotvps_tpu.models.context_block import (
        apply_context_block, init_context_block)

    p = init_context_block(jax.random.PRNGKey(0), 32)
    x = jnp.asarray(rng.standard_normal((2, 6, 8, 32)), jnp.float32)
    y = apply_context_block(p, x)
    assert y.shape == x.shape
    # zero-init final conv => identity at init (GCNet convention)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_viper_config_builds():
    from slotvps_tpu.config import named_config

    cfg = named_config("r50_fpn_slotvps_viper")
    assert cfg.model.stuff_num == 13
    assert cfg.model.slot_head.num_classes == 24
    assert cfg.eval.id_last_stuff == 12
    assert cfg.data.iid_divisor == 100000
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    img = jnp.zeros((1, 64, 128, 3), jnp.float32)
    outs = jax.jit(lambda p, i: forward_frame(p, cfg.model, i, i))(
        params, img)
    assert outs.pred_logits.shape == (1, 100, 24)
    assert outs.fcn_output.shape == (1, 64, 128, 23)


def test_decode_pair_train_aux_outputs(params):
    from slotvps_tpu.models.detector import (
        decode_pair_train, extract_features)

    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 128, 3)).astype(np.float32))
    feats = jax.jit(lambda p, i: extract_features(p, CFG, i))(params, img)
    final, aux, extras = jax.jit(
        lambda p, f: decode_pair_train(p, CFG, f, f))(params, feats)
    assert len(aux) == 6  # 7 stages - final
    # identical ref/cur features => identical ref/cur outputs
    np.testing.assert_allclose(np.asarray(extras["ref"].pred_logits),
                               np.asarray(final.pred_logits),
                               rtol=1e-5, atol=1e-5)
    assert extras["fine_feat"].shape[-1] == 256
    h4, w4 = final.pred_masks.shape[-2:]
    for a_logits, a_masks in aux:
        assert a_logits.shape == (1, 100, 20)
        assert a_masks.shape[-2:] == (h4, w4)
    # final outputs must equal decode_pair's
    from slotvps_tpu.models.detector import decode_pair

    ref = jax.jit(lambda p, f: decode_pair(p, CFG, f, f))(params, feats)
    np.testing.assert_allclose(np.asarray(final.pred_masks),
                               np.asarray(ref.pred_masks),
                               rtol=1e-5, atol=1e-5)


def test_resnet_stage_plugins_identity_at_init():
    """DCN (zero-init offsets) + GCNet (zero-init final conv) stage plugins
    must be exact no-ops at init (reference resnet.py:152-211 wiring,
    init_offset zeroing + ContextBlock zero conv)."""
    from slotvps_tpu.models.resnet import apply_resnet, init_resnet

    params = init_resnet(jax.random.PRNGKey(0), depth=50,
                         dcn_stages=(False, False, True, True),
                         gcb_stages=(False, True, True, False))
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 64, 64, 3)), jnp.float32)
    with_plugins = jax.jit(lambda p, x: apply_resnet(p, x))(params, x)

    import copy

    plain = copy.deepcopy(params)
    for si in range(4):
        for bp in plain[f"layer{si + 1}"]:
            bp.pop("conv2_offset", None)
            bp.pop("gcb", None)
    without = jax.jit(lambda p, x: apply_resnet(p, x))(plain, x)
    for a, b in zip(with_plugins, without):
        # identity semantics, not bit-exact: the DCN accumulates taps in a
        # different order than the dense conv (activations reach ~1e3 on
        # unnormalized input, so tolerances are relative)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-2)


def test_resnet_bn_stat_calibration():
    """Random-init frozen BNs (identity stats) compound activation
    magnitude across the 50-layer backbone (~1e22 at the FPN on the
    flagship — measured on-chip, round 5); calibrate_bn_stats writes
    batch statistics into the running buffers (torch train-mode
    semantics, the random-init analog of pretrained stats) so the eval
    forward is magnitude-sane.  Pairing correctness is replay-checked
    inside the function; here we assert the magnitude contract."""
    from slotvps_tpu.models.resnet import (apply_resnet, calibrate_bn_stats,
                                           init_resnet)

    params = init_resnet(jax.random.PRNGKey(0), depth=50)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 64, 96, 3)), jnp.float32)
    before = jax.jit(lambda p, x: apply_resnet(p, x))(params, x)
    calibrate_bn_stats(params, x, depth=50)
    after = jax.jit(lambda p, x: apply_resnet(p, x))(params, x)
    # calibrated stats keep every stage output O(1)-ish
    for lvl, a in enumerate(after):
        m = float(jnp.abs(a).max())
        assert m < 50.0, (lvl, m)
    # and they genuinely changed the forward (identity stats didn't hold)
    assert float(jnp.abs(before[-1]).max()) > float(
        jnp.abs(after[-1]).max())
    # stats are real moments, not identity
    v = params["layer4"][-1]["bn3"]["var"]
    assert float(jnp.abs(v - 1.0).max()) > 1e-3


def test_mv_config_builds():
    from slotvps_tpu.config import named_config

    cfg = named_config("r50_fpn_slotvps_mv")
    assert cfg.model.stuff_num == 34
    assert cfg.model.slot_head.num_classes == 47
    assert cfg.eval.id_last_stuff == 33


def test_fused_sseg_flag_quarter_res_and_parity(params):
    """semantic_head.fused_sseg=True carries quarter-res fcn logits that
    are exactly the x4-downsampled source of the flag-off full-res output
    (upsample deferral, not a different computation)."""
    import dataclasses

    from slotvps_tpu.ops.interpolate import upsample_x4_bilinear

    cfg_q = dataclasses.replace(
        CFG, semantic_head=dataclasses.replace(
            CFG.semantic_head, fused_sseg=True))
    img = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 64, 128, 3)).astype(np.float32))
    full = extract_features(params, CFG, img)
    quarter = extract_features(params, cfg_q, img)
    assert quarter.fcn_output.shape == (1, 16, 32, 19)
    np.testing.assert_allclose(
        np.asarray(jax.vmap(upsample_x4_bilinear)(quarter.fcn_output)),
        np.asarray(full.fcn_output), rtol=1e-6, atol=1e-6)


def test_per_level_dcn_halo_tuple(params):
    """dcn_halo accepts a per-level tuple (P2..P5): each level runs its
    own halo, and with offsets inside every level's halo the result
    matches the single-halo config exactly."""
    import dataclasses

    from slotvps_tpu.models.fpn import apply_fpn
    from slotvps_tpu.models.semantic_head import apply_semantic_head
    from slotvps_tpu.models.detector import apply_backbone

    img = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 64, 128, 3)).astype(np.float32))
    feats = apply_backbone(params, CFG, img)
    fpn_outs = apply_fpn(params["fpn"], feats, num_outs=CFG.fpn.num_outs)

    # doctor the offset biases so sampling is off-rigid but within the
    # smallest per-level halo (2 px)
    sp = dict(params["semantic_head"])
    sp["tower"] = [dict(b) for b in sp["tower"]]
    for b in sp["tower"]:
        b["offset"] = dict(b["offset"], b=jnp.full((18,), 1.5))

    sh8 = dataclasses.replace(CFG.semantic_head, dcn_halo=8)
    sh_t = dataclasses.replace(CFG.semantic_head, dcn_halo=(2, 3, 4, 8))
    assert [sh_t.level_halo(i) for i in range(4)] == [2, 3, 4, 8]
    out8 = apply_semantic_head(sp, fpn_outs[:4], sh8)
    out_t = apply_semantic_head(sp, fpn_outs[:4], sh_t)
    np.testing.assert_allclose(np.asarray(out_t[0]), np.asarray(out8[0]),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(out_t[2], out8[2]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
