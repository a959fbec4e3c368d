"""Checkpoint tests: torch->jax converter round trip + orbax save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from slotvps_tpu.config import ModelConfig
from slotvps_tpu.models.detector import init_model
from slotvps_tpu.utils.checkpoint import (
    convert_slotvps_checkpoint, load_checkpoint, save_checkpoint)

CFG = ModelConfig()


def _to_torch_sd(params, cfg):
    """Inverse of the converter: our pytree -> reference state_dict keys
    (module layout from SURVEY.md §2.1)."""
    sd = {}

    def conv(prefix, p, bias=True):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        if bias and "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def lin(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def norm(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["scale"])
        sd[f"{prefix}.bias"] = np.asarray(p["bias"])

    def bn(prefix, p):
        norm(prefix, p)
        sd[f"{prefix}.running_mean"] = np.asarray(p["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(p["var"])

    im = "image_model"
    b = params["backbone"]
    conv(f"{im}.backbone.conv1", b["conv1"], bias=False)
    bn(f"{im}.backbone.bn1", b["bn1"])
    for si in range(4):
        for bi, bp in enumerate(b[f"layer{si + 1}"]):
            pre = f"{im}.backbone.layer{si + 1}.{bi}"
            for ci in (1, 2, 3):
                conv(f"{pre}.conv{ci}", bp[f"conv{ci}"], bias=False)
                bn(f"{pre}.bn{ci}", bp[f"bn{ci}"])
            if "downsample" in bp:
                conv(f"{pre}.downsample.0", bp["downsample"]["conv"],
                     bias=False)
                bn(f"{pre}.downsample.1", bp["downsample"]["bn"])
    for i in range(4):
        conv(f"{im}.neck.lateral_convs.{i}.conv", params["fpn"]["lateral"][i])
        conv(f"{im}.neck.fpn_convs.{i}.conv", params["fpn"]["fpn"][i])
    for j, i in enumerate((0, 3, 6)):
        t = params["semantic_head"]["tower"][j]
        conv(f"{im}.panopticFPN.deform_convs.0.{i}.conv_offset", t["offset"])
        conv(f"{im}.panopticFPN.deform_convs.0.{i}.conv", t["conv"],
             bias=False)
        norm(f"{im}.panopticFPN.deform_convs.0.{i + 1}", t["gn"])
    conv(f"{im}.panopticFPN.conv_pred.conv",
         params["semantic_head"]["conv_pred"])

    flat = 0
    for lvl, n in enumerate(cfg.slot_head.per_dh_num_heads):
        for j in range(n):
            sp = params["slot_head"]["stages"][flat]
            pre = f"{im}.dynamic_mask_head.head_series_{lvl}.{j}"
            sd[f"{pre}.self_attn.in_proj_weight"] = \
                np.asarray(sp["self_attn"]["in_proj"]["w"]).T
            sd[f"{pre}.self_attn.in_proj_bias"] = \
                np.asarray(sp["self_attn"]["in_proj"]["b"])
            lin(f"{pre}.self_attn.out_proj", sp["self_attn"]["out_proj"])
            for nm in ("to_q", "to_k", "to_v"):
                lin(f"{pre}.inst_interact.{nm}", sp["inst_interact"][nm])
            for nm in ("norm_q", "norm_k", "norm_v", "norm1"):
                norm(f"{pre}.inst_interact.{nm}", sp["inst_interact"][nm])
            lin(f"{pre}.linear1", sp["linear1"])
            lin(f"{pre}.linear2", sp["linear2"])
            for nm in ("norm1", "norm2", "norm3"):
                norm(f"{pre}.{nm}", sp[nm])
            for mi, m in enumerate(sp["cls_module"]):
                lin(f"{pre}.cls_module.{3 * mi}", m["lin"])
                norm(f"{pre}.cls_module.{3 * mi + 1}", m["ln"])
            for mi, m in enumerate(sp["reg_module"]):
                lin(f"{pre}.reg_module.{3 * mi}", m["lin"])
                norm(f"{pre}.reg_module.{3 * mi + 1}", m["ln"])
            lin(f"{pre}.class_logits", sp["class_logits"])
            if "temporal" in sp:
                tq = f"{pre}.temporal_query_head"
                for nm in ("to_q", "to_k", "to_v"):
                    lin(f"{tq}.inst_interact.{nm}",
                        sp["temporal"]["inst_interact"][nm])
                for nm in ("norm_q", "norm_k", "norm_v", "norm1"):
                    norm(f"{tq}.inst_interact.{nm}",
                         sp["temporal"]["inst_interact"][nm])
                lin(f"{tq}.linear1", sp["temporal"]["linear1"])
                lin(f"{tq}.linear2", sp["temporal"]["linear2"])
                norm(f"{tq}.norm2", sp["temporal"]["norm2"])
                norm(f"{tq}.norm3", sp["temporal"]["norm3"])
            flat += 1
    conv(f"{im}.dynamic_mask_head.conv_trans.conv",
         params["slot_head"]["conv_trans"])
    for i, fc in enumerate(params["track_head"]["fcs"]):
        lin(f"temporal_track_head.fcs_query.{i}", fc)
    sd[f"{im}.init_mask_query.weight"] = np.asarray(
        params["init_mask_query"])
    conv(f"{im}.conv_trans.conv", params["conv_trans"])
    bn(f"{im}.fg_bn", params["fg_bn"])
    bn(f"{im}.feat_bn", params["feat_bn"])
    return sd


def test_converter_round_trip():
    params = init_model(jax.random.PRNGKey(0), CFG)
    sd = _to_torch_sd(params, CFG)
    restored = convert_slotvps_checkpoint(sd, CFG)

    flat_o = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_r = {jax.tree_util.keystr(kp): leaf for kp, leaf in
              jax.tree_util.tree_flatten_with_path(restored)[0]}
    assert len(flat_o) == len(flat_r)
    for kp, leaf in flat_o:
        key = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_r[key]),
                                   rtol=1e-6, atol=1e-7, err_msg=key)


def test_orbax_round_trip(tmp_path):
    params = {"a": jnp.arange(6.0).reshape(2, 3),
              "b": [{"w": jnp.ones((4,))}]}
    save_checkpoint(str(tmp_path / "ckpt"), params)
    like = jax.tree.map(jnp.zeros_like, params)
    restored = load_checkpoint(str(tmp_path / "ckpt"), like)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_check_dcn_halo_measures_offsets():
    """Load-time halo check (VERDICT r2 ask #5a): a conv_offset head whose
    bias pushes offsets past the tuned +-4 halo must be detected and a
    wider halo recommended; zero-offset heads must pass untouched."""
    import dataclasses

    from slotvps_tpu.config import ResNetConfig, SemanticHeadConfig
    from slotvps_tpu.utils.diagnostics import check_dcn_halo

    cfg = dataclasses.replace(
        ModelConfig(), resnet=ResNetConfig(depth=18),
        semantic_head=SemanticHeadConfig(dcn_impl="pallas"))
    params = init_model(jax.random.PRNGKey(0), cfg)

    # zero-init offset heads: nothing to clamp, halos stay at the tuned 4
    mx, eff, rec = check_dcn_halo(params, cfg, warn=False)
    assert eff == (4, 4, 4, 4) and mx == 0.0 and rec == (4, 4, 4, 4)

    # doctor block 0's offset bias to 6 px: every tap exceeds the halo
    # at EVERY level (the tower is shared across levels)
    params["semantic_head"]["tower"][0]["offset"]["b"] = \
        jnp.full((18,), 6.0)
    with pytest.warns(RuntimeWarning, match="dcn_halo"):
        mx, eff, rec = check_dcn_halo(params, cfg)
    assert mx >= 6.0 and all(r >= 6 for r in rec)

    # per-level tuple config: only the levels that clamp are raised
    cfg2 = dataclasses.replace(
        cfg, semantic_head=dataclasses.replace(
            cfg.semantic_head, dcn_halo=(2, 2, 8, 8)))
    mx2, eff2, rec2 = check_dcn_halo(params, cfg2, warn=False)
    assert eff2 == (2, 2, 8, 8)
    assert rec2[0] >= 6 and rec2[1] >= 6      # 2-px levels must widen
    assert rec2[2] == 8 and rec2[3] == 8      # 8-px levels already cover
