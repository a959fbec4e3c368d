"""Golden forward parity vs the EXECUTED reference model.

Builds the actual reference ``VPS_Temporal_Slots`` (via tests/ref_shim.py,
random init, doctored into the interesting regime: confident class scores,
sharp mask logits, non-trivial BN running stats), converts its state_dict
through ``convert_slotvps_checkpoint``, and asserts that this repo's JAX
forward matches the reference's torch forward — layer by layer and then
end-to-end through ``simple_test`` on a 3-frame video (panoptic map,
semantic map, cls_inds, scores, track ids).

This measures the "within 0.1 VPQ" parity claim instead of asserting it
from code reading, and exercises the converter against a real reference
state_dict (not a synthetic inverse).

Reference entry points executed: mmdet/models/detectors/
vps_temporal_slots.py:207-469 (simple_test), :528-807
(PostProcessPanopticInstances), dynamic_mask_head.py:138-228,
panoptic/upsnetFPN.py:66-97, simple_track_head.py:58-92.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_shim  # noqa: E402

H, W = 128, 256


def _doctor(det, seed=1):
    """Push the random-init reference model into a regime where the
    postprocessor keeps a healthy mix of stuff/things: spread class logits
    (score > 0.85 for many slots), sharpen fg_bn so the per-pixel slot
    softmax binarizes, and randomize BN running stats so the converter's
    stats handling is exercised."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, p in det.named_parameters():
            if "class_logits.weight" in name:
                p.copy_(torch.randn(p.shape, generator=g) * 0.5)
            elif "init_mask_query.weight" in name:
                # random-init slot queries are nearly identical after the
                # decoder, collapsing all slots onto 1-2 argmax classes
                # (mask_removal then drops every same-class duplicate);
                # amplified queries diversify the per-slot classes
                p.mul_(8.0)
            elif "conv_offset.weight" in name:
                # trained offset heads emit small displacements (the JAX
                # DCN's documented halo contract, ops/deform_conv.py); the
                # raw init's data-dependent offsets can reach tens of
                # pixels on random backbone features, so make the offsets
                # bias-driven: zero weight + a nonzero per-tap bias
                # exercises the true fractional bilinear sampling path
                p.zero_()
            elif "conv_offset.bias" in name:
                p.copy_((torch.rand(p.shape, generator=g) - 0.5) * 3.0)
        for name, b in det.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.05)
            elif name.endswith("running_var"):
                b.copy_(1.0 + (torch.rand(b.shape, generator=g) - 0.5) * 0.1)
        im = det.image_model
        im.fg_bn.weight.fill_(2.0)
        im.fg_bn.running_mean.zero_()
        im.fg_bn.running_var.fill_(0.01)
        im.feat_bn.running_mean.copy_(
            torch.randn(im.feat_bn.running_mean.shape, generator=g) * 0.1)


def _ref_decode(det, img_t, ref_t):
    """Run the reference pipeline up to the decoder outputs (the inner part
    of simple_test, vps_temporal_slots.py:245-299)."""
    with torch.no_grad():
        feats = []
        for arr in (ref_t, img_t):
            x = det.image_model.neck(det.image_model.backbone(arr))
            _, _, fcn_feature = det.extract_semantic_feats(x)
            feats.append(det.semantic_trans_ins(fcn_feature))
        init_masks = det.image_model.init_mask_query.weight
        pos = [det.generate_position_embedding(f) for f in feats]
        return det.image_model.dynamic_mask_head(
            features=feats, init_masks=[init_masks, init_masks],
            pad_mask=None, pos=pos, query_pos=None, gt_non_void_mask=None)


def _calibrate_class_head(det, seed=7):
    """Center the final-stage class logits over slots so the per-slot
    variation decides the argmax (a trained head is class-balanced; the
    random-init head collapses all 100 slots onto 1-2 classes, leaving
    nothing for mask_removal/tracking to exercise)."""
    rng = np.random.default_rng(seed)
    calib = _t(_smooth_img(rng))
    all_cls, _, _ = _ref_decode(det, calib, calib)
    logits = all_cls[1][-1][0]                      # [L, C]
    head = det.image_model.dynamic_mask_head
    last_level = 0
    while hasattr(head, f"head_series_{last_level + 1}"):
        last_level += 1
    last = getattr(head, f"head_series_{last_level}")[-1].class_logits
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        centered = logits - logits.mean(0, keepdim=True)
        scale = 2.5 / max(float(centered.std()), 1e-3)
        last.weight.mul_(scale)
        last.bias.copy_(-scale * logits.mean(0)
                        + torch.randn(last.bias.shape, generator=g) * 0.3)


@pytest.fixture(scope="module")
def golden():
    from slotvps_tpu.config import r50_fpn_slotvps
    from slotvps_tpu.utils.checkpoint import convert_slotvps_checkpoint

    det, _ns = ref_shim.build_reference_detector(seed=0)
    _doctor(det)
    _calibrate_class_head(det)
    # the calibrated random head keeps a rich slot mix at threshold 0.5
    # (12+ classes) but almost nothing at the production 0.85 — run both
    # stacks at 0.5 (same code paths, same config knob)
    det.postprocess_panoptic.threshold = 0.5
    sd = {k: v.detach().numpy() for k, v in det.state_dict().items()}
    import dataclasses

    config = r50_fpn_slotvps()
    config = dataclasses.replace(config, model=dataclasses.replace(
        config.model, postprocess=dataclasses.replace(
            config.model.postprocess, threshold=0.5)))
    params = convert_slotvps_checkpoint(sd, config.model)
    return det, config, params


def _smooth_img(rng, h=H, w=W, scale=16):
    """Low-frequency random image (upsampled coarse noise) — spatially
    structured features, far fewer argmax ties than white noise."""
    import cv2

    coarse = rng.standard_normal((h // scale, w // scale, 3))
    img = cv2.resize(coarse.astype(np.float32), (w, h),
                     interpolation=cv2.INTER_LINEAR)
    return img + 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)


def _t(img_hwc):
    return torch.from_numpy(np.ascontiguousarray(
        img_hwc.transpose(2, 0, 1)))[None].float()


def _j(img_hwc):
    import jax.numpy as jnp

    return jnp.asarray(img_hwc)[None]


def _close(a, t, tol, what):
    a = np.asarray(a, np.float64)
    t = t.detach().numpy().astype(np.float64)
    assert a.shape == t.shape, f"{what}: {a.shape} vs {t.shape}"
    scale = max(np.abs(t).max(), 1e-3)
    err = np.abs(a - t).max() / scale
    assert err < tol, f"{what}: rel err {err:.2e} >= {tol}"


def test_backbone_fpn_semantic_parity(golden):
    det, config, params = golden
    cfg = config.model
    from slotvps_tpu.models.detector import apply_backbone
    from slotvps_tpu.models.fpn import apply_fpn
    from slotvps_tpu.models.semantic_head import apply_semantic_head

    rng = np.random.default_rng(0)
    img = _smooth_img(rng)

    with torch.no_grad():
        x = det.image_model.backbone(_t(img))
        xn = det.image_model.neck(x)
        fcn_output, fcn_score, fcn_feature = det.extract_semantic_feats(xn)

    feats = apply_backbone(params, cfg, _j(img))
    fpn_outs = apply_fpn(params["fpn"], feats, num_outs=cfg.fpn.num_outs)
    for i, (mine, ref) in enumerate(zip(fpn_outs, xn)):
        _close(np.asarray(mine).transpose(0, 3, 1, 2), ref, 2e-4,
               f"fpn level {i}")

    my_fcn, my_score, my_before = apply_semantic_head(
        params["semantic_head"], fpn_outs[:cfg.semantic_head.num_levels],
        cfg.semantic_head)
    _close(np.asarray(my_score).transpose(0, 3, 1, 2), fcn_score, 5e-4,
           "fcn_score")
    _close(np.asarray(my_fcn).transpose(0, 3, 1, 2), fcn_output, 5e-4,
           "fcn_output")
    for i, (mine, ref) in enumerate(zip(my_before, fcn_feature)):
        _close(np.asarray(mine).transpose(0, 3, 1, 2), ref, 5e-4,
               f"feat_before {i}")


def test_decoder_parity(golden):
    det, config, params = golden
    cfg = config.model
    from slotvps_tpu.models.detector import forward_frame

    rng = np.random.default_rng(1)
    img = _smooth_img(rng)
    ref_img = _smooth_img(rng)

    all_cls, all_masks, all_feats = _ref_decode(det, _t(img), _t(ref_img))
    with torch.no_grad():
        _ref_cls, cls_out = all_cls
        _ref_masks, masks_out = all_masks
        dh_feats = list(all_feats[1])
        dh_feats, mask_output, _aux = det.generate_final_outputs(
            dh_feats, masks_out, generate_aux_output=False)

    outs = forward_frame(params, cfg, _j(img), _j(ref_img))
    _close(outs.pred_logits, cls_out[-1], 2e-3, "pred_logits")
    _close(outs.embeddings, masks_out[-1], 2e-3, "slot embeddings")
    _close(outs.pred_masks, mask_output, 5e-3, "mask logits")


def test_position_encoding_parity():
    """All three reference position-embedding variants vs ours."""
    from slotvps_tpu.models.position_encoding import (
        init_learned_position_embedding, learned_position_embedding,
        sine_position_embedding, sine_position_embedding_v2)

    ref_shim.install()
    from mmdet.core.utils.misc import NestedTensor
    from mmdet.models.detectors.position_encoding import (
        PositionEmbeddingLearned, PositionEmbeddingSine,
        PositionEmbeddingSinev2)

    h, w = 12, 20
    x = torch.zeros((1, 3, h, w))
    mask = torch.zeros((1, h, w), dtype=torch.bool)
    with torch.no_grad():
        ref_sine = PositionEmbeddingSine(128, normalize=True)(
            NestedTensor(x, mask))
        ref_v2 = PositionEmbeddingSinev2(128)(x, H=h, W=w)
        learned = PositionEmbeddingLearned(128)
        ref_learned = learned(x)

    _close(np.asarray(sine_position_embedding(h, w, 128))
           .transpose(2, 0, 1)[None], ref_sine, 1e-5, "sine")
    _close(np.asarray(sine_position_embedding_v2(h, w, 128))[None],
           ref_v2, 1e-5, "sine v2")
    import jax.numpy as jnp

    params = {
        "row_embed": jnp.asarray(learned.row_embed.weight.detach().numpy()),
        "col_embed": jnp.asarray(learned.col_embed.weight.detach().numpy()),
    }
    _close(np.asarray(learned_position_embedding(params, h, w))
           .transpose(2, 0, 1)[None], ref_learned, 1e-6, "learned")
    init_learned_position_embedding(__import__("jax").random.PRNGKey(0))


def test_r52_stem_conversion_parity():
    """Golden forward parity for the R52 deep-stem ResNet variant
    (reference resnet.py:421-424 ``turn_into_r52`` + :472-515 stem:
    three 3x3 convs replacing the 7x7, stage 1 fed 128 channels) —
    config-off in both shipped configs; built for inventory parity."""
    from slotvps_tpu.models.resnet import apply_resnet, init_resnet
    from slotvps_tpu.utils.checkpoint import convert_torchvision_resnet

    ref_shim.install()
    from mmdet.models.backbones.resnet import ResNet

    torch.manual_seed(5)
    net = ResNet(depth=50, turn_into_r52=True)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_torchvision_resnet(sd, depth=50)
    assert "conv3" in params and params["conv3"]["w"].shape == (3, 3, 64, 128)
    # stage 1's first block must consume the 128-ch stem output
    assert params["layer1"][0]["conv1"]["w"].shape[2] == 128

    # init path produces the same tree shape
    ini = init_resnet(__import__("jax").random.PRNGKey(0), depth=50,
                      r52_stem=True)
    assert ini["conv3"]["w"].shape == (3, 3, 64, 128)
    assert ini["layer1"][0]["conv1"]["w"].shape[2] == 128

    rng = np.random.default_rng(6)
    img = _smooth_img(rng, 64, 96)
    with torch.no_grad():
        ref_outs = net(_t(img))
    outs = apply_resnet(params, _j(img), depth=50)
    assert len(outs) == len(ref_outs) == 4
    for i, (mine, ref) in enumerate(zip(outs, ref_outs)):
        _close(np.asarray(mine).transpose(0, 3, 1, 2), ref, 2e-4,
               f"r52 level {i}")


def test_swin_conversion_parity():
    """Golden forward parity for the Swin backbone converter: instantiate
    the reference SwinTransformer (tiny config — same code path as Swin-L),
    convert its state_dict through convert_swin, compare features."""
    from slotvps_tpu.config import SwinConfig
    from slotvps_tpu.models.swin import apply_swin
    from slotvps_tpu.utils.checkpoint import convert_swin

    ref_shim.install()
    from mmdet.models.backbones.swin_transformer import SwinTransformer

    torch.manual_seed(3)
    net = SwinTransformer(embed_dim=32, depths=[1, 1, 2, 1],
                          num_heads=[1, 2, 4, 8], window_size=7,
                          ape=False, patch_norm=True,
                          out_indices=(0, 1, 2, 3))
    net.eval()
    cfg = SwinConfig(embed_dim=32, depths=(1, 1, 2, 1),
                     num_heads=(1, 2, 4, 8), window_size=7,
                     drop_path_rate=0.0)
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = convert_swin(sd, cfg)

    rng = np.random.default_rng(4)
    img = _smooth_img(rng, 64, 96)
    with torch.no_grad():
        ref_outs = net(_t(img))
    outs = apply_swin(params, _j(img), cfg)
    assert len(outs) == len(ref_outs) == 4
    for i, (mine, ref) in enumerate(zip(outs, ref_outs)):
        _close(np.asarray(mine).transpose(0, 3, 1, 2), ref, 2e-4,
               f"swin level {i}")


def test_train_aux_outputs_parity(golden):
    """Deep-supervision path: the reference's generate_final_outputs with
    generate_aux_output=True (vps_temporal_slots.py:161-194: aux stage i
    uses feature level i//2, x-scale bilinear upsample, fg_bn) vs
    decode_pair_train's aux list."""
    det, config, params = golden
    cfg = config.model
    from slotvps_tpu.models.detector import (
        decode_pair_train, extract_features)

    rng = np.random.default_rng(5)
    img = _smooth_img(rng)
    ref_img = _smooth_img(rng)

    all_cls, all_masks, all_feats = _ref_decode(det, _t(img), _t(ref_img))
    with torch.no_grad():
        _, masks_out = all_masks
        dh_feats = list(all_feats[1])
        _, mask_output, aux_outputs = det.generate_final_outputs(
            dh_feats, masks_out, generate_aux_output=True)

    import jax.numpy as jnp

    from slotvps_tpu.models.detector import FrameFeatures

    both = extract_features(params, cfg,
                            jnp.concatenate([_j(ref_img), _j(img)]))
    ref_feats = FrameFeatures(
        feat_trans=tuple(f[:1] for f in both.feat_trans),
        fcn_output=both.fcn_output[:1])
    cur_feats = FrameFeatures(
        feat_trans=tuple(f[1:] for f in both.feat_trans),
        fcn_output=both.fcn_output[1:])
    final, aux, _extras = decode_pair_train(params, cfg, ref_feats,
                                            cur_feats)
    assert len(aux) == len(aux_outputs) == 6
    _close(final.pred_masks, mask_output, 5e-3, "final masks")
    for i, ((a_logits, a_masks), ref_m) in enumerate(
            zip(aux, aux_outputs)):
        _close(a_masks, ref_m, 2e-2, f"aux masks stage {i}")


def test_semantic_loss_parity(golden):
    """UPSNetFPN.loss (weighted CE with ignore label,
    upsnetFPN.py:87-98) vs semantic_loss."""
    det, config, params = golden
    from slotvps_tpu.models.semantic_head import semantic_loss

    rng = np.random.default_rng(6)
    logits = rng.standard_normal((1, 16, 32, 19)).astype(np.float32)
    labels = rng.integers(0, 19, (1, 16, 32)).astype(np.int64)
    labels[0, :3] = 255  # ignore region
    with torch.no_grad():
        ref = det.image_model.panopticFPN.loss(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels))["loss_segm"]
    import jax.numpy as jnp

    mine = semantic_loss(jnp.asarray(logits), jnp.asarray(labels),
                         config.model.semantic_head)
    np.testing.assert_allclose(float(mine), float(ref), rtol=1e-5)


def test_track_head_parity(golden):
    det, config, params = golden
    from slotvps_tpu.models.track_head import apply_track_head

    rng = np.random.default_rng(2)
    cur = rng.standard_normal((5, 256)).astype(np.float32)
    prev = rng.standard_normal((7, 256)).astype(np.float32)
    with torch.no_grad():
        ref = det.temporal_track_head(torch.from_numpy(cur),
                                      torch.from_numpy(prev))[0]
    import jax.numpy as jnp

    mine = apply_track_head(params["track_head"], jnp.asarray(cur),
                            jnp.asarray(prev))
    _close(mine, ref, 1e-4, "track match score")


def test_full_video_parity(golden):
    """End-to-end 3-frame video through the reference ``simple_test`` vs
    this repo's InferencePipeline: panoptic map, semantic map, kept thing
    classes/scores, and greedy track ids."""
    det, config, params = golden
    from slotvps_tpu.inference import InferencePipeline

    rng = np.random.default_rng(3)
    frames = [_smooth_img(rng) for _ in range(3)]

    pipe = InferencePipeline(params, config)
    total_px = H * W
    n_things = []
    thing_px = 0
    for t, frame in enumerate(frames):
        iid = 3 * 10000 + (t + 1)  # vid 3, fid t+1 (fid==1 resets)
        meta = dict(iid=iid, filename=f"f{t}.png",
                    ori_shape=(H, W, 3), img_shape=(H, W, 3))
        ref_frame = frames[t - 1] if t > 0 else frame
        with torch.no_grad():
            ref_out = det.simple_test(_t(frame), [meta],
                                      ref_img=[_t(ref_frame)])
        mine = pipe.process_frame(np.asarray(_j(frame)), is_first=(t == 0))

        ref_sseg = ref_out["fcn_outputs"][0].numpy()
        ref_pan = ref_out["panoptic_outputs"][0].numpy()
        ref_cls = ref_out["panoptic_cls_inds"].numpy()
        ref_prob = ref_out["panoptic_cls_prob"].numpy()
        ref_ids = ref_out["panoptic_det_obj_ids"].numpy()

        sseg_mismatch = (mine.sseg != ref_sseg).mean()
        pan_mismatch = (mine.panoptic != ref_pan).mean()
        assert sseg_mismatch < 2e-3, f"frame {t}: sseg {sseg_mismatch:.2%}"
        assert pan_mismatch < 2e-3, f"frame {t}: panoptic {pan_mismatch:.2%}"
        assert mine.cls_inds.tolist() == ref_cls.tolist(), \
            f"frame {t}: cls_inds {mine.cls_inds} vs {ref_cls}"
        np.testing.assert_allclose(mine.cls_prob, ref_prob, rtol=2e-3,
                                   atol=2e-4)
        assert mine.obj_ids.tolist() == ref_ids.tolist(), \
            f"frame {t}: obj_ids {mine.obj_ids} vs {ref_ids}"
        n_things.append(len(ref_cls))
        thing_px += int((ref_pan >= 11).sum())
    # sanity: the regime is non-trivial (things kept and tracked)
    assert sum(n_things) >= 3, n_things
    assert thing_px > 0.01 * total_px
