"""Training stack tests: offsets grammar, the released train pipeline,
track/insdis losses, and an overfit regression on a synthetic clip.

Reference behaviors under test: cityscapes_vps.py:102-197 (offsets
grammar), transforms.py:15/704/906/1049/247 (train transforms),
r50_fpn_slotvps.py:91-96 + simple_track_head.py (match loss), the
maxdeeplab loss recipe (r50_fpn_slotvps.py:55-65).
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.data.dataset import (
    CityscapesVPSDataset, RefSample, RepeatDataset)


@pytest.fixture()
def tiny_dataset(tmp_path):
    """2 videos (5 + 3 frames), no real images needed for sampling."""
    images = []
    for vid, n in ((1, 5), (2, 3)):
        for fid in range(1, n + 1):
            images.append({"id": vid * 10000 + fid,
                           "file_name": f"v{vid}_f{fid}.png",
                           "height": 64, "width": 128})
    ann = {"images": images, "categories": [
        {"id": 1, "name": "person"}, {"id": 2, "name": "car"}],
        "annotations": []}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return CityscapesVPSDataset(str(p), str(tmp_path))


def _ids(ds, sample):
    return [ds.img_infos[i]["id"] for i in sample.ref_indices]


def test_offsets_grammar(tiny_dataset):
    ds = tiny_dataset
    rng = np.random.default_rng(0)
    i_v1f3 = 2      # video 1, fid 3
    i_v2f1 = 5      # video 2, fid 1

    s = ds.sample_train_refs(i_v1f3, "0", rng)
    assert s == RefSample([i_v1f3], pseudo_video=True)
    s = ds.sample_train_refs(i_v1f3, "0_shift_3", rng)
    assert s == RefSample([i_v1f3] * 3, pseudo_video=True)
    # explicit [-1, 1] offsets: a real neighbour frame
    for _ in range(8):
        s = ds.sample_train_refs(i_v1f3, [-1, 1], rng)
        assert not s.pseudo_video
        assert _ids(ds, s)[0] in (10002, 10004)
    # video 2 frame 1 has no -1; offset +1 must be chosen via retry
    s = ds.sample_train_refs(i_v2f1, [-1, 1], rng)
    assert _ids(ds, s) == [20002]
    # no candidate at all -> None
    assert ds.sample_train_refs(i_v2f1, [-5], rng) is None
    # 'all' = all previous frames
    s = ds.sample_train_refs(i_v1f3, "all", rng)
    assert _ids(ds, s) == [10001, 10002]
    assert ds.sample_train_refs(0, "all", rng) is None
    # 'full_all' = every other frame
    s = ds.sample_train_refs(i_v1f3, "full_all", rng)
    assert _ids(ds, s) == [10001, 10002, 10004, 10005]
    # '-2' = up to two previous
    s = ds.sample_train_refs(4, "-2", rng)   # video 1, fid 5
    assert _ids(ds, s) == [10003, 10004]
    s = ds.sample_train_refs(1, "-2", rng)   # fid 2: only one previous
    assert _ids(ds, s) == [10001]
    # '+-3' = previous topped up with following to exactly 3
    s = ds.sample_train_refs(1, "+-3", rng)  # fid 2: 1 prev + 2 next
    assert _ids(ds, s) == [10001, 10003, 10004]
    s = ds.sample_train_refs(6, "+-3", rng)  # video 2 fid 2: cannot fill 3
    assert s is None
    # '0_or_ref1' mixes both behaviors
    seen = {True: 0, False: 0}
    for k in range(40):
        s = ds.sample_train_refs(i_v1f3, "0_or_ref1", rng)
        seen[s.pseudo_video] += 1
    assert seen[True] > 0 and seen[False] > 0


def test_repeat_dataset(tiny_dataset):
    rep = RepeatDataset(tiny_dataset, times=8)
    assert len(rep) == 8 * len(tiny_dataset)
    assert rep.frame_ids(0) == (1, 1)  # attribute passthrough


def _synthetic_frame(h=64, w=128):
    """Image with 2 things (rectangles) on a stuff background + GT."""
    from slotvps_tpu.data.transforms import FrameGT

    img = np.full((h, w, 3), 80, np.uint8)
    m1 = np.zeros((h, w), np.uint8)
    m1[h * 10 // 64:h * 30 // 64, w * 20 // 128:w * 60 // 128] = 1
    m2 = np.zeros((h, w), np.uint8)
    m2[h * 35 // 64:h * 55 // 64, w * 70 // 128:w * 110 // 128] = 1
    img[m1 > 0] = (200, 60, 60)
    img[m2 > 0] = (60, 200, 60)
    semantic = np.zeros((h, w), np.uint8)
    semantic[m1 > 0] = 11
    semantic[m2 > 0] = 12

    def bbox(m):
        ys, xs = np.where(m)
        return [xs.min(), ys.min(), xs.max(), ys.max()]

    gt = FrameGT(
        bboxes=np.array([bbox(m1), bbox(m2)], np.float32),
        labels=np.array([1, 2], np.int64),
        obj_ids=np.array([101, 202], np.int64),
        masks=[m1, m2], semantic=semantic)
    return img, gt


def test_train_pipeline_shapes_and_consistency():
    from slotvps_tpu.data.transforms import TrainAugConfig, apply_train_pipeline

    img, gt = _synthetic_frame()
    aug = TrainAugConfig(img_scale=(128, 64), ratio_range=(1.0, 1.0),
                         crop_size=(64, 128), shift_padding=10)
    for seed in range(6):
        rng = np.random.default_rng(seed)
        out = apply_train_pipeline(img, gt, None, None, aug, rng,
                                   pseudo_video=True)
        if out is None:
            continue
        assert out["img"].shape == (64, 128, 3)
        assert out["ref_img"].shape == (64, 128, 3)
        assert out["gt_semantic_seg"].shape == (64, 128)
        assert out["gt_semantic_seg_nx"].shape == (16, 32)
        # semantic replay matches the transformed thing masks
        for m, lab in zip(out["gt"].masks, out["gt"].labels):
            inter = (out["gt_semantic_seg"] == 10 + lab) & (m > 0)
            assert inter.sum() > 0.8 * m.sum()
        # gt_pids point at the surviving ref instances by obj id
        ref_ids = list(out["ref_gt"].obj_ids)
        for pid, oid in zip(out["gt_pids"], out["gt"].obj_ids):
            if pid > 0:
                assert ref_ids[pid - 1] == oid
        # pseudo-video ref differs from cur (it was shifted)
        assert np.abs(out["img"] - out["ref_img"]).max() > 0


def test_train_pipeline_real_ref_pair():
    from slotvps_tpu.data.transforms import TrainAugConfig, apply_train_pipeline

    img, gt = _synthetic_frame()
    ref_img = np.roll(img, 8, axis=1)
    import dataclasses

    ref_gt = dataclasses.replace(
        gt, bboxes=gt.bboxes + np.array([8, 0, 8, 0], np.float32),
        masks=[np.roll(m, 8, axis=1) for m in gt.masks],
        semantic=np.roll(gt.semantic, 8, axis=1))
    aug = TrainAugConfig(img_scale=(128, 64), ratio_range=(0.9, 1.2),
                         crop_size=(48, 96))
    out = None
    for seed in range(10):
        out = apply_train_pipeline(img, gt, ref_img, ref_gt, aug,
                                   np.random.default_rng(seed))
        if out is not None:
            break
    assert out is not None
    assert out["img"].shape == out["ref_img"].shape
    assert len(out["gt_pids"]) == len(out["gt"].labels)


def test_match_loss_prefers_correct_assignment():
    from slotvps_tpu.training.losses import match_loss

    rng = np.random.default_rng(0)
    d = 16
    emb = jnp.asarray(rng.standard_normal((8, d)), jnp.float32) * 3
    track = {"fcs": [
        {"w": jnp.eye(d), "b": jnp.zeros((d,))},
        {"w": jnp.eye(d), "b": jnp.zeros((d,))},
    ]}
    slot_idx = jnp.array([0, 1, 2])
    gt_valid = jnp.array([True, True, True])
    # same slots matched on both frames; pids say cur GT g matches ref GT g
    good = match_loss(emb[:, :d], emb[:, :d], slot_idx, slot_idx,
                      jnp.array([1, 2, 3]), gt_valid, gt_valid, track)
    # wrong correspondence
    bad = match_loss(emb[:, :d], emb[:, :d], slot_idx, slot_idx,
                     jnp.array([2, 3, 1]), gt_valid, gt_valid, track)
    assert float(good) < float(bad)
    # new-object target uses column 0
    new = match_loss(emb[:, :d], emb[:, :d], slot_idx, slot_idx,
                     jnp.array([0, 0, 0]), gt_valid, gt_valid, track)
    assert np.isfinite(float(new))


def test_insdis_loss_separates_instances():
    from slotvps_tpu.training.losses import insdis_loss

    h, w, d = 8, 8, 4
    feat = np.zeros((h, w, d), np.float32)
    feat[:4] = [1, 0, 0, 0]
    feat[4:] = [0, 1, 0, 0]
    masks = np.zeros((2, h, w), np.float32)
    masks[0, :4] = 1
    masks[1, 4:] = 1
    valid = jnp.array([True, True])
    sep = insdis_loss(jnp.asarray(feat), jnp.asarray(masks), valid)
    mixed = insdis_loss(jnp.asarray(np.ones((h, w, d), np.float32)),
                        jnp.asarray(masks), valid)
    assert float(sep) < float(mixed)


def _tiny_model_cfg():
    from slotvps_tpu.config import (
        ModelConfig, ResNetConfig, SlotHeadConfig)

    return ModelConfig(
        resnet=ResNetConfig(depth=18),
        slot_head=SlotHeadConfig(per_dh_num_heads=(1, 1, 1, 1),
                                 dh_num_heads=4,
                                 apply_temporal_query_atten_stages=(2, 3)),
        proposal_num=20,
    )


@pytest.mark.slow
def test_overfit_synthetic_clip():
    """Regression for 'training has never been shown to learn': ~40 steps
    on one synthetic 2-frame clip must drive the losses down with finite
    gradients throughout."""
    import optax

    from slotvps_tpu.training.step import (
        make_optimizer, make_train_batch, train_step)
    from slotvps_tpu.models.detector import init_model

    cfg = _tiny_model_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)

    h, w, g = 32, 64, 4
    img, gt = _synthetic_frame(h, w)
    ref_img = np.roll(img, 6, axis=1)
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)

    def norm(im):
        return ((im[..., ::-1].astype(np.float32) - mean) / std)[None]

    qh, qw = h // 4, w // 4
    gt_masks = np.zeros((1, g, qh, qw), np.float32)
    ref_masks = np.zeros((1, g, qh, qw), np.float32)
    for i, m in enumerate(gt.masks):
        gt_masks[0, i] = m[::4, ::4]
        ref_masks[0, i] = np.roll(m, 6, axis=1)[::4, ::4]
    labels = np.zeros((1, g), np.int32)
    labels[0, :2] = [11, 12]
    valid = np.zeros((1, g), bool)
    valid[0, :2] = True
    semantic = gt.semantic[::4, ::4].astype(np.int32)[None]
    pids = np.zeros((1, g), np.int32)
    pids[0, :2] = [1, 2]

    batch = make_train_batch(
        img=jnp.asarray(norm(img)), ref_img=jnp.asarray(norm(ref_img)),
        gt_labels=jnp.asarray(labels), gt_masks=jnp.asarray(gt_masks),
        gt_valid=jnp.asarray(valid), gt_semantic=jnp.asarray(semantic),
        ref_gt_labels=jnp.asarray(labels),
        ref_gt_masks=jnp.asarray(ref_masks),
        ref_gt_valid=jnp.asarray(valid), gt_pids=jnp.asarray(pids))

    opt = make_optimizer(lr=2e-3, params=params)
    opt_state = opt.init(params)

    import functools

    step = jax.jit(functools.partial(train_step, cfg=cfg, optimizer=opt))
    totals, maskids = [], []
    for it in range(60):
        params, opt_state, metrics = step(params, opt_state, batch)
        m = {k: float(v) for k, v in metrics.items()}
        assert all(np.isfinite(v) for v in m.values()), (it, m)
        totals.append(m["loss_total"])
        maskids.append(m["loss_maskid"])
    assert np.mean(totals[-5:]) < np.mean(totals[:5]) * 0.65, totals
    # the mask-id CE moves slowest (needs the decoder features to
    # separate); require a clear downward trend, not convergence
    assert np.mean(maskids[-5:]) < maskids[0] * 0.75, maskids
    # params stayed finite
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))


def test_bn_stats_frozen_during_training():
    """Round-5 regression: ``optax.masked`` passes masked-out updates
    through as the RAW GRADIENT (it does not zero them), so the frozen
    BN running stats were receiving ``+= d loss/d var`` every step — one
    step can push ``var`` negative and the next forward NaNs via
    ``rsqrt`` (exactly how the trained-regime overfit diverged at step 2
    with clean step-1 gradients).  make_optimizer must pin the buffers
    bit-exactly and keep every param finite."""
    import functools

    from slotvps_tpu.models.detector import init_model
    from slotvps_tpu.models.resnet import calibrate_bn_stats
    from slotvps_tpu.training.step import (
        make_optimizer, make_train_batch, train_step)

    cfg = _tiny_model_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg)

    h, w, g = 32, 64, 4
    img, gt = _synthetic_frame(h, w)
    mean = np.asarray((123.675, 116.28, 103.53), np.float32)
    std = np.asarray((58.395, 57.12, 57.375), np.float32)
    nimg = jnp.asarray(
        ((img[..., ::-1].astype(np.float32) - mean) / std)[None])
    # calibrated (small-variance) stats are the regime that exposed the
    # bug: identity stats survive a few corrupt updates by luck
    calibrate_bn_stats(params["backbone"],
                       jnp.concatenate([nimg, nimg], axis=0),
                       depth=cfg.resnet.depth)

    qh, qw = h // 4, w // 4
    gt_masks = np.zeros((1, g, qh, qw), np.float32)
    for i, m in enumerate(gt.masks):
        gt_masks[0, i] = m[::4, ::4]
    labels = np.zeros((1, g), np.int32)
    labels[0, :2] = [11, 12]
    valid = np.zeros((1, g), bool)
    valid[0, :2] = True
    batch = make_train_batch(
        img=nimg, ref_img=nimg, gt_labels=jnp.asarray(labels),
        gt_masks=jnp.asarray(gt_masks), gt_valid=jnp.asarray(valid),
        gt_semantic=jnp.asarray(gt.semantic[::4, ::4].astype(np.int32)[None]))

    stats0 = {k: np.asarray(v)
              for k, v in _bn_stat_leaves(params["backbone"])}
    opt = make_optimizer(lr=2e-3, params=params)
    opt_state = opt.init(params)
    step = jax.jit(functools.partial(train_step, cfg=cfg, optimizer=opt))
    for it in range(3):
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss_total"])), (it, metrics)
    for k, v in _bn_stat_leaves(params["backbone"]):
        np.testing.assert_array_equal(np.asarray(v), stats0[k], err_msg=k)
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree.leaves(params))


def _bn_stat_leaves(tree):
    import jax.tree_util as jtu

    for path, leaf in jtu.tree_flatten_with_path(tree)[0]:
        name = getattr(path[-1], "key", None)
        if name in ("mean", "var"):
            yield jtu.keystr(path), leaf


def test_photometric_distortion_smoke():
    from slotvps_tpu.data.transforms import photometric_distortion

    img = np.random.default_rng(0).integers(
        0, 255, (32, 48, 3)).astype(np.uint8)
    out = photometric_distortion(img, np.random.default_rng(1))
    assert out.shape == img.shape and out.dtype == np.uint8
    # ref frame gets the SAME draws (reference applies identical deltas
    # to 'ref_img', transforms.py:1248-1385)
    a, b = photometric_distortion(img, np.random.default_rng(1), img)
    np.testing.assert_array_equal(a, b)
    # float32 stays unquantized mid-pipeline: identity draws round-trip
    class _NoOp:
        def integers(self, *_):
            return 0

        def uniform(self, lo, hi):
            return 0.0
    f = photometric_distortion(img, _NoOp(), convert_uint8=False)
    np.testing.assert_allclose(f, img.astype(np.float32), atol=1e-3)


def _disk_dataset(tmp_path, n_videos=2, n_frames=2, h=64, w=128):
    """A tiny on-disk dataset (PNGs + polygon anns) usable by make_batch."""
    import cv2

    img, gt = _synthetic_frame(h, w)
    images, anns = [], []
    aid = 1
    for vid in range(1, n_videos + 1):
        for fid in range(1, n_frames + 1):
            name = f"v{vid}_f{fid}_newImg8bit.png"
            cv2.imwrite(str(tmp_path / name), img)
            images.append({"id": vid * 10000 + fid, "file_name": name,
                           "height": h, "width": w})
            for j, (bb, lab, oid) in enumerate(zip(
                    gt.bboxes, gt.labels, gt.obj_ids)):
                x1, y1, x2, y2 = [float(v) for v in bb]
                poly = [x1, y1, x2 + 1, y1, x2 + 1, y2 + 1, x1, y2 + 1]
                anns.append({
                    "id": aid, "image_id": vid * 10000 + fid,
                    "category_id": int(lab),
                    "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                    "area": float((x2 - x1 + 1) * (y2 - y1 + 1)),
                    "segmentation": [poly], "inst_id": int(oid) + vid,
                })
                aid += 1
    ann = {"images": images,
           "categories": [{"id": 1, "name": "person"},
                          {"id": 2, "name": "car"}],
           "annotations": anns}
    p = tmp_path / "ann.json"
    p.write_text(json.dumps(ann))
    return CityscapesVPSDataset(str(p), str(tmp_path))


def test_make_batch_through_repeat_dataset(tmp_path):
    """Repeated indices (idx >= len(base)) must be translated before they
    reach base-dataset methods (the advisor-reported IndexError)."""
    from argparse import Namespace

    from slotvps_tpu.cli.train import make_batch
    from slotvps_tpu.config import named_config
    from slotvps_tpu.data.transforms import TrainAugConfig

    ds = _disk_dataset(tmp_path)
    rep = RepeatDataset(ds, times=8)
    args = Namespace(offsets="0_shift_3", seg_prefix=None,
                     crop=(32, 64), gt_capacity=8)
    cfg = named_config("r50_fpn_slotvps")
    aug = TrainAugConfig(img_scale=(128, 64), ratio_range=(1.0, 1.0),
                         crop_size=(32, 64), shift_padding=5)
    rng = np.random.default_rng(0)
    # indices deliberately past the base length (up to times*N - 1)
    idxs = [len(rep) - 1, len(ds), len(ds) * 5 + 1]
    batch = make_batch(rep, idxs, args, cfg, rng, aug)
    assert batch.img.shape == (3, 32, 64, 3)
    assert batch.gt_valid.any()


def test_prefetch_ordered_order_and_errors():
    """Batches stream strictly in order under multi-threaded assembly,
    and worker exceptions surface at the consumer."""
    import time as _t

    from slotvps_tpu.data.loader import prefetch_ordered

    def f(i):
        _t.sleep(0.005 * ((i * 7) % 3))  # jittered completion order
        return i * i

    out = list(prefetch_ordered(f, range(20), prefetch=2, num_threads=3))
    assert out == [i * i for i in range(20)]

    def g(i):
        if i == 5:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(prefetch_ordered(g, range(10), num_threads=2))


def test_parallel_batch_assembly_deterministic(tmp_path):
    """cli/train.py's per-step derived rngs make worker-threaded batch
    assembly bit-identical to serial assembly (VERDICT r2 ask #7)."""
    from argparse import Namespace

    from slotvps_tpu.cli.train import make_batch
    from slotvps_tpu.config import named_config
    from slotvps_tpu.data.loader import prefetch_ordered
    from slotvps_tpu.data.transforms import TrainAugConfig

    ds = _disk_dataset(tmp_path)
    args = Namespace(offsets="0_shift_3", seg_prefix=None,
                     crop=(32, 64), gt_capacity=8)
    cfg = named_config("r50_fpn_slotvps")
    aug = TrainAugConfig(img_scale=(128, 64), ratio_range=(1.0, 1.0),
                         crop_size=(32, 64), shift_padding=5)
    order = np.random.default_rng((0, 0)).permutation(len(ds))

    def build(s):
        srng = np.random.default_rng((0, 0, int(s)))
        idxs = order[s * 2:(s + 1) * 2]
        return make_batch(ds, idxs, args, cfg, srng, aug)

    serial = [build(s) for s in range(2)]
    threaded = list(prefetch_ordered(build, range(2), num_threads=2))
    for a, b in zip(serial, threaded):
        for fa, fb in zip(a, b):
            np.testing.assert_array_equal(fa, fb)
