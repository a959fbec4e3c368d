"""Inventory-tail components (VERDICT r2 ask #8): MultiScaleFlipAug
general branches, Expand / MinIoURandomCrop / Corrupt train transforms,
COCO-json detection round trip, confusion matrix."""

import json

import numpy as np
import pytest

from slotvps_tpu.data.pipeline import multi_scale_flip_aug, preprocess
from slotvps_tpu.data.transforms import (FrameGT, corrupt_image, expand,
                                         min_iou_random_crop)
from slotvps_tpu.eval.detection import (confusion_matrix, det2json,
                                        json2det, proposal2json,
                                        results2json, xyxy2xywh)


class _Rng:
    """Scripted rng: integers/uniform pop from fixed queues."""

    def __init__(self, ints=(), floats=()):
        self._i = iter(ints)
        self._f = iter(floats)

    def integers(self, *a, **k):
        return next(self._i)

    def uniform(self, *a, **k):
        return next(self._f)


# ---------------------------------------------------------------- test_aug

def test_multi_scale_flip_aug_default_branch_is_plain_preprocess(rng):
    img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
    variants = multi_scale_flip_aug(img, scales=((64, 32),), flip=False)
    assert len(variants) == 1
    arr, meta = variants[0]
    ref_arr, _ = preprocess(img, scale=(64, 32))
    np.testing.assert_array_equal(arr, ref_arr)
    assert meta["flip"] is False and meta["scale"] == (64, 32)


def test_multi_scale_flip_aug_scales_and_flip_quirk(rng):
    """flip=True tests ONLY the flipped copy (reference test_aug.py:21-22),
    and each scale contributes one variant."""
    img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
    variants = multi_scale_flip_aug(
        img, scales=((64, 32), (128, 64)), flip=True)
    assert len(variants) == 2
    for (arr, meta), scale in zip(variants, [(64, 32), (128, 64)]):
        assert meta["flip"] is True and meta["scale"] == scale
        flipped, _ = preprocess(np.ascontiguousarray(img[:, ::-1]),
                                scale=scale)
        np.testing.assert_array_equal(arr, flipped)


def test_multi_scale_flip_aug_numeric_scale_is_ratio(rng):
    """img_scale=[1] = original size (reference test_aug.py:15-16)."""
    img = rng.integers(0, 255, (32, 64, 3)).astype(np.uint8)
    (arr, meta), = multi_scale_flip_aug(img, scales=(1,), flip=False)
    assert meta["img_shape"] == (32, 64)
    (arr2, meta2), = multi_scale_flip_aug(img, scales=(0.5,), flip=False)
    assert meta2["img_shape"] == (16, 32)


# ------------------------------------------------------------- transforms

def _gt_one_box():
    mask = np.zeros((40, 40), np.uint8)
    mask[10:31, 10:31] = 1
    return FrameGT(bboxes=np.array([[10, 10, 30, 30]], np.float32),
                   labels=np.array([1], np.int64),
                   obj_ids=np.array([7], np.int64),
                   masks=[mask])


def test_expand_places_image_on_mean_canvas():
    img = np.full((40, 40, 3), 100, np.uint8)
    gt = _gt_one_box()
    # draws: coin=0 (do expand), ratio=2.0, left=10, top=5
    out, gt2 = expand(img, gt, _Rng(ints=[0], floats=[2.0, 10.0, 5.0]),
                      mean=(1, 2, 3), to_rgb=True)
    assert out.shape == (80, 80, 3)
    # canvas fill is the reversed mean (reference :1410-1413)
    np.testing.assert_array_equal(out[0, 0], [3, 2, 1])
    np.testing.assert_array_equal(out[5:45, 10:50], img)
    np.testing.assert_array_equal(gt2.bboxes[0], [20, 15, 40, 35])
    assert gt2.masks[0].shape == (80, 80)
    assert gt2.masks[0][5 + 10, 10 + 10] == 1 and gt2.masks[0][0, 0] == 0


def test_expand_coin_skip():
    img = np.zeros((8, 8, 3), np.uint8)
    gt = _gt_one_box()
    out, gt2 = expand(img, gt, _Rng(ints=[1]))
    assert out is img and gt2 is gt


def test_min_iou_random_crop():
    img = np.arange(40 * 40 * 3, dtype=np.uint8).reshape(40, 40, 3)
    gt = _gt_one_box()
    # draws: mode index 1 -> min_iou 0.1; new_w 36, new_h 36, left 0, top 0
    out, gt2 = min_iou_random_crop(
        img, gt, _Rng(ints=[1], floats=[36.0, 36.0, 0.0, 0.0]))
    assert out.shape == (36, 36, 3)
    np.testing.assert_array_equal(out, img[:36, :36])
    np.testing.assert_array_equal(gt2.bboxes[0], [10, 10, 30, 30])
    assert gt2.masks[0].shape == (36, 36)


def test_min_iou_random_crop_mode1_identity():
    img = np.zeros((40, 40, 3), np.uint8)
    gt = _gt_one_box()
    out, gt2 = min_iou_random_crop(img, gt, _Rng(ints=[0]))  # mode == 1
    assert out is img and gt2 is gt


def test_corrupt_image(rng):
    img = rng.integers(0, 255, (16, 16, 3)).astype(np.uint8)
    for name in ["gaussian_noise", "shot_noise", "impulse_noise",
                 "speckle_noise", "contrast", "brightness",
                 "gaussian_blur", "pixelate"]:
        out = corrupt_image(img, name, severity=3,
                            rng=np.random.default_rng(0))
        assert out.shape == img.shape and out.dtype == np.uint8
        assert np.any(out != img), name
    # severity scales the distortion
    lo = corrupt_image(img, "gaussian_noise", 1, np.random.default_rng(0))
    hi = corrupt_image(img, "gaussian_noise", 5, np.random.default_rng(0))
    d = lambda a: np.abs(a.astype(int) - img.astype(int)).mean()  # noqa
    assert d(hi) > d(lo)
    with pytest.raises(ValueError):
        corrupt_image(img, "glass_blur")


# ------------------------------------------------------- detection json

def test_det_json_round_trip(tmp_path, rng):
    num_classes = 3
    img_ids = [11, 22]
    results = []
    for _ in img_ids:
        per_class = []
        for c in range(num_classes):
            n = int(rng.integers(0, 4))
            x1y1 = rng.uniform(0, 50, (n, 2))
            wh = rng.uniform(1, 20, (n, 2))
            score = rng.uniform(0, 1, (n, 1))
            per_class.append(np.concatenate(
                [x1y1, x1y1 + wh, score], axis=1).astype(np.float32))
        results.append(per_class)

    files = results2json(img_ids, results, str(tmp_path / "out"))
    assert files["bbox"] == files["proposal"]
    with open(files["bbox"]) as fh:
        payload = json.load(fh)
    assert all(d["category_id"] in (1, 2, 3) for d in payload)
    back = json2det(payload, img_ids, num_classes)
    for orig, rec in zip(results, back):
        for a, b in zip(orig, rec):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)


def test_proposal_json(tmp_path, rng):
    img_ids = [5]
    props = [np.array([[0, 0, 10, 10, 0.9]], np.float32)]
    files = results2json(img_ids, props, str(tmp_path / "p"))
    with open(files["proposal"]) as fh:
        payload = json.load(fh)
    assert payload == [{"image_id": 5, "bbox": [0.0, 0.0, 11.0, 11.0],
                        "score": pytest.approx(0.9), "category_id": 1}]
    assert xyxy2xywh(np.array([2, 3, 7, 9])) == [2, 3, 6, 7]
    assert proposal2json(img_ids, props)[0]["category_id"] == 1


# ---------------------------------------------------- confusion matrix

def test_confusion_matrix_matches_reference_loop(rng):
    n_cls = 5
    gt = rng.integers(0, n_cls, 1000)
    pred = rng.integers(0, n_cls, 1000)
    ours = confusion_matrix(gt, pred, n_cls)
    # the reference's bincount loop (base_dataset.py:471-489), verbatim
    index = (gt * n_cls + pred).astype("int32")
    label_count = np.bincount(index)
    ref = np.zeros((n_cls, n_cls))
    for i in range(n_cls):
        for j in range(n_cls):
            cur = i * n_cls + j
            if cur < len(label_count):
                ref[i, j] = label_count[cur]
    np.testing.assert_array_equal(ours, ref)
    assert ours.sum() == 1000


def test_save_diff_figs_reference_rule(tmp_path):
    """pan_diff error maps: uint8 wrap-around pred-gt, zeroed where gt==0,
    one png per frame named by image id (reference eval_vpq.py:463-470)."""
    from PIL import Image

    from slotvps_tpu.eval.vpq import save_diff_figs

    rng = np.random.default_rng(0)
    pred = [rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)
            for _ in range(2)]
    gt = [rng.integers(0, 256, (8, 12, 3)).astype(np.uint8)
          for _ in range(2)]
    gt[0][2:4, 3:6] = 0          # whole-pixel gt void
    gt[1][5, 5, 1] = 0           # single-channel zero (channel-wise rule)
    save_diff_figs(pred, gt, ["0001.png", "0002.png"], str(tmp_path))
    for i, name in enumerate(["0001.png", "0002.png"]):
        got = np.array(Image.open(tmp_path / "pan_diff" / name))
        want = pred[i] - gt[i]          # uint8 wraps, like the reference
        want[np.where(gt[i] == 0)] = 0  # channel-wise, not pixel-wise
        np.testing.assert_array_equal(got, want)
