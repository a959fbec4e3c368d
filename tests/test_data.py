"""Data pipeline + dataset + loader tests."""

import json
import os.path as osp

import numpy as np
import pytest

from slotvps_tpu.data.dataset import CityscapesVPSDataset
from slotvps_tpu.data.loader import PrefetchLoader
from slotvps_tpu.data.pipeline import imrescale_size, preprocess


def test_imrescale_size_identity():
    assert imrescale_size(2048, 1024, (2048, 1024)) == (2048, 1024)


def test_imrescale_size_ratio():
    # mmcv.imrescale: factor = min(2048/1920, 1024/1080) = 0.9481..
    w, h = imrescale_size(1920, 1080, (2048, 1024))
    f = min(2048 / 1920, 1024 / 1080)
    assert (w, h) == (int(1920 * f + 0.5), int(1080 * f + 0.5))


def test_preprocess_normalize_and_pad():
    img = np.full((50, 70, 3), 128, np.uint8)  # BGR
    out, meta = preprocess(img, scale=(70, 50), size_divisor=32)
    assert out.shape == (1, 64, 96, 3)  # padded to /32
    assert meta["ori_shape"] == (50, 70)
    assert meta["img_shape"] == (50, 70)
    # normalized value: (128 - mean_rgb)/std_rgb; B and R swap
    exp_r = (128 - 123.675) / 58.395
    np.testing.assert_allclose(out[0, 0, 0, 0], exp_r, rtol=1e-5)
    # padding is zero
    assert (out[0, 50:, :, :] == 0).all()


def _make_dataset(tmp_path, n_videos=2, n_frames=4):
    import cv2

    images = []
    for v in range(1, n_videos + 1):
        for f in range(1, n_frames + 1):
            name = f"{v:04d}_{f:04d}_img.png"
            cv2.imwrite(str(tmp_path / name),
                        np.random.default_rng(v * 100 + f).integers(
                            0, 255, (32, 64, 3)).astype(np.uint8))
            images.append({"id": v * 10000 + f, "file_name": name,
                           "height": 32, "width": 64})
    ann = {"images": images, "categories": [], "annotations": []}
    ann_file = tmp_path / "ann.json"
    with open(ann_file, "w") as fh:
        json.dump(ann, fh)
    return str(ann_file), str(tmp_path)


def test_dataset_ref_logic(tmp_path):
    ann, prefix = _make_dataset(tmp_path)
    ds = CityscapesVPSDataset(ann, prefix, nframes_span_test=4,
                              scale=(64, 32))
    assert len(ds) == 8
    assert ds.ref_index(0) == 0      # span start refs itself
    assert ds.ref_index(1) == 0
    assert ds.ref_index(4) == 4      # next span start
    item = ds[0]
    assert item["img"].shape == (1, 32, 64, 3)
    assert item["meta"]["is_first"] is True
    assert ds[1]["meta"]["is_first"] is False
    assert ds[4]["meta"]["vid"] == 2 and ds[4]["meta"]["fid"] == 1


def test_prefetch_loader_order_and_content(tmp_path):
    ann, prefix = _make_dataset(tmp_path)
    ds = CityscapesVPSDataset(ann, prefix, scale=(64, 32))
    loaded = list(PrefetchLoader(ds, prefetch=2, num_threads=3))
    assert len(loaded) == len(ds)
    for i, item in enumerate(loaded):
        np.testing.assert_array_equal(item["img"], ds[i]["img"])


def test_prefetch_loader_propagates_errors():
    class Bad:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            if i == 1:
                raise ValueError("boom")
            return i

    with pytest.raises(ValueError, match="boom"):
        list(PrefetchLoader(Bad(), num_threads=2))


def test_rle_roundtrip(rng):
    from slotvps_tpu.data.mask import decode_rle, encode_rle

    mask = (rng.random((17, 23)) < 0.4).astype(np.uint8)
    assert np.array_equal(decode_rle(encode_rle(mask)), mask)


def test_rle_compressed_string():
    # compare against torch-free reference: encode with our varint-decoder's
    # inverse computed by hand on a tiny case
    from slotvps_tpu.data.mask import decode_rle

    # mask [[1,0],[1,0]] column-major runs: col0 = 1,1 col1 = 0,0
    # counts = [0, 2, 2]
    rle = {"size": [2, 2], "counts": [0, 2, 2]}
    out = decode_rle(rle)
    assert np.array_equal(out, np.array([[1, 0], [1, 0]], np.uint8))


def test_polygon_mask():
    from slotvps_tpu.data.mask import polygons_to_mask

    m = polygons_to_mask([[1, 1, 6, 1, 6, 6, 1, 6]], 8, 8)
    assert m[3, 3] == 1 and m[0, 0] == 0 and m.sum() >= 25


def test_gt_pids():
    from slotvps_tpu.data.dataset import CityscapesVPSDataset

    pids = CityscapesVPSDataset.gt_pids(
        np.array([5, 9, 7]), np.array([7, 5]))
    assert pids.tolist() == [2, 0, 1]


def test_sample_ref_offsets(tmp_path):
    """Full grammar coverage lives in tests/test_training.py; this checks
    the basics through this fixture's json."""
    ann, prefix = _make_dataset(tmp_path, n_videos=1, n_frames=4)
    ds = CityscapesVPSDataset(ann, prefix, scale=(64, 32))
    rng = np.random.default_rng(0)
    s = ds.sample_train_refs(2, "0", rng)
    assert s.ref_indices == [2] and s.pseudo_video
    for _ in range(10):
        s = ds.sample_train_refs(2, "0_shift_1", rng)
        assert s.ref_indices == [2] and s.pseudo_video
        s = ds.sample_train_refs(2, [-1, 1], rng)
        assert s.ref_indices[0] in (1, 3) and not s.pseudo_video
        s = ds.sample_train_refs(3, "all", rng)
        assert s.ref_indices == [0, 1, 2]


def test_proposal_num_guardrail():
    """proposal_num > 127 must fail at config time (int8 ownership maps in
    the postprocessor claim scan)."""
    import pytest

    from slotvps_tpu.config import ModelConfig

    with pytest.raises(ValueError, match="127"):
        ModelConfig(proposal_num=128)
