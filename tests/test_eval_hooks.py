"""File-based ``run_val_eval`` end-to-end (VERDICT r4 ask #6).

``eval/hooks.run_val_eval`` is the ``--eval_every`` entry point: it wires
a CityscapesVPSDataset read from DISK through the full inference ->
fusion -> pred.json/pngs -> final_eval stack — including the gt png
filename mapping (hooks.py: ``*_newImg8bit.png`` -> ``*_final_mask.png``,
``*_leftImg8bit.png`` -> ``*_gtFine_color.png``) that its two helpers
(covered by tests/test_train_eval_loop.py) never touch.  Reference
analog: mmdet/core/evaluation/eval_hooks.py:20-83 (periodic val eval on
the real val split from disk).

Fixture: a 2-frame synthetic video written to a tmpdir — ann json + imgs
+ gt pan pngs + gt pan json — exactly the file layout cli/train.py
--eval_every points the hook at.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

H, W = 32, 64


def _write_fixture(root):
    """2-frame video (vid 1, fids 1-2) on disk; returns the path tuple
    run_val_eval takes."""
    from PIL import Image

    from slotvps_tpu.eval.color import CITYSCAPES_CATEGORIES, id2rgb

    img_dir = root / "img"
    truth_dir = root / "gt"
    img_dir.mkdir()
    truth_dir.mkdir()

    rng = np.random.default_rng(0)
    images, gt_images, gt_annos = [], [], []
    # gt: one stuff region (category 0) + one thing (category 11)
    id_map = np.full((H, W), 1, np.uint32)
    id_map[8:20, 10:30] = 1001
    segs = [
        {"id": 1, "category_id": 0, "iscrowd": 0,
         "area": int((id_map == 1).sum())},
        {"id": 1001, "category_id": 11, "iscrowd": 0,
         "area": int((id_map == 1001).sum())},
    ]
    for fid in (1, 2):
        name = f"0001_{fid:04d}_city_newImg8bit.png"
        frame = rng.integers(0, 255, (H, W, 3), np.uint8)
        cv2.imwrite(str(img_dir / name), frame)
        images.append({"id": 10000 + fid, "file_name": name,
                       "height": H, "width": W})
        gt_images.append({"id": 10000 + fid, "file_name": name})
        gt_annos.append({"segments_info": [dict(s) for s in segs]})
        gt_name = name.replace("_newImg8bit.png", "_final_mask.png")
        Image.fromarray(id2rgb(id_map)).save(truth_dir / gt_name)

    ann_file = root / "ann.json"
    with open(ann_file, "w") as f:
        json.dump({"images": images, "annotations": [],
                   "categories": list(CITYSCAPES_CATEGORIES)}, f)
    gt_json_file = root / "gt_pan.json"
    with open(gt_json_file, "w") as f:
        json.dump({"images": gt_images, "annotations": gt_annos,
                   "categories": list(CITYSCAPES_CATEGORIES)}, f)
    return str(ann_file), str(img_dir), str(truth_dir), str(gt_json_file)


def test_run_val_eval_end_to_end(tmp_path):
    from tests.test_train_eval_loop import _full_cfg

    from slotvps_tpu.eval.hooks import run_val_eval
    from slotvps_tpu.models.detector import init_model

    import jax

    base = _full_cfg()
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, img_scale=(W, H)),
        eval=dataclasses.replace(base.eval, nframes_per_video=2))
    params = init_model(jax.random.PRNGKey(0), cfg.model)

    ann_file, img_prefix, truth_dir, gt_json = _write_fixture(tmp_path)
    out_dir = tmp_path / "out"
    summary = run_val_eval(params, cfg, ann_file, img_prefix, truth_dir,
                           gt_json, output_dir=str(out_dir),
                           max_videos=1)

    # a real summary came back (random init -> near-zero VPQ, but the
    # whole file path ran: dataset read, gt png name mapping, final_eval)
    assert "vpq_all" in summary and 0.0 <= summary["vpq_all"] <= 100.0
    assert (out_dir / "pred.json").exists()
    assert (out_dir / "vpq-final.txt").exists()
    with open(out_dir / "pred.json") as f:
        pred = json.load(f)
    assert len(pred["annotations"]) == 2


def test_run_val_eval_missing_gt_png_raises(tmp_path):
    """The filename mapping must actually be exercised: point truth_dir
    at an empty dir and the hook must fail loudly (not silently score
    zero frames)."""
    from tests.test_train_eval_loop import _full_cfg

    from slotvps_tpu.eval.hooks import run_val_eval
    from slotvps_tpu.models.detector import init_model

    import jax

    base = _full_cfg()
    cfg = dataclasses.replace(
        base,
        data=dataclasses.replace(base.data, img_scale=(W, H)),
        eval=dataclasses.replace(base.eval, nframes_per_video=2))
    params = init_model(jax.random.PRNGKey(0), cfg.model)

    ann_file, img_prefix, _, gt_json = _write_fixture(tmp_path)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(FileNotFoundError):
        run_val_eval(params, cfg, ann_file, img_prefix, str(empty),
                     gt_json, max_videos=1)
