"""Fusion tests: seg/ins reconciliation, stuff-area limit, obj-id dedup,
temporally consistent coloring — plus golden comparison vs the reference
helper when importable."""

import importlib.util
import sys

import numpy as np
import pytest

from slotvps_tpu.eval.color import CITYSCAPES_CATEGORIES, IdGenerator, rgb2id
from slotvps_tpu.eval.fusion import (
    convert_2ch_track, inference_panoptic_video, unify_pan_result)

ID_LAST_STUFF = 10


def _mk_frame(h=8, w=8):
    """seg: semantic argmax; pan: fused map with one thing instance."""
    seg = np.zeros((h, w), dtype=np.uint8)        # stuff class 0 everywhere
    seg[:, w // 2:] = 13                          # thing class 13 right half
    pan = np.zeros((h, w), dtype=np.uint8)
    pan[:, w // 2:] = ID_LAST_STUFF + 1           # instance slot 0
    return seg, pan


def test_unify_agreement_keeps_instance():
    seg, pan = _mk_frame()
    cls_ind = np.array([3])  # 3 + 10 = 13 matches seg majority
    out = unify_pan_result([seg], [pan], [cls_ind], [np.array([7])],
                           stuff_area_limit=2)[0]
    right = out[:, 4:, :]
    assert (right[:, :, 0] == 13).all()   # sem
    assert (right[:, :, 1] == 1).all()    # ins index+1
    assert (right[:, :, 2] == 8).all()    # obj_id + 1
    left = out[:, :4, :]
    assert (left[:, :, 0] == 0).all() and (left[:, :, 1] == 0).all()


def test_unify_majority_stuff_overrides():
    seg, pan = _mk_frame()
    seg[:, :] = 4  # semantic head says stuff class 4 everywhere
    cls_ind = np.array([3])
    out = unify_pan_result([seg], [pan], [cls_ind], [np.array([0])],
                           stuff_area_limit=2)[0]
    # instance region majority-voted to stuff: ins and obj cleared
    right = out[:, 4:, :]
    assert (right[:, :, 0] == 4).all()
    assert (right[:, :, 1] == 0).all()
    assert (right[:, :, 2] == 0).all()


def test_unify_disagreeing_thing_keeps_thing():
    seg, pan = _mk_frame()
    seg[:, 4:] = 15  # says a DIFFERENT thing class; majority is thing ->
    cls_ind = np.array([3])  # keep the slot-head class 13
    out = unify_pan_result([seg], [pan], [cls_ind], [np.array([0])],
                           stuff_area_limit=2)[0]
    right = out[:, 4:, :]
    assert (right[:, :, 0] == 13).all()
    assert (right[:, :, 1] == 1).all()


def test_unify_stuff_area_limit():
    seg = np.zeros((8, 8), dtype=np.uint8)
    pan = np.zeros((8, 8), dtype=np.uint8)
    pan[0, 0] = 4  # tiny stuff region of class 4
    out = unify_pan_result([seg], [pan], [np.array([], dtype=np.int64)],
                           None, stuff_area_limit=3)[0]
    assert out[0, 0, 0] == 255  # voided
    assert (out[1:, :, 0] == 0).all()


def test_unify_duplicate_obj_ids_renamed():
    seg = np.zeros((4, 8), dtype=np.uint8)
    seg[:, :4] = 13
    seg[:, 4:] = 13
    pan = np.zeros((4, 8), dtype=np.uint8)
    pan[:, :4] = 11   # instance slot 0
    pan[:, 4:] = 12   # instance slot 1
    cls_ind = np.array([3, 3])
    obj_id = np.array([5, 5])  # duplicate track id
    out = unify_pan_result([seg], [pan], [cls_ind], [obj_id],
                           stuff_area_limit=1)[0]
    # reference quirk (:235-244): the [::-1] round trip makes the LAST
    # occurrence keep the id; earlier ones are renamed to fresh ids >= 100
    assert out[0, 0, 2] == 101  # renamed to max_oid=100, stored +1
    assert out[0, 4, 2] == 6    # keeps 5, stored +1


def test_convert_2ch_track_temporal_color_consistency():
    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    gen = IdGenerator(cats)
    frames = []
    for _ in range(3):
        f = np.zeros((6, 6, 3), dtype=np.uint8)
        f[:3, :, 0] = 10          # stuff sky
        f[3:, :, 0] = 13          # thing car
        f[3:, :, 1] = 1
        f[3:, :, 2] = 4           # obj id 4 across all frames
        frames.append(f)
    annos, pans = convert_2ch_track(frames, gen)
    ids = [set(np.unique(rgb2id(p))) for p in pans]
    assert ids[0] == ids[1] == ids[2]
    assert len(ids[0]) == 2
    # segments_info areas match the PNG
    for anno, pan in zip(annos, pans):
        pid = rgb2id(pan)
        for seg in anno["segments_info"]:
            assert seg["area"] == int((pid == seg["id"]).sum())


def test_convert_2ch_track_new_object_new_color():
    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    gen = IdGenerator(cats)
    f1 = np.zeros((4, 4, 3), dtype=np.uint8)
    f1[:, :, 0] = 13
    f1[:, :, 1] = 1
    f1[:, :, 2] = 1
    f2 = f1.copy()
    f2[:, :, 2] = 2  # different obj id in frame 2
    _, pans = convert_2ch_track([f1, f2], gen)
    assert set(np.unique(rgb2id(pans[0]))) != set(np.unique(rgb2id(pans[1])))


def test_inference_panoptic_video_writes_artifacts(tmp_path):
    frames = []
    for _ in range(6):
        f = np.zeros((4, 4, 3), dtype=np.uint8)
        f[:, :, 0] = 10
        frames.append(f)
    pans, pred_json = inference_panoptic_video(
        frames, str(tmp_path), CITYSCAPES_CATEGORIES,
        names=[f"f{i}.png" for i in range(6)])
    assert len(pans) == 6
    assert len(pred_json["annotations"]) == 6
    assert (tmp_path / "pred.json").exists()
    assert len(list((tmp_path / "pan_pred").iterdir())) == 6


# ---------------------------------------------------------------------------
# golden comparison vs reference get_unified_pan_result
# ---------------------------------------------------------------------------

def _load_reference_fusion():
    """Import tools/dataset/cityscapes_vps.py with shims for its deps."""
    import types
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    # shim the reference config singleton + panopticapi + utils
    cfgmod = types.ModuleType("tools.config.config")

    class _D(dict):
        __getattr__ = dict.__getitem__

    cfgmod.config = _D(dataset=_D(num_seg_classes=19, num_classes=9),
                       test=_D(panoptic_stuff_area_limit=2048))
    base_spec = importlib.util.spec_from_file_location(
        "tools.dataset.base_dataset",
        "/root/reference/tools/dataset/base_dataset.py")
    utilsmod = types.ModuleType("tools.utils")
    utilsmod.save_color_map = lambda *a, **k: None
    toolsmod = types.ModuleType("tools")
    datasetmod = types.ModuleType("tools.dataset")
    configmod = types.ModuleType("tools.config")
    pano = types.ModuleType("panopticapi")
    pano_utils = types.ModuleType("panopticapi.utils")
    pycoco = types.ModuleType("pycocotools")
    pycoco_coco = types.ModuleType("pycocotools.coco")
    pycoco_coco.COCO = type("COCO", (), {})
    pycoco_mask = types.ModuleType("pycocotools.mask")
    from slotvps_tpu.eval import color as _c
    pano_utils.rgb2id = _c.rgb2id
    pano_utils.id2rgb = _c.id2rgb
    pano_utils.IdGenerator = _c.IdGenerator
    mods = {
        "tools": toolsmod, "tools.dataset": datasetmod,
        "tools.config": configmod, "tools.config.config": cfgmod,
        "tools.utils": utilsmod, "panopticapi": pano,
        "panopticapi.utils": pano_utils,
        "pycocotools": pycoco, "pycocotools.coco": pycoco_coco,
        "pycocotools.mask": pycoco_mask,
    }
    saved = {k: sys.modules.get(k) for k in mods}
    sys.modules.update(mods)
    # py>=3.10 removed collections.Sequence, which the 2021-era reference uses
    import collections
    import collections.abc
    had_seq = hasattr(collections, "Sequence")
    if not had_seq:
        collections.Sequence = collections.abc.Sequence
    try:
        base = importlib.util.module_from_spec(base_spec)
        base_spec.loader.exec_module(base)
        sys.modules["tools.dataset.base_dataset"] = base
        spec = importlib.util.spec_from_file_location(
            "ref_cityscapes_vps",
            "/root/reference/tools/dataset/cityscapes_vps.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None
    finally:
        if not had_seq:
            del collections.Sequence
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


REF_FUSION = _load_reference_fusion()


@pytest.mark.skipif(REF_FUSION is None,
                    reason="reference fusion not importable")
def test_golden_unify_vs_reference(rng):
    n = 4
    segs, pans, cls_inds, obj_ids, names = [], [], [], [], []
    for i in range(n):
        seg = rng.integers(0, 19, size=(24, 32)).astype(np.uint8)
        pan = rng.integers(0, 14, size=(24, 32)).astype(np.uint8)
        # slots present: ensure contiguity 11..13
        cls_inds.append(rng.integers(1, 9, size=3).astype(np.int64))
        obj_ids.append(np.array([2, 0, 1], dtype=np.int64))
        segs.append(seg)
        pans.append(pan)
        names.append(f"f{i}.png")

    ours = unify_pan_result(segs, [p.copy() for p in pans],
                            cls_inds, [o.copy() for o in obj_ids],
                            stuff_area_limit=10, id_last_stuff=10)
    ref_ds = REF_FUSION.CityscapesVps()
    theirs = ref_ds.get_unified_pan_result(
        segs, [p.copy() for p in pans], cls_inds,
        obj_ids=[o.copy() for o in obj_ids],
        stuff_area_limit=10, names=names)
    theirs = [theirs[k] for k in sorted(theirs.keys())]
    for o, t in zip(ours, theirs):
        assert np.array_equal(o, t)


def test_convert_2ch_single_per_frame_colors():
    from slotvps_tpu.eval.fusion import convert_2ch_single

    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    gen = IdGenerator(cats)
    f = np.zeros((4, 4, 3), dtype=np.uint8)
    f[:, :, 0] = 13
    f[:, :, 1] = 1
    f[:, :, 2] = 1
    annos, pans = convert_2ch_single([f, f], gen)
    # same id both frames (colors restart per frame)
    assert np.array_equal(pans[0], pans[1])
    assert len(annos) == 2


def test_empty_instance_frame_blanks():
    """Deliberate divergence from the reference (cityscapes_vps.py:249-252):
    with no kept instances, pixels carrying instance ids must read void in
    BOTH the semantic and instance channels (the reference leaks the raw
    ids into pan_seg because it copies before blanking)."""
    seg = np.full((8, 8), 3, np.uint8)
    pan = np.full((8, 8), 3, np.uint8)
    pan[2:4, 2:4] = 12          # bogus instance id, no cls_ind for it
    out = unify_pan_result([seg], [pan], [np.array([], dtype=np.int64)],
                           [np.array([], dtype=np.int64)],
                           stuff_area_limit=1)[0]
    assert (out[2:4, 2:4, 0] == 255).all()     # pan_seg: void, not 12
    assert (out[2:4, 2:4, 1] == 0).all()       # pan_ins: no instance
    assert (out[..., 0][pan == 3] == 3).all()  # stuff untouched
