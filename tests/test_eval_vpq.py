"""VPQ metric tests on synthetic videos with known IoU / ID-switch counts,
plus a golden comparison against the reference evaluator when importable."""

import importlib.util
import sys

import numpy as np
import pytest

from slotvps_tpu.eval.color import id2rgb
from slotvps_tpu.eval.vpq import (
    PQStat, final_eval, vpq_compute, vpq_compute_single_core)

CATS = {
    1: {"id": 1, "name": "stuffy", "isthing": 0},
    2: {"id": 2, "name": "thingy", "isthing": 1},
}


def _frame(id_map, segments):
    """Build (json, rgb_pan) from an int id map + {id: category} dict."""
    id_map = np.asarray(id_map, dtype=np.uint32)
    segs = []
    for sid, cat in segments.items():
        area = int((id_map == sid).sum())
        segs.append({"id": int(sid), "category_id": cat, "iscrowd": 0,
                     "area": area})
    return {"segments_info": segs}, id2rgb(id_map)


def _set(frames):
    return [(gj, pj, gp, pp, None) for (gj, gp), (pj, pp) in frames]


def test_perfect_match_single_frame():
    id_map = np.zeros((8, 8), dtype=np.uint32)
    id_map[:4] = 5  # stuff segment
    id_map[4:] = 9  # thing segment
    gt = _frame(id_map, {5: 1, 9: 2})
    pred = _frame(id_map, {5: 1, 9: 2})
    stat = vpq_compute_single_core(_set([(gt, pred)]), CATS, nframes=1)
    res, _ = stat.pq_average(CATS, isthing=None)
    assert res["pq"] == 1.0 and res["sq"] == 1.0 and res["rq"] == 1.0
    assert res["ids_sum"] == 2 and res["ids_false"] == 0


def test_known_iou():
    # gt: thing covers columns 0..5 of a 1x10 strip; pred covers 2..7
    gt_map = np.zeros((1, 10), dtype=np.uint32)
    gt_map[0, 0:6] = 9
    pred_map = np.zeros((1, 10), dtype=np.uint32)
    pred_map[0, 2:8] = 9
    gt = _frame(gt_map, {9: 2})
    pred = _frame(pred_map, {9: 2})
    stat = vpq_compute_single_core(_set([(gt, pred)]), CATS, nframes=1)
    # intersection 4; union = 6 + 6 - 4 - void∩pred(2 px where gt=0,pred=9)=2
    # reference subtracts gt-VOID overlap from the union
    iou = 4 / (6 + 6 - 4 - 2)
    assert stat[2].tp == 1
    assert stat[2].iou == pytest.approx(iou)
    assert iou > 0.5


def test_iou_below_half_gives_fn_fp():
    gt_map = np.zeros((1, 10), dtype=np.uint32)
    gt_map[0, 0:6] = 9
    pred_map = np.full((1, 10), 5, dtype=np.uint32)  # stuff everywhere
    pred_map[0, 5:7] = 9
    gt = _frame(gt_map, {9: 2})
    pred = _frame(pred_map, {5: 1, 9: 2})
    stat = vpq_compute_single_core(_set([(gt, pred)]), CATS, nframes=1)
    assert stat[2].tp == 0
    assert stat[2].fn == 1
    assert stat[2].fp == 1


def test_id_switch_counted():
    # 2-frame windows over a 3-frame video; gt thing id stays 9,
    # pred id switches from 9 to 13 in frame 3.
    maps = []
    for pred_id in (9, 9, 13):
        gt_map = np.zeros((4, 4), dtype=np.uint32)
        gt_map[:2] = 9
        gt_map[2:] = 5
        pred_map = np.zeros((4, 4), dtype=np.uint32)
        pred_map[:2] = pred_id
        pred_map[2:] = 5
        maps.append((_frame(gt_map, {9: 2, 5: 1}),
                     _frame(pred_map, {pred_id: 2, 5: 1})))
    stat = vpq_compute_single_core(_set(maps), CATS, nframes=1)
    # 3 windows; tube (frame-level here) match each time, one switch 9->13
    assert stat[2].ids_sum == 3
    assert stat[2].ids_false == 1


def test_tube_matching_requires_temporal_consistency():
    # nframes=2: pred id switches between the two frames, so neither pred
    # tube reaches IoU>0.5 against the persistent gt tube.
    f1_gt = np.full((4, 4), 9, dtype=np.uint32)
    f1_pred = np.full((4, 4), 9, dtype=np.uint32)
    f2_pred = np.full((4, 4), 13, dtype=np.uint32)
    frames = [
        (_frame(f1_gt, {9: 2}), _frame(f1_pred, {9: 2})),
        (_frame(f1_gt, {9: 2}), _frame(f2_pred, {13: 2})),
    ]
    stat = vpq_compute_single_core(_set(frames), CATS, nframes=2)
    assert stat[2].tp == 0
    assert stat[2].fn == 1
    assert stat[2].fp == 2


def test_crowd_gt_ignored():
    gt_map = np.full((4, 4), 9, dtype=np.uint32)
    pred_map = np.full((4, 4), 9, dtype=np.uint32)
    gt = _frame(gt_map, {9: 2})
    gt[0]["segments_info"][0]["iscrowd"] = 1
    pred = _frame(pred_map, {9: 2})
    stat = vpq_compute_single_core(_set([(gt, pred)]), CATS, nframes=1)
    # crowd: no TP, no FN; pred fully covered by crowd -> no FP either
    assert stat[2].tp == 0 and stat[2].fn == 0 and stat[2].fp == 0


def test_final_eval_aggregates(tmp_path):
    id_map = np.zeros((8, 8), dtype=np.uint32)
    id_map[:4] = 5
    id_map[4:] = 9
    frames = [(_frame(id_map, {5: 1, 9: 2}), _frame(id_map, {5: 1, 9: 2}))
              for _ in range(6)]
    gt_jsons = [f[0][0] for f in frames]
    pred_jsons = [f[1][0] for f in frames]
    gt_pans = [f[0][1] for f in frames]
    pred_pans = [f[1][1] for f in frames]
    summary = final_eval(pred_jsons, gt_jsons, gt_pans, pred_pans, CATS,
                         output_dir=str(tmp_path), verbose=False)
    assert summary["vpq_all"] == pytest.approx(100.0)
    assert (tmp_path / "vpq-0.txt").exists()
    assert (tmp_path / "vpq-15.txt").exists()
    assert (tmp_path / "vpq-final.txt").exists()
    # vpq-final.txt layout: exactly the reference's 4 summary lines
    # (tools/eval_vpq.py:558-563)
    lines = (tmp_path / "vpq-final.txt").read_text().splitlines()
    assert [ln.split(":")[0] for ln in lines] == [
        "vpq_all", "vpq_thing", "vpq_stuff", "vpq_errp"]
    # per-category artifact (reference :522 vpq_cats.json: one per-cat
    # list per window size)
    import json as _json

    cats = _json.load(open(tmp_path / "vpq_cats.json"))
    assert len(cats) == 4 and all(len(c) == len(CATS) for c in cats)
    assert summary["per_category"]


def test_final_eval_draw_charts(tmp_path):
    id_map = np.zeros((8, 8), dtype=np.uint32)
    id_map[:4] = 5
    id_map[4:] = 9
    frames = [(_frame(id_map, {5: 1, 9: 2}), _frame(id_map, {5: 1, 9: 2}))
              for _ in range(6)]
    final_eval([f[1][0] for f in frames], [f[0][0] for f in frames],
               [f[0][1] for f in frames], [f[1][1] for f in frames],
               CATS, output_dir=str(tmp_path), verbose=False,
               draw_charts=True)
    for name in ("vpq_fig.png", "vsq_fig.png", "vrq_fig.png",
                 "vpq_cats_fig.png"):
        assert (tmp_path / name).exists(), name


# ---------------------------------------------------------------------------
# golden comparison against the reference evaluator (pure numpy, runs on CPU)
# ---------------------------------------------------------------------------

def _load_reference_vpq():
    try:
        import matplotlib  # noqa: F401  (reference tools/utils needs it)
    except ImportError:
        return None
    ref_tools = "/root/reference/tools"
    spec = importlib.util.spec_from_file_location(
        "ref_eval_vpq", f"{ref_tools}/eval_vpq.py")
    if spec is None:
        return None
    sys.path.insert(0, ref_tools)
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None
    finally:
        sys.path.remove(ref_tools)


REF = _load_reference_vpq()


@pytest.mark.skipif(REF is None, reason="reference evaluator not importable")
@pytest.mark.parametrize("nframes", [1, 2, 3])
def test_golden_vs_reference(nframes, rng):
    """Randomized panoptic maps: our PQStat must match the reference's."""
    frames = []
    for t in range(6):
        gt_map = rng.integers(0, 6, size=(16, 16)).astype(np.uint32)
        pred_map = gt_map.copy()
        # perturb predictions
        noise = rng.random((16, 16)) < 0.15
        pred_map[noise] = rng.integers(0, 6, size=int(noise.sum()))
        segs = {i: (1 if i < 3 else 2) for i in range(1, 6)}
        frames.append((_frame(gt_map, segs), _frame(pred_map, segs)))
    gt_pred_set = _set(frames)

    ours = vpq_compute_single_core(gt_pred_set, CATS, nframes=nframes)
    theirs = REF.vpq_compute_single_core(
        [tuple(x) for x in gt_pred_set], CATS, nframes=nframes)
    for cat in CATS:
        o, t_ = ours[cat], theirs[cat]
        assert o.tp == t_.tp, cat
        assert o.fp == t_.fp, cat
        assert o.fn == t_.fn, cat
        assert o.iou == pytest.approx(t_.iou), cat
        assert o.ids_sum == t_.ids_sum, cat
        assert o.ids_false == t_.ids_false, cat


def _switchy_videos(rng, n_videos=2, n_frames=6):
    """Random videos engineered so ≥2 classes accrue ID switches: pred
    relabels one stuff id and one thing id mid-video (same class, same
    region ⇒ the tube still matches at IoU>0.5, so the switch is counted
    by the reference's ids_memory rule, tools/eval_vpq.py:238-246)."""
    videos = []
    for _ in range(n_videos):
        switch_at = int(rng.integers(2, n_frames - 1))
        frames = []
        for t in range(n_frames):
            gt_map = rng.integers(0, 6, size=(16, 16)).astype(np.uint32)
            pred_map = gt_map.copy()
            noise = rng.random((16, 16)) < 0.1
            pred_map[noise] = rng.integers(0, 6, size=int(noise.sum()))
            gt_segs = {i: (1 if i < 3 else 2) for i in range(1, 6)}
            pred_segs = dict(gt_segs)
            if t >= switch_at:
                # stuff id 2 -> 12, thing id 4 -> 14 (categories unchanged)
                pred_map[pred_map == 2] = 12
                pred_map[pred_map == 4] = 14
                del pred_segs[2], pred_segs[4]
                pred_segs[12], pred_segs[14] = 1, 2
            frames.append((_frame(gt_map, gt_segs),
                           _frame(pred_map, pred_segs)))
        videos.append(_set(frames))
    return videos


@pytest.mark.skipif(REF is None, reason="reference evaluator not importable")
@pytest.mark.parametrize("seed", [11, 22, 33])
def test_vpq_txt_artifacts_byte_identical(seed, tmp_path):
    """vpq-{k}.txt written by our evaluator must be byte-identical to the
    file the reference's own ``vpq_compute`` writes on the same inputs —
    including the aggregate ERRP column, which is the SUM of per-class
    ratios in the All/Things/Stuff rows (tools/eval_vpq.py:100-111,
    374-377), not the aggregate ids_false/ids_sum ratio."""
    rng = np.random.default_rng(seed)
    gt_pred_split = _switchy_videos(rng)

    ours_dir = tmp_path / "ours"
    ref_dir = tmp_path / "ref"
    ours_dir.mkdir()
    ref_dir.mkdir()

    for nframes in (1, 2, 3, 4):
        k = (nframes - 1) * 5
        vpq_compute(gt_pred_split, CATS, nframes, output_dir=str(ours_dir))
        acc = [[] for _ in range(8)]
        REF.vpq_compute(
            [[tuple(x) for x in v] for v in gt_pred_split], CATS, nframes,
            str(ref_dir), *acc)
        ours_txt = (ours_dir / f"vpq-{k}.txt").read_bytes()
        ref_txt = (ref_dir / f"vpq-{k}.txt").read_bytes()
        assert ours_txt == ref_txt, f"vpq-{k}.txt differs"

    # the divergence regime must actually be exercised: at k=0 both
    # classes accrue switches, so the summed per-class ERRP (what the txt
    # All row prints) differs from the aggregate ids_false/ids_sum ratio
    stat = PQStat()
    for video in gt_pred_split:
        stat += vpq_compute_single_core(video, CATS, nframes=1)
    res, _ = stat.pq_average(CATS, isthing=None)
    assert res["ids_false"] > 0
    assert res["ids_errp"] != pytest.approx(
        res["ids_false"] / res["ids_sum"])


@pytest.mark.skipif(REF is None, reason="reference evaluator not importable")
def test_image_pq_golden_vs_reference(rng):
    """Image PQ (nframes=1 per isolated frame) must equal the reference's
    single-frame stats."""
    from slotvps_tpu.eval.pq import pq_compute

    gt_jsons, pred_jsons, gt_pans, pred_pans = [], [], [], []
    for _ in range(4):
        gt_map = rng.integers(0, 6, size=(16, 16)).astype(np.uint32)
        pred_map = gt_map.copy()
        noise = rng.random((16, 16)) < 0.2
        pred_map[noise] = rng.integers(0, 6, size=int(noise.sum()))
        segs = {i: (1 if i < 3 else 2) for i in range(1, 6)}
        (gj, gp), (pj, pp) = _frame(gt_map, segs), _frame(pred_map, segs)
        gt_jsons.append(gj)
        pred_jsons.append(pj)
        gt_pans.append(gp)
        pred_pans.append(pp)

    ours = pq_compute(gt_jsons, pred_jsons, gt_pans, pred_pans, CATS)
    ref_stat = REF.PQStat()
    for gj, pj, gp, pp in zip(gt_jsons, pred_jsons, gt_pans, pred_pans):
        ref_stat += REF.vpq_compute_single_core(
            [(gj, pj, gp, pp, None)], CATS, nframes=1)
    ref_all, _ = ref_stat.pq_average(CATS, isthing=None)
    assert ours["All"]["pq"] == pytest.approx(ref_all["pq"])
    assert ours["All"]["sq"] == pytest.approx(ref_all["sq"])
    assert ours["All"]["rq"] == pytest.approx(ref_all["rq"])
