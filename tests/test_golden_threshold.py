"""Golden video parity at the PRODUCTION postproc regime (VERDICT r2 ask
#6b).  The main golden suite (tests/test_golden_model.py) runs at
keep-threshold 0.5 because the calibrated random head keeps almost nothing
at the reference default 0.85 — leaving the production regime and the
keep-nothing branch only probabilistically covered.  Here the SAME
doctored reference detector's final class head is re-scaled into two
deterministic 0.85-threshold regimes and compared end-to-end against the
executed reference ``simple_test``:

  * sharpened (x3 logits): many slots clear 0.85 — the production keep
    rule, mask claim, area filter, renumbering and tracking all run hot;
  * flattened (x0.05 logits): NO slot can reach 0.85 — every frame takes
    the keep-nothing branch (reference vps_temporal_slots.py:685-696
    keeps an empty index set; the fused map is stuff-only and the track
    update sees zero rows).

Discovered while building this: the reference has NO working
keep-nothing branch — a frame keeping zero slots crashes it twice over:
``mask_removal`` (on in the shipped config,
configs/cityscapes/r50_fpn_slotvps.py:71) calls ``np.max`` on the empty
kept-class array (vps_temporal_slots.py:578), and even with it off the
panoptic argmax reduces over an empty slot dim
(vps_temporal_slots.py:417).  Both crash sites are pinned below, our
pipeline's graceful empty result is pinned as the deliberate divergence,
and the *reachable* empty edge — stuff kept but NO things (empty
cls_inds/obj_ids, zero-row tracking) — is golden-matched instead.

Reference entry points executed: mmdet/models/detectors/
vps_temporal_slots.py:207-469 (simple_test), :528-807
(PostProcessPanopticInstances at threshold 0.85).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tests import ref_shim  # noqa: E402
from tests.test_golden_model import (H, W, _calibrate_class_head,  # noqa
                                     _doctor, _j, _smooth_img, _t)


@pytest.fixture(scope="module")
def det_and_head():
    det, _ns = ref_shim.build_reference_detector(seed=0)
    _doctor(det)
    _calibrate_class_head(det)
    head = det.image_model.dynamic_mask_head
    last_level = 0
    while hasattr(head, f"head_series_{last_level + 1}"):
        last_level += 1
    last = getattr(head, f"head_series_{last_level}")[-1].class_logits
    w0 = last.weight.detach().clone()
    b0 = last.bias.detach().clone()
    return det, last, (w0, b0)


def _variant_params(det, last, wb0, scale, mask_removal=True,
                    bias_boost=None):
    """Scale the final class head by ``scale`` (argmax-preserving softmax
    sharpening/flattening) and convert the resulting state_dict.
    ``bias_boost=(class, value)`` additionally pins every slot's argmax to
    one class (stuff-only regimes)."""
    from slotvps_tpu.config import r50_fpn_slotvps
    from slotvps_tpu.utils.checkpoint import convert_slotvps_checkpoint

    w0, b0 = wb0
    with torch.no_grad():
        last.weight.copy_(w0 * scale)
        last.bias.copy_(b0 * scale)
        if bias_boost is not None:
            last.bias[bias_boost[0]] += bias_boost[1]
    det.postprocess_panoptic.threshold = 0.85  # reference default
    det.postprocess_panoptic.apply_mask_removal = mask_removal
    sd = {k: v.detach().numpy() for k, v in det.state_dict().items()}
    config = r50_fpn_slotvps()  # PostprocessConfig.threshold = 0.85
    if not mask_removal:
        config = dataclasses.replace(config, model=dataclasses.replace(
            config.model, postprocess=dataclasses.replace(
                config.model.postprocess, apply_mask_removal=False)))
    params = convert_slotvps_checkpoint(sd, config.model)
    return config, params


def _run_video_parity(det, config, params, n_things_per_frame):
    """3-frame video through reference simple_test vs InferencePipeline;
    returns nothing — asserts maps/classes/scores/ids per frame and that
    the per-frame kept-thing counts satisfy ``n_things_per_frame(n)``."""
    from slotvps_tpu.inference import InferencePipeline

    rng = np.random.default_rng(3)
    frames = [_smooth_img(rng) for _ in range(3)]
    pipe = InferencePipeline(params, config)
    counts = []
    for t, frame in enumerate(frames):
        iid = 7 * 10000 + (t + 1)
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

        assert (mine.sseg != ref_sseg).mean() < 2e-3, f"frame {t}: sseg"
        assert (mine.panoptic != ref_pan).mean() < 2e-3, \
            f"frame {t}: panoptic"
        assert mine.cls_inds.tolist() == ref_cls.tolist(), \
            f"frame {t}: cls_inds {mine.cls_inds} vs {ref_cls}"
        np.testing.assert_allclose(mine.cls_prob, ref_prob, rtol=2e-3,
                                   atol=2e-4)
        assert mine.obj_ids.tolist() == ref_ids.tolist(), \
            f"frame {t}: obj_ids {mine.obj_ids} vs {ref_ids}"
        counts.append(len(ref_cls))
    assert n_things_per_frame(counts), counts


def test_production_threshold_video(det_and_head):
    """Sharpened head at threshold 0.85: the production keep rule fires on
    real (>0.85) scores and the whole kept-path matches the reference."""
    det, last, wb0 = det_and_head
    config, params = _variant_params(det, last, wb0, scale=3.0)
    _run_video_parity(det, config, params,
                      lambda c: sum(c) >= 3 and max(c) >= 2)


def test_no_things_kept_video(det_and_head):
    """Stuff-pinned head at threshold 0.85 (every slot confidently
    predicts stuff class 2): slots ARE kept so the reference can run, but
    no THING survives — empty cls_inds/obj_ids, zero-row tracking, and a
    stuff-only panoptic map, golden-matched frame by frame under the
    shipped production config (mask_removal on)."""
    det, last, wb0 = det_and_head
    config, params = _variant_params(det, last, wb0, scale=0.05,
                                     bias_boost=(2, 10.0))
    _run_video_parity(det, config, params, lambda c: sum(c) == 0)


def test_keep_nothing_reference_crash_divergence(det_and_head):
    """A frame keeping ZERO slots crashes the reference under BOTH
    mask_removal settings (np.max over the empty kept-class array,
    vps_temporal_slots.py:578, and the empty-dim panoptic argmax,
    vps_temporal_slots.py:417).  Pin both crash sites, and pin that our
    pipeline handles the same configs gracefully (deliberate divergence:
    a crash is not matchable)."""
    from slotvps_tpu.inference import InferencePipeline

    det, last, wb0 = det_and_head
    rng = np.random.default_rng(3)
    frame = _smooth_img(rng)
    meta = dict(iid=8 * 10000 + 1, filename="f0.png",
                ori_shape=(H, W, 3), img_shape=(H, W, 3))

    config, params = _variant_params(det, last, wb0, scale=0.05,
                                     mask_removal=True)
    with torch.no_grad(), pytest.raises(ValueError, match="zero-size"):
        det.simple_test(_t(frame), [meta], ref_img=[_t(frame)])
    mine = InferencePipeline(params, config).process_frame(
        np.asarray(_j(frame)), is_first=True)
    assert mine.cls_inds.size == 0 and mine.obj_ids.size == 0
    # zero slots -> nothing to fuse: the whole map is void (255)
    assert np.unique(mine.panoptic).tolist() == [255]

    config2, params2 = _variant_params(det, last, wb0, scale=0.05,
                                       mask_removal=False)
    with torch.no_grad(), pytest.raises(IndexError, match="non-zero"):
        det.simple_test(_t(frame), [meta], ref_img=[_t(frame)])
    mine2 = InferencePipeline(params2, config2).process_frame(
        np.asarray(_j(frame)), is_first=True)
    assert mine2.cls_inds.size == 0 and mine2.obj_ids.size == 0
