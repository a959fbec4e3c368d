"""End-to-end pipeline test on a tiny synthetic clip: model -> postproc ->
tracking -> fusion -> VPQ, all through the public API."""

import jax
import numpy as np
import pytest

from slotvps_tpu.config import Config, ModelConfig, PostprocessConfig
from slotvps_tpu.eval.color import CITYSCAPES_CATEGORIES
from slotvps_tpu.eval.fusion import inference_panoptic_video, unify_pan_result
from slotvps_tpu.eval.vpq import final_eval
from slotvps_tpu.inference import InferencePipeline, run_video
from slotvps_tpu.models.detector import init_model
from slotvps_tpu.tracking import TrackState


def test_track_state_basic():
    ts = TrackState()
    emb = np.eye(3, 8, dtype=np.float32)
    ids = ts.start(emb)
    assert ids.tolist() == [0, 1, 2]
    # second frame: 2 instances; first matches pool id 1, second is new
    score = np.array([
        [0.0, 0.1, 9.0, 0.2],   # matches col 2 -> obj id 1
        [5.0, 0.1, 0.2, 0.3],   # col 0 -> new
    ], np.float32)
    ids = ts.update(score, np.ones((2, 8), np.float32))
    assert ids.tolist() == [1, 3]
    assert ts.embeddings.shape[0] == 4


def test_track_state_contested_match():
    """Two candidates claim the same previous id: higher likelihood wins,
    loser gets a fresh id (reference :373-394 'undo if matched before')."""
    ts = TrackState()
    ts.start(np.zeros((2, 4), np.float32))
    score = np.array([
        [0.0, 4.0, 0.0],   # wants obj 0, likelihood lower
        [0.0, 8.0, 0.0],   # wants obj 0, likelihood higher
    ], np.float32)
    ids = ts.update(score, np.arange(8, dtype=np.float32).reshape(2, 4))
    assert ids[1] == 0          # winner keeps obj 0
    assert ids[0] == 2          # demoted -> new id
    # pool embedding for obj 0 replaced by the winner's embedding
    np.testing.assert_array_equal(ts.embeddings[0],
                                  np.array([4, 5, 6, 7], np.float32))


@pytest.mark.slow
def test_pipeline_ori_shape_crop():
    """Input whose height is not /32-aligned (the VIPER 1080p analog:
    here 40 pads to 64): outputs must come back at exactly ori_shape, with
    the padding resized away (reference vps_temporal_slots.py:440-451)."""
    cfg = Config(model=ModelConfig(
        postprocess=PostprocessConfig(threshold=0.04)))
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    pipe = InferencePipeline(params, cfg, image_size=(40, 96))
    rng = np.random.default_rng(0)
    raw = rng.standard_normal((1, 40, 96, 3)).astype(np.float32)
    padded = np.zeros((1, 64, 96, 3), np.float32)
    padded[:, :40] = raw
    res = pipe.process_frame(padded, is_first=True)
    assert res.sseg.shape == (40, 96)
    assert res.panoptic.shape == (40, 96)


@pytest.mark.slow
def test_pipeline_end_to_end_tiny():
    """6-frame clip through the full stack; artifacts scoreable by VPQ."""
    cfg = Config(model=ModelConfig(
        postprocess=PostprocessConfig(threshold=0.04)))
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    pipe = InferencePipeline(params, cfg)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)
    frames = [np.roll(base, t * 4, axis=2) for t in range(6)]
    results = run_video(pipe, frames)
    assert len(results) == 6
    for r in results:
        assert r.sseg.shape == (64, 128)
        assert r.panoptic.shape == (64, 128)
        assert len(r.cls_inds) == len(r.obj_ids) == len(r.cls_prob)
        # panoptic thing ids must be contiguous 11..11+n-1
        vals = np.unique(r.panoptic)
        things = vals[(vals > 10) & (vals != 255)]
        assert things.tolist() == list(range(11, 11 + len(things)))
        assert len(things) == len(r.cls_inds)

    pans_2ch = unify_pan_result(
        [r.sseg for r in results], [r.panoptic for r in results],
        [r.cls_inds for r in results], [r.obj_ids for r in results],
        stuff_area_limit=16)
    pred_pans, pred_json = inference_panoptic_video(
        pans_2ch, None, CITYSCAPES_CATEGORIES)
    assert len(pred_json["annotations"]) == 6
    # self-eval must give VPQ 100
    cats = {c["id"]: c for c in CITYSCAPES_CATEGORIES}
    summary = final_eval(pred_json["annotations"], pred_json["annotations"],
                         pred_pans, pred_pans, cats, verbose=False)
    assert summary["vpq_all"] == pytest.approx(100.0)
