"""Batched lockstep multi-video inference must match streaming exactly.

VERDICT round-2 ask #2: the shipped CLI must be able to run the benched
configuration (frame t of N videos per device step, video axis sharded
over the mesh — BASELINE config 5; reference dist-eval analog
mmdet/core/evaluation/eval_hooks.py:40-79) and produce artifacts
bit-identical to the streaming path.
"""

import dataclasses

import jax
import numpy as np
import pytest

from slotvps_tpu.config import (Config, ModelConfig, PostprocessConfig,
                                ResNetConfig, SlotHeadConfig)
from slotvps_tpu.inference import (BatchedVideoPipeline, InferencePipeline,
                                   run_video)
from slotvps_tpu.models.detector import init_model


def _compact_cfg():
    """Compact dims (same recipe as dryrun_multichip): rich postproc
    regime at threshold 0.04, fast CPU compile."""
    base = ModelConfig()
    return Config(model=dataclasses.replace(
        base,
        resnet=ResNetConfig(depth=18),
        slot_head=SlotHeadConfig(
            per_dh_num_heads=(1, 1, 1, 1), dh_num_heads=4,
            apply_temporal_query_atten_stages=(2, 3)),
        proposal_num=20,
        postprocess=PostprocessConfig(threshold=0.04)))


def _videos(rng, n_videos, n_frames, h=64, w=128):
    videos = []
    for v in range(n_videos):
        base = rng.standard_normal((1, h, w, 3)).astype(np.float32)
        videos.append([np.roll(base, 4 * t * (v + 1), axis=2)
                       for t in range(n_frames)])
    return videos


def _assert_same(stream, batched):
    for v, (sv, bv) in enumerate(zip(stream, batched)):
        assert len(sv) == len(bv)
        for t, (a, b) in enumerate(zip(sv, bv)):
            np.testing.assert_array_equal(a.sseg, b.sseg,
                                          err_msg=f"sseg v{v} t{t}")
            np.testing.assert_array_equal(a.panoptic, b.panoptic,
                                          err_msg=f"panoptic v{v} t{t}")
            np.testing.assert_array_equal(a.cls_inds, b.cls_inds,
                                          err_msg=f"cls_inds v{v} t{t}")
            np.testing.assert_array_equal(a.obj_ids, b.obj_ids,
                                          err_msg=f"obj_ids v{v} t{t}")
            np.testing.assert_allclose(a.cls_prob, b.cls_prob, rtol=1e-6,
                                       err_msg=f"cls_prob v{v} t{t}")


@pytest.mark.slow
def test_batched_sharded_matches_streaming(rng):
    """2 videos sharded over a 2-device mesh == streaming per video."""
    cfg = _compact_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    videos = _videos(rng, n_videos=2, n_frames=3)

    stream = []
    for v in range(2):
        pipe = InferencePipeline(params, cfg)
        stream.append(run_video(pipe, videos[v]))

    batched = BatchedVideoPipeline(params, cfg, batch=2)
    assert batched.n_devices == 2   # video axis sharded over the CPU mesh
    _assert_same(stream, batched.run_videos(videos))


@pytest.mark.slow
def test_cli_batch_videos_matches_streaming(tmp_path, monkeypatch):
    """CLI --batch_videos artifacts bit-identical to streaming, incl. the
    tail group (3 videos, batch 2 -> one padded group)."""
    import cv2

    import slotvps_tpu.cli.test_eval_vpq as cli
    from slotvps_tpu.config import DataConfig

    n_videos, n_frames = 3, 2
    images = []
    for v in range(1, n_videos + 1):
        for f in range(1, n_frames + 1):
            name = f"{v:04d}_{f:04d}_img.png"
            cv2.imwrite(str(tmp_path / name),
                        np.random.default_rng(v * 100 + f).integers(
                            0, 255, (32, 64, 3)).astype(np.uint8))
            images.append({"id": v * 10000 + f, "file_name": name,
                           "height": 32, "width": 64})
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(
        __import__("json").dumps(
            {"images": images, "categories": [], "annotations": []}))

    cfg = dataclasses.replace(
        _compact_cfg(),
        data=DataConfig(img_scale=(64, 32), nframes_span_test=n_frames))
    monkeypatch.setattr(cli, "named_config", lambda name: cfg)

    def run(extra, out):
        cli.main(["--ann_file", str(ann_file), "--img_prefix",
                  str(tmp_path), "--out", str(tmp_path / out)] + extra)
        import pickle

        with open(str(tmp_path / out).replace(
                ".pkl", "_pred_pans_2ch.pkl"), "rb") as fh:
            return pickle.load(fh)

    stream = run(["--debug_postproc"], "s.pkl")  # flag smoke
    batched = run(["--batch_videos", "2"], "b.pkl")
    assert len(stream) == len(batched) == n_videos * n_frames
    for i, (a, b) in enumerate(zip(stream, batched)):
        np.testing.assert_array_equal(a, b, err_msg=f"frame {i}")


def test_uint8_upload_matches_float(rng):
    """``keep_uint8`` + device normalize must equal the host-normalized
    float path bit-for-bit: the resize happens on the uint8 image in both
    paths and the deferred ``(x - mean) / std`` is the same IEEE f32
    computation (inference._device_normalize)."""
    import jax.numpy as jnp

    from slotvps_tpu.config import DataConfig
    from slotvps_tpu.data.pipeline import preprocess
    from slotvps_tpu.inference import _device_normalize

    img = rng.integers(0, 255, (30, 61, 3)).astype(np.uint8)
    dcfg = DataConfig(img_scale=(64, 32))
    f32, meta_f = preprocess(img, dcfg.img_scale)
    u8, meta_u = preprocess(img, dcfg.img_scale, keep_uint8=True)
    assert u8.dtype == np.uint8 and u8.shape == f32.shape
    assert meta_f == meta_u
    dev = np.asarray(_device_normalize(jnp.asarray(u8), dcfg,
                                       valid_hw=meta_u["img_shape"]))
    np.testing.assert_array_equal(dev, f32)
    # float inputs pass through untouched (trace-time dtype branch)
    assert _device_normalize(jnp.asarray(f32), dcfg) is not None
    np.testing.assert_array_equal(
        np.asarray(_device_normalize(jnp.asarray(f32), dcfg)), f32)


@pytest.mark.slow
def test_batched_single_device_matches_streaming(rng):
    """Local batch > 1 on one device (the real-chip case: lb = batch)."""
    cfg = _compact_cfg()
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    videos = _videos(rng, n_videos=2, n_frames=2)

    stream = []
    for v in range(2):
        pipe = InferencePipeline(params, cfg)
        stream.append(run_video(pipe, videos[v]))

    batched = BatchedVideoPipeline(params, cfg, batch=2,
                                   devices=jax.devices()[:1])
    assert batched.n_devices == 1
    _assert_same(stream, batched.run_videos(videos))
