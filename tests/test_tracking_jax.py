"""On-device tracking (tracking_jax) vs the host-loop port (tracking.py),
and the scan-based whole-clip runner vs the streaming pipeline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.tracking import TrackState
from slotvps_tpu.tracking_jax import (
    init_pool, start_pool, track_step, update_pool)


def _random_case(rng, n_cur, n_pool, cap=16, d=8):
    cur = rng.standard_normal((n_cur, d)).astype(np.float32)
    pool_emb = rng.standard_normal((n_pool, d)).astype(np.float32)
    score = rng.standard_normal((n_cur, n_pool + 1)).astype(np.float32) * 3
    return cur, pool_emb, score


@pytest.mark.parametrize("seed", range(8))
def test_update_matches_host_loop(seed):
    rng = np.random.default_rng(seed)
    n_cur = int(rng.integers(1, 7))
    n_pool = int(rng.integers(1, 6))
    cap = 16
    cur, pool_emb, score = _random_case(rng, n_cur, n_pool, cap)

    host = TrackState()
    host.embeddings = pool_emb.copy()
    host_ids = host.update(score.copy(), cur)

    pool = init_pool(cap, cur.shape[1])
    pool = pool._replace(
        embeddings=pool.embeddings.at[:n_pool].set(pool_emb),
        size=jnp.asarray(n_pool, jnp.int32),
        started=jnp.ones((), bool))
    # pad rows/cols to fixed capacity
    k = 8
    score_pad = np.full((k, cap + 1), 0.0, np.float32)
    score_pad[:n_cur, :n_pool + 1] = score
    cur_pad = np.zeros((k, cur.shape[1]), np.float32)
    cur_pad[:n_cur] = cur
    valid = np.zeros((k,), bool)
    valid[:n_cur] = True

    ids, new_pool = jax.jit(update_pool)(
        pool, jnp.asarray(score_pad), jnp.asarray(cur_pad),
        jnp.asarray(valid))
    ids = np.asarray(ids)
    assert ids[:n_cur].tolist() == host_ids.tolist(), (
        ids[:n_cur], host_ids)
    assert int(new_pool.size) == host.embeddings.shape[0]
    np.testing.assert_allclose(
        np.asarray(new_pool.embeddings[:int(new_pool.size)]),
        host.embeddings, rtol=1e-6)


def test_start_pool_matches_host():
    rng = np.random.default_rng(0)
    cur = rng.standard_normal((3, 4)).astype(np.float32)
    host = TrackState()
    host_ids = host.start(cur)

    pool = init_pool(8, 4)
    cur_pad = np.zeros((6, 4), np.float32)
    cur_pad[:3] = cur
    valid = np.array([True, True, True, False, False, False])
    ids, pool2 = jax.jit(start_pool)(pool, jnp.asarray(cur_pad),
                                     jnp.asarray(valid))
    assert np.asarray(ids)[:3].tolist() == host_ids.tolist()
    assert int(pool2.size) == 3
    np.testing.assert_allclose(np.asarray(pool2.embeddings[:3]), cur)


def test_update_pool_at_capacity_boundary():
    """Exactly filling the pool must still match the host loop, and an
    over-capacity append must NOT clobber slot cap-1 (the old clip-based
    scatter folded slot=p onto p-1, racing a legitimate winner there)."""
    cap, d = 4, 8
    rng = np.random.default_rng(3)
    pool_emb = rng.standard_normal((cap, d)).astype(np.float32)  # full pool
    cur = rng.standard_normal((2, d)).astype(np.float32)
    score = np.full((2, cap + 1), -5.0, np.float32)
    score[0, cap] = 5.0      # row 0 wins pool id cap-1 (slot cap-1)
    score[1, 0] = 5.0        # row 1 is new -> id cap (over capacity)

    host = TrackState()
    host.embeddings = pool_emb.copy()
    host_ids = host.update(score.copy(), cur)

    pool = init_pool(cap, d)._replace(
        embeddings=jnp.asarray(pool_emb),
        size=jnp.asarray(cap, jnp.int32),
        started=jnp.ones((), bool))
    ids, pool2 = jax.jit(update_pool)(
        pool, jnp.asarray(score), jnp.asarray(cur),
        jnp.ones((2,), bool))
    assert np.asarray(ids).tolist() == host_ids.tolist()
    # winner's embedding landed in slot cap-1; the dropped append did not
    # touch any slot
    np.testing.assert_allclose(np.asarray(pool2.embeddings),
                               host.embeddings[:cap], rtol=1e-6)
    assert int(pool2.size) == cap


def test_scanner_warns_on_pool_saturation():
    """The scan readback path must warn when assigned ids reach capacity
    (silent-divergence guard for crowded clips)."""
    import warnings

    from slotvps_tpu.inference import _warn_pool_saturation

    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _warn_pool_saturation(np.array([[0, 1, -1], [2, 3, -1]]), 4)
    assert not rec
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        _warn_pool_saturation(np.array([[0, 1, -1], [2, 4, -1]]), 4)
    assert any("pool saturated" in str(w.message) for w in rec)


def test_track_step_dispatch():
    pool = init_pool(8, 4)
    cur = jnp.ones((2, 4), jnp.float32)
    valid = jnp.array([True, True])
    score = jnp.zeros((2, 9), jnp.float32)
    ids, pool = jax.jit(track_step)(pool, score, cur, valid)
    assert np.asarray(ids).tolist() == [0, 1]       # started
    ids2, pool = jax.jit(track_step)(pool, score, cur, valid)
    assert bool(pool.started)


@pytest.mark.slow
def test_video_scanner_matches_streaming_pipeline():
    """VideoScanner (one lax.scan per clip) must emit exactly what the
    per-frame InferencePipeline emits."""
    from slotvps_tpu.config import Config, ModelConfig, PostprocessConfig
    from slotvps_tpu.inference import InferencePipeline, VideoScanner, run_video
    from slotvps_tpu.models.detector import init_model

    cfg = Config(model=ModelConfig(
        postprocess=PostprocessConfig(threshold=0.04)))
    params = init_model(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, 64, 128, 3)).astype(np.float32)
    frames = [np.roll(base, t * 4, axis=2) for t in range(4)]

    stream = run_video(InferencePipeline(params, cfg), frames)
    scan = VideoScanner(params, cfg, pool_capacity=128).run_video(frames)
    assert len(stream) == len(scan) == 4
    for t, (a, b) in enumerate(zip(stream, scan)):
        np.testing.assert_array_equal(a.panoptic, b.panoptic, err_msg=f"t={t}")
        np.testing.assert_array_equal(a.sseg, b.sseg)
        assert a.cls_inds.tolist() == b.cls_inds.tolist()
        assert a.obj_ids.tolist() == b.obj_ids.tolist(), (
            t, a.obj_ids, b.obj_ids)
        np.testing.assert_allclose(a.cls_prob, b.cls_prob, rtol=1e-5)
