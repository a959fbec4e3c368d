"""Fused-postproc detection-capacity compaction (PostprocessConfig.
detect_capacity).

The slot permutation puts every valid slot in a contiguous prefix
(models/postprocess.py:_slot_order), so the fused pipeline may run on a
[cap, h, w] prefix whenever at most ``cap`` slots are valid, with a
``lax.cond`` falling back to the full pipeline otherwise.  Both routes
must be bit-identical to the XLA impl (which golden-matches the numpy
walk of the reference PostProcessPanopticInstances, reference
mmdet/models/detectors/vps_temporal_slots.py:528-807).
"""
import dataclasses

import jax
import numpy as np
import pytest

from slotvps_tpu.config import PostprocessConfig
from slotvps_tpu.models.postprocess import postprocess_frame

K, C, D = 24, 20, 8


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _interpret_ctx():
    from jax.experimental.pallas import tpu as pltpu
    return (pltpu.force_tpu_interpret_mode()
            if jax.default_backend() == "cpu" else _null())


def _case(rng, thr):
    logits = rng.standard_normal((K, C)).astype(np.float32) * 2
    masks = rng.standard_normal((K, 16, 24)).astype(np.float32) * 2
    for k in range(0, K, 3):
        y, x = rng.integers(0, 12), rng.integers(0, 18)
        masks[k, y:y + 6, x:x + 8] += 6.0
    out_size = (64, 96)
    fcn = rng.standard_normal((*out_size, 19)).astype(np.float32)
    emb = rng.standard_normal((K, D)).astype(np.float32)
    args = (jax.numpy.asarray(logits), jax.numpy.asarray(masks),
            jax.numpy.asarray(emb), jax.numpy.asarray(fcn))
    return args, out_size, PostprocessConfig(threshold=thr)


def _assert_same(a, b):
    for f in ("kept", "panoptic", "thing_rank", "sseg", "n_kept",
              "n_things"):
        np.testing.assert_array_equal(np.asarray(getattr(a, f)),
                                      np.asarray(getattr(b, f)), err_msg=f)


@pytest.mark.parametrize("seed,cap", [(0, 8), (1, 8), (2, 16)])
def test_capacity_sliced_branch_exact(seed, cap):
    """thr=0.6 keeps few slots (< cap): the sliced branch runs and must
    match both the uncapped fused path and the XLA reference impl."""
    rng = np.random.default_rng(seed)
    args, out_size, cfg = _case(rng, thr=0.6)
    n_valid = _n_valid(args[0], cfg)
    assert n_valid <= cap, "case must exercise the sliced branch"
    ref = postprocess_frame(*args, out_size, cfg)
    with _interpret_ctx():
        capped = postprocess_frame(*args, out_size, dataclasses.replace(
            cfg, impl="fused", detect_capacity=cap))
        uncapped = postprocess_frame(*args, out_size, dataclasses.replace(
            cfg, impl="fused", detect_capacity=0))
    _assert_same(capped, ref)
    _assert_same(capped, uncapped)


def test_capacity_overflow_falls_back_to_full():
    """thr=0.05 makes nearly every slot valid (> cap): the cond takes the
    full branch; results still exact vs the XLA impl."""
    rng = np.random.default_rng(3)
    args, out_size, cfg = _case(rng, thr=0.05)
    cap = 8
    assert _n_valid(args[0], cfg) > cap
    ref = postprocess_frame(*args, out_size, cfg)
    with _interpret_ctx():
        capped = postprocess_frame(*args, out_size, dataclasses.replace(
            cfg, impl="fused", detect_capacity=cap))
    _assert_same(capped, ref)


def test_capacity_at_exact_boundary():
    """n_valid == cap exactly: the sliced branch is taken (<=) and every
    valid slot is inside the prefix."""
    rng = np.random.default_rng(4)
    args, out_size, cfg = _case(rng, thr=0.6)
    n_valid = _n_valid(args[0], cfg)
    if n_valid == 0:
        pytest.skip("seed kept nothing")
    cap = int(n_valid)
    ref = postprocess_frame(*args, out_size, cfg)
    with _interpret_ctx():
        capped = postprocess_frame(*args, out_size, dataclasses.replace(
            cfg, impl="fused", detect_capacity=cap))
    _assert_same(capped, ref)


def _n_valid(logits, cfg):
    p = np.asarray(jax.nn.softmax(logits, axis=-1))
    scores, classes = p.max(-1), p.argmax(-1)
    return int(((classes != cfg.num_classes - 1)
                & (scores > cfg.threshold)).sum())


def test_capacity_half_tier_exact():
    """The tiered ladder's HALF-capacity branch (n_valid <= cap//2) must
    be bit-identical too — a typical production frame (10-40 valid of
    100) takes this branch."""
    rng = np.random.default_rng(5)
    args, out_size, cfg = _case(rng, thr=0.6)
    n_valid = _n_valid(args[0], cfg)
    if n_valid == 0:
        pytest.skip("seed kept nothing")
    cap = int(2 * n_valid) + 2  # half = n_valid+1 > n_valid => half tier
    assert n_valid <= cap // 2
    ref = postprocess_frame(*args, out_size, cfg)
    with _interpret_ctx():
        capped = postprocess_frame(*args, out_size, dataclasses.replace(
            cfg, impl="fused", detect_capacity=cap))
    _assert_same(capped, ref)
