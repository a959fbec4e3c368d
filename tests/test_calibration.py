"""Pure-JAX detection-regime calibration (utils/calibration.py): doctored
+ calibrated random-init params must keep a realistic slot population at
the production threshold 0.85 — the regime bench.py measures (a real
Cityscapes frame keeps tens of segments,
reference vps_temporal_slots.py:659-807)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.config import named_config
from slotvps_tpu.models.detector import (decode_pair, extract_features,
                                         init_model)
from slotvps_tpu.models.postprocess import postprocess_frame
from slotvps_tpu.utils.calibration import (calibrate_class_head,
                                           doctor_params)

H, W = 128, 256


@pytest.fixture(scope="module")
def calibrated():
    cfg = named_config("r50_fpn_slotvps").model
    params = init_model(jax.random.PRNGKey(0), cfg)
    params = doctor_params(params, jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)

    @jax.jit
    def probe(params, img):
        f = extract_features(params, cfg, img)
        return decode_pair(params, cfg, f, f)

    logits = probe(params, img).pred_logits[0]
    params, info = calibrate_class_head(
        params, logits, jax.random.PRNGKey(2), target_valid=40,
        threshold=cfg.postprocess.threshold)
    outs = probe(params, img)
    return cfg, params, outs, info


def test_probe_count_hits_target(calibrated):
    _, _, _, info = calibrated
    assert 35 <= info["n_valid_probe"] <= 60, info


def test_kept_population_at_production_threshold(calibrated):
    cfg, params, outs, _ = calibrated
    res = postprocess_frame(
        outs.pred_logits[0], outs.pred_masks[0], outs.embeddings[0],
        outs.fcn_output[0], (H, W), cfg.postprocess)
    n_kept = int(res.n_kept)
    n_things = int(res.n_things)
    # mask removal / area filtering may drop some of the ~40 valid slots,
    # but a healthy population must survive, with things among them —
    # the claim scan and small-area passes then do real work
    assert n_kept >= 10, (n_kept, n_things)
    assert n_things >= 5, (n_kept, n_things)


def test_doctor_keeps_offsets_within_halo(calibrated):
    cfg, params, _, _ = calibrated
    for blk in params["semantic_head"]["tower"]:
        assert float(jnp.abs(blk["offset"]["b"]).max()) <= 1.5
        assert float(jnp.abs(blk["offset"]["w"]).max()) == 0.0


def test_uncalibrated_init_keeps_nothing():
    """The regression the calibration exists to avoid: raw init keeps ~0
    at 0.85, so benching it would measure the empty branch."""
    cfg = named_config("r50_fpn_slotvps").model
    params = init_model(jax.random.PRNGKey(0), cfg)

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, H, W, 3)), jnp.float32)

    @jax.jit
    def probe(params, img):
        f = extract_features(params, cfg, img)
        return decode_pair(params, cfg, f, f)

    outs = probe(params, img)
    probs = jax.nn.softmax(outs.pred_logits[0], axis=-1)
    valid = (probs.argmax(-1) != cfg.postprocess.num_classes - 1) \
        & (probs.max(-1) > cfg.postprocess.threshold)
    assert int(valid.sum()) <= 2
