"""End-to-end tuned-vs-exact divergence bounds (VERDICT r3 ask #5).

The production ``--tuned`` stack (bf16 + Pallas DCN + fused postproc with
detect-capacity prefix) is compared whole-pipeline against the exact
f32/XLA path — the configuration golden-matched against the executed
reference — at the production 0.85 keep threshold, in TWO regimes (see
utils/parity.tuned_vs_exact):

  * ``trained``: flagship overfit on a synthetic multi-object scene —
    production-like statistics (scores saturate away from the threshold,
    wide per-pixel slot margins).  The representative parity number:
    bounds are TIGHT.
  * ``calibrated``: doctored random weights packed AT the boundary —
    adversarial amplification of bf16 noise (the round-4 decomposition,
    TUNED_VS_EXACT_DECOMP_r04.json, shows bf16 activations alone
    reproduce the divergence; the Pallas kernels add nothing beyond MXU
    rounding).  Bounds are FLOORS that catch catastrophic regressions.

Two layers of assertion:
  * a live run at reduced resolution (CPU: Pallas interpret mode; TPU:
    compiled) must stay within the adversarial floors, and
  * the committed on-chip artifact TUNED_VS_EXACT_r04.json (produced by
    ``python _tuned_vs_exact.py`` on the TPU at full 1024x2048) must
    record both regimes within their bounds — so a regression that
    widens on-chip divergence can't hide behind a green CPU test.
"""

import json
import os

import jax
import pytest

ON_TPU = jax.default_backend() not in ("cpu",)

# ---- trained regime: the representative production-parity bounds ------
TR_MIN_PAN_MATCHED = 0.98
TR_MIN_SSEG = 0.99
TR_MAX_SCORE_DRIFT = 0.02
TR_MAX_KEPT_UNMATCHED_FRAC = 0.05

# ---- adversarial calibrated regime: regression floors ------------------
# (measured on-chip r4: pan_matched_min 0.46, sseg_min 0.975, drift 0.08,
# unmatched 11/29 — every kept score sits within amplified-bf16 noise of
# the 0.85 boundary BY CONSTRUCTION, so pixel-level agreement is
# regime-dominated, not kernel-quality-dominated)
ADV_MIN_PAN_MATCHED = 0.30
ADV_MIN_SSEG = 0.97
ADV_MAX_SCORE_DRIFT = 0.15
ADV_MAX_KEPT_UNMATCHED_FRAC = 0.60


def _check_adversarial(report):
    agg = report["aggregate"]
    assert agg["pan_agreement_matched_min"] >= ADV_MIN_PAN_MATCHED, agg
    assert agg["sseg_agreement_min"] >= ADV_MIN_SSEG, agg
    assert agg["max_score_drift"] <= ADV_MAX_SCORE_DRIFT, agg
    total = max(agg["n_kept_exact_total"], 1)
    assert agg["kept_unmatched_total"] / total <= \
        ADV_MAX_KEPT_UNMATCHED_FRAC, agg
    # the regime is real: frames keep a population near the boundary
    assert agg["n_kept_exact_total"] >= 4 * report["n_frames"], agg


def _check_trained(report):
    agg = report["aggregate"]
    assert agg["pan_agreement_matched_min"] >= TR_MIN_PAN_MATCHED, agg
    assert agg["sseg_agreement_min"] >= TR_MIN_SSEG, agg
    assert agg["max_score_drift"] <= TR_MAX_SCORE_DRIFT, agg
    total = max(agg["n_kept_exact_total"], 1)
    assert agg["kept_unmatched_total"] / total <= \
        TR_MAX_KEPT_UNMATCHED_FRAC, agg
    # production-scale population: ~12 things + stuff per frame
    assert agg["n_kept_exact_total"] >= 8 * report["n_frames"], agg


@pytest.mark.slow
def test_tuned_vs_exact_live():
    from slotvps_tpu.utils.parity import tuned_vs_exact

    if ON_TPU:
        report = tuned_vs_exact(h=1024, w=2048, n_frames=2)
    else:
        from jax.experimental.pallas import tpu as pltpu

        with pltpu.force_tpu_interpret_mode():
            report = tuned_vs_exact(h=256, w=512, n_frames=2,
                                    target_valid=32)
    _check_adversarial(report)


@pytest.mark.slow
def test_tuned_vs_exact_live_trained():
    """Live coverage of the TRAINED regime (the representative parity
    path) so regressions there can't hide behind the committed artifact
    (ADVICE r4): a short overfit at reduced resolution, checked with
    bounds relaxed for the shorter schedule / smaller scene (scores sit
    closer to the threshold than a full 300-step 1024x2048 run)."""
    from slotvps_tpu.utils.parity import tuned_vs_exact

    if ON_TPU:
        report = tuned_vs_exact(h=1024, w=2048, n_frames=2,
                                regime="trained")
        _check_trained(report)
        return
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        report = tuned_vs_exact(h=256, w=512, n_frames=2,
                                regime="trained", train_steps=150,
                                n_things=6, train_dcn_impl="xla")
    agg = report["aggregate"]
    assert agg["pan_agreement_matched_min"] >= 0.90, agg
    assert agg["sseg_agreement_min"] >= 0.97, agg
    assert agg["max_score_drift"] <= 0.10, agg
    # the regime is real: things + stuff detected every frame
    assert agg["n_kept_exact_total"] >= 4 * report["n_frames"], agg


def test_committed_onchip_artifact():
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "TUNED_VS_EXACT_r05.json")
    if not os.path.exists(path):
        pytest.fail(
            "TUNED_VS_EXACT_r05.json is not committed — run `python "
            "_tuned_vs_exact.py` on the TPU; the trained-regime bounds "
            "are the production parity number and must be asserted "
            "against an on-chip artifact (VERDICT r4 ask #1)")
    with open(path) as fh:
        report = json.load(fh)
    for regime, check in (("trained", _check_trained),
                          ("calibrated", _check_adversarial)):
        section = report[regime]
        assert section["resolution"] == [1024, 2048]
        assert section["threshold"] == 0.85
        assert section["regime"] == regime
        check(section)


def test_committed_decomposition_artifact():
    """The decomposition artifact must show the fused postproc kernels
    nearly clean (their divergence budget is MXU/bf16 rounding of mask
    logits, not algorithmic) and bf16-only reproducing the bulk of the
    full tuned divergence — the evidence that the adversarial regime
    measures amplified numeric noise, not kernel bugs."""
    path = os.path.join(os.path.dirname(__file__), os.pardir,
                        "TUNED_VS_EXACT_DECOMP_r04.json")
    if not os.path.exists(path):
        pytest.skip("decomposition artifact not yet produced this round")
    with open(path) as fh:
        v = json.load(fh)["variants"]
    assert v["fusedpp_only"]["sseg_min"] >= 0.999, v
    assert v["fusedpp_only"]["pan_matched_min"] >= 0.85, v
    # bf16 alone accounts for (at least most of) the full divergence
    assert v["bf16_only"]["pan_matched_min"] <= \
        v["full_tuned"]["pan_matched_min"] + 0.15, v
