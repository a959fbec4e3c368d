"""Tuned-vs-exact end-to-end divergence measurement (VERDICT r3 ask #5).

The production ``--tuned`` stack (bf16 activations + Pallas one-hot-matmul
DCN + fused Pallas postproc with detect-capacity prefix) has per-kernel
parity tests, but the *end-to-end* question — how often does a 1-ulp
score flip cross the sharp keep/claim thresholds (reference
vps_temporal_slots.py:606-608,685-696) at the production 0.85 keep rule —
needs a whole-pipeline measurement in the calibrated detection regime.

``tuned_vs_exact`` runs the same calibrated parameters through

  * the EXACT pipeline: f32 activations, XLA-gather DCN, full-resolution
    semantic logits, pure-XLA postprocessing (the configuration whose
    outputs are golden-matched bit-for-bit against the executed reference
    in tests/test_golden_model.py / test_golden_threshold.py), and
  * the TUNED pipeline: bf16 compute, Pallas DCN at the production
    per-level halos, fused_sseg quarter-res logits, fused postproc
    kernels with the detect-capacity prefix,

streaming several frames (each frame carries the previous frame's
features, as the serving pipeline does — so divergence COMPOUNDS the way
it would in production), and reports pixel agreement of the panoptic /
semantic maps, kept-set deltas, and score drift.

Run on the TPU by ``_tuned_vs_exact.py`` (repo root) at 1024x2048 to
produce the committed ``TUNED_VS_EXACT_r04.json``; exercised at reduced
resolution on CPU (Pallas interpret mode) by
tests/test_tuned_vs_exact.py, which asserts the same bounds.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import numpy as np


def smooth_img(rng, h: int, w: int, scale: int = 16) -> np.ndarray:
    """Low-frequency random image (upsampled coarse noise) — spatially
    structured features, far fewer argmax ties than white noise.  Same
    recipe as the golden suite (tests/test_golden_model.py:_smooth_img)."""
    import cv2

    coarse = rng.standard_normal((h // scale, w // scale, 3))
    img = cv2.resize(coarse.astype(np.float32), (w, h),
                     interpolation=cv2.INTER_LINEAR)
    return img + 0.05 * rng.standard_normal((h, w, 3)).astype(np.float32)


def _kept_list(res) -> List[Tuple[int, float]]:
    kept = np.asarray(res.kept, bool)
    labels = np.asarray(res.labels)[kept]
    scores = np.asarray(res.scores)[kept]
    order = np.lexsort((scores, labels))
    return list(zip(labels[order].tolist(), scores[order].tolist()))


def _match_relabel(pan_a: np.ndarray, pan_b: np.ndarray) -> np.ndarray:
    """Relabel ``pan_b``'s segment ids onto ``pan_a``'s by greedy maximum
    pixel overlap (injective).  Removes pure *rank renumbering*
    divergence — two pipelines keeping the same segments but sorting two
    near-equal scores differently get 100% matched agreement — while real
    kept-set differences still show up as disagreement."""
    a = pan_a.astype(np.int64).ravel()
    b = pan_b.astype(np.int64).ravel()
    pairs, counts = np.unique(a * (1 << 20) + b, return_counts=True)
    ids_a, ids_b = pairs >> 20, pairs & ((1 << 20) - 1)
    order = np.argsort(counts)[::-1]
    mapping: Dict[int, int] = {}
    used_a = set()
    for i in order:
        sa, sb = int(ids_a[i]), int(ids_b[i])
        if sb not in mapping and sa not in used_a:
            mapping[sb] = sa
            used_a.add(sa)
    out = pan_b.copy()
    for sb, sa in mapping.items():
        if sb != sa:
            out[pan_b == sb] = sa
    return out


def compare_results(exact, tuned) -> Dict:
    """Per-frame divergence metrics between two PostprocResults."""
    e_pan = np.asarray(exact.panoptic)
    t_pan = np.asarray(tuned.panoptic)
    e_sseg = np.asarray(exact.sseg)
    t_sseg = np.asarray(tuned.sseg)
    e_kept, t_kept = _kept_list(exact), _kept_list(tuned)

    # kept-set delta: greedy label-wise matching; leftovers on either
    # side are keep-boundary flips
    drift = 0.0
    by_label: Dict[int, Tuple[List[float], List[float]]] = {}
    for lab, sc in e_kept:
        by_label.setdefault(lab, ([], []))[0].append(sc)
    for lab, sc in t_kept:
        by_label.setdefault(lab, ([], []))[1].append(sc)
    unmatched = 0
    for lab, (se, st) in by_label.items():
        n = min(len(se), len(st))
        unmatched += abs(len(se) - len(st))
        # score-sorted pairing within a label (lists already sorted)
        for i in range(n):
            drift = max(drift, abs(se[-1 - i] - st[-1 - i]))

    t_pan_matched = _match_relabel(e_pan, t_pan)
    return {
        "sseg_agreement": float((e_sseg == t_sseg).mean()),
        "pan_agreement": float((e_pan == t_pan).mean()),
        "pan_agreement_matched": float((e_pan == t_pan_matched).mean()),
        "n_kept_exact": int(np.asarray(exact.n_kept)),
        "n_kept_tuned": int(np.asarray(tuned.n_kept)),
        "n_things_exact": int(np.asarray(exact.n_things)),
        "n_things_tuned": int(np.asarray(tuned.n_things)),
        "kept_unmatched": int(unmatched),
        "max_score_drift": float(drift),
    }


def tuned_vs_exact(
    config_name: str = "r50_fpn_slotvps",
    h: int = 1024,
    w: int = 2048,
    n_frames: int = 4,
    seed: int = 0,
    target_valid: int = 48,
    halos: Tuple[int, ...] = (2, 3, 4, 6),
    regime: str = "calibrated",
    train_steps: int = 300,
    n_things: int = 12,
    train_dcn_impl: str = "pallas",
) -> Dict:
    """Run the tuned-vs-exact comparison; returns the report dict
    (per-frame metrics + aggregates).

    Two regimes (the committed artifact records both):

    * ``calibrated`` — doctored random weights whose class head is
      rescaled so ~``target_valid`` slots *just* clear the 0.85 keep
      rule.  This is ADVERSARIAL by construction: the calibration
      multiplies the raw slot logits ~10-15x (their std is ~0.3, a
      trained head's is ~3+), so bf16 feature noise is amplified by the
      same factor and every kept score sits within noise of the
      boundary.  A round-4 decomposition (bf16-only / pallas-only /
      fused-postproc-only variants) showed bf16 activations alone
      reproduce the full divergence — the Pallas kernels add nothing
      beyond their own MXU-precision rounding.  Useful as a worst-case
      boundary-sensitivity bound, NOT as a production parity number.
    * ``trained`` — the flagship model overfit on a synthetic
      multi-object scene (utils/synthetic.py) until scores saturate,
      like any production checkpoint: kept scores sit far from the
      threshold and per-pixel slot margins are wide, so the same bf16
      noise flips (almost) nothing.  This is the regime the sharp
      keep/claim thresholds (reference vps_temporal_slots.py:606-608,
      685-696) actually operate in.
    """
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.config import named_config
    from slotvps_tpu.models.detector import (decode_pair, extract_features,
                                             init_model)
    from slotvps_tpu.models.postprocess import postprocess_frame
    from slotvps_tpu.utils.calibration import (calibrate_class_head,
                                               doctor_params)

    base = named_config(config_name).model
    exact_cfg = dataclasses.replace(
        base, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="xla", fused_sseg=False),
        postprocess=dataclasses.replace(base.postprocess, impl="jax"))
    tuned_cfg = dataclasses.replace(
        base, compute_dtype="bfloat16",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="pallas", fused_sseg=True,
            dcn_halo=halos[:base.semantic_head.num_levels]),
        postprocess=dataclasses.replace(base.postprocess, impl="fused"))

    if regime == "trained":
        from slotvps_tpu.utils.synthetic import (make_scene, overfit,
                                                 scene_frames,
                                                 scene_train_batch)

        scene = make_scene(h, w, n_things=n_things, seed=seed)
        batch = scene_train_batch(scene)
        # train with the Pallas custom-vjp DCN by default: the XLA-gather
        # DCN backward materializes ~1 GB gather temps per level at full
        # resolution (44 GB > 15.75 GB HBM on one v5e); the col2im
        # one-hot-matmul backward streams them (ops/pallas/
        # deform_conv.py).  The CPU live test passes ``train_dcn_impl=
        # "xla"`` — at reduced resolution the temps are small and XLA is
        # far faster than Pallas interpret mode.  Zero-init offset convs
        # stay well inside the production halos over an overfit run
        # (measured + ASSERTED below against the per-level halos), so the
        # halo contract is honored and the trained weights are valid for
        # BOTH inference pipelines.
        train_cfg = dataclasses.replace(
            exact_cfg, semantic_head=dataclasses.replace(
                exact_cfg.semantic_head, dcn_impl=train_dcn_impl,
                dcn_halo=halos[:base.semantic_head.num_levels]))
        print(f"# parity: overfitting {train_steps} steps at {h}x{w} "
              f"(dcn_impl={train_dcn_impl}; first step compiles)",
              flush=True)
        params = overfit(train_cfg, batch, steps=train_steps,
                         seed=seed, log_every=50)
        print("# parity: overfit done; measuring DCN offsets", flush=True)
        frames = [f[0] for f in scene_frames(scene, n_frames, shift=16)]
        from slotvps_tpu.utils.diagnostics import measure_max_dcn_offset
        max_off = measure_max_dcn_offset(params, exact_cfg,
                                         image=jnp.asarray(frames[0][None]))
        # the halo contract must hold or the tuned pipeline silently
        # clamps samples the exact pipeline doesn't — which would corrupt
        # the representative parity number; fail loudly instead
        eff = halos[:base.semantic_head.num_levels]
        for lvl, (off, halo) in enumerate(zip(max_off, eff)):
            assert float(off) <= halo, (
                f"trained conv_offset head emits offsets up to "
                f"{float(off):.2f} px at level P{lvl + 2} but the tuned "
                f"pipeline's halo is {halo} px — samples would clamp; "
                f"raise the halo or shorten the overfit run")
        calib = {"scale": 1.0, "n_valid_probe": -1,
                 "max_abs_offset": [round(float(v), 3) for v in max_off]}
    else:
        params = init_model(jax.random.PRNGKey(seed), exact_cfg)
        params = doctor_params(params, jax.random.PRNGKey(seed + 1))

        @jax.jit
        def _probe(params, img1):
            f = extract_features(params, exact_cfg, img1)
            return decode_pair(params, exact_cfg, f, f).pred_logits[0]

        rng = np.random.default_rng(seed + 2)
        frames = [smooth_img(rng, h, w) for _ in range(n_frames)]
        probe = jnp.asarray(frames[0][None, ::4, ::4])
        params, calib = calibrate_class_head(
            params, _probe(params, probe), jax.random.PRNGKey(seed + 3),
            target_valid=target_valid,
            threshold=base.postprocess.threshold)

    def make_step(cfg):
        @jax.jit
        def step(params, img, ref_feats):
            cur = extract_features(params, cfg, img)
            outs = decode_pair(params, cfg, ref_feats, cur)
            post = postprocess_frame(
                outs.pred_logits[0], outs.pred_masks[0],
                outs.embeddings[0], outs.fcn_output[0], (h, w),
                cfg.postprocess)
            return cur, post

        @jax.jit
        def extract(params, img):
            return extract_features(params, cfg, img)

        return step, extract

    e_step, e_extract = make_step(exact_cfg)
    t_step, t_extract = make_step(tuned_cfg)

    img0 = jnp.asarray(frames[0][None])
    print("# parity: compiling exact + tuned pipelines", flush=True)
    e_feats, t_feats = e_extract(params, img0), t_extract(params, img0)
    per_frame = []
    for t, frame in enumerate(frames):
        img = jnp.asarray(frame[None])
        e_feats, e_post = e_step(params, img, e_feats)
        t_feats, t_post = t_step(params, img, t_feats)
        m = compare_results(e_post, t_post)
        m["frame"] = t
        per_frame.append(m)
        print(f"# parity: frame {t}: pan_matched="
              f"{m['pan_agreement_matched']:.4f} kept "
              f"{m['n_kept_exact']}/{m['n_kept_tuned']}", flush=True)

    agg = {
        "pan_agreement_matched_min": min(
            m["pan_agreement_matched"] for m in per_frame),
        "pan_agreement_matched_mean": float(np.mean(
            [m["pan_agreement_matched"] for m in per_frame])),
        "sseg_agreement_min": min(m["sseg_agreement"] for m in per_frame),
        "kept_unmatched_total": sum(m["kept_unmatched"] for m in per_frame),
        "n_kept_exact_total": sum(m["n_kept_exact"] for m in per_frame),
        "max_score_drift": max(m["max_score_drift"] for m in per_frame),
        "max_n_kept_delta": max(
            abs(m["n_kept_exact"] - m["n_kept_tuned"]) for m in per_frame),
    }
    return {
        "config": config_name,
        "resolution": [h, w],
        "n_frames": n_frames,
        "threshold": base.postprocess.threshold,
        "halos": list(halos[:base.semantic_head.num_levels]),
        "regime": regime,
        "train_steps": train_steps if regime == "trained" else 0,
        "calib": calib,
        "per_frame": per_frame,
        "aggregate": agg,
    }
