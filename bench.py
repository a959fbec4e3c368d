"""Benchmark: VPS frames/sec/chip at 1024x2048 (Cityscapes-VPS shape).

Measures the full per-frame device step of the flagship r50_fpn_slotvps
model — backbone + FPN + DCN semantic head + 7-stage slot decoder +
on-device panoptic post-processing — exactly what the reference spends its
per-frame wall clock on (reference tools/test_vpq.py:23-59 +
vps_temporal_slots.py:207-469).  Steady-state: each frame reuses the
previous frame's backbone features as its reference features, as the
streaming pipeline does.  BATCH videos are processed in parallel
(data-parallel batched multi-video inference, BASELINE.json config 5 —
how the 50-video eval runs at max throughput).

TWO detection regimes are measured (VERDICT r4 ask #3):

  * ``trained`` (the HEADLINE): the flagship overfit on a synthetic
    multi-object scene (utils/synthetic.py) — production-like mask
    statistics: well-separated confident masks, mask removal rejects few,
    n_kept ~15-25 incl. stuff.  Overfit params are cached in /tmp so
    repeated runs skip the ~300-step training.
  * ``calibrated``: doctored random weights whose class head is bisected
    so ~48 slots clear the 0.85 keep rule on white-noise frames —
    heavier VALID load but doctored-random masks overlap so mask removal
    rejects ~80%.  Kept for round-over-round comparability
    (BENCH_r03/r04 measured this regime).

Also records B=1 streaming latency (``latency_ms_b1``, VERDICT r4 ask
#8) — the reference's per-frame loop is a latency workload.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip",
   "vs_baseline": x, "regimes": {...}, "latency_ms_b1": ...}

``vs_baseline`` compares against the reference PyTorch path's per-frame
rate.  The reference publishes no throughput (BASELINE.md), so the
denominator is MEASURED: ``_measure_baseline.py`` times the executed
reference model (via tests/ref_shim) end-to-end through ``simple_test``
on this host's CPU and projects a generous V100 rate (linear pixel
scaling + the full CPU->V100 GEMM-peak ratio applied to the whole path,
including its host-side numpy/PIL postproc — every assumption
overestimates the reference, so vs_baseline is a lower bound).  The
derivation + raw numbers live in BASELINE_MEASURED.json (committed) and
BASELINE.md.  Fallback when the file is absent: 1.0 frame/s.
The north-star target is vs_baseline >= 10 (BASELINE.json).

Env knobs: BENCH_REGIMES=trained,calibrated  BENCH_BATCH=8
BENCH_HALOS=2,3,4,6  BENCH_TRACE=<dir>  BENCH_LATENCY=1
BENCH_OVERFIT_STEPS=300  (BENCH_CALIB/BENCH_TARGET_VALID/... as before)
"""

import dataclasses
import json
import os
import pickle
import sys
import time

import numpy as np

_bm = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BASELINE_MEASURED.json")
if os.path.exists(_bm):
    with open(_bm) as _fh:
        BASELINE_FPS = json.load(_fh)["baseline_fps_v100_projected"]
else:  # pre-measurement fallback (see docstring)
    BASELINE_FPS = 1.0
H, W = 1024, 2048
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
WARMUP = 2
ITERS = 8


def _backend_watchdog(timeout_s=300):
    """Fail fast (with a parseable JSON line) if the TPU backend never
    initializes — the tunneled axon platform hangs indefinitely when the
    tunnel is down, which would otherwise leave the driver with no output
    at all.  Returns an Event the caller sets once devices are up."""
    import threading

    ready = threading.Event()

    def _watch():
        if not ready.wait(timeout_s):
            print(json.dumps({
                "metric": "VPS frames/sec/chip at 1024x2048",
                "value": 0.0,
                "unit": "frames/sec/chip",
                "vs_baseline": 0.0,
                "error": f"TPU backend init did not complete within "
                         f"{timeout_s}s (axon tunnel down?)",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    return ready


def _tuned_cfg(config_name, halos):
    """The production-tuned stack: bf16 activations (params fp32, norm
    stats fp32, logits/masks/postproc f32 where it matters), Pallas
    one-hot-matmul DCN at per-level halos, fused sseg + fused postproc.
    NOTE the benched number assumes these halos hold for the eval
    checkpoint too: checkpoint loading calibrates and auto-raises any
    level whose converted conv_offset head would clamp
    (utils/diagnostics.check_dcn_halo)."""
    from slotvps_tpu.config import named_config

    base = named_config(config_name).model
    if len(halos) < base.semantic_head.num_levels:
        raise SystemExit(
            f"BENCH_HALOS must list >= {base.semantic_head.num_levels} "
            f"per-level halos (P2..P5), got {halos!r}")
    return dataclasses.replace(
        base, compute_dtype="bfloat16",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="pallas", fused_sseg=True,
            dcn_halo=halos[:base.semantic_head.num_levels]),
        slot_head=dataclasses.replace(
            base.slot_head,
            retriever_impl=os.environ.get("BENCH_RETRIEVER", "jax")),
        postprocess=dataclasses.replace(
            base.postprocess, impl="fused"))


def _trained_setup(config_name, cfg, halos):
    """Overfit the flagship on a synthetic multi-object scene (cached in
    /tmp) and build a BATCH of scene frames.  Returns (params, img,
    effective_cfg, info) — the halo contract is measured on the trained
    offset heads and any violated level is auto-raised (recorded)."""
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.utils.diagnostics import measure_max_dcn_offset
    from slotvps_tpu.utils.synthetic import (make_scene, norm_img,
                                             scene_train_batch)

    steps = int(os.environ.get("BENCH_OVERFIT_STEPS", "300"))
    n_things, seed = 12, 0
    cache = (f"/tmp/slotvps_overfit_{config_name}_{H}x{W}"
             f"_s{steps}_n{n_things}_seed{seed}.pkl")
    scene = make_scene(H, W, n_things=n_things, seed=seed)
    if os.path.exists(cache):
        with open(cache, "rb") as fh:
            params = jax.tree.map(jnp.asarray, pickle.load(fh))
        print(f"# trained regime: loaded cached overfit params {cache}",
              file=sys.stderr)
    else:
        from slotvps_tpu.utils.synthetic import overfit

        # train in f32 with the Pallas custom-vjp DCN (the XLA-gather
        # backward OOMs at full res — see utils/parity.py) at the same
        # halos the tuned pipeline serves with
        train_cfg = dataclasses.replace(
            cfg, compute_dtype="float32",
            semantic_head=dataclasses.replace(
                cfg.semantic_head, dcn_impl="pallas", fused_sseg=False),
            postprocess=dataclasses.replace(cfg.postprocess, impl="jax"))
        t0 = time.perf_counter()
        params = overfit(train_cfg, scene_train_batch(scene), steps=steps,
                         seed=seed, log_every=100)
        print(f"# trained regime: overfit {steps} steps in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)
        with open(cache, "wb") as fh:
            pickle.dump(jax.tree.map(np.asarray, params), fh)

    # halo contract: trained conv_offset heads must stay inside the
    # tuned pipeline's per-level halos, else samples silently clamp —
    # auto-raise violated levels (costs FLOPs; recorded in the JSON)
    probe = jnp.asarray(norm_img(scene.img))
    exact_cfg = dataclasses.replace(
        cfg, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            cfg.semantic_head, dcn_impl="xla", fused_sseg=False))
    max_off = [float(v) for v in
               measure_max_dcn_offset(params, exact_cfg, image=probe)]
    eff = tuple(max(h0, int(np.ceil(o)))
                for h0, o in zip(halos[:cfg.semantic_head.num_levels],
                                 max_off))
    if eff != tuple(halos[:cfg.semantic_head.num_levels]):
        print(f"# trained offsets {max_off} exceed halos {halos}; "
              f"raised to {eff}", file=sys.stderr)
        cfg = dataclasses.replace(
            cfg, semantic_head=dataclasses.replace(
                cfg.semantic_head, dcn_halo=eff))

    # BATCH independent "videos": the scene at different phases
    img = jnp.asarray(np.concatenate(
        [norm_img(np.roll(scene.img, 37 * i + 11 * (i % 3), axis=1))
         for i in range(BATCH)], axis=0))
    info = {"overfit_steps": steps,
            "max_abs_offset": [round(o, 2) for o in max_off],
            "halos": list(eff)}
    return params, img, cfg, info


def _calibrated_setup(cfg):
    """Doctored random weights bisected so ~target slots clear the keep
    rule on white-noise frames (adversarial: doctored-random masks
    overlap heavily, so mask removal rejects most — recorded in stats).
    BENCH_CALIB=0 restores the old empty-regime measurement."""
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.models.detector import (decode_pair, extract_features,
                                             init_model)

    params = init_model(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)), jnp.float32)
    info = {"enabled": False}
    if os.environ.get("BENCH_CALIB", "1") != "0":
        from slotvps_tpu.utils.calibration import (calibrate_class_head,
                                                   doctor_params)

        target = int(os.environ.get("BENCH_TARGET_VALID", "48"))
        fg_scale = float(os.environ.get("BENCH_FG_SCALE", "2.0"))
        noise_std = float(os.environ.get("BENCH_CLS_NOISE", "0.3"))
        params = doctor_params(params, jax.random.PRNGKey(1),
                               fg_scale=fg_scale)

        @jax.jit
        def _probe(params, img1):
            f = extract_features(params, cfg, img1)
            return decode_pair(params, cfg, f, f).pred_logits[0]

        # probe at 1/4 the bench resolution: the slot-logit statistics
        # the bisection needs are close enough (verified by the recorded
        # n_kept at full res), and the full-res probe graph is expensive
        # enough to OOM the compile helper
        probe_logits = _probe(params, img[:1, ::4, ::4])
        params, info = calibrate_class_head(
            params, probe_logits, jax.random.PRNGKey(2),
            target_valid=target, threshold=cfg.postprocess.threshold,
            noise_std=noise_std)
        info["enabled"] = True
        print(f"# calib: scale {info['scale']:.3f}, "
              f"{info['n_valid_probe']} slots clear "
              f"{cfg.postprocess.threshold} on probe", file=sys.stderr)
    return params, img, info


def _make_frame_step(cfg, batch):
    import jax
    import jax.numpy as jnp

    from slotvps_tpu.models.detector import decode_pair, extract_features
    from slotvps_tpu.models.postprocess import postprocess_frame

    @jax.jit
    def frame_step(params, img, ref_feats):
        cur_feats = extract_features(params, cfg, img)
        outs = decode_pair(params, cfg, ref_feats, cur_feats)
        # per-video postproc loop: measured FASTER than a vmapped postproc
        # (vmap turns the per-frame while_loops into max-trip-count
        # lockstep passes and serializes the claim kernel over a (B, K)
        # grid — 15.3 s vs 0.25 s for the loop at B=4)
        posts = [postprocess_frame(
            outs.pred_logits[i], outs.pred_masks[i], outs.embeddings[i],
            outs.fcn_output[i], (H, W), cfg.postprocess)
            for i in range(batch)]
        # regime diagnostic: slots clearing the keep rule BEFORE mask
        # removal / area filtering (distinguishes "calibration missed at
        # full res" from "mask removal rejected them")
        probs = jax.nn.softmax(outs.pred_logits.astype(jnp.float32), -1)
        n_valid = ((probs.argmax(-1) != cfg.postprocess.num_classes - 1)
                   & (probs.max(-1) > cfg.postprocess.threshold)).sum(-1)
        # scalar checksum over every output: reading it back forces the
        # whole step to complete (block_until_ready is async on the
        # tunneled axon platform, so a readback is the only real fence)
        probe = sum(p.panoptic.sum() + p.sseg.sum() + p.kept.sum()
                    + p.labels.sum() + p.scores.sum().astype(jnp.int32)
                    + p.embeddings.sum().astype(jnp.int32) for p in posts)
        return cur_feats, posts, n_valid, probe

    @jax.jit
    def extract(params, img):
        return extract_features(params, cfg, img)

    return frame_step, extract


def _measure(cfg, params, img, batch, label, trace_dir=""):
    """Timed steady-state loop; returns (fps, out, n_valid, step_dt,
    frame_step handle) for one regime."""
    import jax

    frame_step, extract = _make_frame_step(cfg, batch)
    ref_feats = extract(params, img)
    for _ in range(WARMUP):
        ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
    _ = np.asarray(probe)  # fence

    if trace_dir:
        # XLA profiler trace of 2 steps (inspect op-level MXU/VPU time
        # with tensorboard-profile or the trace-event json under <dir>)
        with jax.profiler.trace(trace_dir):
            ref_feats, out, n_valid, probe = frame_step(params, img,
                                                        ref_feats)
            ref_feats, out, n_valid, probe = frame_step(params, img,
                                                        ref_feats)
            _ = np.asarray(probe)
        print(f"# trace written to {trace_dir}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
    _ = np.asarray(probe)  # fence
    dt = (time.perf_counter() - t0) / ITERS
    fps = batch / dt

    # model FLOPs + MFU (diagnostic, stderr — the driver parses stdout)
    mfu = None
    try:
        ca = frame_step.lower(params, img, ref_feats).compile() \
            .cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        tflops = float(ca.get("flops", 0.0)) / 1e12
        peak = 197.0  # v5e bf16 peak TFLOP/s
        mfu = 100 * tflops / dt / peak
        print(f"# [{label}] step {tflops:.2f} TF, {tflops / dt:.1f} TF/s, "
              f"MFU ~{mfu:.1f}% of v5e bf16 peak", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    import jax.numpy as jnp

    stats = {
        "fps": round(fps, 3),
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "step_ms": round(1000 * dt, 1),
        "n_valid_mean": round(float(np.asarray(n_valid).mean()), 2),
        "n_kept_mean": round(float(np.asarray(
            jnp.stack([p.n_kept for p in out])).mean()), 2),
        "n_kept_max": int(np.asarray(
            jnp.stack([p.n_kept for p in out])).max()),
        "n_things_mean": round(float(np.asarray(
            jnp.stack([p.n_things for p in out])).mean()), 2),
        "n_loop_mean": round(float(np.asarray(
            jnp.stack([p.n_loop for p in out])).mean()), 2),
    }
    if mfu is not None:
        stats["mfu_pct"] = round(mfu, 1)
    print(f"# [{label}] regime: {stats}", file=sys.stderr)
    return stats


def main(config_name="r50_fpn_slotvps"):
    ready = _backend_watchdog()
    import jax

    jax.devices()  # triggers backend init; hangs here if the tunnel is down
    ready.set()

    try:
        # persistent compile cache: repeated bench runs skip the multi-
        # minute compile (single-core host; same cache as the dryrun)
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_slotvps")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    halos = tuple(int(x) for x in os.environ.get(
        "BENCH_HALOS", "2,3,4,6").split(","))
    cfg = _tuned_cfg(config_name, halos)

    regimes = {}
    want = [r.strip() for r in os.environ.get(
        "BENCH_REGIMES", "trained,calibrated").split(",") if r.strip()]
    trace_dir = os.environ.get("BENCH_TRACE", "")
    trained_params = trained_cfg = None
    for regime in want:
        try:
            if regime == "trained":
                params, img, rcfg, info = _trained_setup(config_name, cfg,
                                                         halos)
                trained_params, trained_cfg = params, rcfg
            elif regime == "calibrated":
                params, img, info = _calibrated_setup(cfg)
                rcfg = cfg
            else:
                raise SystemExit(f"unknown BENCH_REGIME {regime!r}")
            stats = _measure(
                rcfg, params, img, BATCH, regime,
                trace_dir=(trace_dir and f"{trace_dir}/{regime}"))
        except SystemExit:
            raise
        except Exception as e:  # record, don't hide — and keep going
            import traceback

            traceback.print_exc()
            regimes[regime] = {"error": f"{type(e).__name__}: {e}"[:300]}
            continue
        stats.update({k: v for k, v in info.items()
                      if k in ("overfit_steps", "max_abs_offset", "halos",
                               "scale", "n_valid_probe", "enabled")})
        regimes[regime] = stats

    # B=1 streaming latency (the reference's per-frame loop is a latency
    # workload, tools/test_vpq.py:23-59) — measured in the headline
    # regime
    latency_ms_b1 = None
    if os.environ.get("BENCH_LATENCY", "1") != "0":
        try:
            lp = trained_params
            lcfg = trained_cfg if trained_cfg is not None else cfg
            if lp is None:
                lp, limg, _ = _calibrated_setup(cfg)
                limg = limg[:1]
            else:
                from slotvps_tpu.utils.synthetic import make_scene, norm_img

                import jax.numpy as jnp

                limg = jnp.asarray(norm_img(
                    make_scene(H, W, n_things=12, seed=0).img))
            lstats = _measure(lcfg, lp, limg, 1, "latency_b1")
            latency_ms_b1 = lstats["step_ms"]
        except Exception as e:  # diagnostic only — never kill the bench
            import traceback

            traceback.print_exc()
            print(f"# latency measurement failed: {e}", file=sys.stderr)

    ok = {k: v for k, v in regimes.items() if "fps" in v}
    if not ok:
        print(json.dumps({
            "metric": f"VPS frames/sec/chip at 1024x2048 ({config_name})",
            "value": 0.0, "unit": "frames/sec/chip", "vs_baseline": 0.0,
            "regimes": regimes, "error": "no regime measured"}))
        return
    head_name = "trained" if "trained" in ok else next(iter(ok))
    headline = ok[head_name]
    out = {
        "metric": f"VPS frames/sec/chip at 1024x2048 ({config_name}, "
                  "full step incl. on-device panoptic postproc; "
                  f"{BATCH}-video data-parallel batch; "
                  f"{head_name}-regime headline; regimes measured: "
                  f"{', '.join(ok)})",
        "value": headline["fps"],
        "unit": "frames/sec/chip",
        "vs_baseline": headline["vs_baseline"],
        "regimes": regimes,
    }
    if latency_ms_b1 is not None:
        out["latency_ms_b1"] = latency_ms_b1
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "r50_fpn_slotvps")
