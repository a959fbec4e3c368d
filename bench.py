"""Benchmark: VPS frames/sec/chip at 1024x2048 (Cityscapes-VPS shape).

Measures the full per-frame device step of the flagship r50_fpn_slotvps
model — backbone + FPN + DCN semantic head + 7-stage slot decoder +
on-device panoptic post-processing — exactly what the reference spends its
per-frame wall clock on (reference tools/test_vpq.py:23-59 +
vps_temporal_slots.py:207-469).  Steady-state: each frame reuses the
previous frame's backbone features as its reference features, as the
streaming pipeline does.  BATCH videos are processed in parallel
(data-parallel batched multi-video inference, BASELINE.json config 5 —
how the 50-video eval runs at max throughput); BATCH=1 measures pure
streaming latency instead.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec/chip", "vs_baseline": x}

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
"""

import json
import sys
import time

import numpy as np

import os

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
    import jax.numpy as jnp

    from slotvps_tpu.config import named_config
    from slotvps_tpu.models.detector import (
        decode_pair, extract_features, init_model)
    from slotvps_tpu.models.postprocess import postprocess_frame

    import dataclasses

    base = named_config(config_name).model
    # production-tuned: bf16 activations (params fp32, norm stats fp32,
    # logits/masks/postproc fp32) + Pallas one-hot-matmul DCN kernel
    # per-level DCN halos (P2..P5): fine levels need smaller sampling
    # ranges than coarse ones (the halo sets the kernel's contracted dim,
    # its dominant FLOP knob).  NOTE the benched number assumes these
    # halos hold for the eval checkpoint too: checkpoint loading
    # calibrates and auto-raises any level whose converted conv_offset
    # head would clamp (utils/diagnostics.check_dcn_halo), and a raised
    # level costs proportionally more.
    halos = tuple(int(x) for x in os.environ.get(
        "BENCH_HALOS", "2,3,4,6").split(","))
    if len(halos) < base.semantic_head.num_levels:
        raise SystemExit(
            f"BENCH_HALOS must list >= {base.semantic_head.num_levels} "
            f"per-level halos (P2..P5), got {halos!r}")
    cfg = dataclasses.replace(
        base, compute_dtype="bfloat16",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="pallas", fused_sseg=True,
            dcn_halo=halos[:base.semantic_head.num_levels]),
        slot_head=dataclasses.replace(
            base.slot_head,
            retriever_impl=os.environ.get("BENCH_RETRIEVER", "jax")),
        postprocess=dataclasses.replace(
            base.postprocess, impl="fused"))
    params = init_model(jax.random.PRNGKey(0), cfg)

    # ---- production-regime calibration -------------------------------
    # Random-init weights keep ~0 slots at threshold 0.85 (focal prior
    # bias), which would measure the postprocessor's EMPTY branch — not
    # the production workload, where a real frame keeps tens of
    # segments.  Doctor + calibrate the head (pure JAX, see
    # utils/calibration.py) so ~TARGET_VALID slots clear the keep rule;
    # the resulting kept/things counts are recorded in the JSON.
    # BENCH_CALIB=0 restores the old empty-regime measurement.
    calib_info = {"enabled": False}
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((BATCH, H, W, 3)), jnp.float32)
    if os.environ.get("BENCH_CALIB", "1") != "0":
        from slotvps_tpu.utils.calibration import (
            calibrate_class_head, doctor_params)

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
        params, calib_info = calibrate_class_head(
            params, probe_logits, jax.random.PRNGKey(2),
            target_valid=target, threshold=cfg.postprocess.threshold,
            noise_std=noise_std)
        calib_info["enabled"] = True
        print(f"# calib: scale {calib_info['scale']:.3f}, "
              f"{calib_info['n_valid_probe']} slots clear "
              f"{cfg.postprocess.threshold} on probe", file=sys.stderr)

    @jax.jit
    def frame_step(params, img, ref_feats):
        cur_feats = extract_features(params, cfg, img)
        outs = decode_pair(params, cfg, ref_feats, cur_feats)
        # per-video postproc loop: measured FASTER than a vmapped postproc
        # (vmap turns the per-frame while_loops into max-trip-count lockstep
        # passes and serializes the claim kernel over a (B, K) grid —
        # 15.3 s vs 0.25 s for the loop at B=4)
        posts = [postprocess_frame(
            outs.pred_logits[i], outs.pred_masks[i], outs.embeddings[i],
            outs.fcn_output[i], (H, W), cfg.postprocess)
            for i in range(BATCH)]
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
    def _extract(params, img):
        return extract_features(params, cfg, img)

    ref_feats = _extract(params, img)

    for _ in range(WARMUP):
        ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
    _ = np.asarray(probe)  # fence

    trace_dir = os.environ.get("BENCH_TRACE", "")
    if trace_dir:
        # XLA profiler trace of 2 steps (inspect op-level MXU/VPU time with
        # tensorboard-profile or the trace-event json under <dir>)
        with jax.profiler.trace(trace_dir):
            ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
            ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
            _ = np.asarray(probe)
        print(f"# trace written to {trace_dir}", file=sys.stderr)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        ref_feats, out, n_valid, probe = frame_step(params, img, ref_feats)
    _ = np.asarray(probe)  # fence
    dt = (time.perf_counter() - t0) / ITERS

    fps = BATCH / dt

    # model FLOPs + MFU (diagnostic, stderr — the driver parses stdout)
    try:
        ca = frame_step.lower(params, img, ref_feats).compile() \
            .cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        tflops = float(ca.get("flops", 0.0)) / 1e12
        peak = 197.0  # v5e bf16 peak TFLOP/s
        print(f"# step {tflops:.2f} TF, {tflops / dt:.1f} TF/s, "
              f"MFU ~{100 * tflops / dt / peak:.1f}% of v5e bf16 peak",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# cost analysis unavailable: {e}", file=sys.stderr)

    # production-regime evidence: how many slots actually survived the
    # keep rule / mask removal / area filter in the measured steps
    n_kept = np.asarray(jnp.stack([p.n_kept for p in out]))
    n_things = np.asarray(jnp.stack([p.n_things for p in out]))
    n_loop = np.asarray(jnp.stack([p.n_loop for p in out]))
    n_valid_full = np.asarray(n_valid)
    regime = {
        "calibrated": calib_info.get("enabled", False),
        "n_valid_mean": round(float(n_valid_full.mean()), 2),
        "n_kept_mean": round(float(n_kept.mean()), 2),
        "n_kept_max": int(n_kept.max()),
        "n_things_mean": round(float(n_things.mean()), 2),
        "n_things_max": int(n_things.max()),
        "n_loop_mean": round(float(n_loop.mean()), 2),
        "n_loop_max": int(n_loop.max()),
    }
    if calib_info.get("enabled"):
        regime["calib_scale"] = round(calib_info["scale"], 3)
        regime["n_valid_probe"] = calib_info["n_valid_probe"]
    print(f"# regime: {regime}", file=sys.stderr)

    print(json.dumps({
        "metric": f"VPS frames/sec/chip at 1024x2048 ({config_name}, "
                  "full step incl. on-device panoptic postproc; "
                  f"{BATCH}-video data-parallel batch; calibrated "
                  "production detection regime)",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "regime": regime,
    }))


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "r50_fpn_slotvps")
