"""Component profiler on the real TPU chip (production shapes).

Usage: python _prof.py [section ...]
Sections: dcn postproc fused model
"""
import sys
import time

import numpy as np


def fence(x):
    return np.asarray(x.sum() if hasattr(x, "sum") else x)


def timeit(fn, *args, iters=5, warmup=2, probe=None):
    for _ in range(warmup):
        out = fn(*args)
    fence(probe(out) if probe else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fence(probe(out) if probe else out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_slotvps")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    sections = sys.argv[1:] or ["postproc"]
    rng = np.random.default_rng(0)
    print("devices:", jax.devices(), flush=True)

    B = 4
    if "dcn" in sections:
        from slotvps_tpu.ops.pallas.deform_conv import deform_conv2d_pallas
        import os as _os
        halo = int(_os.environ.get("DCN_HALO", "4"))
        sub = int(_os.environ.get("DCN_SUB", "32"))
        rblk = int(_os.environ.get("DCN_RBLK", "4"))
        rowfuse = _os.environ.get("DCN_ROWFUSE", "") == "1"
        for (h, w, ci, co) in [(256, 512, 256, 256), (256, 512, 256, 128),
                               (256, 512, 128, 128), (128, 256, 256, 256)]:
            x = jnp.asarray(rng.standard_normal((B, h, w, ci)), jnp.float32)
            off = jnp.asarray(
                rng.standard_normal((B, h, w, 18)) * 2, jnp.float32)
            wgt = jnp.asarray(
                rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.float32)
            f = jax.jit(lambda x, o, w: deform_conv2d_pallas(
                x, o, w, halo=halo, sub=sub, rblk=rblk, rowfuse=rowfuse))
            dt = timeit(f, x, off, wgt)
            print(f"dcn pallas halo{halo} sub{sub} rblk{rblk} "
                  f"rowfuse{int(rowfuse)} B{B} "
                  f"{h}x{w} {ci}->{co}: "
                  f"{dt*1e3:.2f} ms ({dt/B*1e3:.2f} ms/frame)", flush=True)

    if "dcnbwd" in sections:
        # fwd+bwd at production shapes: pallas custom-vjp vs the XLA path
        from slotvps_tpu.ops.deform_conv import deform_conv2d
        from slotvps_tpu.ops.pallas.deform_conv import deform_conv2d_pallas
        Bt = 2  # training pair (frame + ref frame)
        for (h, w, ci, co) in [(200, 400, 256, 256), (200, 400, 256, 128),
                               (100, 200, 256, 256)]:
            x = jnp.asarray(rng.standard_normal((Bt, h, w, ci)), jnp.float32)
            off = jnp.asarray(
                rng.standard_normal((Bt, h, w, 18)) * 2, jnp.float32)
            wgt = jnp.asarray(
                rng.standard_normal((3, 3, ci, co)) * 0.05, jnp.float32)
            for name, fn in [
                ("pallas", lambda *a: deform_conv2d_pallas(*a, halo=4)),
                ("xla", lambda *a: deform_conv2d(
                    *a, padding=1, max_displacement=4)),
            ]:
                g = jax.jit(jax.grad(
                    lambda *a: (fn(*a) ** 2).sum().astype(jnp.float32),
                    argnums=(0, 1, 2)))
                dt = timeit(g, x, off, wgt, probe=lambda o: o[2])
                print(f"dcn fwd+bwd impl={name} B{Bt} {h}x{w} {ci}->{co}: "
                      f"{dt*1e3:.2f} ms", flush=True)

    if "train" in sections:
        # full train step at the released crop, per dcn impl
        import dataclasses
        import functools
        import optax
        from slotvps_tpu.config import named_config
        from slotvps_tpu.models.detector import init_model
        from slotvps_tpu.training.step import (make_optimizer,
                                               make_train_batch, train_step)
        h, w, g_cap = 800, 1600, 16
        qh, qw = h // 4, w // 4
        img = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
        gm = jnp.asarray(
            rng.random((1, g_cap, qh, qw)) > 0.9, jnp.float32)
        labels = jnp.asarray(rng.integers(11, 19, (1, g_cap)), jnp.int32)
        valid = jnp.asarray(np.arange(g_cap)[None] < 6)
        sem = jnp.asarray(rng.integers(0, 19, (1, qh, qw)), jnp.int32)
        pids = jnp.asarray(np.arange(g_cap)[None] + 1, jnp.int32)
        batch = make_train_batch(
            img=img, ref_img=img, gt_labels=labels, gt_masks=gm,
            gt_valid=valid, gt_semantic=sem, ref_gt_labels=labels,
            ref_gt_masks=gm, ref_gt_valid=valid, gt_pids=pids)
        import os as _os
        impl = _os.environ.get("TRAIN_DCN", "jax")
        cfg = named_config("r50_fpn_slotvps").model
        cfg = dataclasses.replace(cfg, semantic_head=dataclasses.replace(
            cfg.semantic_head, dcn_impl=impl,
            dcn_halo=4 if impl.startswith("pallas") else 0))
        params = init_model(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(lr=1e-4, params=params)
        opt_state = opt.init(params)
        step = jax.jit(functools.partial(train_step, cfg=cfg, optimizer=opt),
                       donate_argnums=(0, 1))
        t0 = time.perf_counter()
        params, opt_state, metrics = step(params, opt_state, batch)
        print(f"train dcn={impl} compile+first: "
              f"{time.perf_counter()-t0:.1f}s "
              f"loss={float(metrics['loss_total']):.3f}", flush=True)
        for it in range(3):
            t0 = time.perf_counter()
            params, opt_state, metrics = step(params, opt_state, batch)
            lt = float(metrics["loss_total"])  # readback fences the step
            print(f"train dcn={impl} step: "
                  f"{(time.perf_counter()-t0)*1e3:.0f} ms "
                  f"loss={lt:.3f}", flush=True)

    if "stages" in sections:
        # per-stage breakdown of the TUNED full step at bench shapes in
        # the CALIBRATED detection regime (the BENCH_r04 configuration):
        # backbone+FPN / DCN tower / decoder / postproc, B videos
        import dataclasses
        import functools
        from slotvps_tpu.config import named_config
        from slotvps_tpu.models import layers as L
        from slotvps_tpu.models.detector import (apply_backbone, apply_fpn,
                                                 decode_pair,
                                                 extract_features, init_model)
        from slotvps_tpu.models.semantic_head import apply_semantic_head
        from slotvps_tpu.models.postprocess import postprocess_frame
        from slotvps_tpu.utils.calibration import (calibrate_class_head,
                                                   doctor_params)
        import os as _os
        H, W = 1024, 2048
        Bs = int(_os.environ.get("BENCH_BATCH", "8"))
        base = named_config(
            _os.environ.get("PROF_CONFIG", "r50_fpn_slotvps")).model
        halos = tuple(int(x) for x in _os.environ.get(
            "BENCH_HALOS", "2,3,4,6").split(","))
        cfg = dataclasses.replace(
            base, compute_dtype="bfloat16",
            semantic_head=dataclasses.replace(
                base.semantic_head, dcn_impl="pallas", fused_sseg=True,
                dcn_halo=halos[:base.semantic_head.num_levels]),
            postprocess=dataclasses.replace(base.postprocess, impl="fused"))
        params = init_model(jax.random.PRNGKey(0), cfg)
        params = doctor_params(params, jax.random.PRNGKey(1))
        img = jnp.asarray(rng.standard_normal((Bs, H, W, 3)), jnp.float32)

        @jax.jit
        def _probe_logits(params, img1):
            f = extract_features(params, cfg, img1)
            return decode_pair(params, cfg, f, f).pred_logits[0]

        params, info = calibrate_class_head(
            params, _probe_logits(params, img[:1, ::4, ::4]),
            jax.random.PRNGKey(2), target_valid=int(
                _os.environ.get("BENCH_TARGET_VALID", "48")),
            threshold=cfg.postprocess.threshold)
        print(f"stages: calib scale {info['scale']:.2f} "
              f"({info['n_valid_probe']} valid on probe), B={Bs}",
              flush=True)

        @jax.jit
        def bb(params, img):
            x = img.astype(jnp.dtype(cfg.compute_dtype))
            return apply_fpn(params["fpn"], apply_backbone(params, cfg, x),
                             num_outs=cfg.fpn.num_outs)

        fpn_outs = bb(params, img)
        dt = timeit(bb, params, img, probe=lambda o: o[0])
        print(f"stage backbone+fpn: {dt*1e3:.1f} ms ({dt/Bs*1e3:.2f} "
              "ms/frame)", flush=True)

        @jax.jit
        def sem(params, fpn_outs):
            fcn, _, fb = apply_semantic_head(
                params["semantic_head"],
                fpn_outs[:cfg.semantic_head.num_levels], cfg.semantic_head)
            ft = tuple(L.conv2d(params["conv_trans"], f, padding=0)
                       for f in fb)
            return fcn, ft

        fcn, ft = sem(params, fpn_outs)
        dt = timeit(sem, params, fpn_outs, probe=lambda o: o[0])
        print(f"stage dcn tower (+conv_trans): {dt*1e3:.1f} ms "
              f"({dt/Bs*1e3:.2f} ms/frame)", flush=True)

        feats = jax.jit(functools.partial(extract_features, cfg=cfg))(
            params, img=img)

        @jax.jit
        def dec(params, feats):
            return decode_pair(params, cfg, feats, feats)

        outs = dec(params, feats)
        dt = timeit(dec, params, feats, probe=lambda o: o.pred_logits)
        print(f"stage decoder (pair): {dt*1e3:.1f} ms ({dt/Bs*1e3:.2f} "
              "ms/frame)", flush=True)

        @jax.jit
        def post(outs):
            ps = [postprocess_frame(
                outs.pred_logits[i], outs.pred_masks[i], outs.embeddings[i],
                outs.fcn_output[i], (H, W), cfg.postprocess)
                for i in range(Bs)]
            return (sum(p.panoptic.sum() + p.sseg.sum() for p in ps),
                    sum(p.n_kept for p in ps), sum(p.n_things for p in ps))

        chk, nk, nt = post(outs)
        dt = timeit(post, outs, probe=lambda o: o[0])
        print(f"stage postproc: {dt*1e3:.1f} ms ({dt/Bs*1e3:.2f} ms/frame) "
              f"[kept {float(nk)/Bs:.1f}/frame, things "
              f"{float(nt)/Bs:.1f}/frame]", flush=True)

    if "postproc" in sections or "fused" in sections:
        from slotvps_tpu.config import PostprocessConfig
        from slotvps_tpu.models.postprocess import postprocess_frame
        H, W, K, D = 1024, 2048, 100, 128
        h, w = H // 4, W // 4
        logits = jnp.asarray(rng.standard_normal((K, 20)) * 3, jnp.float32)
        masks = jnp.asarray(rng.standard_normal((K, h, w)), jnp.float32)
        embeds = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
        fcn = jnp.asarray(rng.standard_normal((H, W, 19)), jnp.float32)

        impls = {"postproc": ["pallas"], "fused": ["fused"]}
        todo = sum((impls[s] for s in sections if s in impls), [])
        fcn_q = jnp.asarray(rng.standard_normal((h, w, 19)), jnp.float32)
        for impl in todo:
            for sd in (["float32", "bfloat16"] if impl != "fused"
                       else ["float32"]):
                cfg = PostprocessConfig(threshold=0.04, impl=impl,
                                        stack_dtype=sd)
                f = jax.jit(lambda a, b, c, d: postprocess_frame(
                    a, b, c, d, (H, W), cfg))
                dt = timeit(f, logits, masks, embeds, fcn,
                            probe=lambda o: o.panoptic)
                print(f"postproc impl={impl} stack={sd}: {dt*1e3:.2f} "
                      "ms/frame", flush=True)
                if impl == "fused":
                    dtq = timeit(f, logits, masks, embeds, fcn_q,
                                 probe=lambda o: o.panoptic)
                    print(f"postproc impl=fused quarter-fcn (sseg_v3): "
                          f"{dtq*1e3:.2f} ms/frame", flush=True)

    if "regime" in sections:
        # postproc cost vs detection count: logits constructed so exactly
        # N slots clear the production 0.85 keep rule (the calibrated
        # bench regime), quarter-res fcn (fused_sseg path)
        from slotvps_tpu.config import PostprocessConfig
        from slotvps_tpu.models.postprocess import postprocess_frame
        H, W, K, D = 1024, 2048, 100, 128
        h, w = H // 4, W // 4
        masks = jnp.asarray(rng.standard_normal((K, h, w)), jnp.float32)
        embeds = jnp.asarray(rng.standard_normal((K, D)), jnp.float32)
        fcn_q = jnp.asarray(rng.standard_normal((h, w, 19)), jnp.float32)
        cfg = PostprocessConfig(threshold=0.85, impl="fused")
        f = jax.jit(lambda a, b, c, d: postprocess_frame(
            a, b, c, d, (H, W), cfg))
        for n_valid in (0, 6, 12, 24, 48):
            lg = np.full((K, 20), 0.0, np.float32)
            lg[:, 19] = 8.0                      # no-obj wins by default
            cls = rng.integers(0, 19, (K,))
            lg[np.arange(n_valid), 19] = 0.0
            lg[np.arange(n_valid), cls[:n_valid]] = 8.0  # conf ~1.0
            logits = jnp.asarray(lg)
            dt = timeit(f, logits, masks, embeds, fcn_q,
                        probe=lambda o: o.panoptic)
            out = f(logits, masks, embeds, fcn_q)
            print(f"postproc fused 0.85 n_valid={n_valid}: "
                  f"{dt*1e3:.2f} ms/frame (kept={int(out.n_kept)} "
                  f"things={int(out.n_things)})", flush=True)

    if "kern3" in sections:
        from slotvps_tpu.ops.pallas.postproc_v3 import (
            argmax_v3, claim_v3, theta_v3)
        H, W, K = 1024, 2048, 100
        h, w = H // 4, W // 4
        m_klow = jnp.asarray(rng.standard_normal((K, h, w)), jnp.float32)
        valid = jnp.ones((K,), bool)
        labels = jnp.asarray(rng.integers(0, 19, (K,)), jnp.int32)
        is_thing = labels > 10
        f1 = jax.jit(lambda m, v: theta_v3(m, v, 0.4))
        dt = timeit(f1, m_klow, valid)
        print(f"theta_v3: {dt*1e3:.2f} ms", flush=True)
        theta_b = f1(m_klow, valid)
        f2 = jax.jit(lambda m, t: claim_v3(
            m, t, labels, is_thing, valid, 0.03))
        dt = timeit(f2, m_klow, theta_b, probe=lambda o: o[1])
        print(f"claim_v3: {dt*1e3:.2f} ms", flush=True)
        _, owner_b = f2(m_klow, theta_b)
        kept = valid
        f3 = jax.jit(lambda m, o: argmax_v3(m, o, kept, is_thing))
        dt = timeit(f3, m_klow, owner_b, probe=lambda o: o[0])
        print(f"argmax_v3: {dt*1e3:.2f} ms", flush=True)

    if "kern" in sections:
        from slotvps_tpu.ops.pallas.postproc_fused import (
            argmax_areas_pallas, claim_scan_fused, theta_pallas)
        H, W, K = 1024, 2048, 100
        h, w = H // 4, W // 4
        masks_hwk = jnp.asarray(
            rng.standard_normal((h, w, K)), jnp.float32)
        valid = jnp.ones((K,), bool)
        labels = jnp.asarray(rng.integers(0, 19, (K,)), jnp.int32)
        is_thing = labels > 10
        f1 = jax.jit(lambda m, v: theta_pallas(m, v, 0.4))
        dt = timeit(f1, masks_hwk, valid)
        print(f"theta_pallas: {dt*1e3:.2f} ms", flush=True)
        theta = f1(masks_hwk, valid)
        f2 = jax.jit(lambda m, t: claim_scan_fused(
            m, t, labels, is_thing, valid, 0.03))
        dt = timeit(f2, masks_hwk, theta, probe=lambda o: o[1])
        print(f"claim_scan_fused: {dt*1e3:.2f} ms", flush=True)
        _, owner = f2(masks_hwk, theta)
        kept = valid
        f3 = jax.jit(lambda m, o: argmax_areas_pallas(m, o, kept, is_thing))
        dt = timeit(f3, masks_hwk, owner, probe=lambda o: o[0])
        print(f"argmax_areas_pallas: {dt*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
