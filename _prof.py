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
