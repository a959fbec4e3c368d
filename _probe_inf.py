"""Round-5 NaN hunt, part 2: the step-1 gradient probes found ZERO NaN
grads on-chip, yet params are NaN after the first optimizer update
(_probe_steps.py).  Suspect: an **inf** gradient (f32 overflow on the
TPU's default-bf16 matmul path) — ``optax.clip_by_global_norm`` turns
an inf global norm into ``inf * 0 = NaN`` across every leaf.

  PROBE_TPU=1 python _probe_inf.py pallas 256 512
"""

import dataclasses
import functools
import os
import sys

import jax

if os.environ.get("PROBE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_slotvps")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

from slotvps_tpu.config import named_config
from slotvps_tpu.models.detector import init_model
from slotvps_tpu.models.resnet import calibrate_bn_stats
from slotvps_tpu.training.step import loss_fn
from slotvps_tpu.utils.synthetic import make_scene, scene_train_batch


def main(impl="pallas", h=256, w=512):
    h, w = int(h), int(w)
    base = named_config("r50_fpn_slotvps").model
    exact_cfg = dataclasses.replace(
        base, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="xla", fused_sseg=False),
        postprocess=dataclasses.replace(base.postprocess, impl="jax"))
    train_cfg = dataclasses.replace(
        exact_cfg, semantic_head=dataclasses.replace(
            exact_cfg.semantic_head, dcn_impl=impl,
            dcn_halo=(2, 3, 4, 6)))
    scene = make_scene(h, w, n_things=12, seed=0)
    batch = scene_train_batch(scene)
    params = init_model(jax.random.PRNGKey(0), train_cfg)
    both = jnp.concatenate([batch.ref_img, batch.img], axis=0)
    calibrate_bn_stats(params["backbone"], both, depth=train_cfg.resnet.depth)

    (total, metrics), grads = jax.jit(jax.value_and_grad(
        functools.partial(loss_fn, cfg=train_cfg), has_aux=True))(
            params, batch=batch)
    print("loss:", {k: round(float(v), 3) for k, v in metrics.items()},
          flush=True)

    import jax.tree_util as jtu

    rows = []
    n_nan = n_inf = 0
    for path, leaf in jtu.tree_flatten_with_path(grads)[0]:
        a = np.asarray(leaf)
        n_nan += int(np.isnan(a).sum())
        n_inf += int(np.isinf(a).sum())
        mx = float(np.nanmax(np.abs(a))) if a.size else 0.0
        rows.append((mx, int(np.isinf(a).sum()), jtu.keystr(path)))
    rows.sort(reverse=True)
    print(f"total NaN {n_nan}  total inf {n_inf}", flush=True)
    for mx, ni, k in rows[:12]:
        print(f"  max|g|={mx:.3e}  inf x{ni:6d}  {k}", flush=True)
    sq = sum(float(np.square(np.asarray(l, np.float64)).sum())
             for l in jtu.tree_leaves(grads))
    print(f"global norm (f64 on host): {np.sqrt(sq):.6e}", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
