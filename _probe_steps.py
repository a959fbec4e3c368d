"""Per-step loss trace of the trained-regime overfit — localizes WHICH
step the on-chip NaN first appears at (round-5 debugging: step-1
gradients are clean on TPU for both DCN impls, yet a 40-step overfit at
256x512 ends with NaN conv_offset heads).

  PROBE_TPU=1 python _probe_steps.py pallas 40 256 512

Replicates utils/parity.tuned_vs_exact(regime='trained') config
construction EXACTLY so the train-step graph hits the persistent
compile cache from earlier on-chip runs.
"""

import dataclasses
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
from slotvps_tpu.utils.synthetic import (make_scene, norm_img, overfit,
                                         scene_train_batch)


def main(impl="pallas", steps=40, h=256, w=512):
    steps, h, w = int(steps), int(h), int(w)
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
    params = overfit(train_cfg, batch, steps=steps, seed=0, log_every=1)
    flat = jax.tree_util.tree_leaves(params)
    n = sum(int(np.isnan(np.asarray(g)).sum()) for g in flat)
    print(f"total NaN param elements after {steps} steps: {n}", flush=True)
    from slotvps_tpu.utils.diagnostics import measure_max_dcn_offset

    off = measure_max_dcn_offset(params, exact_cfg,
                                 image=jnp.asarray(norm_img(scene.img)))
    print("max offsets:", [round(float(v), 3) for v in off], flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
