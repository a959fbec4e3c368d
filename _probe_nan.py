"""Localize the NaN gradient that appears at overfit step 1 once the
backbone BN stats are calibrated (round-5 trained-regime debugging).

  python _probe_nan.py [H W]   # CPU by default (small shapes)
"""

import dataclasses
import sys

import os

import jax

if os.environ.get("PROBE_TPU", "0") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/jax_cache_slotvps")
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


def _tree_nan_report(grads, prefix=""):
    import jax.tree_util as jtu

    for path, leaf in jtu.tree_flatten_with_path(grads)[0]:
        a = np.asarray(leaf)
        n_nan = int(np.isnan(a).sum())
        if n_nan:
            print(f"NaN x{n_nan:8d}  max|g|={np.nanmax(np.abs(a)):.3e}  "
                  f"{jtu.keystr(path)}")


def main(h=64, w=128, impl="xla"):
    h, w = int(h), int(w)
    base = named_config("r50_fpn_slotvps").model
    cfg = dataclasses.replace(
        base, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            base.semantic_head, fused_sseg=False,
            dcn_impl=impl,
            dcn_halo=(2, 3, 4, 6)))

    scene = make_scene(h, w, n_things=int(os.environ.get("PROBE_THINGS",
                                                         "12")), seed=0)
    batch = scene_train_batch(scene)
    params = init_model(jax.random.PRNGKey(0), cfg)
    both = jnp.concatenate([batch.ref_img, batch.img], axis=0)
    calibrate_bn_stats(params["backbone"], both, depth=cfg.resnet.depth)

    import contextlib
    import functools

    ctx = contextlib.nullcontext()
    if (cfg.semantic_head.dcn_impl.startswith("pallas")
            and jax.default_backend() == "cpu"):
        from jax.experimental.pallas import tpu as pltpu

        ctx = pltpu.force_tpu_interpret_mode()
    with ctx:
        (total, metrics), grads = jax.jit(jax.value_and_grad(
            functools.partial(loss_fn, cfg=cfg), has_aux=True))(
                params, batch=batch)
    print("loss:", {k: round(float(v), 3) for k, v in metrics.items()})
    print("total:", float(total))
    _tree_nan_report(grads)
    flat = jax.tree_util.tree_leaves(grads)
    n = sum(int(np.isnan(np.asarray(g)).sum()) for g in flat)
    print(f"total NaN grad elements: {n}")


if __name__ == "__main__":
    main(*sys.argv[1:])
