"""Diagnose the trained-regime overfit divergence seen on-chip at
1024x2048 (round 5): run synthetic.overfit's exact recipe with per-25-step
diagnostics — every loss component, per-level first-block DCN offset
maxima, FPN feature magnitude, and offset-conv weight drift — to locate
where/when the blowup enters.

  python _probe_overfit.py [H W steps lr]
"""

import dataclasses
import functools
import sys
import time

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_slotvps")
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax

from slotvps_tpu.config import named_config
from slotvps_tpu.models import layers as L
from slotvps_tpu.models.detector import apply_backbone, init_model
from slotvps_tpu.models.fpn import apply_fpn
from slotvps_tpu.training.step import make_optimizer, train_step
from slotvps_tpu.utils.synthetic import (make_scene, norm_img,
                                         scene_train_batch)


def main(h=512, w=1024, steps=300, lr=2e-3):
    h, w, steps, lr = int(h), int(w), int(steps), float(lr)
    base = named_config("r50_fpn_slotvps").model
    train_cfg = dataclasses.replace(
        base, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="pallas", fused_sseg=False,
            dcn_halo=(2, 3, 4, 6)))

    scene = make_scene(h, w, n_things=12, seed=0)
    batch = scene_train_batch(scene)
    img0 = jnp.asarray(norm_img(scene.img))

    params = init_model(jax.random.PRNGKey(0), train_cfg)
    from slotvps_tpu.models.resnet import calibrate_bn_stats

    both = jnp.concatenate([batch.ref_img, batch.img], axis=0)
    calibrate_bn_stats(params["backbone"], both,
                       depth=train_cfg.resnet.depth)
    opt = make_optimizer(lr=lr, params=params)
    opt_state = opt.init(params)
    step = jax.jit(functools.partial(train_step, cfg=train_cfg,
                                     optimizer=opt))

    sh = train_cfg.semantic_head

    @jax.jit
    def diag(params, img):
        feats = apply_backbone(params, train_cfg, img)
        fpn_outs = apply_fpn(params["fpn"], feats,
                             num_outs=train_cfg.fpn.num_outs)
        from slotvps_tpu.models.semantic_head import _dcn_block

        offs, xmax = [], []
        for x in fpn_outs[:sh.num_levels]:
            xmax.append(jnp.abs(x).max())
            lvl = []
            for block in params["semantic_head"]["tower"]:
                off = L.conv2d(block["offset"], x, padding=1)
                lvl.append(jnp.abs(off).max())
                x = _dcn_block(block, x, sh.gn_groups, impl="jax", halo=16)
            offs.append(jnp.stack(lvl))
        wmax = jnp.stack([jnp.abs(b["offset"]["w"]).max()
                          for b in params["semantic_head"]["tower"]])
        return jnp.stack(offs), jnp.stack(xmax), wmax

    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, metrics = step(params, opt_state, batch)
        if (i + 1) % 25 == 0 or i == 0:
            m = {k: round(float(v), 3) for k, v in metrics.items()}
            offs, xmax, wmax = diag(params, img0)
            print(f"step {i + 1:4d} t={time.perf_counter() - t0:6.0f}s "
                  f"{m}", flush=True)
            print(f"     off max/blk {np.asarray(offs).round(2).tolist()} "
                  f"fpn|x| {np.asarray(xmax).round(1).tolist()} "
                  f"off|w| {np.asarray(wmax).round(4).tolist()}",
                  flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
