"""Find an overfit recipe whose decoded slots reach a production-scale
confident population (>= 8 things/frame clearing the 0.85 keep rule):
the round-5 on-chip trained-regime run saturated only 1/12 things after
300 steps at 1024x2048, below tests/test_tuned_vs_exact._check_trained's
population bound.  Sweep steps x query_scale x head_lr_mult at reduced
resolution (same recipe code path: utils/synthetic.overfit), report the
confident-slot count and the actual kept population from the exact
postproc pipeline.

  python _probe_sat.py [H W]
"""

import dataclasses
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

from slotvps_tpu.config import named_config
from slotvps_tpu.models.detector import (decode_pair, extract_features,
                                         init_model)
from slotvps_tpu.models.postprocess import postprocess_frame
from slotvps_tpu.utils.synthetic import (make_scene, norm_img, overfit,
                                         scene_train_batch)


def main(h=512, w=1024, *variants):
    h, w = int(h), int(w)
    base = named_config("r50_fpn_slotvps").model
    train_cfg = dataclasses.replace(
        base, compute_dtype="float32",
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl="pallas", fused_sseg=False,
            dcn_halo=(2, 3, 4, 6)),
        postprocess=dataclasses.replace(base.postprocess, impl="jax"))
    scene = make_scene(h, w, n_things=12, seed=0)
    batch = scene_train_batch(scene)
    img0 = jnp.asarray(norm_img(scene.img))

    @jax.jit
    def kept_count(params):
        f = extract_features(params, train_cfg, img0)
        o = decode_pair(params, train_cfg, f, f)
        r = postprocess_frame(o.pred_logits[0], o.pred_masks[0],
                              o.embeddings[0], o.fcn_output[0], (h, w),
                              train_cfg.postprocess)
        return r.n_kept, r.n_things

    grid = [dict(steps=300, query_scale=1.0, head_lr_mult=1.0),
            dict(steps=600, query_scale=1.0, head_lr_mult=1.0),
            dict(steps=300, query_scale=4.0, head_lr_mult=1.0),
            dict(steps=300, query_scale=1.0, head_lr_mult=4.0),
            dict(steps=600, query_scale=4.0, head_lr_mult=4.0)]
    if variants:  # e.g. "600:4:4" -> steps 600, qs 4, hlm 4
        grid = []
        for v in variants:
            s, q, m = v.split(":")
            grid.append(dict(steps=int(s), query_scale=float(q),
                             head_lr_mult=float(m)))
    for g in grid:
        t0 = time.perf_counter()
        params = overfit(train_cfg, batch, log_every=0, **g)
        sc = jax.nn.softmax(
            decode_pair(params, train_cfg,
                        extract_features(params, train_cfg, img0),
                        extract_features(params, train_cfg, img0)
                        ).pred_logits[0].astype(jnp.float32), -1)
        n_conf = int((np.asarray(sc)[:, :-1].max(-1) > 0.85).sum())
        try:
            nk, nt = kept_count(params)
            nk = f"kept={int(np.asarray(nk))} things={int(np.asarray(nt))}"
        except Exception as e:
            nk = f"err:{type(e).__name__}: {e}"[:120]
        print(f"RESULT {g} -> n_conf={n_conf} {nk} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
