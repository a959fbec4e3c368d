"""Decompose tuned-vs-exact divergence: which tuned component drives it?

Runs the adversarial calibrated regime (utils/parity.py) at 512x1024 on
the TPU with each tuned component isolated against the exact f32/XLA
pipeline:

  bf16_only    — bf16 activations, XLA DCN, exact postproc
  pallas_only  — f32 activations, Pallas DCN, exact postproc
  fusedpp_only — f32 activations, XLA DCN, fused Pallas postproc
  full_tuned   — the production --tuned stack

Round-4 result (TUNED_VS_EXACT_DECOMP_r04.json): bf16 activations alone
reproduce the full tuned divergence (pan_matched 0.39 vs 0.49 full);
pallas DCN's contribution is its MXU-precision contraction (drift 0.08,
the MXU multiplies at bf16 granularity even for f32 inputs at default
precision); the fused postproc kernels are nearly clean (0.91/drift
0.017).  I.e. the adversarial regime measures amplified numeric noise
(calibration scales logits ~14x), not kernel bugs — see
utils/parity.tuned_vs_exact for the representative trained regime.
"""
import dataclasses, json, sys

import numpy as np
import jax, jax.numpy as jnp
from slotvps_tpu.config import named_config
from slotvps_tpu.models.detector import decode_pair, extract_features, init_model
from slotvps_tpu.models.postprocess import postprocess_frame
from slotvps_tpu.utils.calibration import calibrate_class_head, doctor_params
from slotvps_tpu.utils.parity import smooth_img, compare_results

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_slotvps")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

H, W, NF = 512, 1024, 2
base = named_config("r50_fpn_slotvps").model
halos = (2, 3, 4, 6)

def mk(dtype, dcn, fused, post):
    return dataclasses.replace(
        base, compute_dtype=dtype,
        semantic_head=dataclasses.replace(
            base.semantic_head, dcn_impl=dcn, fused_sseg=fused,
            dcn_halo=halos[:base.semantic_head.num_levels]),
        postprocess=dataclasses.replace(base.postprocess, impl=post))

VARIANTS = {
    "exact":       mk("float32", "xla", False, "jax"),
    "bf16_only":   mk("bfloat16", "xla", False, "jax"),
    "pallas_only": mk("float32", "pallas", False, "jax"),
    "fusedpp_only":mk("float32", "xla", True, "fused"),
    "full_tuned":  mk("bfloat16", "pallas", True, "fused"),
}

exact_cfg = VARIANTS["exact"]
params = init_model(jax.random.PRNGKey(0), exact_cfg)
params = doctor_params(params, jax.random.PRNGKey(1))

@jax.jit
def _probe(params, img1):
    f = extract_features(params, exact_cfg, img1)
    return decode_pair(params, exact_cfg, f, f).pred_logits[0]

rng = np.random.default_rng(2)
frames = [smooth_img(rng, H, W) for _ in range(NF)]
probe = jnp.asarray(frames[0][None, ::4, ::4])
params, calib = calibrate_class_head(
    params, _probe(params, probe), jax.random.PRNGKey(3),
    target_valid=48, threshold=base.postprocess.threshold)
print("calib", calib, flush=True)

def run(cfg):
    @jax.jit
    def step(params, img, ref_feats):
        cur = extract_features(params, cfg, img)
        outs = decode_pair(params, cfg, ref_feats, cur)
        post = postprocess_frame(
            outs.pred_logits[0], outs.pred_masks[0], outs.embeddings[0],
            outs.fcn_output[0], (H, W), cfg.postprocess)
        return cur, post
    @jax.jit
    def extract(params, img):
        return extract_features(params, cfg, img)
    img0 = jnp.asarray(frames[0][None])
    feats = extract(params, img0)
    posts = []
    for f in frames:
        feats, p = step(params, jnp.asarray(f[None]), feats)
        posts.append(jax.device_get(p))
    return posts

ex = run(VARIANTS["exact"])
out = {}
for name, cfg in VARIANTS.items():
    if name == "exact":
        continue
    ps = run(cfg)
    ms = [compare_results(e, t) for e, t in zip(ex, ps)]
    agg = {
        "pan_matched_min": min(m["pan_agreement_matched"] for m in ms),
        "sseg_min": min(m["sseg_agreement"] for m in ms),
        "unmatched": sum(m["kept_unmatched"] for m in ms),
        "kept_exact": sum(m["n_kept_exact"] for m in ms),
        "drift": max(m["max_score_drift"] for m in ms),
    }
    out[name] = agg
    print(name, json.dumps(agg), flush=True)
print(json.dumps(out, indent=1))
