"""Detection-regime calibration for random-init parameters (pure JAX).

A freshly initialized model keeps essentially nothing at the production
keep-threshold 0.85: the final class head carries the focal-loss prior
bias (pi=0.01), so every slot's softmax collapses onto the no-object
class (reference slot head init, mmdet/models/detectors/
multi_scale_dynamic_mask_head.py focal bias; our
models/slot_head.py:86-96).  Benchmarks run on random weights would
therefore measure the postprocessor's *empty* branch — the claim scan,
small-area while_loop and tracking all see zero detections, which is NOT
the production workload (a real Cityscapes frame keeps tens of
segments, reference vps_temporal_slots.py:659-807).

This module pushes a random-init parameter tree into a realistic
detection regime without any torch dependency — the JAX analog of the
golden suite's reference-side doctoring
(tests/test_golden_model.py::_doctor / _calibrate_class_head):

  * ``doctor_params``   — amplify the slot queries (diversifies per-slot
    argmax classes), sharpen ``fg_bn`` so the per-pixel slot softmax
    binarizes (masks claim real pixel sets), and make the DCN offsets
    bias-driven (trained offset heads emit small displacements; the raw
    zero-init emits exactly zero, skipping fractional sampling).
  * ``calibrate_class_head`` — center the final-stage class logits over
    slots and binary-search the sharpening scale so a target number of
    slots clears the keep rule (argmax != no-object and softmax max >
    threshold) — the slot population a trained head produces.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def doctor_params(params: Dict, key, offset_range: float = 1.5,
                  fg_scale: float = 2.0, fg_var: float = 0.01) -> Dict:
    """Return a copy of ``params`` doctored into a rich mask regime.

    ``offset_range`` bounds the per-tap DCN offset biases (pixels); keep
    it within the configured DCN halo so the Pallas kernel's contract is
    honored (trained heads satisfy the same bound,
    utils/diagnostics.check_dcn_halo).
    """
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    params = jax.device_get(params)  # host copy we can mutate freely
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # 1. diversify slot queries: near-identical random queries collapse
    #    every slot onto 1-2 argmax classes after the decoder
    params["init_mask_query"] = params["init_mask_query"] * 8.0

    # 2. sharpen fg_bn (reference init weight 0.1 -> 2.0, var -> 0.01):
    #    the per-pixel softmax over slots binarizes, so claim/area passes
    #    operate on real pixel sets instead of uniform mush
    params["fg_bn"] = dict(params["fg_bn"],
                           scale=jnp.full((1,), fg_scale, jnp.float32),
                           mean=jnp.zeros((1,), jnp.float32),
                           var=jnp.full((1,), fg_var, jnp.float32))

    # 3. bias-driven DCN offsets: zero-init offset convs emit exactly
    #    zero displacement (integer sampling only); trained heads emit
    #    small fractional offsets — emulate with per-tap biases
    tower = []
    for blk_i, blk in enumerate(params["semantic_head"]["tower"]):
        key, sub = jax.random.split(key)
        bias = (jax.random.uniform(sub, (18,)) - 0.5) * 2 * offset_range
        tower.append(dict(blk, offset=dict(blk["offset"], b=bias)))
    params["semantic_head"] = dict(params["semantic_head"], tower=tower)
    return params


def _valid_count(logits: np.ndarray, scale: float, no_obj: int,
                 threshold: float) -> int:
    z = logits * scale
    z = z - z.max(axis=-1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=-1, keepdims=True)
    cls = p.argmax(axis=-1)
    return int(((cls != no_obj) & (p.max(axis=-1) > threshold)).sum())


def calibrate_class_head(
    params: Dict,
    final_logits: jnp.ndarray,
    key,
    target_valid: int = 48,
    threshold: float = 0.85,
    noise_std: float = 0.3,
) -> Tuple[Dict, dict]:
    """Rescale the last decoder stage's class head so ~``target_valid``
    slots clear the keep rule on the probe input.

    ``final_logits``: [L, C] final-stage class logits from one forward
    pass of the *doctored* params on a representative input.  The head is
    replaced by ``w' = s*w, b' = s*(b - mean_logits) + noise`` — i.e. the
    new logits on the probe are ``s * (logits - mean-over-slots) +
    noise`` — and ``s`` is binary-searched so the keep count lands on
    ``target_valid``.  Returns (new params, info dict).
    """
    logits = np.asarray(final_logits, np.float64)
    mean = logits.mean(axis=0, keepdims=True)
    noise = noise_std * np.asarray(
        jax.random.normal(key, (logits.shape[1],)), np.float64)
    centered = (logits - mean) + noise
    no_obj = logits.shape[1] - 1

    # monotone in s (sharper softmax -> more slots above threshold);
    # bracket then bisect on the count
    lo, hi = 1e-3, 1.0
    while _valid_count(centered, hi, no_obj, threshold) < target_valid \
            and hi < 1e4:
        hi *= 2.0
    for _ in range(60):
        mid = 0.5 * (lo + hi)
        if _valid_count(centered, mid, no_obj, threshold) < target_valid:
            lo = mid
        else:
            hi = mid
    scale = hi
    n_valid = _valid_count(centered, scale, no_obj, threshold)

    stages = list(params["slot_head"]["stages"])
    last = stages[-1]
    head = last["class_logits"]
    std = max(float(np.abs(centered).std()), 1e-6)
    new_head = {
        "w": head["w"] * scale,
        "b": (head["b"] - jnp.asarray(mean[0], jnp.float32)) * scale
             + jnp.asarray(noise, jnp.float32) * scale,
    }
    stages[-1] = dict(last, class_logits=new_head)
    params = dict(params, slot_head=dict(params["slot_head"],
                                         stages=stages))
    info = {"scale": float(scale), "n_valid_probe": n_valid,
            "logit_std": std}
    return params, info
