"""Panoptic post-processing — jittable, fixed slot capacity.

Behavioral re-implementation of the reference's
``PostProcessPanopticInstances`` (reference
mmdet/models/detectors/vps_temporal_slots.py:528-807) plus the detector-side
panoptic id remap (:323-435), re-designed for XLA: no data-dependent shapes.
Variable-length instance lists become a fixed capacity of ``K`` slots with
validity flags, the score-sorted greedy mask-removal loop becomes a
``lax.scan`` over slot positions carrying pixel-ownership maps, and the
iterative small-segment filter becomes a ``lax.while_loop``.

Pipeline (semantics matched step-for-step):
 1. threshold keep: class != no-obj and softmax score > 0.85 (:685-696),
 2. bilinear-upsample mask logits to full resolution (:697-698),
 3. reorder slots: stuff (score desc), things (score desc), invalid
    (:591-599 keeps stuff first in sorted order),
 4. greedy mask removal over things (:601-639): binarize the kept-slot
    softmax at 0.4; drop a mask if it is all-0/all-1, or its overlap with
    same-class already-claimed pixels exceeds 3% of its area; otherwise it
    claims its still-unclaimed pixels,
 5. per-pixel argmax over the modified mask stack, duplicate-stuff dedup on
    the first pass (:724-758),
 6. iterative area<=4 filter with argmax recompute (:762-790),
 7. panoptic id remap: stuff pixel -> class id, thing pixel -> 11 + rank of
    its slot among kept things (:414-435).

The reference's id2rgb -> PIL NEAREST resize -> rgb2id round trip (:745-751)
is an identity here because Cityscapes eval guarantees target size ==
processed size (asserted by the reference at :310-312, :437-439).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from slotvps_tpu.config import ModelConfig, PostprocessConfig
from slotvps_tpu.ops.interpolate import (interpolate_bilinear, upsample_x4_bilinear)

_NEG = -1e30


class PostprocResult(NamedTuple):
    """Fixed-capacity per-frame result (order: stuff desc, things desc,
    invalid).  Host code converts to variable-length lists."""

    kept: jnp.ndarray         # [K] bool — survives all filtering
    is_thing: jnp.ndarray     # [K] bool
    labels: jnp.ndarray       # [K] int32 class ids (0..18)
    scores: jnp.ndarray       # [K] f32
    embeddings: jnp.ndarray   # [K, D] slot embeddings (for tracking)
    thing_rank: jnp.ndarray   # [K] int32 rank among kept things (-1 else)
    panoptic: jnp.ndarray     # [H, W] int32: stuff class / 11+rank / 255
    sseg: jnp.ndarray         # [H, W] int32 semantic argmax
    n_kept: jnp.ndarray       # [] int32
    n_things: jnp.ndarray     # [] int32
    n_loop: jnp.ndarray       # [] int32 small-area-filter iterations run
    #                           (regime diagnostic, VERDICT r3 ask #1)


def _slot_order(scores, classes, cfg: PostprocessConfig):
    """Permutation: stuff (score desc), things (score desc), invalid."""
    no_obj = cfg.num_classes - 1
    valid = (classes != no_obj) & (scores > cfg.threshold)
    is_stuff = classes <= cfg.num_stuff - 1
    # score-desc order matching np.argsort(x)[::-1] tie behavior
    by_score = jnp.argsort(scores, stable=True)[::-1]
    group = jnp.where(valid[by_score],
                      jnp.where(is_stuff[by_score], 0, 1), 2)
    perm = by_score[jnp.argsort(group, stable=True)]
    return perm, valid


def _mask_removal_scan(logit, labels, is_thing, valid,
                       cfg: PostprocessConfig):
    """Greedy per-slot claim loop (reference :601-639).

    logit: [K, H, W] bool binarized masks (softmax >= pixel_threshold over
    valid slots).  Returns (kept [K] bool, owner [H, W] int8 — claiming
    slot position or -1)."""
    k, h, w = logit.shape
    assert k <= 127  # owner maps are int8
    mask_sum = logit.reshape(k, -1).sum(axis=1)

    def step(carry, i):
        owner, owner_class = carry
        lg = logit[i]
        n = mask_sum[i]
        cls = labels[i].astype(jnp.int8)
        same_class_claimed = (owner >= 0) & (owner_class == cls)
        overlap = (lg & same_class_claimed).sum()
        degenerate = (n == 0) | (n == h * w)
        reject = degenerate | (overlap / jnp.maximum(n, 1)
                               > cfg.fraction_threshold)
        keep_i = valid[i] & is_thing[i] & ~reject
        claim = lg & (owner < 0) & keep_i
        owner = jnp.where(claim, i.astype(jnp.int8), owner)
        owner_class = jnp.where(claim, cls, owner_class)
        return (owner, owner_class), keep_i

    init = (jnp.full((h, w), -1, jnp.int8), jnp.full((h, w), -1, jnp.int8))
    (owner, _), keep_things = jax.lax.scan(step, init, jnp.arange(k))
    if not cfg.apply_mask_removal_only_ins:
        raise NotImplementedError(
            "only apply_mask_removal_only_ins=True is used by the reference "
            "configs (r50_fpn_slotvps.py:72)")
    kept = jnp.where(is_thing, keep_things, valid)
    return kept, owner


def _dedup_map(labels, is_thing, kept):
    """First-kept-stuff-position per class (reference :736-741)."""
    k = labels.shape[0]
    pos = jnp.arange(k)
    stuff_kept = kept & ~is_thing
    # first kept position per class: scatter-min over labels
    # (64 bins covers every config: Mapillary has 47 classes)
    first = jnp.full((64,), k, jnp.int32).at[
        jnp.where(stuff_kept, labels, 63)
    ].min(jnp.where(stuff_kept, pos, k))
    mapped = jnp.where(stuff_kept, first[labels], pos)
    return jnp.where(mapped < k, mapped, pos)


def _argmax_pass(final_vals_hwk, kept, dedup, labels, is_thing):
    """[H, W, K] masked argmax + per-slot areas (reference get_ids_area).

    K rides the minor (lane) axis so the argmax reduction runs at full VPU
    bandwidth."""
    k = final_vals_hwk.shape[-1]
    vals = jnp.where(kept, final_vals_hwk, _NEG)
    m_id = jnp.argmax(vals, axis=-1).astype(jnp.int32)
    if dedup:
        m_id = _dedup_map(labels, is_thing, kept)[m_id]
    # broadcast-compare reduction: ~20x faster than a 2M-index scatter-add
    areas = (m_id[..., None] == jnp.arange(k, dtype=jnp.int32)).sum(
        axis=(0, 1), dtype=jnp.int32)
    areas = jnp.where(kept, areas, 0)
    return m_id, areas


def _finish(kept, m_id, classes, scores, embeds, is_thing, sseg, cfg,
            n_loop=0):
    """Panoptic id remap + result assembly (shared by all impls)."""
    kept_thing = kept & is_thing
    thing_rank = jnp.where(kept_thing,
                           jnp.cumsum(kept_thing.astype(jnp.int32)) - 1, -1)
    slot_value = jnp.where(kept_thing, cfg.num_stuff + thing_rank,
                           jnp.where(kept, classes, 255))
    any_kept = jnp.any(kept)
    panoptic = jnp.where(any_kept, slot_value[m_id], 255).astype(jnp.int32)
    return PostprocResult(
        kept=kept, is_thing=is_thing, labels=classes, scores=scores,
        embeddings=embeds, thing_rank=thing_rank.astype(jnp.int32),
        panoptic=panoptic, sseg=sseg,
        n_kept=kept.sum().astype(jnp.int32),
        n_things=kept_thing.sum().astype(jnp.int32),
        n_loop=jnp.asarray(n_loop, jnp.int32))


def _small_fn(cfg: PostprocessConfig):
    if cfg.filter_small_option == "4":
        return lambda areas, cls: areas <= 4
    if cfg.filter_small_option == "4_256":
        return lambda areas, cls: jnp.where(cls > cfg.num_stuff - 1,
                                            areas < 256, areas < 4)
    if cfg.filter_small_option == "4096_256":
        return lambda areas, cls: jnp.where(cls > cfg.num_stuff - 1,
                                            areas < 256, areas < 4096)
    raise ValueError(cfg.filter_small_option)


def _postprocess_fused(masks_khw, scores, classes, valid, embeds, is_thing,
                       fcn_output, cfg: PostprocessConfig):
    """Fully fused TPU path: the [H, W, K] upsampled stack never exists.

    Slot-major v3 kernels (ops/pallas/postproc_v3.py): slots on sublanes,
    low-res width on lanes, full-res maps phase-blocked [4, 4, h, w].

    ``fcn_output`` arrives either full-res [H, W, 19] (argmaxed directly)
    or quarter-res [h, w, 19] (semantic_head ``fused_sseg=True``), in
    which case the x4 upsample + argmax run fused in one kernel and the
    full-res 19-channel logits never exist."""
    from slotvps_tpu.ops.pallas.postproc_v3 import (
        argmax_v3, claim_v3, from_blocked, repair_v3, sseg_v3, theta_v3)

    if not cfg.apply_mask_removal_only_ins:
        raise NotImplementedError(
            "only apply_mask_removal_only_ins=True is supported")
    if fcn_output.shape[:2] == masks_khw.shape[1:]:
        sseg = from_blocked(sseg_v3(fcn_output.transpose(2, 0, 1)))
    else:
        sseg = jnp.argmax(fcn_output, axis=-1).astype(jnp.int32)
    theta_b = theta_v3(masks_khw, valid, cfg.pixel_threshold)
    keep_things, owner_b = claim_v3(
        masks_khw, theta_b, classes, is_thing, valid,
        cfg.fraction_threshold)
    kept = jnp.where(is_thing, keep_things, valid)
    small = _small_fn(cfg)
    k = classes.shape[0]
    kp = -(-k // 8) * 8

    # First pass also emits PER-TILE per-slot pixel counts: each
    # small-area-filter iteration then recomputes the argmax only on
    # row-tiles actually containing pixels of the removed slots
    # (ops/pallas/postproc_v3.repair_v3) — removed segments are tiny by
    # definition, so a production iteration touches ~1-2 tiles and costs
    # an id-map copy, not a full [K, H, W] recompute (reference :762-790
    # recomputes in full; removals only change pixels whose winner was
    # removed, so clean tiles are exact copies).
    m1_b, areas_t = argmax_v3(masks_khw, owner_b, kept, is_thing,
                              per_tile=True)               # [T, kp]
    dmap = _dedup_map(classes, is_thing, kept)
    m_disp = dmap[m1_b]
    fold = (dmap[None, :] == jnp.arange(k)[:, None]).astype(jnp.int32)
    areas = jnp.where(kept, fold @ areas_t.sum(0)[:k], 0)

    def cond(state):
        kept_, _, _, _, areas_, _ = state
        return jnp.any(kept_ & small(areas_, classes)) & jnp.any(kept_)

    def body(state):
        kept_, _, m1, areas_t_, areas_, n_loop = state
        removed = kept_ & small(areas_, classes)
        kept_n = kept_ & ~removed
        removed_p = jnp.pad(removed, (0, kp - k))
        # dirty row-tiles: those with pixels whose RAW winner was removed
        dirty = ((areas_t_ > 0) & removed_p[None, :]).any(-1)   # [T]
        m1n, areas_tn = repair_v3(masks_khw, owner_b, m1, kept_n,
                                  is_thing, dirty, areas_t_)
        areas_n = jnp.where(kept_n, areas_tn.sum(0)[:k], 0)
        # after any iteration the display map is the RAW winner map (the
        # exact path's loop recomputes with dedup=False, :399-404)
        return kept_n, m1n, m1n, areas_tn, areas_n, n_loop + 1

    kept, m_disp, _, _, areas, n_loop = jax.lax.while_loop(
        cond, body, (kept, m_disp, m1_b, areas_t, areas, jnp.int32(0)))
    return _finish(kept, from_blocked(m_disp), classes, scores, embeds,
                   is_thing, sseg, cfg, n_loop=n_loop)


def postprocess_frame(
    pred_logits: jnp.ndarray,   # [K, C]
    pred_masks: jnp.ndarray,    # [K, h, w] quarter-res logits
    embeddings: jnp.ndarray,    # [K, D]
    fcn_output: jnp.ndarray,    # [H, W, 19] full-res, or [h, w, 19]
                                # quarter-res (semantic_head fused_sseg)
    out_size: Tuple[int, int],
    cfg: PostprocessConfig,
) -> PostprocResult:
    """Full per-frame post-processing (jit-friendly, static shapes).

    ``out_size`` is the TARGET (original) size.  When the processed size
    differs (e.g. VIPER 1080 padded to 1088), masks are interpolated
    directly to the target (reference vps_temporal_slots.py:313-316 passes
    ori_shape to the postprocessor) and the semantic logits are resized to
    the target before the argmax (reference :440-451)."""
    k = pred_logits.shape[0]
    h, w = out_size
    fused_ok = (cfg.impl == "fused" and cfg.apply_mask_removal
                and (h, w) == (4 * pred_masks.shape[1],
                               4 * pred_masks.shape[2]))
    # semantic_head fused_sseg=True ships quarter-res fcn logits; the
    # fused impl upsamples+argmaxes them in one kernel.  Any other route
    # reproduces the reference's staging exactly: x4 upsample first
    # (:697-698), then resize to ori_shape (:440-451) — NOT a single
    # direct interpolation, whose weights would differ.
    fcn_quarter = fcn_output.shape[:2] == pred_masks.shape[1:]
    if fcn_quarter and not fused_ok:
        fcn_output = upsample_x4_bilinear(fcn_output)
        fcn_quarter = False
    if not fcn_quarter and fcn_output.shape[:2] != (h, w):
        fcn_output = interpolate_bilinear(fcn_output, (h, w),
                                          align_corners=False)

    probs = jax.nn.softmax(pred_logits, axis=-1)
    scores = probs.max(axis=-1)
    classes = probs.argmax(axis=-1).astype(jnp.int32)

    perm, valid = _slot_order(scores, classes, cfg)
    scores = scores[perm]
    classes = classes[perm]
    valid = valid[perm]
    embeds = embeddings[perm]
    masks = pred_masks[perm]
    is_thing = classes > cfg.num_stuff - 1

    if fused_ok:
        cap = cfg.detect_capacity
        if 0 < cap < k:
            # every valid slot sits in the permutation's prefix (stuff
            # desc, things desc, invalid — _slot_order), so when at most
            # ``c`` slots are valid the whole fused pipeline can run on
            # the first ``c`` slots with bit-identical results.  TIERED
            # ladder: the fixed passes (theta, argmax/top-2, hist) scale
            # linearly with the prefix, so a typical production frame
            # (10-40 valid at threshold 0.85) takes the half-capacity
            # branch; the final fallback is the exact full pipeline.
            def _sliced(c):
                def run(_):
                    r = _postprocess_fused(
                        masks[:c], scores[:c], classes[:c], valid[:c],
                        embeds[:c], is_thing[:c], fcn_output, cfg)
                    pad = k - c
                    return PostprocResult(
                        kept=jnp.concatenate(
                            [r.kept, jnp.zeros((pad,), bool)]),
                        is_thing=is_thing, labels=classes, scores=scores,
                        embeddings=embeds,
                        thing_rank=jnp.concatenate(
                            [r.thing_rank, jnp.full((pad,), -1,
                                                    jnp.int32)]),
                        panoptic=r.panoptic, sseg=r.sseg,
                        n_kept=r.n_kept, n_things=r.n_things,
                        n_loop=r.n_loop)
                return run

            def _full(_):
                return _postprocess_fused(masks, scores, classes, valid,
                                          embeds, is_thing, fcn_output,
                                          cfg)

            n_valid = valid.sum()
            half = cap // 2
            if half >= 8:
                return jax.lax.cond(n_valid <= half, _sliced(half),
                                    lambda _: jax.lax.cond(
                                        n_valid <= cap, _sliced(cap),
                                        _full, None), None)
            return jax.lax.cond(n_valid <= cap, _sliced(cap), _full, None)
        return _postprocess_fused(masks, scores, classes, valid,
                                  embeds, is_thing, fcn_output, cfg)
    masks_hwk = masks.transpose(1, 2, 0)
    # the [H, W, K] stack in cfg.stack_dtype (bf16 halves HBM traffic of
    # every subsequent pass; reductions below accumulate in f32)
    masks_hwk = masks_hwk.astype(jnp.dtype(cfg.stack_dtype))

    # upsample to full res (reference :697-698, bilinear align_corners=False)
    # [K, h, w] -> [H, W, K]: slots on the minor axis for fast reductions
    if (h, w) == (4 * masks.shape[1], 4 * masks.shape[2]):
        raw_hwk = upsample_x4_bilinear(masks_hwk)
    else:
        raw_hwk = interpolate_bilinear(masks_hwk, (h, w),
                                       align_corners=False)

    if cfg.apply_mask_removal:
        # binarize the per-pixel softmax over *valid* slots (reference :572,
        # :606-608) without materializing it:  softmax_k(x) >= thr  iff
        # x_k >= log(thr) + logsumexp over valid slots
        masked = jnp.where(valid, raw_hwk, jnp.asarray(_NEG, raw_hwk.dtype))
        mx = jnp.max(masked, axis=-1, keepdims=True)
        lse = mx.astype(jnp.float32) + jnp.log(jnp.maximum(
            jnp.sum(jnp.exp((masked - mx).astype(jnp.float32)),
                    axis=-1, keepdims=True), 1e-30))
        theta = jnp.log(cfg.pixel_threshold) + lse       # [H, W, 1] f32
        # threshold compare in f32 even for the bf16 stack: rounding theta
        # to bf16 could flip pixels within 1 ulp of the softmax threshold
        # (the upcast fuses into the compare — no extra HBM traffic)
        logit_khw = ((raw_hwk.astype(jnp.float32) >= theta)
                     & valid).transpose(2, 0, 1)
        if cfg.impl == "pallas":
            from slotvps_tpu.ops.pallas.claim_scan import claim_scan_pallas

            if not cfg.apply_mask_removal_only_ins:
                raise NotImplementedError(
                    "only apply_mask_removal_only_ins=True is supported")
            keep_things, owner = claim_scan_pallas(
                logit_khw, classes, is_thing, valid,
                cfg.fraction_threshold)
            kept = jnp.where(is_thing, keep_things, valid)
        else:
            kept, owner = _mask_removal_scan(logit_khw, classes, is_thing,
                                             valid, cfg)
        pos = jnp.arange(k)
        final_vals = jnp.where(
            is_thing,
            jnp.where(owner[..., None] == pos, raw_hwk, 0.0),
            raw_hwk)
    else:
        kept = valid
        final_vals = raw_hwk

    # argmax fusion + iterative small-area filter (reference :758-790)
    small = _small_fn(cfg)
    m_id, areas = _argmax_pass(final_vals, kept, True, classes, is_thing)

    def cond(state):
        kept_, _, areas_, _ = state
        return jnp.any(kept_ & small(areas_, classes)) & jnp.any(kept_)

    def body(state):
        kept_, _, areas_, n_loop = state
        kept_ = kept_ & ~small(areas_, classes)
        m_id_, areas_ = _argmax_pass(final_vals, kept_, False, classes,
                                     is_thing)
        return kept_, m_id_, areas_, n_loop + 1

    kept, m_id, areas, n_loop = jax.lax.while_loop(
        cond, body, (kept, m_id, areas, jnp.int32(0)))
    # panoptic id remap (reference :414-435): thing -> stuff_num + rank
    sseg = jnp.argmax(fcn_output, axis=-1).astype(jnp.int32)
    return _finish(kept, m_id, classes, scores, embeds, is_thing,
                   sseg, cfg, n_loop=n_loop)
