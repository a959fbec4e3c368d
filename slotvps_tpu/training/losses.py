"""Training losses for Slot-VPS.

The reference does NOT release its training code (reference
vps_temporal_slots.py:496-497 asserts out; README.md:64), but its configs
document the loss structure it trained with: a MaX-DeepLab-style PQ loss
over slot/GT bipartite matching plus per-pixel mask-id cross-entropy and an
auxiliary semantic-head CE (reference r50_fpn_slotvps.py:55-65 commented
``maxdeeplablossC``: pq_loss_weight=3, instance_loss_weight=1,
maskid_loss_weight=0.3, alpha=0.75, temp=0.3, plus train_cfg
loss_pano_weight=0.5).  This module implements that recipe natively in JAX:

  * Hungarian matching on a class-probability x mask-dice similarity
    (optax.assignment.hungarian_algorithm — runs under jit),
  * PQ-style loss: matched pairs optimize class-prob x dice jointly,
    unmatched slots are pushed to the no-object class,
  * mask-id cross-entropy over the per-pixel slot softmax,
  * semantic-head CE (models/semantic_head.py:semantic_loss).

GT comes padded to the slot capacity with a validity mask (fixed shapes).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from optax import assignment

_EPS = 1e-6


def dice_similarity(mask_logits: jnp.ndarray,
                    gt_masks: jnp.ndarray) -> jnp.ndarray:
    """[L, H, W] slot mask logits x [G, H, W] binary GT -> [L, G] dice."""
    probs = jax.nn.sigmoid(mask_logits)
    p = probs.reshape(probs.shape[0], -1)
    g = gt_masks.reshape(gt_masks.shape[0], -1)
    inter = p @ g.T
    denom = p.sum(-1, keepdims=True) + g.sum(-1, keepdims=True).T
    return (2 * inter + _EPS) / (denom + _EPS)


def match_slots(class_probs: jnp.ndarray, dice: jnp.ndarray,
                gt_labels: jnp.ndarray, gt_valid: jnp.ndarray,
                temp: float = 0.3) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hungarian matching on similarity = p_class * dice.

    class_probs: [L, C]; dice: [L, G]; gt_labels: [G]; gt_valid: [G] bool.
    Returns (slot_idx [G], valid [G]) — the slot matched to each GT.
    """
    p_cls = class_probs[:, gt_labels]          # [L, G]
    sim = (p_cls ** temp) * dice
    # matching is a discrete decision — stop_gradient the cost.  Without it
    # the vjp of p**temp (temp<1) is inf at p==0, and inf * zero-cotangent
    # = NaN poisons every gradient a couple of steps into training.
    cost = jax.lax.stop_gradient(
        jnp.where(gt_valid[None, :], -sim, 0.0))
    _, slot_idx = assignment.hungarian_algorithm(cost.T)  # rows = GT
    return slot_idx, gt_valid


def pq_loss(
    pred_logits: jnp.ndarray,    # [L, C]
    mask_logits: jnp.ndarray,    # [L, H, W]
    gt_labels: jnp.ndarray,      # [G]
    gt_masks: jnp.ndarray,       # [G, H, W] {0,1}
    gt_valid: jnp.ndarray,       # [G] bool
    pq_weight: float = 3.0,
    maskid_weight: float = 0.3,
    alpha: float = 0.75,
    temp: float = 0.3,
    fixed_match: bool = False,
) -> Dict[str, jnp.ndarray]:
    """MaX-DeepLab-style PQ loss for one frame.

    ``fixed_match=True`` pins the assignment to slot i <-> GT i instead
    of re-running Hungarian each step.  For single-batch overfitting
    (utils/synthetic.overfit) this is essential: with near-symmetric
    slots the per-step Hungarian assignment churns, every slot receives
    the same churn-averaged target, and a collapsed decoder (all slots
    bit-identical) is a perfectly fittable optimum — measured as all 100
    slots predicting no-object at one shared score.  A fixed assignment
    makes collapse strictly suboptimal, so the gradient must break slot
    symmetry.  Real multi-scene training keeps the reference's
    matched-on-similarity semantics (default False)."""
    num_classes = pred_logits.shape[-1]
    class_probs = jax.nn.softmax(pred_logits, axis=-1)
    dice = dice_similarity(mask_logits, gt_masks)
    if fixed_match:
        slot_idx = jnp.arange(gt_labels.shape[0], dtype=jnp.int32)
        valid = gt_valid
    else:
        slot_idx, valid = match_slots(class_probs, dice, gt_labels,
                                      gt_valid, temp)

    n_gt = jnp.maximum(valid.sum(), 1)
    # positive term: maximize p_class * dice for matched pairs
    p_matched = class_probs[slot_idx, gt_labels]       # [G]
    d_matched = dice[slot_idx, jnp.arange(dice.shape[1])]
    pos = -(jax.lax.stop_gradient(d_matched) * jnp.log(p_matched + _EPS)
            + jax.lax.stop_gradient(p_matched) * d_matched)
    loss_pos = alpha * (pos * valid).sum() / n_gt

    # negative term: unmatched slots -> no-object class
    l = pred_logits.shape[0]
    matched = jnp.zeros((l,), bool).at[slot_idx].max(valid)
    logp = jax.nn.log_softmax(pred_logits, axis=-1)
    loss_neg = -(1 - alpha) * jnp.where(
        matched, 0.0, logp[:, num_classes - 1]).sum() / jnp.maximum(
            (~matched).sum(), 1)

    # mask-id CE: per-pixel slot softmax vs matched slot id.  Where GT
    # masks overlap, the first (lowest-index) valid GT owns the pixel.
    logp_pix = jax.nn.log_softmax(mask_logits, axis=0)  # [L, H, W]
    covering = (gt_masks > 0) & gt_valid[:, None, None]
    gt_any = covering.any(axis=0)
    first_g = jnp.argmax(covering, axis=0)              # [H, W]
    pix_slot = slot_idx[first_g].astype(jnp.int32)
    ll = jnp.take_along_axis(
        logp_pix.reshape(logp_pix.shape[0], -1),
        pix_slot.reshape(1, -1), axis=0)[0].reshape(gt_any.shape)
    loss_maskid = -(ll * gt_any).sum() / jnp.maximum(gt_any.sum(), 1)

    return {
        "loss_pq": pq_weight * (loss_pos + loss_neg),
        "loss_maskid": maskid_weight * loss_maskid,
    }


def pq_loss_with_match(pred_logits, mask_logits, gt_labels, gt_masks,
                       gt_valid, fixed_match: bool = False, **kw):
    """pq_loss that also returns the GT->slot assignment (for the track
    head's match loss)."""
    losses = pq_loss(pred_logits, mask_logits, gt_labels, gt_masks,
                     gt_valid, fixed_match=fixed_match, **kw)
    if fixed_match:
        return losses, jnp.arange(gt_labels.shape[0], dtype=jnp.int32)
    class_probs = jax.nn.softmax(pred_logits, axis=-1)
    dice = dice_similarity(mask_logits, gt_masks)
    slot_idx, _ = match_slots(class_probs, dice, gt_labels, gt_valid)
    return losses, slot_idx


def match_loss(
    cur_embeds: jnp.ndarray,    # [L, D] current-frame slot embeddings
    ref_embeds: jnp.ndarray,    # [L, D] reference-frame slot embeddings
    cur_slot_idx: jnp.ndarray,  # [G] slot matched to each current GT
    ref_slot_idx: jnp.ndarray,  # [G] slot matched to each reference GT
    gt_pids: jnp.ndarray,       # [G] 0 = new, j = 1-based ref-GT index
    gt_valid: jnp.ndarray,      # [G] bool (current GTs)
    ref_gt_valid: jnp.ndarray,  # [G] bool (reference GTs)
    track_params,
    loss_weight: float = 0.5,
) -> jnp.ndarray:
    """SimpleTrackHead training loss: cross-entropy on the correlation
    matrix vs gt_pids targets (reference config r50_fpn_slotvps.py:91-96
    ``loss_match`` CrossEntropyLoss weight 0.5; head
    simple_track_head.py:58-92; targets built by cityscapes_vps.py:246-248).

    Rows = current-frame GT-matched slot embeddings, columns = [new-object,
    reference GT-matched slot embeddings]; invalid reference columns are
    masked out of the softmax."""
    from slotvps_tpu.models.track_head import apply_track_head

    cur = cur_embeds[cur_slot_idx]          # [G, D]
    ref = ref_embeds[ref_slot_idx]          # [G, D]
    score = apply_track_head(track_params, cur, ref)  # [G, G+1]
    col_valid = jnp.concatenate(
        [jnp.ones((1,), bool), ref_gt_valid])          # [G+1]
    score = jnp.where(col_valid[None, :], score, -1e30)
    logp = jax.nn.log_softmax(score, axis=-1)
    # a pid pointing at an invalid ref column can only come from padding
    tgt_ok = gt_valid & (gt_pids <= ref_gt_valid.shape[0]) \
        & col_valid[jnp.clip(gt_pids, 0, ref_gt_valid.shape[0])]
    ll = jnp.take_along_axis(logp, jnp.clip(gt_pids, 0, score.shape[1] - 1)
                             [:, None], axis=-1)[:, 0]
    return -loss_weight * (ll * tgt_ok).sum() / jnp.maximum(tgt_ok.sum(), 1)


def insdis_loss(
    feat: jnp.ndarray,          # [h, w, D] L2-normalized decoder feature
    gt_masks: jnp.ndarray,      # [G, h, w] {0,1}
    gt_valid: jnp.ndarray,      # [G] bool
    temp: float = 0.3,
    loss_weight: float = 1.0,
) -> jnp.ndarray:
    """MaX-DeepLab instance-discrimination loss ('hand_craft' variant,
    reference loss recipe r50_fpn_slotvps.py:55-65:
    ``instance_loss_weight=1, insdis_loss_option='hand_craft', temp=0.3``):
    contrast each in-mask pixel feature against per-instance mean feature
    prototypes at temperature ``temp``."""
    g = gt_masks.shape[0]
    m = gt_masks * gt_valid[:, None, None]             # [G, h, w]
    proto = jnp.einsum("ghw,hwd->gd", m, feat)
    proto = proto * jax.lax.rsqrt(
        jnp.sum(jnp.square(proto), -1, keepdims=True) + 1e-12)
    logits = jnp.einsum("hwd,gd->hwg", feat, proto) / temp
    logits = jnp.where(gt_valid, logits, -1e30)
    logp = jax.nn.log_softmax(logits, axis=-1)
    covered = m.max(axis=0) > 0                        # [h, w]
    owner = jnp.argmax(m, axis=0)                      # first covering GT
    ll = jnp.take_along_axis(logp, owner[..., None], axis=-1)[..., 0]
    return -loss_weight * (ll * covered).sum() / jnp.maximum(
        covered.sum(), 1)
