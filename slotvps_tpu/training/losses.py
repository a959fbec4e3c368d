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
) -> Dict[str, jnp.ndarray]:
    """MaX-DeepLab-style PQ loss for one frame."""
    num_classes = pred_logits.shape[-1]
    class_probs = jax.nn.softmax(pred_logits, axis=-1)
    dice = dice_similarity(mask_logits, gt_masks)
    slot_idx, valid = match_slots(class_probs, dice, gt_labels, gt_valid,
                                  temp)

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
