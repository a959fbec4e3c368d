"""Training step: two-frame forward + PQ/mask-id/semantic losses + optax.

The reference never released training (SURVEY.md §2); this is the native
trainer the framework ships instead, using the loss recipe the reference's
configs document (training/losses.py) and the reference's optimizer settings
(AdamW lr 1e-4, weight_decay 1e-4, grad clip max_norm 1 —
reference configs/cityscapes/r50_fpn_slotvps.py:198-199).

SPMD: the step jits over a Mesh with the batch sharded on 'data' and
optional tensor parallelism on 'model' (parallel/mesh.py).  Gradient
all-reduce is inserted by the partitioner — no DistOptimizerHook equivalent
needed.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from slotvps_tpu.config import ModelConfig
from slotvps_tpu.models.detector import (
    FrameFeatures, decode_pair, extract_features)
from slotvps_tpu.models.semantic_head import (
    apply_semantic_head, semantic_loss)
from slotvps_tpu.models.fpn import apply_fpn
from slotvps_tpu.models.detector import apply_backbone
from slotvps_tpu.training.losses import pq_loss


class TrainBatch(NamedTuple):
    """Fixed-capacity training batch (pads to G GT slots).

    ``gt_pids`` are the track-id targets: 0 = new object, j = 1-based index
    into the reference frame's GT list (reference
    cityscapes_vps.py:246-248)."""

    img: jnp.ndarray         # [B, H, W, 3]
    ref_img: jnp.ndarray     # [B, H, W, 3]
    gt_labels: jnp.ndarray   # [B, G] int32
    gt_masks: jnp.ndarray    # [B, G, H/4, W/4] {0,1}
    gt_valid: jnp.ndarray    # [B, G] bool
    gt_semantic: jnp.ndarray  # [B, H/4, W/4] int32 (255 = ignore)
    ref_gt_labels: jnp.ndarray  # [B, G] int32
    ref_gt_masks: jnp.ndarray   # [B, G, H/4, W/4] {0,1}
    ref_gt_valid: jnp.ndarray   # [B, G] bool
    gt_pids: jnp.ndarray        # [B, G] int32


def make_train_batch(img, ref_img, gt_labels, gt_masks, gt_valid,
                     gt_semantic, ref_gt_labels=None, ref_gt_masks=None,
                     ref_gt_valid=None, gt_pids=None) -> TrainBatch:
    """TrainBatch builder; reference-frame GT defaults to mirroring the
    current frame (static pseudo-video before shifting) with identity
    pids."""
    if ref_gt_labels is None:
        ref_gt_labels = gt_labels
        ref_gt_masks = gt_masks
        ref_gt_valid = gt_valid
    if gt_pids is None:
        g = gt_labels.shape[-1]
        gt_pids = jnp.where(gt_valid, jnp.arange(1, g + 1,
                                                 dtype=jnp.int32), 0)
    return TrainBatch(img, ref_img, gt_labels, gt_masks, gt_valid,
                      gt_semantic, ref_gt_labels, ref_gt_masks,
                      ref_gt_valid, gt_pids)


def trainable_mask(params) -> Dict:
    """BatchNorm running statistics are buffers, not weights (torch
    semantics; the reference's backbone runs norm_eval=True).  Optimizing
    them diverges immediately: one AdamW step can push ``var`` negative and
    ``rsqrt(var + eps)`` in batch_norm_eval turns the whole forward NaN."""
    def keep(path, leaf):
        last = path[-1]
        name = getattr(last, "key", None)
        return name not in ("mean", "var")

    return jax.tree_util.tree_map_with_path(keep, params)


def make_optimizer(lr=1e-4, weight_decay: float = 1e-4,
                   clip_norm: float = 1.0, params=None):
    """AdamW with the reference's settings (r50_fpn_slotvps.py:198-199);
    pass ``params`` to freeze the BN statistics (required for training).

    The freeze needs TWO stages: ``optax.masked`` passes masked-out
    leaves' updates through UNCHANGED — i.e. the *raw gradient*, not
    zero — so a lone ``masked(adamw, trainable)`` silently adds raw
    ``d loss/d var`` to the running stats every step, and one step can
    push ``var`` negative (forward NaN via ``rsqrt``).  Found round 5:
    the trained-regime overfit diverged at step 2 on chip and CPU alike
    while standalone step-1 gradients were clean.  The second
    ``masked(set_to_zero(), ~trainable)`` stage pins the buffers."""
    opt = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    if params is not None:
        tm = trainable_mask(params)
        opt = optax.chain(
            optax.masked(opt, tm),
            optax.masked(optax.set_to_zero(),
                         jax.tree.map(lambda b: not b, tm)))
    return opt


def loss_fn(params: Dict, cfg: ModelConfig, batch: TrainBatch,
            loss_pano_weight: float = 0.5,
            fixed_match: bool = False) -> Tuple[jnp.ndarray, Dict]:
    # forward both frames jointly (same path as inference)
    both = jnp.concatenate([batch.ref_img, batch.img], axis=0)
    feats = apply_backbone(params, cfg, both)
    fpn_outs = apply_fpn(params["fpn"], feats, num_outs=cfg.fpn.num_outs)
    _, fcn_score, feat_before = apply_semantic_head(
        params["semantic_head"], fpn_outs[:cfg.semantic_head.num_levels],
        cfg.semantic_head)
    from slotvps_tpu.models import layers as L
    feat_trans = tuple(
        L.conv2d(params["conv_trans"], f, padding=0) for f in feat_before)
    b = batch.img.shape[0]
    ref_feats = FrameFeatures(
        feat_trans=tuple(f[:b] for f in feat_trans),
        fcn_output=fcn_score[:b].astype(jnp.float32))
    cur_feats = FrameFeatures(
        feat_trans=tuple(f[b:] for f in feat_trans),
        fcn_output=fcn_score[b:].astype(jnp.float32))
    from slotvps_tpu.models.detector import decode_pair_train
    from slotvps_tpu.training.losses import (
        insdis_loss, match_loss, pq_loss_with_match)

    outs, aux, extras = decode_pair_train(params, cfg, ref_feats, cur_feats)
    ref_outs = extras["ref"]

    per_frame = jax.vmap(
        functools.partial(pq_loss_with_match, fixed_match=fixed_match),
        in_axes=(0, 0, 0, 0, 0))
    losses, slot_idx = per_frame(outs.pred_logits, outs.pred_masks,
                                 batch.gt_labels, batch.gt_masks,
                                 batch.gt_valid)
    metrics = {k: v.mean() for k, v in losses.items()}
    # reference-frame supervision (both frames carry GT in the reference's
    # train pipeline, r50_fpn_slotvps.py:141-145 Collect keys ref_*)
    ref_losses, ref_slot_idx = per_frame(
        ref_outs.pred_logits, ref_outs.pred_masks, batch.ref_gt_labels,
        batch.ref_gt_masks, batch.ref_gt_valid)
    metrics["loss_ref"] = sum(v.mean() for v in ref_losses.values())
    # deep supervision over the intermediate decoder stages (reference
    # return_intermediate=True, dynamic_mask_head.py:205-211)
    aux_total = 0.0
    for a_logits, a_masks in aux:
        a_losses = jax.vmap(
            functools.partial(pq_loss, fixed_match=fixed_match),
            in_axes=(0, 0, 0, 0, 0))(
            a_logits, a_masks, batch.gt_labels, batch.gt_masks,
            batch.gt_valid)
        aux_total = aux_total + sum(v.mean() for v in a_losses.values())
    if aux:
        metrics["loss_aux"] = aux_total / len(aux)
    # track-head match loss (reference r50_fpn_slotvps.py:91-96)
    metrics["loss_match"] = jax.vmap(
        functools.partial(match_loss, track_params=params["track_head"])
    )(outs.embeddings, ref_outs.embeddings, slot_idx, ref_slot_idx,
      batch.gt_pids, batch.gt_valid, batch.ref_gt_valid).mean()
    # instance-discrimination loss (recipe instance_loss_weight=1,
    # insdis_loss_option='hand_craft', temp=0.3)
    metrics["loss_insdis"] = jax.vmap(insdis_loss)(
        extras["fine_feat"], batch.gt_masks, batch.gt_valid).mean()
    loss_sem = semantic_loss(fcn_score[b:], batch.gt_semantic,
                             cfg.semantic_head)
    metrics["loss_sem"] = loss_pano_weight * loss_sem
    total = sum(metrics.values())
    metrics["loss_total"] = total
    return total, metrics


def train_step(params: Dict, opt_state, batch: TrainBatch,
               cfg: ModelConfig, optimizer,
               fixed_match: bool = False) -> Tuple[Dict, object, Dict]:
    (_, metrics), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params, cfg, batch,
                               fixed_match=fixed_match)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, metrics
