"""Top-level VPS detector: backbone -> FPN -> semantic head -> slot decoder.

Functional equivalent of the reference's detector pair
(reference mmdet/models/detectors/vps_temporal_slots.py:39 ``VPS_Temporal_Slots``
+ vps_capsule.py:27 ``VPS_Capsule``): one parameter tree, one pure
``extract_features`` + ``decode_pair`` pipeline instead of module mutation.

Key reference semantics preserved:
  * shared 1x1 ``conv_trans`` (128->128) on every semantic-tower level
    before the decoder (vps_capsule.py:76-79, vps_temporal_slots.py:129-135),
  * sine position embeddings per level (vps_capsule.py:94, pos_config
    hidden_dim=256 -> num_pos_feats=128),
  * ``feat_bn`` (BatchNorm2d(256), eval stats) + L2-normalize on decoder
    features, mask logits via feature x slot-embedding einsum, then
    ``fg_bn`` (BatchNorm2d(1), eval stats) over the slot maps
    (vps_temporal_slots.py:144-160; init fg_bn weight=0.1,
    vps_capsule.py:129-133).

TPU-first deviation (numerics identical): the reference recomputes the
reference frame's backbone/FPN/semantic features from scratch every step
(vps_temporal_slots.py:245-268); we compute ``extract_features`` once per
frame and carry it to the next step, halving backbone cost.  The two-frame
slot decode itself is joint (Video Retriever couples the frames) and cannot
be cached.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from slotvps_tpu.config import ModelConfig
from slotvps_tpu.models import layers as L
from slotvps_tpu.models import resnet, swin
from slotvps_tpu.models.fpn import apply_fpn, init_fpn
from slotvps_tpu.models.position_encoding import sine_position_embedding
from slotvps_tpu.models.semantic_head import (
    apply_semantic_head, init_semantic_head)
from slotvps_tpu.models.slot_head import (
    apply_slot_head, init_slot_head, retriever_attention)
from slotvps_tpu.models.track_head import init_track_head


class FrameFeatures(NamedTuple):
    """Per-frame backbone-side features carried across video steps."""

    feat_trans: Tuple[jnp.ndarray, ...]  # 4 levels, coarsest first, 128ch
    # [B, H, W, 19] full-res logits — or [B, H/4, W/4, 19] quarter-res
    # when semantic_head.fused_sseg=True (postprocess fuses the upsample)
    fcn_output: jnp.ndarray


class FrameOutputs(NamedTuple):
    """Raw per-frame model outputs (fixed slot capacity)."""

    pred_logits: jnp.ndarray   # [B, L, num_classes]
    pred_masks: jnp.ndarray    # [B, L, H/4, W/4] mask logits
    embeddings: jnp.ndarray    # [B, L, D] slot output embeddings
    fcn_output: jnp.ndarray    # [B, H, W, 19]


def init_model(key, cfg: ModelConfig) -> Dict:
    ks = jax.random.split(key, 8)
    if cfg.backbone == "resnet":
        backbone = resnet.init_resnet(
            ks[0], cfg.resnet.depth, dcn_stages=cfg.resnet.dcn_stages,
            gcb_stages=cfg.resnet.gcb_stages,
            gcb_ratio=cfg.resnet.gcb_ratio,
            r52_stem=cfg.resnet.r52_stem)
    elif cfg.backbone == "swin":
        backbone = swin.init_swin(ks[0], cfg.swin)
    else:
        raise ValueError(cfg.backbone)
    d = cfg.slot_head.dh_dim
    out_ch = cfg.semantic_head.out_channels
    params = {
        "backbone": backbone,
        "fpn": init_fpn(ks[1], cfg.fpn_in_channels(), cfg.fpn.out_channels),
        "semantic_head": init_semantic_head(ks[2], cfg.semantic_head),
        "slot_head": init_slot_head(ks[3], cfg.slot_head),
        "track_head": init_track_head(ks[4], cfg.track_head),
        # learned slot queries (vps_capsule.py:71, xavier init)
        "init_mask_query": L.xavier_uniform(
            ks[5], (cfg.proposal_num, d), cfg.proposal_num, d),
        # capsule-level shared 1x1 transform (vps_capsule.py:76-79)
        "conv_trans": L.init_conv(ks[6], 1, 1, out_ch, out_ch),
        "fg_bn": L.init_bn(1),
        "feat_bn": L.init_bn(d),
    }
    # reference init: fg_bn weight 0.1 (vps_capsule.py:129)
    params["fg_bn"]["scale"] = jnp.full((1,), 0.1, jnp.float32)
    if cfg.pos_embedding in ("learned", "v3"):
        from slotvps_tpu.models.position_encoding import (
            init_learned_position_embedding)

        params["pos_embed"] = init_learned_position_embedding(
            ks[7], cfg.pos_hidden_dim // 2)
    return params


def apply_backbone(params, cfg: ModelConfig, img: jnp.ndarray):
    if cfg.backbone == "resnet":
        return resnet.apply_resnet(params["backbone"], img,
                                   depth=cfg.resnet.depth,
                                   out_indices=cfg.resnet.out_indices)
    return swin.apply_swin(params["backbone"], img, cfg.swin)


def extract_features(params: Dict, cfg: ModelConfig,
                     img: jnp.ndarray) -> FrameFeatures:
    """Backbone -> FPN -> semantic head -> conv_trans for one frame batch.

    img: [B, H, W, 3] normalized.  Mirrors
    vps_temporal_slots.py:245-268 (extract_feat + extract_semantic_feats +
    semantic_trans_ins) for a single frame.
    """
    img = img.astype(jnp.dtype(cfg.compute_dtype))
    feats = apply_backbone(params, cfg, img)
    fpn_outs = apply_fpn(params["fpn"], feats, num_outs=cfg.fpn.num_outs)
    fcn_output, _, feat_before = apply_semantic_head(
        params["semantic_head"], fpn_outs[:cfg.semantic_head.num_levels],
        cfg.semantic_head)
    feat_trans = tuple(
        L.conv2d(params["conv_trans"], f, padding=0) for f in feat_before)
    # fp32 guard on the semantic logits (vps_temporal_slots.py:125-126)
    return FrameFeatures(feat_trans=feat_trans,
                         fcn_output=fcn_output.astype(jnp.float32))


def _position_embeddings(cfg: ModelConfig,
                         feat_trans: Sequence[jnp.ndarray],
                         params: Dict | None = None):
    if cfg.pos_embedding in ("learned", "v3"):
        from slotvps_tpu.models.position_encoding import (
            learned_position_embedding)

        return [
            learned_position_embedding(params["pos_embed"], f.shape[1],
                                       f.shape[2], dtype=f.dtype)
            for f in feat_trans
        ]
    return [
        sine_position_embedding(f.shape[1], f.shape[2],
                                num_pos_feats=cfg.pos_hidden_dim // 2,
                                dtype=f.dtype)
        for f in feat_trans
    ]


def decode_pair(params: Dict, cfg: ModelConfig,
                ref_feats: FrameFeatures,
                cur_feats: FrameFeatures) -> FrameOutputs:
    """Joint two-frame slot decode + final mask logits for the current frame
    (vps_temporal_slots.py:270-308 + generate_final_outputs :144-160)."""
    pos = _position_embeddings(cfg, cur_feats.feat_trans, params)
    ref_pos = _position_embeddings(cfg, ref_feats.feat_trans, params)
    if cfg.slot_head.retriever_impl == "pallas":
        from slotvps_tpu.ops.pallas.slot_attention import (
            retriever_attention_pallas)

        retriever_fn = retriever_attention_pallas
    else:
        retriever_fn = retriever_attention
    all_logits, all_embeds, all_feats = apply_slot_head(
        params["slot_head"], cfg.slot_head,
        features=[list(ref_feats.feat_trans), list(cur_feats.feat_trans)],
        init_queries=params["init_mask_query"],
        pos=[ref_pos, pos],
        retriever_fn=retriever_fn,
    )
    logits = all_logits[1][-1]      # current frame, last stage [B, L, C]
    embeds = all_embeds[1][-1]      # [B, L, D]
    dec_feats = all_feats[1]        # 4 levels, 256ch, coarsest first

    # feat_bn + channel L2-normalize on the finest decoder feature,
    # then fg_bn (BatchNorm2d(1) eval over slot maps == scalar affine)
    fine = _feat_norm(params, dec_feats[-1])
    mask_logits = _fg_bn(params,
                         jnp.einsum("bhwc,blc->blhw", fine, embeds))

    return FrameOutputs(
        pred_logits=logits.astype(jnp.float32),
        pred_masks=mask_logits.astype(jnp.float32),
        embeddings=embeds.astype(jnp.float32),
        fcn_output=cur_feats.fcn_output,
    )


def decode_pair_train(params: Dict, cfg: ModelConfig,
                      ref_feats: FrameFeatures,
                      cur_feats: FrameFeatures):
    """Like decode_pair but also returns per-stage auxiliary outputs for
    deep supervision (reference trains with return_intermediate=True,
    dynamic_mask_head.py:205-211; aux masks use the feature level of their
    stage, feat_index = stage // 2 with matched_feat_version=0,
    vps_temporal_slots.py:161-192)."""
    pos = _position_embeddings(cfg, cur_feats.feat_trans, params)
    ref_pos = _position_embeddings(cfg, ref_feats.feat_trans, params)
    all_logits, all_embeds, all_feats = apply_slot_head(
        params["slot_head"], cfg.slot_head,
        features=[list(ref_feats.feat_trans), list(cur_feats.feat_trans)],
        init_queries=params["init_mask_query"],
        pos=[ref_pos, pos],
    )
    dec_feats = all_feats[1]
    n_stages = all_logits[1].shape[0]

    normed = [
        _feat_norm(params, f) for f in dec_feats
    ]
    fine = normed[-1]
    h4, w4 = fine.shape[1:3]

    def mask_logits_for(feat, embeds):
        m = jnp.einsum("bhwc,blc->blhw", feat, embeds)
        return _fg_bn(params, m)

    final = FrameOutputs(
        pred_logits=all_logits[1][-1].astype(jnp.float32),
        pred_masks=mask_logits_for(fine, all_embeds[1][-1]).astype(
            jnp.float32),
        embeddings=all_embeds[1][-1].astype(jnp.float32),
        fcn_output=cur_feats.fcn_output,
    )
    aux = []
    for s in range(n_stages - 1):
        feat = normed[min(s // 2, len(normed) - 1)]
        m = mask_logits_for(feat, all_embeds[1][s])
        if m.shape[-2:] != (h4, w4):
            from slotvps_tpu.ops.interpolate import upsample_int_bilinear

            scale = h4 // m.shape[-2]
            m = upsample_int_bilinear(
                m.transpose(0, 2, 3, 1), scale).transpose(0, 3, 1, 2)
        aux.append((all_logits[1][s].astype(jnp.float32),
                    m.astype(jnp.float32)))

    # reference-frame final outputs (for ref-side supervision + the track
    # head's match loss) and the normalized fine feature (for the
    # instance-discrimination loss)
    ref_fine = _feat_norm(params, all_feats[0][-1])
    ref_final = FrameOutputs(
        pred_logits=all_logits[0][-1].astype(jnp.float32),
        pred_masks=_fg_bn(params, jnp.einsum(
            "bhwc,blc->blhw", ref_fine, all_embeds[0][-1])).astype(
                jnp.float32),
        embeddings=all_embeds[0][-1].astype(jnp.float32),
        fcn_output=ref_feats.fcn_output,
    )
    extras = {"ref": ref_final, "fine_feat": fine.astype(jnp.float32)}
    return final, aux, extras


def _feat_norm(params, feat):
    """feat_bn + channel L2-normalize (reference F.normalize(p=2, dim=1),
    vps_temporal_slots.py:146-147).  rsqrt(sumsq + eps) instead of
    x/max(||x||, eps): forward-identical to <1e-6 rel for any non-degenerate
    feature, and its gradient stays finite at tiny norms (the max() form
    produced exploding gradients -> NaN within a few training steps)."""
    f = L.batch_norm_eval(params["feat_bn"], feat)
    sumsq = jnp.sum(jnp.square(f), axis=-1, keepdims=True)
    return f * jax.lax.rsqrt(sumsq + 1e-12)


def _fg_bn(params, mask_logits):
    p = params["fg_bn"]
    scale = p["scale"][0] * jax.lax.rsqrt(p["var"][0] + 1e-5)
    bias = p["bias"][0] - p["mean"][0] * scale
    return mask_logits * scale.astype(mask_logits.dtype) \
        + bias.astype(mask_logits.dtype)


def forward_frame(params: Dict, cfg: ModelConfig, img: jnp.ndarray,
                  ref_img: jnp.ndarray) -> FrameOutputs:
    """Full single-frame forward (both frames from pixels), the shape the
    reference runs per test step (vps_temporal_slots.py:207-308)."""
    # one batched backbone pass over [ref; cur]
    both = jnp.concatenate([ref_img, img], axis=0)
    feats = extract_features(params, cfg, both)
    b = img.shape[0]
    ref_feats = FrameFeatures(
        feat_trans=tuple(f[:b] for f in feats.feat_trans),
        fcn_output=feats.fcn_output[:b])
    cur_feats = FrameFeatures(
        feat_trans=tuple(f[b:] for f in feats.feat_trans),
        fcn_output=feats.fcn_output[b:])
    return decode_pair(params, cfg, ref_feats, cur_feats)
