"""Panoptic Retriever slot decoder.

Reference: mmdet/models/detectors/dynamic_mask_head.py —
``MultiScaleDynamicMaskHead`` (:36), ``MaskRCNNHead`` (:231),
``MaskDynamicConv`` (:403, the Retriever: slot-softmax cross-attention over
pixels), ``TemporalSlotsHead``/``SlotsDynamicConv`` (:465/:530, the Video
Retriever: cross-frame slot-slot attention).

Seven decoder stages over four coarse-to-fine feature levels
(per_dh_num_heads=[1,2,2,2], r50 config :35).  Between levels the previous
level's (updated, 256-ch) feature map is bilinearly upsampled x2 and
concatenated with the current level's 128-ch input, then fused by a shared
1x1 conv to 256 (:171-185; level 0 tiles its 128-ch input x3 instead,
:182-185).  Each stage runs per frame: slot self-attention -> Retriever
cross-attention -> FFN, each with residual+LayerNorm; stages in
``apply_temporal_query_atten_stages`` then concatenate both frames' slots
along the slot axis and run the Video Retriever with a residual (:308-322).
Slot queries are detached between stages (:211).

Frames are batched along the leading axis for all convolution/attention work
(the reference concatenates frames along dim 0, :158-164) so the two-frame
decode is one SPMD-friendly computation.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from slotvps_tpu.config import SlotHeadConfig
from slotvps_tpu.models import layers as L
from slotvps_tpu.ops.interpolate import upsample_int_bilinear

# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _init_retriever(key, d):
    ks = jax.random.split(key, 3)
    return {
        "to_q": L.init_linear(ks[0], d, d),
        "to_k": L.init_linear(ks[1], d, d),
        "to_v": L.init_linear(ks[2], d, d),
        "norm_q": L.init_norm(d),
        "norm_k": L.init_norm(d),
        "norm_v": L.init_norm(d),
        "norm1": L.init_norm(d),
    }


def _init_temporal_head(key, cfg: SlotHeadConfig):
    t = cfg.temporal_query_attention
    ks = jax.random.split(key, 3)
    return {
        "inst_interact": _init_retriever(ks[0], t.d_model),
        "linear1": L.init_linear(ks[1], t.d_model, t.dim_feedforward),
        "linear2": L.init_linear(ks[2], t.dim_feedforward, t.d_model),
        "norm2": L.init_norm(t.d_model),
        "norm3": L.init_norm(t.d_model),
    }


def _init_stage(key, cfg: SlotHeadConfig, with_temporal: bool):
    d = cfg.dh_dim
    ks = jax.random.split(key, 12)
    p = {
        "self_attn": L.init_mha(ks[0], d),
        "inst_interact": _init_retriever(ks[1], d),
        "linear1": L.init_linear(ks[2], d, cfg.dim_feedforward),
        "linear2": L.init_linear(ks[3], cfg.dim_feedforward, d),
        "norm1": L.init_norm(d),
        "norm2": L.init_norm(d),
        "norm3": L.init_norm(d),
        "cls_module": [
            {"lin": L.init_linear(ks[4 + i], d, d, bias=False),
             "ln": L.init_norm(d)} for i in range(cfg.num_cls)
        ],
        "reg_module": [
            {"lin": L.init_linear(ks[6 + i], d, d, bias=False),
             "ln": L.init_norm(d)} for i in range(cfg.num_reg)
        ],
        "class_logits": L.init_linear(ks[8], d, cfg.num_classes),
    }
    if cfg.use_focal:
        # focal-style bias init (reference dynamic_mask_head.py:123-136)
        bias_value = -math.log((1 - cfg.prior_prob) / cfg.prior_prob)
        p["class_logits"]["b"] = jnp.full(
            (cfg.num_classes,), bias_value, jnp.float32)
    if with_temporal:
        p["temporal"] = _init_temporal_head(ks[9], cfg)
    return p


def init_slot_head(key, cfg: SlotHeadConfig) -> Dict:
    n_stages = sum(cfg.per_dh_num_heads)
    ks = jax.random.split(key, n_stages + 1)
    stages = []
    for s in range(n_stages):
        with_temporal = (cfg.temporal_query_attention is not None
                         and s in cfg.apply_temporal_query_atten_stages)
        stages.append(_init_stage(ks[s], cfg, with_temporal))
    return {
        "stages": stages,
        "conv_trans": L.init_conv(ks[-1], 1, 1, cfg.trans_in_dim, cfg.dh_dim,
                                  init="xavier"),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def retriever_attention(p, slots, features, pos, softmax_dim="slots"):
    """MaskDynamicConv (reference dynamic_mask_head.py:423-461).

    slots: [B, L, D]; features: [B, H, W, D]; pos: [H, W, D] or None.
    Softmax over the SLOT axis (inverted/slot attention), not pixels.
    """
    q = L.layer_norm(p["norm_q"], L.linear(p["to_q"], slots))
    k_in = features if pos is None else features + pos.astype(features.dtype)
    k = L.layer_norm(p["norm_k"], L.linear(p["to_k"], k_in))
    v = L.layer_norm(p["norm_v"], L.linear(p["to_v"], features))

    attn = jnp.einsum("blc,bhwc->blhw", q, k)
    if softmax_dim == "slots":
        attn = jax.nn.softmax(attn, axis=1)
    elif softmax_dim == "hw":
        b, l, h, w = attn.shape
        attn = jax.nn.softmax(attn.reshape(b, l, h * w), axis=-1
                              ).reshape(b, l, h, w)
    else:
        raise ValueError(softmax_dim)
    out = jnp.einsum("blhw,bhwc->blc", attn, v)
    return L.relu(L.layer_norm(p["norm1"], out))


def slots_attention(p, q_slots, kv_slots, softmax_dim="slots"):
    """SlotsDynamicConv (reference dynamic_mask_head.py:550-572)."""
    q = L.layer_norm(p["norm_q"], L.linear(p["to_q"], q_slots))
    k = L.layer_norm(p["norm_k"], L.linear(p["to_k"], kv_slots))
    v = L.layer_norm(p["norm_v"], L.linear(p["to_v"], kv_slots))
    attn = jnp.einsum("blc,buc->blu", q, k)
    axis = 1 if softmax_dim == "slots" else 2
    attn = jax.nn.softmax(attn, axis=axis)
    out = jnp.einsum("blu,buc->blc", attn, v)
    return L.relu(L.layer_norm(p["norm1"], out))


def _temporal_head(p, slots, cfg: SlotHeadConfig):
    """Video Retriever (reference dynamic_mask_head.py:494-527).
    slots: [B, F*L, D] concatenated over frames."""
    t = cfg.temporal_query_attention
    act = L.ACTIVATIONS[t.activation]
    out = slots_attention(p["inst_interact"], slots, slots, t.softmax_dim)
    slots = L.layer_norm(p["norm2"], slots + out)
    ffn = L.linear(p["linear2"], act(L.linear(p["linear1"], slots)))
    return L.layer_norm(p["norm3"], slots + ffn)


def _stage_till_ffn(p, features, slots, pos, cfg: SlotHeadConfig,
                    retriever_fn):
    """Self-attn + Retriever + FFN (reference :342-388).
    features: [B, H, W, D]; slots: [B, L, D]."""
    act = L.ACTIVATIONS[cfg.activation]
    attn_out = L.multi_head_attention(p["self_attn"], slots, slots, slots,
                                      cfg.nhead)
    slots = L.layer_norm(p["norm1"], slots + attn_out)
    inter = retriever_fn(p["inst_interact"], slots, features, pos,
                         cfg.softmax_dim)
    slots = L.layer_norm(p["norm2"], slots + inter)
    ffn = L.linear(p["linear2"], act(L.linear(p["linear1"], slots)))
    return L.layer_norm(p["norm3"], slots + ffn)


def _stage_after_ffn(p, slots):
    """cls/reg towers (reference :390-400). Returns (logits, next_query)."""
    cls_f = slots
    for m in p["cls_module"]:
        cls_f = L.relu(L.layer_norm(m["ln"], L.linear(m["lin"], cls_f)))
    reg_f = slots
    for m in p["reg_module"]:
        reg_f = L.relu(L.layer_norm(m["ln"], L.linear(m["lin"], reg_f)))
    logits = L.linear(p["class_logits"], cls_f)
    return logits, reg_f


def apply_slot_head(
    params: Dict,
    cfg: SlotHeadConfig,
    features: Sequence[Sequence[jnp.ndarray]],
    init_queries: jnp.ndarray,
    pos: Sequence[Sequence[jnp.ndarray]],
    retriever_fn=retriever_attention,
) -> Tuple[list, list, list]:
    """Run the 7-stage decoder over ``F`` frames jointly.

    features: per frame, per level [B, H, W, 128] (coarsest first).
    init_queries: [L, D] learned slot queries (shared across frames).
    pos: per frame, per level [H, W, D] sine embeddings.

    Returns per frame: stacked class logits [S, B, L, C], stacked slot
    embeddings [S, B, L, D], and the per-level updated 256-ch features.
    """
    n_frames = len(features)
    n_levels = cfg.feat_num_levels
    bs = features[0][0].shape[0]
    dtype = features[0][0].dtype

    queries = [jnp.broadcast_to(init_queries[None], (bs,) + init_queries.shape
                                ).astype(dtype) for _ in range(n_frames)]
    inter_logits: List[List[jnp.ndarray]] = [[] for _ in range(n_frames)]
    inter_embeds: List[List[jnp.ndarray]] = [[] for _ in range(n_frames)]

    # frames ride the batch axis for all dense work
    cat_feats = [jnp.concatenate([features[f][lvl] for f in range(n_frames)],
                                 axis=0) for lvl in range(n_levels)]

    stage_idx = 0
    updated: List[jnp.ndarray] = [None] * n_levels
    for lvl in range(n_levels):
        curr = cat_feats[lvl]
        if lvl > 0:
            if cfg.merge_operation == "concat":
                curr = jnp.concatenate(
                    (upsample_int_bilinear(updated[lvl - 1], 2), curr), axis=-1)
            else:
                curr = curr + upsample_int_bilinear(updated[lvl - 1], 2)
            curr = L.conv2d(params["conv_trans"], curr, padding=0)
        elif cfg.dh_dim != curr.shape[-1] \
                and cfg.trans_in_dim == curr.shape[-1] * 3:
            # level-0 special case (reference :182-185): tile channels x3
            curr = jnp.concatenate((curr, curr, curr), axis=-1)
            curr = L.conv2d(params["conv_trans"], curr, padding=0)
        updated[lvl] = curr

        frame_feats = jnp.split(curr, n_frames, axis=0)
        for _ in range(cfg.per_dh_num_heads[lvl]):
            sp = params["stages"][stage_idx]
            temporal = (cfg.temporal_query_attention is not None
                        and stage_idx
                        in cfg.apply_temporal_query_atten_stages)
            slots_f = [
                _stage_till_ffn(sp, frame_feats[f], queries[f],
                                pos[f][lvl], cfg, retriever_fn)
                for f in range(n_frames)
            ]
            if temporal:
                cat_slots = jnp.concatenate(slots_f, axis=1)  # [B, F*L, D]
                refined = _temporal_head(sp["temporal"], cat_slots, cfg)
                cat_slots = cat_slots + refined
                slots_f = list(jnp.split(cat_slots, n_frames, axis=1))
            for f in range(n_frames):
                logits, embed = _stage_after_ffn(sp, slots_f[f])
                inter_logits[f].append(logits)
                inter_embeds[f].append(embed)
                # queries detached between stages (reference :211)
                queries[f] = jax.lax.stop_gradient(embed)
            stage_idx += 1

    out_feats = [
        [jnp.split(updated[lvl], n_frames, axis=0)[f]
         for lvl in range(n_levels)]
        for f in range(n_frames)
    ]
    return (
        [jnp.stack(il) for il in inter_logits],
        [jnp.stack(ie) for ie in inter_embeds],
        out_feats,
    )
