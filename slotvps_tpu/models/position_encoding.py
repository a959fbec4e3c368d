"""Position embeddings (DETR-style).

Reference: mmdet/models/detectors/position_encoding.py —
``PositionEmbeddingSine`` :220-256 (the one both shipped configs use,
built with ``normalize=True`` and ``num_pos_feats = hidden_dim // 2``,
:336-345), ``PositionEmbeddingSinev2`` :259-306 (same features, flattened
[H*W, C] layout), ``PositionEmbeddingLearned`` :309-333 (learned 50-bin
row/col embeddings).  The reference feeds an all-valid mask at test time
(``nested_tensor_from_tensor_list`` on unpadded tensors), so cumsum over
the valid mask reduces to 1..H / 1..W index grids — we compute those
directly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def sine_position_embedding(
    h: int, w: int,
    num_pos_feats: int = 128,
    temperature: float = 10000.0,
    normalize: bool = True,
    scale: float = 2 * math.pi,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Returns [H, W, 2*num_pos_feats] (y-features then x-features)."""
    y_embed = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None] \
        * jnp.ones((1, w), jnp.float32)
    x_embed = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :] \
        * jnp.ones((h, 1), jnp.float32)
    if normalize:
        eps = 1e-6
        y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
        x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin/cos over even/odd feature pairs (reference :253-254)
    pos_x = jnp.stack(
        (jnp.sin(pos_x[:, :, 0::2]), jnp.cos(pos_x[:, :, 1::2])), axis=3
    ).reshape(h, w, num_pos_feats)
    pos_y = jnp.stack(
        (jnp.sin(pos_y[:, :, 0::2]), jnp.cos(pos_y[:, :, 1::2])), axis=3
    ).reshape(h, w, num_pos_feats)
    return jnp.concatenate((pos_y, pos_x), axis=-1).astype(dtype)


def sine_position_embedding_v2(h: int, w: int, num_pos_feats: int = 128,
                               temperature: float = 10000.0,
                               normalize: bool = False,
                               dtype=jnp.float32) -> jnp.ndarray:
    """``PositionEmbeddingSinev2`` (reference :259-306): same features as
    v1 but flattened to [H*W, 2*num_pos_feats] and default
    ``normalize=False``."""
    pos = sine_position_embedding(h, w, num_pos_feats, temperature,
                                  normalize, dtype=dtype)
    return pos.reshape(h * w, -1)


def init_learned_position_embedding(key, num_pos_feats: int = 128,
                                    num_bins: int = 50):
    """``PositionEmbeddingLearned`` params (reference :309-319:
    Embedding(50, d) per axis, uniform init)."""
    k1, k2 = jax.random.split(key)
    return {
        "row_embed": jax.random.uniform(k1, (num_bins, num_pos_feats)),
        "col_embed": jax.random.uniform(k2, (num_bins, num_pos_feats)),
    }


def learned_position_embedding(params, h: int, w: int,
                               dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2*num_pos_feats]: col features then row features
    (reference :321-333 cat([x_emb, y_emb]))."""
    x_emb = params["col_embed"][:w]            # [W, d]
    y_emb = params["row_embed"][:h]            # [H, d]
    pos = jnp.concatenate([
        jnp.broadcast_to(x_emb[None, :, :], (h, w, x_emb.shape[-1])),
        jnp.broadcast_to(y_emb[:, None, :], (h, w, y_emb.shape[-1])),
    ], axis=-1)
    return pos.astype(dtype)


# ---------------------------------------------------------------------------
# Relative-position variants (reference position_encoding.py:15-218).
# Config-unused by every shipped reference config — provided for API
# completeness.  Functional init/apply pairs; the attention-bias appliers
# take the decomposed-axis query layout the reference uses
# (channel halves attend the h- and w-axes separately).
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02):
    """timm-style truncated normal in [-2std, 2std]
    (reference mmdet/core/utils/misc.py trunc_normal_)."""
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape,
                                             jnp.float32)


def init_full_rel_pos(key, h: int, w: int, dim: int):
    """``FullRelPos`` params (reference :15-48, has_map=False): one
    relative embedding per axis over offsets [-(len-1), len-1]."""
    k1, k2 = jax.random.split(key)
    return {
        "rel_emb_h": _trunc_normal(k1, (2 * h - 1, dim // 2)),
        "rel_emb_w": _trunc_normal(k2, (2 * w - 1, dim // 2)),
    }


def _axis_rel_table(emb: jnp.ndarray, length: int) -> jnp.ndarray:
    """[2*len-1, c] -> [q, k, c] lookup via relative index q-k+len-1
    (reference :37-42)."""
    idx = jnp.arange(length)[None, :] - jnp.arange(length)[:, None] \
        + length - 1
    return emb[idx]                                    # [q, k, c]


def full_rel_pos_attn(params, q: jnp.ndarray, attn: jnp.ndarray,
                      h: int, w: int) -> jnp.ndarray:
    """``FullRelPos.forward`` without rois (reference :113-120).

    q:    [B, h*w, P, G, 2c] — first channel half attends rows, second
          half columns (reference rearranges with n=2),
    attn: [B, G, h*w, kh*kw, P].  Returns attn + per-axis rel logits."""
    b, hw, p, g, c2 = q.shape
    c = c2 // 2
    abs_h = _axis_rel_table(params["rel_emb_h"], h)    # [h, kh, c]
    abs_w = _axis_rel_table(params["rel_emb_w"], w)    # [w, kw, c]
    qs = q.reshape(b, h, w, p, g, 2, c)
    logits_h = jnp.einsum("bhwpgc,hkc->bghwkp", qs[..., 0, :], abs_h)
    logits_w = jnp.einsum("bhwpgc,wkc->bghwkp", qs[..., 1, :], abs_w)
    attn = attn.reshape(b, g, hw, h, w, p)
    attn = attn + logits_h.reshape(b, g, hw, h, 1, p)
    attn = attn + logits_w.reshape(b, g, hw, 1, w, p)
    return attn.reshape(b, g, hw, h * w, p)


def init_swin_rel_pos(key, h: int, w: int, num_heads: int = 1):
    """``SwinRelPos`` params (reference :123-143): one bias table over
    the (2h-1)x(2w-1) relative-offset grid; the index buffer is
    recomputed on the fly (pure function of h, w)."""
    return {"bias_table": _trunc_normal(
        key, ((2 * h - 1) * (2 * w - 1), num_heads))}


def swin_rel_pos_bias(params, h: int, w: int) -> jnp.ndarray:
    """[1, nH, h*w, h*w, 1] additive attention bias
    (reference :145-149)."""
    coords = jnp.stack(jnp.meshgrid(jnp.arange(h), jnp.arange(w),
                                    indexing="ij"))       # [2, h, w]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]             # [2, hw, hw]
    rel = rel.transpose(1, 2, 0) + jnp.asarray([h - 1, w - 1])
    index = rel[..., 0] * (2 * w - 1) + rel[..., 1]       # [hw, hw]
    bias = params["bias_table"][index.reshape(-1)] \
        .reshape(h * w, h * w, -1)
    return bias.transpose(2, 0, 1)[None, ..., None]


def init_rel_pos(key, dim: int, win_len: int = 1):
    """``RelPos`` params (reference :152-178): windowed relative
    embeddings over 2*win_len offsets per axis."""
    k1, k2 = jax.random.split(key)
    return {
        "rel_emb_h": _trunc_normal(k1, (2 * win_len, dim // 2)),
        "rel_emb_w": _trunc_normal(k2, (2 * win_len, dim // 2)),
    }


def _rel_pos_onehot(q_len: int, k_len: int, win_len: int) -> jnp.ndarray:
    """[q, k, 2*win_len] one-hot of (j - i == rel_idx[r]) with
    rel_idx = [-win_len, win_len) (reference :158-168)."""
    rel_idx = jnp.arange(-win_len, win_len)
    diff = jnp.arange(k_len)[None, :] - jnp.arange(q_len)[:, None]
    return (diff[:, :, None] == rel_idx[None, None, :]) \
        .astype(jnp.float32)


def rel_pos_attn(params, q: jnp.ndarray, attn: jnp.ndarray,
                 q_len: int, k_len: int, win_len: int = 1) -> jnp.ndarray:
    """``RelPos.forward`` (reference :180-204); q/attn layouts as in
    :func:`full_rel_pos_attn` with square q_len x q_len queries over
    k_len x k_len keys."""
    b, qq, p, g, c2 = q.shape
    c = c2 // 2
    onehot = _rel_pos_onehot(q_len, k_len, win_len)
    abs_h = jnp.einsum("qkr,rc->qkc", onehot, params["rel_emb_h"])
    abs_w = jnp.einsum("qkr,rc->qkc", onehot, params["rel_emb_w"])
    qs = q.reshape(b, q_len, q_len, p, g, 2, c)
    logits_h = jnp.einsum("bhwpgc,hkc->bghwkp", qs[..., 0, :], abs_h)
    logits_w = jnp.einsum("bhwpgc,wkc->bghwkp", qs[..., 1, :], abs_w)
    attn = attn.reshape(b, g, qq, k_len, k_len, p)
    attn = attn + logits_h.reshape(b, g, qq, k_len, 1, p)
    attn = attn + logits_w.reshape(b, g, qq, 1, k_len, p)
    return attn.reshape(b, g, qq, k_len * k_len, p)


def init_dps_conv_pos(key, dim: int, k: int):
    """``DPSConvPos`` params (reference :211-214): depthwise k x k conv,
    no bias.  Weight layout [k, k, 1, dim] (HWIO, feature_group_count =
    dim)."""
    fan_in = k * k  # torch Conv2d kaiming-uniform with groups=dim
    bound = math.sqrt(1.0 / fan_in) * math.sqrt(3.0)
    return {"w": jax.random.uniform(key, (k, k, 1, dim), jnp.float32,
                                    -bound, bound)}


def dps_conv_pos(params, v: jnp.ndarray, h: int) -> jnp.ndarray:
    """``DPSConvPos.forward`` (reference :216-218): depthwise conv over
    the [B, h*w, C] token grid."""
    b, hw, c = v.shape
    x = v.reshape(b, h, hw // h, c)
    out = jax.lax.conv_general_dilated(
        x, params["w"], window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)
    return out.reshape(b, hw, c)
