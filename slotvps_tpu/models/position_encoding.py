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
