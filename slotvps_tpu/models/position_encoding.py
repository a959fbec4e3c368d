"""Sine position embedding (DETR-style).

Reference: mmdet/models/detectors/position_encoding.py:220-256
(``PositionEmbeddingSine``), built with ``normalize=True`` and
``num_pos_feats = hidden_dim // 2`` (reference :336-345).  The reference
feeds an all-valid mask at test time (``nested_tensor_from_tensor_list`` on
unpadded tensors), so cumsum over the valid mask reduces to 1..H / 1..W
index grids — we compute those directly.
"""

from __future__ import annotations

import math

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
