"""ContextBlock (GCNet) — optional ResNet-stage plugin.

Reference: mmdet/ops/context_block.py:13-104.  Global-context channel
attention: a 1x1 conv produces per-pixel attention logits, softmax over
all pixels pools a global context vector, which is transformed by a
bottleneck (1x1 -> LN -> ReLU -> 1x1) and added (or multiplied after
sigmoid) to every position.  Unused by both reference configs
(capability parity only).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from slotvps_tpu.models import layers as L


def init_context_block(key, in_channels: int, ratio: float = 1.0 / 16):
    planes = int(in_channels * ratio)
    ks = jax.random.split(key, 3)
    return {
        "conv_mask": L.init_conv(ks[0], 1, 1, in_channels, 1),
        "channel_add": {
            "conv1": L.init_conv(ks[1], 1, 1, in_channels, planes),
            "ln": L.init_norm(planes),
            "conv2": L.init_conv(ks[2], 1, 1, planes, in_channels,
                                 init="zero"),
        },
    }


def apply_context_block(p, x):
    """x: [B, H, W, C]."""
    b, h, w, c = x.shape
    attn = L.conv2d(p["conv_mask"], x, padding=0).reshape(b, h * w)
    attn = jax.nn.softmax(attn, axis=-1)
    context = jnp.einsum("bp,bpc->bc", attn, x.reshape(b, h * w, c))
    context = context[:, None, None, :]
    t = L.conv2d(p["channel_add"]["conv1"], context, padding=0)
    t = L.relu(L.layer_norm(p["channel_add"]["ln"], t))
    t = L.conv2d(p["channel_add"]["conv2"], t, padding=0)
    return x + t
