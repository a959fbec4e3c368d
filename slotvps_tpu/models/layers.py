"""Functional NN primitives (NHWC, explicit param dicts).

Semantics match the torch layers the reference composes
(nn.Conv2d / Linear / LayerNorm / GroupNorm / frozen BatchNorm /
nn.MultiheadAttention), verified in tests/test_models_layers.py.

Param conventions:
  conv:   {'w': [kh, kw, c_in, c_out], 'b': [c_out]?}
  linear: {'w': [d_in, d_out], 'b': [d_out]?}       (torch stores [out, in])
  ln/gn:  {'scale': [d], 'bias': [d]}
  bn:     {'scale', 'bias', 'mean', 'var'}          (running statistics)
  mha:    {'in_proj': {'w': [d, 3d], 'b': [3d]}, 'out_proj': linear}
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initializers (matching the reference's init recipes where they matter)
# ---------------------------------------------------------------------------


def kaiming_normal(key, shape, fan_in, a=0.0):
    std = math.sqrt(2.0 / ((1 + a * a) * fan_in))
    return std * jax.random.normal(key, shape, jnp.float32)


def kaiming_uniform(key, shape, fan_in, a=0.0):
    bound = math.sqrt(6.0 / ((1 + a * a) * fan_in))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def xavier_uniform(key, shape, fan_in, fan_out):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_conv(key, kh, kw, c_in, c_out, bias=True, init="kaiming"):
    fan_in = kh * kw * c_in
    fan_out = kh * kw * c_out
    if init == "kaiming":
        w = kaiming_normal(key, (kh, kw, c_in, c_out), fan_in)
    elif init == "xavier":
        w = xavier_uniform(key, (kh, kw, c_in, c_out), fan_in, fan_out)
    elif init == "zero":
        w = jnp.zeros((kh, kw, c_in, c_out), jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((c_out,), jnp.float32)
    return p


def init_linear(key, d_in, d_out, bias=True, init="xavier"):
    if init == "xavier":
        w = xavier_uniform(key, (d_in, d_out), d_in, d_out)
    elif init == "kaiming":
        w = kaiming_normal(key, (d_in, d_out), d_in)
    elif init == "normal001":  # track-head init (simple_track_head.py:55)
        w = 0.01 * jax.random.normal(key, (d_in, d_out), jnp.float32)
    else:
        raise ValueError(init)
    p = {"w": w}
    if bias:
        p["b"] = jnp.zeros((d_out,), jnp.float32)
    return p


def init_norm(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32)}


def init_bn(dim):
    return {"scale": jnp.ones((dim,), jnp.float32),
            "bias": jnp.zeros((dim,), jnp.float32),
            "mean": jnp.zeros((dim,), jnp.float32),
            "var": jnp.ones((dim,), jnp.float32)}


def init_mha(key, d_model):
    k1, k2 = jax.random.split(key)
    return {
        "in_proj": {"w": xavier_uniform(k1, (d_model, 3 * d_model),
                                        d_model, 3 * d_model),
                    "b": jnp.zeros((3 * d_model,), jnp.float32)},
        "out_proj": init_linear(k2, d_model, d_model),
    }


# ---------------------------------------------------------------------------
# apply functions
# ---------------------------------------------------------------------------


def conv2d(p, x, stride=1, padding="SAME", dilation=1, groups=1):
    """NHWC conv. ``padding`` may be int (symmetric), 'SAME', or 'VALID'."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def linear(p, x):
    out = x @ p["w"].astype(x.dtype)
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def layer_norm(p, x, eps=1e-5):
    # statistics in f32: bf16 accumulation over the feature dim is lossy
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def group_norm(p, x, num_groups=32, eps=1e-5):
    """GroupNorm over NHWC (channels last), matching torch nn.GroupNorm."""
    *lead, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(*lead, h, w, g, c // g).astype(jnp.float32)
    mean = jnp.mean(xg, axis=(-4, -3, -1), keepdims=True)
    var = jnp.var(xg, axis=(-4, -3, -1), keepdims=True)
    xg = ((xg - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    y = xg.reshape(*lead, h, w, c)
    return y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)


def batch_norm_eval(p, x, eps=1e-5):
    """Frozen BatchNorm (running stats), channels-last.

    Matches the reference's norm_eval backbone BNs and the test-mode
    ``fg_bn``/``feat_bn`` (reference vps_capsule.py:96-97)."""
    scale = (p["scale"] * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    bias = (p["bias"] - p["mean"] * p["scale"]
            * jax.lax.rsqrt(p["var"] + eps)).astype(x.dtype)
    return x * scale + bias


def batch_norm_train(p, x, axes, eps=1e-5, momentum=0.1):
    """Training-mode BN over ``axes``; returns (y, new_stats)."""
    mean = jnp.mean(x, axis=axes)
    var = jnp.var(x, axis=axes)
    shape = [1] * x.ndim
    shape[-1] = x.shape[-1]
    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(var.reshape(shape) + eps)
    y = y * p["scale"].reshape(shape) + p["bias"].reshape(shape)
    n = x.size // x.shape[-1]
    unbiased = var * n / max(n - 1, 1)
    new_stats = {
        "mean": (1 - momentum) * p["mean"] + momentum * mean,
        "var": (1 - momentum) * p["var"] + momentum * unbiased,
    }
    return y, new_stats


def multi_head_attention(p, q, k, v, num_heads):
    """torch ``nn.MultiheadAttention`` with packed in_proj.

    q/k/v: [B, L, D].  Returns [B, L, D].
    """
    d = q.shape[-1]
    wq, wk, wv = jnp.split(p["in_proj"]["w"].astype(q.dtype), 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj"]["b"].astype(q.dtype), 3)
    qh = q @ wq + bq
    kh = k @ wk + bk
    vh = v @ wv + bv
    b, lq, _ = qh.shape
    lk = kh.shape[1]
    hd = d // num_heads
    qh = qh.reshape(b, lq, num_heads, hd).transpose(0, 2, 1, 3)
    kh = kh.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    vh = vh.reshape(b, lk, num_heads, hd).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(hd)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn, vh)
    out = out.transpose(0, 2, 1, 3).reshape(b, lq, d)
    return linear(p["out_proj"], out)


def gelu(x):
    """torch F.gelu default (erf formulation)."""
    return jax.nn.gelu(x, approximate=False)


def relu(x):
    return jnp.maximum(x, 0)


ACTIVATIONS = {"relu": relu, "gelu": gelu}
