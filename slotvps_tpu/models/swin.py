"""Swin Transformer backbone (Swin-L config).

Reference: mmdet/models/backbones/swin_transformer.py:449 (``SwinTransformer``)
with the Swin-L settings of configs/cityscapes/swinL_fpn_slotvps.py:6-20.

Windowed MSA with relative position bias, shifted windows on alternate
blocks, patch merging between stages.  Implemented TPU-first: windows are
extracted with reshapes (no gathers) and all windows of a stage batch into
one attention call.
"""

from __future__ import annotations

import math
from typing import Dict, List

import jax
import jax.numpy as jnp

from slotvps_tpu.config import SwinConfig
from slotvps_tpu.models import layers as L


def _trunc_normal(key, shape, std=0.02):
    # torch trunc_normal_(std=.02) truncates at +-2 std
    u = jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32)
    return u * std


def _rel_pos_index(window: int) -> jnp.ndarray:
    """Relative position index table [W*W, W*W] (reference swin :87-97)."""
    coords = jnp.stack(jnp.meshgrid(jnp.arange(window), jnp.arange(window),
                                    indexing="ij"))  # [2, Wh, Ww]
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # [2, N, N]
    rel = rel.transpose(1, 2, 0)
    rel = rel + (window - 1)
    index = rel[..., 0] * (2 * window - 1) + rel[..., 1]
    return index


def _init_block(key, dim, num_heads, window, mlp_ratio, qkv_bias):
    ks = jax.random.split(key, 6)
    hidden = int(dim * mlp_ratio)
    p = {
        "norm1": L.init_norm(dim),
        "qkv": L.init_linear(ks[0], dim, 3 * dim, bias=qkv_bias),
        "proj": L.init_linear(ks[1], dim, dim),
        "rel_pos_bias": _trunc_normal(
            ks[2], ((2 * window - 1) ** 2, num_heads)),
        "norm2": L.init_norm(dim),
        "fc1": L.init_linear(ks[3], dim, hidden),
        "fc2": L.init_linear(ks[4], hidden, dim),
    }
    return p


def init_swin(key, cfg: SwinConfig) -> Dict:
    ks = jax.random.split(key, 2 + len(cfg.depths))
    params: Dict = {
        "patch_embed": {
            "proj": L.init_conv(ks[0], cfg.patch_size, cfg.patch_size, 3,
                                cfg.embed_dim),
            "norm": L.init_norm(cfg.embed_dim) if cfg.patch_norm else None,
        },
    }
    dims = [cfg.embed_dim * 2 ** i for i in range(len(cfg.depths))]
    for si, depth in enumerate(cfg.depths):
        bkeys = jax.random.split(ks[1 + si], depth + 1)
        stage = {
            "blocks": [
                _init_block(bkeys[bi], dims[si], cfg.num_heads[si],
                            cfg.window_size, cfg.mlp_ratio, cfg.qkv_bias)
                for bi in range(depth)
            ],
        }
        if si < len(cfg.depths) - 1:
            stage["downsample"] = {
                "reduction": L.init_linear(bkeys[-1], 4 * dims[si],
                                           2 * dims[si], bias=False),
                "norm": L.init_norm(4 * dims[si]),
            }
        params[f"stage{si}"] = stage
    # per-out-level norms (reference swin :590-597)
    for i in range(len(cfg.depths)):
        params[f"out_norm{i}"] = L.init_norm(dims[i])
    return params


def _window_partition(x, w):
    """[B, H, W, C] -> [B*nH*nW, w, w, C] (H, W divisible by w)."""
    b, h, ww, c = x.shape
    x = x.reshape(b, h // w, w, ww // w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w, w, c)


def _window_reverse(wins, w, b, h, ww):
    c = wins.shape[-1]
    x = wins.reshape(b, h // w, ww // w, w, w, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, ww, c)


def _window_attention(p, x, num_heads, window, rel_index, mask=None):
    """x: [nW, N, C] windows; mask: [num_win_types, N, N] or None."""
    nw, n, c = x.shape
    hd = c // num_heads
    qkv = L.linear(p["qkv"], x).reshape(nw, n, 3, num_heads, hd)
    q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
    attn = jnp.einsum("whnd,whmd->whnm", q, k) / math.sqrt(hd)
    bias = p["rel_pos_bias"][rel_index.reshape(-1)].reshape(
        n, n, num_heads).transpose(2, 0, 1)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        nt = mask.shape[0]
        attn = attn.reshape(nw // nt, nt, num_heads, n, n) \
            + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(nw, num_heads, n, n)
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("whnm,whmd->whnd", attn, v)
    out = out.transpose(0, 2, 1, 3).reshape(nw, n, c)
    return L.linear(p["proj"], out)


def _shift_mask(h, w, window, shift):
    """Attention mask for shifted windows (reference swin :318-337)."""
    img = jnp.zeros((1, h, w, 1), jnp.float32)
    cnt = 0
    rows = [(0, h - window), (h - window, h - shift), (h - shift, h)]
    cols = [(0, w - window), (w - window, w - shift), (w - shift, w)]
    for r0, r1 in rows:
        for c0, c1 in cols:
            img = img.at[:, r0:r1, c0:c1, :].set(cnt)
            cnt += 1
    wins = _window_partition(img, window).reshape(-1, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return jnp.where(diff != 0, -100.0, 0.0)


def _drop_path(key, x, rate):
    """Stochastic depth on the batch axis (timm DropPath semantics,
    reference swin :189, :251-252)."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * mask.astype(x.dtype) / keep


def _block(p, x, num_heads, window, shift, rel_index, drop=None):
    b, h, w, c = x.shape
    shortcut = x
    x = L.layer_norm(p["norm1"], x)
    # pad to multiples of window (reference swin :188-192)
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = x.shape[1:3]
    if shift > 0:
        x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        mask = _shift_mask(hp, wp, window, shift)
    else:
        mask = None
    wins = _window_partition(x, window).reshape(-1, window * window, c)
    wins = _window_attention(p, wins, num_heads, window, rel_index, mask)
    x = _window_reverse(wins.reshape(-1, window, window, c), window,
                        b, hp, wp)
    if shift > 0:
        x = jnp.roll(x, (shift, shift), axis=(1, 2))
    x = x[:, :h, :w]
    if drop is not None:
        key, rate = drop
        k1, k2 = jax.random.split(key)
        x = shortcut + _drop_path(k1, x, rate)
        ffn = L.linear(p["fc2"], L.gelu(L.linear(
            p["fc1"], L.layer_norm(p["norm2"], x))))
        return x + _drop_path(k2, ffn, rate)
    x = shortcut + x
    ffn = L.linear(p["fc2"], L.gelu(L.linear(
        p["fc1"], L.layer_norm(p["norm2"], x))))
    return x + ffn


def _stage_scan(blocks, x, num_heads, window, rel_index, drops=None):
    """Run an even-depth stage as ``lax.scan`` over [no-shift, shift]
    block pairs.

    The XLA program then contains ONE pair body instead of ``depth``
    inlined copies — without this, Swin-L's 18-block stage 2 at
    1024x2048 makes the compiler run out of memory.  Numerics are
    identical to the unrolled loop (same op sequence per block); the
    only graph difference is that per-block params are stacked on a
    leading scan axis.

    ``drops``: optional ``(keys, rates)`` with shapes [n_pairs, 2, key]
    and [n_pairs, 2] for train-time stochastic depth.
    """
    n_pairs = len(blocks) // 2
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[{"even": blocks[2 * i], "odd": blocks[2 * i + 1]}
          for i in range(n_pairs)])
    shift = window // 2

    def body(carry, xs):
        if drops is None:
            p = xs
            d0 = d1 = None
        else:
            p, keys, rates = xs
            d0, d1 = (keys[0], rates[0]), (keys[1], rates[1])
        carry = _block(p["even"], carry, num_heads, window, 0, rel_index,
                       drop=d0)
        carry = _block(p["odd"], carry, num_heads, window, shift,
                       rel_index, drop=d1)
        return carry, None

    xs = stacked if drops is None else (stacked,) + drops
    x, _ = jax.lax.scan(body, x, xs)
    return x


def _patch_merge(p, x):
    """[B, H, W, C] -> [B, H/2, W/2, 2C] (reference swin :257-297)."""
    b, h, w, c = x.shape
    pad_b, pad_r = h % 2, w % 2
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    x = L.layer_norm(p["norm"], x)
    return L.linear(p["reduction"], x)


def apply_swin(params: Dict, img: jnp.ndarray, cfg: SwinConfig,
               drop_path_key=None) -> List[jnp.ndarray]:
    """img: [B, H, W, 3] -> 4 feature maps at strides 4/8/16/32.

    ``drop_path_key``: PRNG key enabling train-time stochastic depth with
    linearly increasing rate up to cfg.drop_path_rate (reference swin
    :481-483, timm DropPath); None (inference) = identity."""
    x = L.conv2d(params["patch_embed"]["proj"], img,
                 stride=cfg.patch_size, padding=0)
    if params["patch_embed"]["norm"] is not None:
        x = L.layer_norm(params["patch_embed"]["norm"], x)
    rel_index = _rel_pos_index(cfg.window_size)
    total_blocks = sum(cfg.depths)
    dpr = [cfg.drop_path_rate * i / max(total_blocks - 1, 1)
           for i in range(total_blocks)]
    if drop_path_key is not None:
        block_keys = jax.random.split(drop_path_key, total_blocks)
    outs = []
    gi = 0
    for si in range(len(cfg.depths)):
        stage = params[f"stage{si}"]
        depth = len(stage["blocks"])
        if depth >= 4 and depth % 2 == 0:
            # deep stage: scan over block pairs (one body in the XLA
            # program — see _stage_scan). rate 0 drop-path is identity,
            # so uniform application inside the scan matches the
            # per-block `dpr > 0` gating of the unrolled path.
            drops = None
            if drop_path_key is not None:
                keys = block_keys[gi:gi + depth].reshape(
                    depth // 2, 2, *block_keys.shape[1:])
                rates = jnp.asarray(
                    dpr[gi:gi + depth], jnp.float32).reshape(depth // 2, 2)
                drops = (keys, rates)
            x = _stage_scan(stage["blocks"], x, cfg.num_heads[si],
                            cfg.window_size, rel_index, drops=drops)
            gi += depth
        else:
            for bi, bp in enumerate(stage["blocks"]):
                # odd blocks always shift — the reference does NOT clamp
                # shift to 0 on maps smaller than the window (unlike
                # official Swin): it pads, rolls, and masks
                # (swin_transformer.py:361-404)
                shift = 0 if bi % 2 == 0 else cfg.window_size // 2
                drop = None
                if drop_path_key is not None and dpr[gi] > 0:
                    drop = (block_keys[gi], dpr[gi])
                x = _block(bp, x, cfg.num_heads[si], cfg.window_size,
                           shift, rel_index, drop=drop)
                gi += 1
        if si in cfg.out_indices:
            outs.append(L.layer_norm(params[f"out_norm{si}"], x))
        if si < len(cfg.depths) - 1:
            x = _patch_merge(stage["downsample"], x)
    return outs
