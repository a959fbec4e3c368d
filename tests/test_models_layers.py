"""Layer-primitive parity vs torch CPU."""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from slotvps_tpu.models import layers as L


def test_conv2d_matches_torch(rng):
    x = rng.standard_normal((2, 9, 11, 5), dtype=np.float32)
    w = rng.standard_normal((3, 3, 5, 7), dtype=np.float32)
    b = rng.standard_normal(7, dtype=np.float32)
    ours = np.asarray(L.conv2d({"w": jnp.asarray(w), "b": jnp.asarray(b)},
                               jnp.asarray(x), padding=1))
    conv = nn.Conv2d(5, 7, 3, padding=1)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(3, 2, 0, 1)))
        conv.bias.copy_(torch.from_numpy(b))
        theirs = conv(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_layer_norm_matches_torch(rng):
    x = rng.standard_normal((2, 10, 16), dtype=np.float32)
    scale = rng.standard_normal(16, dtype=np.float32)
    bias = rng.standard_normal(16, dtype=np.float32)
    ours = np.asarray(L.layer_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x)))
    ln = nn.LayerNorm(16)
    with torch.no_grad():
        ln.weight.copy_(torch.from_numpy(scale))
        ln.bias.copy_(torch.from_numpy(bias))
        theirs = ln(torch.from_numpy(x))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_group_norm_matches_torch(rng):
    x = rng.standard_normal((2, 6, 7, 32), dtype=np.float32)
    scale = rng.standard_normal(32, dtype=np.float32)
    bias = rng.standard_normal(32, dtype=np.float32)
    ours = np.asarray(L.group_norm(
        {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        jnp.asarray(x), num_groups=8))
    gn = nn.GroupNorm(8, 32)
    with torch.no_grad():
        gn.weight.copy_(torch.from_numpy(scale))
        gn.bias.copy_(torch.from_numpy(bias))
        theirs = gn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-4)


def test_batch_norm_eval_matches_torch(rng):
    x = rng.standard_normal((2, 4, 5, 8), dtype=np.float32)
    p = {"scale": rng.standard_normal(8, dtype=np.float32),
         "bias": rng.standard_normal(8, dtype=np.float32),
         "mean": rng.standard_normal(8, dtype=np.float32),
         "var": rng.random(8, dtype=np.float32) + 0.5}
    ours = np.asarray(L.batch_norm_eval(
        {k: jnp.asarray(v) for k, v in p.items()}, jnp.asarray(x)))
    bn = nn.BatchNorm2d(8).eval()
    with torch.no_grad():
        bn.weight.copy_(torch.from_numpy(p["scale"]))
        bn.bias.copy_(torch.from_numpy(p["bias"]))
        bn.running_mean.copy_(torch.from_numpy(p["mean"]))
        bn.running_var.copy_(torch.from_numpy(p["var"]))
        theirs = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        ours, theirs.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5)


def test_mha_matches_torch(rng):
    d, heads, b, l = 32, 4, 2, 10
    x = rng.standard_normal((b, l, d), dtype=np.float32)
    mha = nn.MultiheadAttention(d, heads, dropout=0.0, batch_first=True)
    p = {
        "in_proj": {
            "w": jnp.asarray(mha.in_proj_weight.detach().numpy().T),
            "b": jnp.asarray(mha.in_proj_bias.detach().numpy()),
        },
        "out_proj": {
            "w": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
            "b": jnp.asarray(mha.out_proj.bias.detach().numpy()),
        },
    }
    ours = np.asarray(L.multi_head_attention(
        p, jnp.asarray(x), jnp.asarray(x), jnp.asarray(x), heads))
    with torch.no_grad():
        theirs, _ = mha(torch.from_numpy(x), torch.from_numpy(x),
                        torch.from_numpy(x))
    np.testing.assert_allclose(ours, theirs.numpy(), rtol=1e-4, atol=1e-5)


def test_gelu_matches_torch(rng):
    x = rng.standard_normal(100, dtype=np.float32) * 3
    ours = np.asarray(L.gelu(jnp.asarray(x)))
    theirs = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_batch_norm_train_stats(rng):
    x = rng.standard_normal((4, 6, 6, 3), dtype=np.float32)
    p = {k: jnp.asarray(v) for k, v in
         {"scale": np.ones(3, np.float32), "bias": np.zeros(3, np.float32),
          "mean": np.zeros(3, np.float32), "var": np.ones(3, np.float32)}.items()}
    y, stats = L.batch_norm_train(p, jnp.asarray(x), axes=(0, 1, 2))
    bn = nn.BatchNorm2d(3)
    t = bn(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(y),
                               t.detach().numpy().transpose(0, 2, 3, 1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(stats["mean"]),
                               bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(stats["var"]),
                               bn.running_var.numpy(), rtol=1e-4, atol=1e-5)
