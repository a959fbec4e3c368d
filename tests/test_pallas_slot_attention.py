"""Pallas slot-attention kernel vs the einsum reference (interpret mode on
CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slotvps_tpu.models.slot_head import retriever_attention
from slotvps_tpu.ops.pallas import slot_attention as sa

ON_TPU = jax.default_backend() not in ("cpu",)


def _einsum_ref(q, k, v):
    attn = jnp.einsum("lc,pc->lp", q, k)
    attn = jax.nn.softmax(attn, axis=0)
    return jnp.einsum("lp,pc->lc", attn, v)


@pytest.fixture(autouse=True)
def _interpret_on_cpu(monkeypatch):
    if not ON_TPU:
        from jax.experimental.pallas import tpu as pltpu
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


@pytest.mark.parametrize("l,p,c,tile", [
    (100, 1024, 256, 512),   # even tiles
    (100, 1000, 256, 512),   # ragged pixel tail
    (7, 300, 128, 256),      # tiny slots
])
def test_matches_einsum(rng, l, p, c, tile):
    q = jnp.asarray(rng.standard_normal((l, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p, c)), jnp.float32)
    ours = sa.slot_attention_pallas(q, k, v, tile=tile)
    ref = _einsum_ref(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_retriever_drop_in(rng):
    from slotvps_tpu.models.layers import (
        init_linear, init_norm)

    d = 128
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    p = {
        "to_q": init_linear(ks[0], d, d),
        "to_k": init_linear(ks[1], d, d),
        "to_v": init_linear(ks[2], d, d),
        "norm_q": init_norm(d), "norm_k": init_norm(d),
        "norm_v": init_norm(d), "norm1": init_norm(d),
    }
    slots = jnp.asarray(rng.standard_normal((2, 10, d)), jnp.float32)
    feats = jnp.asarray(rng.standard_normal((2, 8, 16, d)), jnp.float32)
    pos = jnp.asarray(rng.standard_normal((8, 16, d)), jnp.float32)
    ref = retriever_attention(p, slots, feats, pos)
    ours = sa.retriever_attention_pallas(p, slots, feats, pos)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
