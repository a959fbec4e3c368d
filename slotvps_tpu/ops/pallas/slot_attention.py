"""Pallas TPU kernel for slot-softmax cross-attention (the Retriever core).

Reference math (mmdet/models/detectors/dynamic_mask_head.py:435-456):

    attn[l, p] = q[l] . k[p]          # slots x pixels
    attn = softmax over the SLOT axis  # per-pixel competition of slots
    out[l]  = sum_p attn[l, p] * v[p]

At Cityscapes resolution the finest level has H*W = 131072 pixels, so the
XLA einsum materializes a [100, 131072] attention tensor in HBM twice (fwd
read+write).  Because the softmax normalizer is per *pixel* over the tiny
slot axis, the computation is exactly tileable over pixels with no online
rescaling: each pixel tile computes its own softmax completely.  The kernel
streams k/v tiles through VMEM, runs two MXU matmuls per tile, and
accumulates the [slots, C] output in a VMEM scratch — attention never
touches HBM.

Shapes are padded to MXU-friendly sizes: slots 100 -> 128 (masked with -inf
before the softmax so padded slots get zero probability), pixels to the
tile size (padded k rows are masked out of the output matmul via zero v —
they still receive softmax probability in their own *column*, which is
irrelevant because each column is an independent pixel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, nvalid_ref, o_ref, acc_ref):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[:]                      # [Lp, C]
    k = k_ref[:]                      # [T, C]
    v = v_ref[:]                      # [T, C]
    n_slots = nvalid_ref[0]

    scores = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [Lp, T]
    lp = q.shape[0]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (lp, 1), 0)
    valid = slot_ids < n_slots
    scores = jnp.where(valid, scores, -jnp.inf)
    # per-pixel (per-column) softmax over slots
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)
    z = jnp.sum(e, axis=0, keepdims=True)
    p = e / z                                        # [Lp, T]
    acc_ref[:] += jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # [Lp, C]

    @pl.when(t == nt - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


def slot_attention_pallas(
    q: jnp.ndarray,   # [L, C]
    k: jnp.ndarray,   # [P, C] flattened pixels
    v: jnp.ndarray,   # [P, C]
    tile: int = 1024,
) -> jnp.ndarray:
    """out[l, c] = sum_p softmax_l(q k^T)[l, p] v[p, c]."""
    l, c = q.shape
    p_pix = k.shape[0]
    lp = max(128, -(-l // 128) * 128)
    q_pad = jnp.zeros((lp, c), q.dtype).at[:l].set(q)
    n_tiles = -(-p_pix // tile)
    pad_p = n_tiles * tile
    if pad_p != p_pix:
        # padded pixels: zero v (no output contribution); k can be zero too
        k = jnp.zeros((pad_p, c), k.dtype).at[:p_pix].set(k)
        v = jnp.zeros((pad_p, c), v.dtype).at[:p_pix].set(v)

    out = pl.pallas_call(
        _kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((lp, c), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((lp, c), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((lp, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((lp, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * lp * pad_p * c,
            bytes_accessed=2 * pad_p * c * 4 + lp * c * 8,
            transcendentals=lp * pad_p,
        ),
    )(q_pad, k, v, jnp.array([l], jnp.int32))
    return out[:l].astype(q.dtype)


def retriever_attention_pallas(p, slots, features, pos,
                               softmax_dim="slots"):
    """Drop-in replacement for models.slot_head.retriever_attention using
    the Pallas kernel for the attention einsums."""
    from slotvps_tpu.models import layers as L

    assert softmax_dim == "slots", "pallas kernel implements slot softmax"
    q = L.layer_norm(p["norm_q"], L.linear(p["to_q"], slots))
    k_in = features if pos is None else features + pos.astype(features.dtype)
    k = L.layer_norm(p["norm_k"], L.linear(p["to_k"], k_in))
    v = L.layer_norm(p["norm_v"], L.linear(p["to_v"], features))
    b, h, w, c = k.shape
    k = k.reshape(b, h * w, c)
    v = v.reshape(b, h * w, c)
    out = jax.vmap(slot_attention_pallas)(q, k, v)
    return L.relu(L.layer_norm(p["norm1"], out))
