"""Pallas TPU kernel for the greedy mask-removal claim loop.

Reference semantics: mmdet/models/detectors/vps_temporal_slots.py:601-639 —
slots are visited in score order; a thing slot is rejected if its binarized
mask is degenerate or overlaps already-claimed same-class pixels by more
than ``fraction_threshold`` of its area; otherwise it claims its still
unowned pixels.

The XLA ``lax.scan`` version re-reads and re-writes the [H, W] ownership
maps from HBM on every one of the K steps (~16 MB/step).  Here the grid
iterates over (batch, slot) and the ownership maps live in VMEM scratch
across the slot steps (TPU grids are sequential, last dim fastest), so
each step only streams its own binarized plane from HBM.

``claim_scan_pallas`` is ``jax.vmap``-able via a custom batching rule that
maps the batch onto the outer grid dimension (data-parallel multi-video
batches, BASELINE config 5).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(logit_ref, meta_ref, frac_ref, kept_ref, owner_ref,
            owner, owner_class, *, h, w):
    b = pl.program_id(0)
    k = pl.program_id(1)
    nk = pl.num_programs(1)

    @pl.when(k == 0)
    def _():
        owner[:] = jnp.full((h, w), -1, jnp.int32)
        owner_class[:] = jnp.full((h, w), -1, jnp.int32)

    lg = logit_ref[0, 0] != 0                   # [H, W] bool
    cls = meta_ref[0, 0, k]                     # int32: class id
    flags = meta_ref[0, 1, k]                   # 1 = valid thing
    n = meta_ref[0, 2, k]                       # mask_sum
    frac = frac_ref[0]

    same = (owner[:] >= 0) & (owner_class[:] == cls)
    overlap = jnp.sum((lg & same).astype(jnp.float32))
    degenerate = (n == 0) | (n == h * w)
    reject = degenerate | (overlap / jnp.maximum(n, 1).astype(jnp.float32)
                           > frac)
    keep = (flags == 1) & ~reject
    kept_ref[b, k] = keep.astype(jnp.int32)

    @pl.when(keep)
    def _():
        claim = lg & (owner[:] < 0)
        owner[:] = jnp.where(claim, k, owner[:])
        owner_class[:] = jnp.where(claim, cls, owner_class[:])

    @pl.when(k == nk - 1)
    def _():
        owner_ref[0] = owner[:].astype(jnp.int8)


def _claim_scan_batched(logit, labels, is_thing, valid, frac):
    """logit: [B, K, H, W] bool -> (keep_things [B, K] bool,
    owner [B, H, W] int8)."""
    bsz, k, h, w = logit.shape
    mask_sum = logit.reshape(bsz, k, -1).sum(axis=2, dtype=jnp.int32)
    meta = jnp.stack([
        labels.astype(jnp.int32),
        (valid & is_thing).astype(jnp.int32),
        mask_sum,
    ], axis=1)  # [B, 3, K]
    kept, owner = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(bsz, k),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, k), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, k), jnp.int32),
            jax.ShapeDtypeStruct((bsz, h, w), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(logit.astype(jnp.int8), meta,
      jnp.asarray([frac], jnp.float32))
    return kept != 0, owner


@jax.custom_batching.custom_vmap
def claim_scan_pallas(logit, labels, is_thing, valid, fraction_threshold):
    """logit: [K, H, W] bool; returns (keep_things [K] bool,
    owner [H, W] int8)."""
    kept, owner = _claim_scan_batched(
        logit[None], labels[None], is_thing[None], valid[None],
        fraction_threshold)
    return kept[0], owner[0]


@claim_scan_pallas.def_vmap
def _claim_scan_vmap(axis_size, in_batched, logit, labels, is_thing, valid,
                     fraction_threshold):
    def bcast(x, batched):
        return x if batched else jnp.broadcast_to(
            x[None], (axis_size,) + x.shape)

    out = _claim_scan_batched(
        bcast(logit, in_batched[0]), bcast(labels, in_batched[1]),
        bcast(is_thing, in_batched[2]), bcast(valid, in_batched[3]),
        fraction_threshold)
    return out, (True, True)
