"""Pallas TPU kernel for the greedy mask-removal claim loop.

Reference semantics: mmdet/models/detectors/vps_temporal_slots.py:601-639 —
slots are visited in score order; a thing slot is rejected if its binarized
mask is degenerate or overlaps already-claimed same-class pixels by more
than ``fraction_threshold`` of its area; otherwise it claims its still
unowned pixels.

The XLA ``lax.scan`` version re-reads and re-writes the [H, W] ownership
maps from HBM on every one of the K steps (~16 MB/step).  Here the grid
iterates over slots and the ownership maps live in VMEM scratch across
grid steps (TPU grids are sequential), so each step only streams its own
binarized plane from HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(logit_ref, meta_ref, frac_ref, kept_ref, owner_ref,
            owner, owner_class, *, h, w):
    k = pl.program_id(0)
    nk = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        owner[:] = jnp.full((h, w), -1, jnp.int32)
        owner_class[:] = jnp.full((h, w), -1, jnp.int32)

    lg = logit_ref[0] != 0                      # [H, W] bool
    cls = meta_ref[0, k]                        # int32: class id
    flags = meta_ref[1, k]                      # 1 = valid thing
    n = meta_ref[2, k]                          # mask_sum
    frac = frac_ref[0]

    same = (owner[:] >= 0) & (owner_class[:] == cls)
    overlap = jnp.sum((lg & same).astype(jnp.float32))
    degenerate = (n == 0) | (n == h * w)
    reject = degenerate | (overlap / jnp.maximum(n, 1).astype(jnp.float32)
                           > frac)
    keep = (flags == 1) & ~reject
    kept_ref[k] = keep.astype(jnp.int32)

    @pl.when(keep)
    def _():
        claim = lg & (owner[:] < 0)
        owner[:] = jnp.where(claim, k, owner[:])
        owner_class[:] = jnp.where(claim, cls, owner_class[:])

    @pl.when(k == nk - 1)
    def _():
        owner_ref[:] = owner[:].astype(jnp.int8)


def claim_scan_pallas(logit, labels, is_thing, valid, fraction_threshold):
    """logit: [K, H, W] bool; returns (keep_things [K] bool,
    owner [H, W] int8)."""
    k, h, w = logit.shape
    mask_sum = logit.reshape(k, -1).sum(axis=1, dtype=jnp.int32)
    meta = jnp.stack([
        labels.astype(jnp.int32),
        (valid & is_thing).astype(jnp.int32),
        mask_sum,
    ])  # [3, K]
    kept, owner = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((h, w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((h, w), jnp.int32),
            pltpu.VMEM((h, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(logit.astype(jnp.int8), meta,
      jnp.asarray([fraction_threshold], jnp.float32))
    return kept != 0, owner
