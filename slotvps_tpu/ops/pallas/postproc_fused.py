"""Fused Pallas kernels for panoptic post-processing.

The post-processing math (models/postprocess.py) conceptually operates on
the x4-upsampled mask stack [H, W, K] — 838 MB in f32 at Cityscapes
resolution, and the XLA path materializes it and re-reads it per pass.
These kernels never materialize it: each works on 8-full-res-row tiles,
DMA-ing the 4 corresponding low-res mask rows (+1 halo) from HBM and
reconstructing the upsampled values in VMEM with the exact fixed-phase
bilinear weights (ops/interpolate.py semantics, torch-exact).

  * :func:`theta_pallas` — per-pixel binarization threshold
    theta = log(thr) + logsumexp over valid slots (the softmax>=thr test
    in logit space; reference vps_temporal_slots.py:572,606-608),
  * :func:`claim_scan_fused` — the greedy mask-removal loop
    (reference :601-639) with ownership maps resident in VMEM and the
    binarized plane reconstructed on the fly per slot,
  * :func:`argmax_areas_pallas` — the masked per-pixel argmax + per-slot
    area histogram of ``get_ids_area`` (reference :724-756), with the
    thing-ownership zeroing (reference :624-638) applied on the fly.

Total HBM traffic per full post-process drops from ~6 GB to ~300 MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _upsampled_row(rows_ref, y_phase, base_rel, wlr, k):
    """Reconstruct one full-res row [4*wlr, K] from the VMEM low-res rows.

    rows_ref: [4, wlr+2, K] (edge-padded by 1 column, rows are the tile's
    low-res window).  y_phase in 0..3, base_rel in {1, 2} (relative row of
    the phase's 'center' sample, +1 for the row halo)."""
    w_prev = (0.375, 0.125, 0.0, 0.0)[y_phase]
    w_next = (0.0, 0.0, 0.125, 0.375)[y_phase]
    w_cent = 1.0 - w_prev - w_next
    row = w_cent * rows_ref[base_rel]
    if w_prev:
        row += w_prev * rows_ref[base_rel - 1]
    if w_next:
        row += w_next * rows_ref[base_rel + 1]
    # row: [wpad, K] low-res columns (1-col halo + alignment pad)
    prev = row[:wlr, :]
    cent = row[1:wlr + 1, :]
    nxt = row[2:wlr + 2, :]
    p0 = 0.375 * prev + 0.625 * cent
    p1 = 0.125 * prev + 0.875 * cent
    p2 = 0.875 * cent + 0.125 * nxt
    p3 = 0.625 * cent + 0.375 * nxt
    out = jnp.stack([p0, p1, p2, p3], axis=1)      # [wlr, 4, K]
    return out.reshape(4 * wlr, k)                 # [W, K]


def _pad_lowres(m, k_pad=None):
    """Edge-replicate pad by 1 row/col, zero-pad slots to the lane width
    and columns to a sublane multiple (8) — manual DMA of a VMEM-tiled
    region faults if the second-to-minor dim is not tile-aligned:
    [h+2, wpad, Kp]."""
    m = jnp.concatenate([m[:1], m, m[-1:]], axis=0)
    m = jnp.concatenate([m[:, :1], m, m[:, -1:]], axis=1)
    wpad = -(-m.shape[1] // 8) * 8
    if wpad != m.shape[1]:
        m = jnp.pad(m, ((0, 0), (0, wpad - m.shape[1]), (0, 0)))
    if k_pad is not None and k_pad != m.shape[-1]:
        m = jnp.pad(m, ((0, 0), (0, 0), (0, k_pad - m.shape[-1])))
    return m


def _wpad(w):
    return -(-(w + 2) // 8) * 8


def _lane_pad(k):
    return -(-k // 128) * 128


def _dma_rows(m_hbm, rows, t, sem):
    cp = pltpu.make_async_copy(m_hbm.at[pl.ds(2 * t, 4)], rows, sem)
    cp.start()
    cp.wait()


def _theta_kernel(valid_ref, m_hbm, o_ref, rows, sem, *, wlr, k, log_thr):
    t = pl.program_id(0)
    _dma_rows(m_hbm, rows, t, sem)
    valid = valid_ref[:] != 0                       # [1, K] bool
    for y in range(8):
        vals = _upsampled_row(rows, y % 4, 1 + y // 4, wlr, k)
        vals = jnp.where(valid, vals, _NEG)
        mx = jnp.max(vals, axis=-1, keepdims=True)
        z = jnp.sum(jnp.exp(vals - mx), axis=-1, keepdims=True)
        theta = log_thr + mx + jnp.log(jnp.maximum(z, 1e-30))
        o_ref[y, :] = theta[:, 0]


def theta_pallas(m_lowres, valid, pixel_threshold):
    """m_lowres: [h, w, K] f32; valid: [K] bool -> theta [4h, 4w] f32."""
    import math

    h, w, k = m_lowres.shape
    kp = _lane_pad(k)
    mp = _pad_lowres(m_lowres, kp)
    valid = jnp.pad(valid, (0, kp - k))
    n_tiles = (4 * h) // 8
    return pl.pallas_call(
        functools.partial(_theta_kernel, wlr=w, k=kp,
                          log_thr=math.log(pixel_threshold)),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 4 * w), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4 * h, 4 * w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4, _wpad(w), kp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(valid.astype(jnp.int32)[None], mp)


def _claim_kernel(meta_ref, frac_ref, m_ref, theta_ref, kept_ref, owner_ref,
                  owner, owner_class, *, hlr, wlr, k):
    """Grid over slots; ownership maps stay in VMEM (full res).

    The per-slot low-res plane arrives as a grid-blocked VMEM input —
    combining manual DMA with SMEM outputs faults on this toolchain."""
    i = pl.program_id(0)
    nk = pl.num_programs(0)
    h, w = 4 * hlr, 4 * wlr

    @pl.when(i == 0)
    def _():
        owner[:] = jnp.full((h, w), -1, jnp.int32)
        owner_class[:] = jnp.full((h, w), -1, jnp.int32)

    mrows = m_ref
    cls = meta_ref[0, i]
    flags = meta_ref[1, i]
    frac = frac_ref[0]

    # reconstruct the full-res binarized plane in VMEM.
    # row phases interleave on the SUBLANE dim (supported reshape);
    # column phases use the blocked layout c_blk = p*wlr + j (lane
    # interleave is an unsupported shape cast in Mosaic) — theta and the
    # ownership maps live in the same blocked layout, and the wrapper
    # unblocks the owner map once in XLA.
    colsrc = mrows[0]                               # [hlr+2, wpad]
    rp = colsrc[:hlr, :]
    rc = colsrc[1:hlr + 1, :]
    rn = colsrc[2:hlr + 2, :]
    rows_full = jnp.stack([
        0.375 * rp + 0.625 * rc,
        0.125 * rp + 0.875 * rc,
        0.875 * rc + 0.125 * rn,
        0.625 * rc + 0.375 * rn,
    ], axis=1).reshape(h, colsrc.shape[1])          # [H, wpad], true rows
    prev = rows_full[:, :wlr]
    cent = rows_full[:, 1:wlr + 1]
    nxt = rows_full[:, 2:wlr + 2]
    full = jnp.concatenate([
        0.375 * prev + 0.625 * cent,
        0.125 * prev + 0.875 * cent,
        0.875 * cent + 0.125 * nxt,
        0.625 * cent + 0.375 * nxt,
    ], axis=1)                                      # [H, W] col-blocked
    lg = (flags >= 0) & (full >= theta_ref[:])          # valid slots only via n
    # flags: 1 = valid thing, 0 = valid stuff/other, -1 = invalid
    n = jnp.sum(lg.astype(jnp.float32))
    same = (owner[:] >= 0) & (owner_class[:] == cls)
    overlap = jnp.sum((lg & same).astype(jnp.float32))
    degenerate = (n == 0) | (n == h * w)
    reject = degenerate | (overlap / jnp.maximum(n, 1.0) > frac)
    keep = (flags == 1) & ~reject
    kept_ref[i] = keep.astype(jnp.int32)

    @pl.when(keep)
    def _():
        claim = lg & (owner[:] < 0)
        owner[:] = jnp.where(claim, i, owner[:])
        owner_class[:] = jnp.where(claim, cls, owner_class[:])

    @pl.when(i == nk - 1)
    def _():
        owner_ref[:] = owner[:].astype(jnp.int8)


def _to_col_blocked(x, wlr):
    """True layout [H, 4*wlr] -> column-blocked (c_blk = p*wlr + j)."""
    hh = x.shape[0]
    return x.reshape(hh, wlr, 4).transpose(0, 2, 1).reshape(hh, 4 * wlr)


def _from_col_blocked(x, wlr):
    hh = x.shape[0]
    return x.reshape(hh, 4, wlr).transpose(0, 2, 1).reshape(hh, 4 * wlr)


def claim_scan_fused(m_lowres, theta, labels, is_thing, valid,
                     fraction_threshold):
    """m_lowres: [h, w, K]; theta: [4h, 4w].
    Returns (keep_things [K] bool, owner [4h, 4w] int8)."""
    h, w, k = m_lowres.shape
    theta = _to_col_blocked(theta, w)
    mp = _pad_lowres(m_lowres)[:, :, :k].transpose(2, 0, 1)  # [K, h+2, wpad]
    mp_w = mp.shape[2]
    flags = jnp.where(valid, jnp.where(is_thing, 1, 0), -1)
    meta = jnp.stack([labels.astype(jnp.int32), flags.astype(jnp.int32)])
    kept, owner = pl.pallas_call(
        functools.partial(_claim_kernel, hlr=h, wlr=w, k=k),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h + 2, mp_w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * h, 4 * w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4 * h, 4 * w), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((4 * h, 4 * w), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((4 * h, 4 * w), jnp.int32),
            pltpu.VMEM((4 * h, 4 * w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(meta, jnp.asarray([fraction_threshold], jnp.float32), mp, theta)
    return kept != 0, _from_col_blocked(owner, w)


def _argmax_kernel(meta_ref, m_hbm, owner_ref, mid_ref, areas_ref,
                   rows, sem, *, wlr, k):
    t = pl.program_id(0)
    _dma_rows(m_hbm, rows, t, sem)
    lane = jax.lax.broadcasted_iota(jnp.int32, (4 * wlr, k), 1)
    kept_row = meta_ref[0:1, :] != 0                  # [1, K]
    is_thing_row = meta_ref[1:2, :] != 0              # [1, K]
    acc_rows = []
    for y in range(8):
        vals = _upsampled_row(rows, y % 4, 1 + y // 4, wlr, k)
        owner_row = owner_ref[y, :][:, None]          # [W, 1] int32
        zero_mask = is_thing_row & (owner_row != lane)
        vals = jnp.where(zero_mask, 0.0, vals)
        vals = jnp.where(kept_row, vals, _NEG)
        # first-index tie-break (numpy/torch semantics; Mosaic's argmax
        # breaks ties differently): min lane index achieving the max
        mxv = jnp.max(vals, axis=-1, keepdims=True)
        m_id = jnp.min(jnp.where(vals >= mxv, lane, 2 ** 30),
                       axis=-1).astype(jnp.int32)           # [W]
        mid_ref[y, :] = m_id
        acc_rows.append(
            jnp.sum((m_id[:, None] == lane).astype(jnp.int32), axis=0))
    areas_ref[:] = jnp.stack(acc_rows, axis=0)


def argmax_areas_pallas(m_lowres, owner, kept, is_thing):
    """Masked argmax + per-slot areas, upsampling on the fly.

    m_lowres: [h, w, K]; owner: [4h, 4w] int8.
    Returns (m_id [4h, 4w] int32, areas [K] int32)."""
    h, w, k = m_lowres.shape
    kp = _lane_pad(k)
    mp = _pad_lowres(m_lowres, kp)
    n_tiles = (4 * h) // 8
    meta = jnp.stack([
        jnp.pad(kept.astype(jnp.int32), (0, kp - k)),
        jnp.pad(is_thing.astype(jnp.int32), (0, kp - k)),
    ])
    m_id, areas = pl.pallas_call(
        functools.partial(_argmax_kernel, wlr=w, k=kp),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((8, 4 * w), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, 4 * w), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kp), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4 * h, 4 * w), jnp.int32),
            jax.ShapeDtypeStruct((n_tiles * 8, kp), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, _wpad(w), kp), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(meta, mp, owner.astype(jnp.int32))
    return m_id, areas.sum(axis=0)[:k]
