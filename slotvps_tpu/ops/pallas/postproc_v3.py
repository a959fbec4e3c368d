"""Fused panoptic post-processing kernels, v3 — slot-major layout.

Replaces ops/pallas/postproc_fused.py's [H, W, K] lane-major kernels.
Profiling on v5e showed those run ~15-20x off the VPU floor because every
per-pixel reduction (logsumexp, argmax) runs over the LANE axis, where a
cross-lane reduction yields only 8 results per op sequence.  These kernels
flip the layout:

  * slots K ride the SUBLANE axis (reductions over K are cheap
    register-wise elementwise maxes/adds, ~1 op/element),
  * image width rides the LANE axis at the LOW-RES width (512 = 4 lane
    tiles at Cityscapes), and
  * the x4-upsampled full-res image lives in a PHASE-BLOCKED layout
    [4, 4, h, w]: plane (pr, pc) holds full-res pixels (4i+pr, 4j+pc).
    All pixelwise math is layout-invariant; the caller unblocks the final
    owner/m_id maps once in XLA.

As in postproc_fused.py, the [H, W, K] upsampled stack never exists: each
kernel reconstructs full-res values on the fly from the low-res mask rows
with the exact fixed-phase bilinear weights of ops/interpolate.py
(torch-exact, align_corners=False; reference vps_temporal_slots.py:697-698
upsamples with F.interpolate before thresholding at :606-608).

Kernels (reference semantics in models/postprocess.py):
  * :func:`theta_v3`    — per-pixel binarization threshold
                          theta = log(thr) + logsumexp over valid slots,
  * :func:`claim_v3`    — the sequential greedy mask-removal loop
                          (reference :601-639), ownership maps in VMEM,
  * :func:`argmax_v3`   — masked per-pixel argmax + per-slot areas with
                          thing-ownership zeroing (reference :624-638,
                          :724-756).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30

# fixed-phase x4 bilinear weights (ops/interpolate.py): phase p of the
# upsampled axis mixes (prev, cent, next) low-res samples
_W_PREV = (0.375, 0.125, 0.0, 0.0)
_W_NEXT = (0.0, 0.0, 0.125, 0.375)


def _round8(n):
    return -(-n // 8) * 8


def _round128(n):
    return -(-n // 128) * 128


def to_blocked(x):
    """Full-res [4h, 4w] -> phase-blocked [4, 4, h, w]."""
    hh, ww = x.shape
    h, w = hh // 4, ww // 4
    return x.reshape(h, 4, w, 4).transpose(1, 3, 0, 2)


def from_blocked(xb):
    """Phase-blocked [4, 4, h, w] -> full-res [4h, 4w]."""
    _, _, h, w = xb.shape
    return xb.transpose(2, 0, 3, 1).reshape(4 * h, 4 * w)


def _pad_khw(m, kp, extra_rows=0):
    """[K, h, w] -> [kp, h+2+extra, wpad] edge-replicated rows/cols, zero
    slots.  ``extra_rows`` zero-pads the bottom so row-chunk DMAs can use
    sublane-aligned (multiple-of-8) slice lengths; the lane (width) dim is
    zero-padded to a 128 multiple for the same reason."""
    k = m.shape[0]
    m = jnp.concatenate([m[:, :1], m, m[:, -1:]], axis=1)
    m = jnp.concatenate([m[:, :, :1], m, m[:, :, -1:]], axis=2)
    wp = _round128(m.shape[2])
    m = jnp.pad(m, ((0, kp - k), (0, extra_rows), (0, wp - m.shape[2])))
    return m


def _row_phases(rows, li, w):
    """rows: [kp, hb+2, wpad] -> 4 row-interpolated [kp, wpad] and their
    (prev, cent, next) column slices for one low-res row li."""
    prev_r = rows[:, li, :]
    cent_r = rows[:, li + 1, :]
    next_r = rows[:, li + 2, :]
    out = []
    for pr in range(4):
        wp, wn = _W_PREV[pr], _W_NEXT[pr]
        rv = (1.0 - wp - wn) * cent_r
        if wp:
            rv = rv + wp * prev_r
        if wn:
            rv = rv + wn * next_r
        out.append((rv[:, 0:w], rv[:, 1:w + 1], rv[:, 2:w + 2]))
    return out


def _col_phase(pc, prev, cent, next_):
    wp, wn = _W_PREV[pc], _W_NEXT[pc]
    v = (1.0 - wp - wn) * cent
    if wp:
        v = v + wp * prev
    if wn:
        v = v + wn * next_
    return v


def _row_phases_block(rows, pr, hb):
    """Batched-row variant of :func:`_row_phases`: row-interpolate ALL
    ``hb`` low-res rows of the block for one row phase in one 3-D op
    chain.  rows: [kp, hb+2(+pad), wpad] -> [kp, hb, wpad]."""
    wp, wn = _W_PREV[pr], _W_NEXT[pr]
    cent = rows[:, 1:hb + 1, :]
    rv = (1.0 - wp - wn) * cent
    if wp:
        rv = rv + wp * rows[:, 0:hb, :]
    if wn:
        rv = rv + wn * rows[:, 2:hb + 2, :]
    return rv


def _theta_kernel(valid_ref, m_hbm, o_ref, rows, sem, *, hb, w, kp,
                  log_thr):
    t = pl.program_id(0)
    # slice length hb+8 (not hb+2): sublane slices must be 8-aligned
    cp = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(t * hb, hb + 8), :], rows, sem)
    cp.start()
    cp.wait()
    valid = valid_ref[:, 0][:, None] != 0                 # [kp, 1]
    # per-output-row form: at the full kp=104 slot capacity the batched
    # [kp, hb, w] variant spills vector registers and measures ~12%
    # SLOWER (batched-row pays off only at small kp — see _sseg_kernel)
    for li in range(hb):
        for pr, (prev, cent, next_) in enumerate(_row_phases(rows, li, w)):
            for pc in range(4):
                vals = _col_phase(pc, prev, cent, next_)   # [kp, w]
                vals = jnp.where(valid, vals, _NEG)
                mx = jnp.max(vals, axis=0, keepdims=True)  # [1, w]
                z = jnp.sum(jnp.exp(vals - mx), axis=0, keepdims=True)
                o_ref[pr, pc, li, :] = (
                    log_thr + mx + jnp.log(jnp.maximum(z, 1e-30)))[0]


def theta_v3(m_klow, valid, pixel_threshold, hb=8):
    """m_klow: [K, h, w] f32; valid: [K] bool.

    Returns theta phase-blocked [4, 4, h, w] f32."""
    k, h, w = m_klow.shape
    kp = _round8(k)
    hb = math.gcd(hb, h)
    mp = _pad_khw(m_klow.astype(jnp.float32), kp, extra_rows=6)
    vcol = jnp.pad(valid.astype(jnp.int32), (0, kp - k))[:, None]
    return pl.pallas_call(
        functools.partial(_theta_kernel, hb=hb, w=w, kp=kp,
                          log_thr=math.log(pixel_threshold)),
        grid=(h // hb,),
        in_specs=[
            pl.BlockSpec((kp, 1), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4, h, w), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kp, hb + 8, _round128(w + 2)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(vcol, mp)


def _claim_kernel(meta_ref, frac_ref, theta_ref, m_hbm, kept_ref, owner_ref,
                  owner, owner_class, lg_store, rows, keep_s, sem,
                  *, h, w, kp):
    i = pl.program_id(0)
    nk = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        owner[:] = jnp.full((4, 4, h, w), -1, jnp.int32)
        owner_class[:] = jnp.full((4, 4, h, w), -1, jnp.int32)

    cls = meta_ref[0, i]
    flags = meta_ref[1, i]
    frac = frac_ref[0]
    keep_s[0] = 0

    # Only valid THING slots participate: stuff/invalid slots never claim
    # and keep_things is False for them regardless
    # (apply_mask_removal_only_ins, reference :601-639; models/
    # postprocess.py kept = where(is_thing, keep_things, valid)), so the
    # whole plane pass — including the DMA — is skipped for them.  At the
    # production 0.85 score threshold most slots are invalid, making the
    # claim scan cost proportional to the number of detections.
    @pl.when(flags == 1)
    def _():
        cp = pltpu.make_async_copy(m_hbm.at[i], rows, sem)
        cp.start()
        cp.wait()
        # pass 1: binarize all 16 phase planes, store them, and accumulate
        # the slot's pixel count + same-class-claimed overlap
        n = jnp.zeros((), jnp.float32)
        ovl = jnp.zeros((), jnp.float32)
        prev_r = rows[:h, :]
        cent_r = rows[1:h + 1, :]
        next_r = rows[2:h + 2, :]
        for pr in range(4):
            wp, wn = _W_PREV[pr], _W_NEXT[pr]
            rv = (1.0 - wp - wn) * cent_r
            if wp:
                rv = rv + wp * prev_r
            if wn:
                rv = rv + wn * next_r
            for pc in range(4):
                vals = _col_phase(pc, rv[:, 0:w], rv[:, 1:w + 1],
                                  rv[:, 2:w + 2])            # [h, w]
                lg = vals >= theta_ref[pr, pc]
                lg_store[pr, pc] = lg.astype(jnp.int8)
                n += jnp.sum(lg.astype(jnp.float32))
                same = (owner[pr, pc] >= 0) & (owner_class[pr, pc] == cls)
                ovl += jnp.sum((lg & same).astype(jnp.float32))

        degenerate = (n == 0) | (n == 16.0 * h * w)
        reject = degenerate | (ovl / jnp.maximum(n, 1.0) > frac)
        keep_s[0] = (~reject).astype(jnp.int32)

    kept_ref[i] = keep_s[0]

    @pl.when(keep_s[0] != 0)
    def _():
        for pr in range(4):
            for pc in range(4):
                claim = (lg_store[pr, pc] != 0) & (owner[pr, pc] < 0)
                owner[pr, pc] = jnp.where(claim, i, owner[pr, pc])
                owner_class[pr, pc] = jnp.where(claim, cls,
                                                owner_class[pr, pc])

    @pl.when(i == nk - 1)
    def _():
        owner_ref[:] = owner[:].astype(jnp.int8)


def claim_v3(m_klow, theta_b, labels, is_thing, valid, fraction_threshold):
    """Sequential greedy claim loop (reference :601-639).

    m_klow: [K, h, w] f32; theta_b: [4, 4, h, w].
    Returns (keep_things [K] bool, owner phase-blocked [4, 4, h, w] int8).
    """
    k, h, w = m_klow.shape
    mp = _pad_khw(m_klow.astype(jnp.float32), k, extra_rows=6)
    flags = jnp.where(valid, jnp.where(is_thing, 1, 0), -1)
    meta = jnp.stack([labels.astype(jnp.int32), flags.astype(jnp.int32)])
    kept, owner = pl.pallas_call(
        functools.partial(_claim_kernel, h=h, w=w, kp=k),
        grid=(k,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 4, h, w), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((4, 4, h, w), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((k,), jnp.int32),
            jax.ShapeDtypeStruct((4, 4, h, w), jnp.int8),
        ),
        scratch_shapes=[
            pltpu.VMEM((4, 4, h, w), jnp.int32),
            pltpu.VMEM((4, 4, h, w), jnp.int32),
            pltpu.VMEM((4, 4, h, w), jnp.int8),
            pltpu.VMEM((h + 8, _round128(w + 2)), jnp.float32),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(meta, jnp.asarray([fraction_threshold], jnp.float32), theta_b, mp)
    return kept != 0, owner


def _argmax_kernel(meta_ref, m_hbm, owner_ref, mid_ref, mid2_ref, areas_ref,
                   rows, areas, sem, *, hb, w, kp, top2, per_tile):
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    # slice length hb+8 (not hb+2): sublane slices must be 8-aligned
    cp = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(t * hb, hb + 8), :], rows, sem)
    cp.start()
    cp.wait()

    if not per_tile:
        @pl.when(t == 0)
        def _():
            areas[:] = jnp.zeros((kp, w), jnp.int32)

    kept = meta_ref[:, 0:1] != 0                      # [kp, 1]
    is_thing = meta_ref[:, 1:2] != 0                  # [kp, 1]
    kiota = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)
    acc = jnp.zeros((kp, w), jnp.int32) if per_tile else areas[:]
    # per-output-row form: the batched [kp, hb, w] variant measured ~14%
    # slower at kp=104 (register spills) — see _theta_kernel note
    for li in range(hb):
        for pr, (prev, cent, next_) in enumerate(_row_phases(rows, li, w)):
            for pc in range(4):
                vals = _col_phase(pc, prev, cent, next_)   # [kp, w]
                owner_row = owner_ref[pr, pc, li, :][None]  # [1, w] int32
                vals = jnp.where(is_thing & (owner_row != kiota), 0.0, vals)
                vals = jnp.where(kept, vals, _NEG)
                mx = jnp.max(vals, axis=0, keepdims=True)   # [1, w]
                # first-index tie-break (numpy semantics): min slot
                # achieving the max
                m_id = jnp.min(jnp.where(vals >= mx, kiota, 2 ** 30),
                               axis=0, keepdims=True)       # [1, w]
                mid_ref[pr, pc, li, :] = m_id[0]
                if top2:
                    # runner-up: best slot EXCLUDING the winner (by index)
                    # — lets the small-area filter loop patch pixels of
                    # removed slots without a full recompute
                    vals2 = jnp.where(kiota == m_id, _NEG, vals)
                    mx2 = jnp.max(vals2, axis=0, keepdims=True)
                    m2 = jnp.min(jnp.where(vals2 >= mx2, kiota, 2 ** 30),
                                 axis=0, keepdims=True)
                    mid2_ref[pr, pc, li, :] = m2[0]
                acc = acc + (m_id == kiota).astype(jnp.int32)
    if per_tile:
        # per-tile per-slot pixel counts: the small-area filter's repair
        # loop uses them to find the tiles a removal actually touches
        areas_ref[0] = jnp.sum(acc, axis=1, keepdims=True)
    else:
        areas[:] = acc

        @pl.when(t == nt - 1)
        def _():
            areas_ref[:] = areas[:]


def argmax_v3(m_klow, owner_b, kept, is_thing, hb=8, top2=False,
              per_tile=False):
    """Masked argmax + per-slot areas (reference get_ids_area).

    m_klow: [K, h, w] f32; owner_b: [4, 4, h, w] int8 (phase-blocked).
    Returns (m_id phase-blocked [4, 4, h, w] int32, areas [K] int32);
    with ``top2=True`` returns (m_id, m2_id, areas) where m2_id is the
    per-pixel runner-up slot (first-index tie-break, winner excluded by
    index).  With ``per_tile=True`` areas is instead [T, kp] — per
    row-tile per-slot pixel counts (T = h/hb tiles, RAW kp padding kept)
    for :func:`repair_v3` dirty-tile detection."""
    k, h, w = m_klow.shape
    kp = _round8(k)
    hb = math.gcd(hb, h)
    mp = _pad_khw(m_klow.astype(jnp.float32), kp, extra_rows=6)
    meta = jnp.stack([
        jnp.pad(kept.astype(jnp.int32), (0, kp - k)),
        jnp.pad(is_thing.astype(jnp.int32), (0, kp - k)),
    ], axis=1)                                        # [kp, 2]
    nt = h // hb
    areas_spec = (
        pl.BlockSpec((1, kp, 1), lambda t: (t, 0, 0),
                     memory_space=pltpu.VMEM) if per_tile else
        pl.BlockSpec((kp, w), lambda t: (0, 0), memory_space=pltpu.VMEM))
    areas_shape = (jax.ShapeDtypeStruct((nt, kp, 1), jnp.int32)
                   if per_tile else
                   jax.ShapeDtypeStruct((kp, w), jnp.int32))
    m_id, m2_id, areas = pl.pallas_call(
        functools.partial(_argmax_kernel, hb=hb, w=w, kp=kp, top2=top2,
                          per_tile=per_tile),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((kp, 2), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                          memory_space=pltpu.VMEM) if top2 else
             pl.BlockSpec((4, 4, 1, 1), lambda t: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)),
            areas_spec,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, 4, h, w), jnp.int32),
            jax.ShapeDtypeStruct((4, 4, h, w) if top2 else (4, 4, 1, 1),
                                 jnp.int32),
            areas_shape,
        ),
        scratch_shapes=[
            pltpu.VMEM((kp, hb + 8, _round128(w + 2)), jnp.float32),
            pltpu.VMEM((kp, w), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(meta, mp, owner_b.astype(jnp.int32))
    if per_tile:
        areas = areas[:, :, 0]                        # [T, kp]
    else:
        areas = areas.sum(axis=1)[:k]
    if top2:
        return m_id, m2_id, areas
    return m_id, areas


def _repair_kernel(meta_ref, dirty_ref, m_hbm, owner_ref, m1_ref,
                   areas_prev_ref, mid_ref, areas_ref, rows, sem,
                   *, hb, w, kp):
    t = pl.program_id(0)
    d = dirty_ref[t]

    @pl.when(d == 0)
    def _():
        # no pixel in this tile had its winner removed: the argmax over a
        # SUBSET that still contains the max is unchanged — copy through
        mid_ref[:] = m1_ref[:]
        areas_ref[0] = areas_prev_ref[0]

    @pl.when(d != 0)
    def _():
        cp = pltpu.make_async_copy(
            m_hbm.at[:, pl.ds(t * hb, hb + 8), :], rows, sem)
        cp.start()
        cp.wait()
        kept = meta_ref[:, 0:1] != 0
        is_thing = meta_ref[:, 1:2] != 0
        kiota = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)
        acc = jnp.zeros((kp, w), jnp.int32)
        for li in range(hb):
            for pr, (prev, cent, next_) in enumerate(
                    _row_phases(rows, li, w)):
                for pc in range(4):
                    vals = _col_phase(pc, prev, cent, next_)   # [kp, w]
                    owner_row = owner_ref[pr, pc, li, :] \
                        .astype(jnp.int32)[None]               # [1, w]
                    vals = jnp.where(is_thing & (owner_row != kiota),
                                     0.0, vals)
                    vals = jnp.where(kept, vals, _NEG)
                    mx = jnp.max(vals, axis=0, keepdims=True)
                    m_id = jnp.min(jnp.where(vals >= mx, kiota, 2 ** 30),
                                   axis=0, keepdims=True)
                    mid_ref[pr, pc, li, :] = m_id[0]
                    acc = acc + (m_id == kiota).astype(jnp.int32)
        areas_ref[0] = jnp.sum(acc, axis=1, keepdims=True)


def repair_v3(m_klow, owner_b, m1_b, kept, is_thing, dirty,
              areas_tile_prev, hb=8):
    """One small-area-filter iteration: recompute the masked per-pixel
    argmax ONLY on row-tiles containing pixels whose current winner was
    removed (``dirty``), copying every clean tile through.

    Removals only change pixels whose winner was removed (the argmax over
    a subset still containing its max is unchanged), and removed segments
    are tiny by definition (area below the filter threshold, reference
    vps_temporal_slots.py:762-790) — so a production iteration touches
    ~1-2 of the h/hb tiles and costs one id-map copy instead of a full
    [K, H, W] argmax recompute.

    m_klow: [K, h, w] f32; owner_b: [4, 4, h, w] int8; m1_b: [4, 4, h, w]
    int32 current RAW winner map; kept: [K] bool (post-removal);
    dirty: [T] bool; areas_tile_prev: [T, kp] int32.
    Returns (m1n_b [4, 4, h, w] int32, areas_tile [T, kp] int32)."""
    k, h, w = m_klow.shape
    kp = _round8(k)
    hb = math.gcd(hb, h)
    nt = h // hb
    mp = _pad_khw(m_klow.astype(jnp.float32), kp, extra_rows=6)
    meta = jnp.stack([
        jnp.pad(kept.astype(jnp.int32), (0, kp - k)),
        jnp.pad(is_thing.astype(jnp.int32), (0, kp - k)),
    ], axis=1)                                        # [kp, 2]
    m1n, areas = pl.pallas_call(
        functools.partial(_repair_kernel, hb=hb, w=w, kp=kp),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((kp, 2), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kp, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, 4, h, w), jnp.int32),
            jax.ShapeDtypeStruct((nt, kp, 1), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kp, hb + 8, _round128(w + 2)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(meta, dirty.astype(jnp.int32), mp, owner_b, m1_b,
      areas_tile_prev[:, :, None])
    return m1n, areas[:, :, 0]


def _sseg_kernel(m_hbm, o_ref, rows, sem, *, hb, w, kp, c):
    t = pl.program_id(0)
    cp = pltpu.make_async_copy(
        m_hbm.at[:, pl.ds(t * hb, hb + 8), :], rows, sem)
    cp.start()
    cp.wait()
    kiota = jax.lax.broadcasted_iota(jnp.int32, (kp, 1, 1), 0)
    # zero-padded channels [c, kp) must not win over all-negative logits
    valid = kiota < c
    # batched-row formulation: one [kp, hb, w] op chain per phase (16
    # iterations) instead of per-output-row [kp, w] chains (16*hb) —
    # 4.47 -> 3.21 ms at 1024x2048 on v5e.  Only pays off at SMALL kp
    # (19 channels pad to 24 sublanes); at the kp=104 slot capacity the
    # 3-D working set spills vector registers and the same rewrite
    # measured ~12-14% slower, so theta/argmax keep the per-row form.
    for pr in range(4):
        rv = _row_phases_block(rows, pr, hb)               # [kp, hb, wpad]
        for pc in range(4):
            vals = _col_phase(pc, rv[:, :, 0:w], rv[:, :, 1:w + 1],
                              rv[:, :, 2:w + 2])           # [kp, hb, w]
            vals = jnp.where(valid, vals, _NEG)
            mx = jnp.max(vals, axis=0, keepdims=True)      # [1, hb, w]
            m_id = jnp.min(jnp.where(vals >= mx, kiota, 2 ** 30),
                           axis=0)                         # [hb, w]
            o_ref[pr, pc] = m_id


def sseg_v3(score_chw, hb=8):
    """Fused x4 phase-upsample + channel argmax (the semantic map).

    score_chw: [C, h, w] f32 channel-major quarter-res logits.  Returns
    the phase-blocked [4, 4, h, w] int32 argmax map — bit-identical to
    ``argmax(upsample_x4_bilinear(score), -1)`` (first-index tie-break)
    without ever materializing the [4h, 4w, C] full-res logits (whose
    minor C=19 axis pads toward 128 lanes on TPU, ~6x the real bytes;
    reference vps_temporal_slots.py:440-451 argmaxes the upsampled
    logits)."""
    c, h, w = score_chw.shape
    kp = _round8(c)
    hb = math.gcd(hb, h)
    mp = _pad_khw(score_chw.astype(jnp.float32), kp, extra_rows=6)
    return pl.pallas_call(
        functools.partial(_sseg_kernel, hb=hb, w=w, kp=kp, c=c),
        grid=(h // hb,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, 4, h, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((kp, hb + 8, _round128(w + 2)), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(mp)


def _hist_kernel(mid_ref, areas_ref, areas, *, hb, w, kp):
    t = pl.program_id(0)
    nt = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        areas[:] = jnp.zeros((kp, w), jnp.int32)

    kiota = jax.lax.broadcasted_iota(jnp.int32, (kp, 1), 0)
    acc = areas[:]
    for li in range(hb):
        for pr in range(4):
            for pc in range(4):
                row = mid_ref[pr, pc, li, :][None]        # [1, w]
                acc = acc + (row == kiota).astype(jnp.int32)
    areas[:] = acc

    @pl.when(t == nt - 1)
    def _():
        areas_ref[:] = areas[:]


def hist_v3(mid_b, k, hb=8):
    """Per-slot pixel counts of a phase-blocked id map.

    mid_b: [4, 4, h, w] int32 with values in [0, kp); returns areas [k]
    int32.  Reads the 2 MP id map once through VMEM — the cheap companion
    to :func:`argmax_v3` for the small-area filter's patched iterations,
    where the argmax itself is already known."""
    _, _, h, w = mid_b.shape
    kp = _round8(k)
    hb = math.gcd(hb, h)
    areas = pl.pallas_call(
        functools.partial(_hist_kernel, hb=hb, w=w, kp=kp),
        grid=(h // hb,),
        in_specs=[
            pl.BlockSpec((4, 4, hb, w), lambda t: (0, 0, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kp, w), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((kp, w), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((kp, w), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(mid_b)
    return areas.sum(axis=1)[:k]
