"""Pallas TPU kernel for deformable convolution (forward).

TPU-native replacement for the reference CUDA im2col kernel
(reference mmdet/ops/dcn/src/deform_conv_cuda_kernel.cu
``deformable_im2col``).  TPUs have no per-element gather hardware (and
Mosaic rejects ``take_along_axis``), so the bilinear gather is reformulated
as dense MXU matmuls against one-hot interpolation matrices:

Offsets are clamped into a +-halo window around each tap's rigid position
(same contract as the XLA path, ops/deform_conv.py), so for one output row
and a column tile every sample lives in a small window of
Rbuf = 2*halo+4 input rows x Wwin = tile+2*halo+4 columns.  That window is
DMA'd from HBM directly into a *flattened* [Rbuf*Wwin, C] VMEM buffer (one
strided copy per window row).  For each tap, a one-hot matrix

  M[j, q] = wy_a(j) * wx_b(j) * 1{q == y0_rel(j)*Wwin + x0_rel(j) + ...}

(4 bilinear corners per row, built with VPU compares against precomputed
row/column index maps) turns the per-pixel gather into

  samples = M @ window_flat        # [taps*tile, Rbuf*Wwin] x [Rbuf*Wwin, C]

one large MXU contraction per tap group, followed by the 3x3 weight
contraction.  The CUDA boundary rule (a sample contributes iff its position
is in (-1, H) x (-1, W); out-of-range corners read 0) is reproduced by
zero-padding x and folding the validity predicate into M.

Per P2 level (256x512, C=256) this is ~1.2 TFLOP of dense MXU work instead
of 4.7M serialized gather rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu



def _dcn_kernel(roff_ref, moff_ref, off_ref, x_hbm, w_ref, o_ref,
                xwin, sems, *, halo, h, w, c_in, c_out, tile, sub, rblk,
                compute_dtype, rowfuse=False):
    bi = pl.program_id(0)
    yb = pl.program_id(1)
    rbuf = 2 * halo + 3 + rblk  # window rows shared by the rblk output rows
    wwin = _round16(tile + 2 * halo + 4)  # sublane-aligned DMA
    swin = _swin(sub, halo)
    # rowfuse: one one-hot contraction per (subtile, ky) spanning ALL rblk
    # output rows — the window grows by rblk-1 rows (more MXU FLOPs) but
    # M rises from 3*sub to rblk*3*sub rows (fewer, fuller matmuls)
    rwin = (2 * halo + 2 + rblk - 1) if rowfuse else (2 * halo + 2)
    ksub = rwin * swin
    n_tiles = w // tile
    n_sub = tile // sub

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    r_of = roff_ref[0, :][None]  # [1, ksub]: q // swin
    m_of = moff_ref[0, :][None]  # [1, ksub]: q %  swin
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (sub, 1), 0).astype(jnp.float32)

    # double-buffered tile windows: tile t+1's rows stream in while tile t
    # computes.  A grid step covers ``rblk`` consecutive output rows, so
    # the window re-reads rbuf/rblk rows per output row instead of
    # 2*halo+4 (3.2x less HBM traffic at rblk=4, halo=4), and the
    # per-step DMA/loop overheads amortize.
    # window rows [yb*rblk+1, yb*rblk+1+rbuf), cols [t*tile, t*tile+wwin)
    # of padded x: xwin[s, r] = xp[yb*rblk+1+r, cols]
    def tile_dma(t, slot):
        return [pltpu.make_async_copy(
            x_hbm.at[bi, yb * rblk + 1 + r, pl.ds(t * tile, wwin)],
            xwin.at[slot, r],
            sems.at[slot, r]) for r in range(rbuf)]

    for cp in tile_dma(0, 0):
        cp.start()

    for t in range(n_tiles):
        slot = t % 2
        if t + 1 < n_tiles:
            for cp in tile_dma(t + 1, (t + 1) % 2):
                cp.start()
        for cp in tile_dma(t, slot):
            cp.wait()

        # Two nested locality splits keep the one-hot contraction small:
        #   * kernel-row groups: the taps of row ky only sample from the
        #     2*halo+2 buffer rows starting at rr+ky,
        #   * column subtiles: ``sub`` consecutive pixels only sample from
        #     a ``swin``-column slice of the tile window, so the contracted
        #     axis is (2*halo+2)*swin instead of (2*halo+2)*wwin — 3x less
        #     MXU work and M-build work at tile=128/sub=32/halo=4.
        def tap_m(rr, s, ky, kx):
            """[sub, ksub] one-hot interpolation rows for one tap of one
            subtile's pixels at output row yb*rblk+rr."""
            y = yb * rblk + rr
            yf = y.astype(jnp.float32)
            k = ky * 3 + kx
            px0 = t * tile + s * sub
            dy = off_ref[0, rr, 2 * k, pl.ds(px0, sub)][:, None]
            dx = off_ref[0, rr, 2 * k + 1, pl.ds(px0, sub)][:, None]
            rig_y = yf + (ky - 1.0)
            rig_x = col_iota + (px0 + kx - 1.0)
            py = rig_y + dy
            px = rig_x + dx
            valid = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
            py = jnp.clip(py, rig_y - halo, rig_y + halo)
            px = jnp.clip(px, rig_x - halo, rig_x + halo)
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            fy = (py - y0).astype(jnp.float32)
            fx = (px - x0).astype(jnp.float32)
            # row index relative to this contraction group's window start
            # (buffer row rr+ky — or ky when the group spans all rblk rows
            # — holds unpadded row y + ky - 1 - halo); col index relative
            # to the subtile window start
            y0r = y0.astype(jnp.int32) - y + (halo + 1) - ky \
                + (rr if rowfuse else 0)
            x0r = x0.astype(jnp.int32) + (halo + 2) \
                - t * tile - s * sub                   # [S,1]
            # corner weights pre-folded on the tiny [sub, 1]
            # columns so the big [sub, ksub] broadcasts are
            # just compare+select+add
            wtop = 1.0 - fy
            wx1 = jnp.where(valid, fx, 0.0)
            wx0 = jnp.where(valid, 1.0 - fx, 0.0)
            # corner (a, b) -> subtile-flat (y0r+a)*swin+x0r+b
            top = jnp.where(m_of == x0r, wx0 * wtop, 0.0) \
                + jnp.where(m_of == x0r + 1, wx1 * wtop, 0.0)
            bot = jnp.where(m_of == x0r, wx0 * fy, 0.0) \
                + jnp.where(m_of == x0r + 1, wx1 * fy, 0.0)
            return (jnp.where(r_of == y0r, top, 0.0)
                    + jnp.where(r_of == y0r + 1, bot, 0.0)).astype(
                        compute_dtype)

        def onehot_dot(m_rows, base_row, s):
            m_g = jnp.concatenate(m_rows, axis=0)
            win = xwin[slot, base_row:base_row + rwin,
                       pl.ds(s * sub, swin), :]
            return jax.lax.dot_general(
                m_g, win.reshape(ksub, c_in), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)

        # samples[ky][kx]: per-(rr, s) [sub, C] blocks in rr-major order
        samples = [[[None] * (rblk * n_sub) for _ in range(3)]
                   for _ in range(3)]
        if rowfuse:
            # one [rblk*3*sub, ksub] contraction per (subtile, ky): the
            # window spans all rblk rows (rwin = 2*halo+1+rblk rows)
            for s in range(n_sub):
                for ky in range(3):
                    m_rows = [tap_m(rr, s, ky, kx)
                              for rr in range(rblk) for kx in range(3)]
                    s_g = onehot_dot(m_rows, ky, s)
                    for rr in range(rblk):
                        for kx in range(3):
                            samples[ky][kx][rr * n_sub + s] = s_g[
                                (rr * 3 + kx) * sub:
                                (rr * 3 + kx + 1) * sub].astype(
                                    compute_dtype)
        else:
            for rr in range(rblk):
                for s in range(n_sub):
                    for ky in range(3):
                        # [3*sub, ksub] one-hot for (row, subtile, ky)
                        m_rows = [tap_m(rr, s, ky, kx) for kx in range(3)]
                        s_g = onehot_dot(m_rows, rr + ky, s)
                        for kx in range(3):
                            samples[ky][kx][rr * n_sub + s] = s_g[
                                kx * sub:(kx + 1) * sub].astype(
                                    compute_dtype)
        # weight contraction over the whole row block: concatenating the
        # subtiles AND the rblk rows first turns 9*rblk*n_sub M=sub
        # matmuls into 9 M=rblk*tile matmuls (full MXU row utilization,
        # rblk x fewer issues).  Row order is rr-major (the rr loop is
        # outer), matching the [rblk, tile] output block.
        out = jnp.zeros((rblk * tile, c_out), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                samp = samples[ky][kx][0] if len(samples[ky][kx]) == 1 \
                    else jnp.concatenate(samples[ky][kx], axis=0)
                out += jax.lax.dot_general(
                    samp, w_ref[ky * 3 + kx], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
        o_ref[0, :, pl.ds(t * tile, tile), :] = out.reshape(
            rblk, tile, c_out).astype(o_ref.dtype)


def _round16(n):
    return -(-n // 16) * 16


def _swin(sub, halo):
    """Subtile window width: pixels [s*sub, s*sub+sub) sample padded
    columns [s*sub + 1, s*sub + sub + 2*halo + 2], rounded up for sublane
    alignment of the slice."""
    return -(-(sub + 2 * halo + 4) // 8) * 8


def deform_conv2d_pallas(
    x: jnp.ndarray,       # [B, H, W, C_in]
    offset: jnp.ndarray,  # [B, H, W, 18]
    weight: jnp.ndarray,  # [3, 3, C_in, C_out]
    halo: int = 4,
    compute_dtype=jnp.bfloat16,
    sub: int = 32,
    rblk: int = 4,
    rowfuse: bool = False,
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 deformable conv (the semantic-tower case).

    Matches ops/deform_conv.py:deform_conv2d with
    ``max_displacement=halo`` up to ``compute_dtype`` precision; offsets
    beyond +-halo are clamped (exact inside the halo).
    """
    b, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    assert (kh, kw) == (3, 3) and wc_in == c_in
    # tile=128 measured best (256 regressed 8.9 -> 7.3 fps: the bigger
    # one-hot matmul loses more to VMEM pressure than the halo amortizes)
    tile = min(128, w)
    sub = min(sub, tile)
    import math
    rblk = math.gcd(min(rblk, h), h)  # largest power-of-2 divisor fit
    assert w % tile == 0 and tile % sub == 0, (w, tile, sub)
    assert h % rblk == 0, (h, rblk)
    rbuf = 2 * halo + 3 + rblk
    wwin = _round16(tile + 2 * halo + 4)  # sublane-aligned DMA
    swin = _swin(sub, halo)
    rwin = (2 * halo + 2 + rblk - 1) if rowfuse else (2 * halo + 2)
    ksub = rwin * swin
    assert (tile - sub) + swin <= wwin  # last subtile slice stays in window

    # zero-pad: top/left halo+2; bottom/right so the last window fits
    pad = halo + 2
    xp = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (pad, pad + 2), (pad, wwin - tile - pad), (0, 0)))
    w9 = weight.reshape(9, c_in, c_out).astype(compute_dtype)

    q = np.arange(ksub, dtype=np.int32)
    r_of = jnp.asarray((q // swin)[None], jnp.int32)   # [1, ksub]
    m_of = jnp.asarray((q % swin)[None], jnp.int32)

    kernel = functools.partial(
        _dcn_kernel, halo=halo, h=h, w=w, c_in=c_in, c_out=c_out,
        tile=tile, sub=sub, rblk=rblk, compute_dtype=compute_dtype,
        rowfuse=rowfuse)

    # offsets laid out [B, H, 18, W] so the kernel slices taps from the
    # sublane dim and pixels from the lane dim.  Batch rides the OUTER grid
    # dimension (one pallas_call — no per-frame dispatch gaps; the DMA
    # pipeline spans frame boundaries).
    off_t = offset.astype(jnp.float32).transpose(0, 1, 3, 2)
    out = pl.pallas_call(
        kernel,
        grid=(b, h // rblk),
        in_specs=[
            pl.BlockSpec((1, ksub), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksub), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, 18, w), lambda bi, y: (bi, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rblk, w, c_out),
                               lambda bi, y: (bi, y, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c_out), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, rbuf, wwin, c_in), compute_dtype),
            pltpu.SemaphoreType.DMA((2, rbuf)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (w // sub) * 9 * sub
            * (ksub // 3 + c_out) * c_in,
            bytes_accessed=b * ((h // rblk) * (w // tile) * rbuf * wwin
                                * c_in * 2
                                + h * w * (18 * 4 + c_out * 4)),
            transcendentals=0,
        ),
    )(r_of, m_of, off_t, xp, w9)
    return out.astype(x.dtype)
