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


def _tile_for_width(w: int) -> int:
    """Column-tile choice.  tile=128 measured best (256 regressed
    8.9 -> 7.3 fps: the bigger one-hot matmul loses more to VMEM pressure
    than the halo amortizes); widths that are not a multiple of 128 fall
    back to 64 (training-crop and VIPER FPN widths)."""
    if w % 128 == 0:
        return 128
    if w % 64 == 0:
        return 64
    return w  # < 64 case: the wrapper padded w to a multiple of 32


def _forward_impl(
    x: jnp.ndarray,       # [B, H, W, C_in]
    offset: jnp.ndarray,  # [B, H, W, 18]
    weight: jnp.ndarray,  # [3, 3, C_in, C_out]
    halo: int,
    compute_dtype,
    sub: int,
    rblk: int,
    rowfuse: bool,
) -> jnp.ndarray:
    b, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    assert (kh, kw) == (3, 3) and wc_in == c_in
    tile = _tile_for_width(w)
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
            pl.BlockSpec(memory_space=pl.ANY),
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


def _dcn_bwd_kernel(roff_ref, moff_ref, off_ref, g_ref, wt_ref, x_hbm,
                    dx_hbm, doff_ref, dw_ref,
                    xwin, stripe, sems, osem, *,
                    halo, h, w, c_in, c_out, tile, sub, rblk, nyb,
                    compute_dtype):
    """Backward of the one-hot-matmul DCN (reference col2im analog,
    deform_conv_cuda_kernel.cu ``deformable_col2im`` /
    ``deformable_col2im_coord``), reformulated as dense MXU work:

      dsample_k = g @ W_k^T                    (conv backprop-data)
      dx_window += M_k^T @ dsample_k           (transpose of the forward's
                                                one-hot gather = scatter)
      dW_k      += samples_k^T @ g             (forward samples recomputed
                                                from the same M_k)
      doff_y/x  = sum_q dM_{y/x}[j,q] * (dsample @ win^T)[j,q]
                                               (bilinear-corner derivative
                                                folded into one Pt matmul
                                                shared by dy and dx)

    dx accumulation crosses row-block boundaries only through the +-halo
    window, so a sliding VMEM stripe of ``rbuf`` padded rows carries the
    overlap between sequential grid steps: after each step the first
    ``rblk`` rows are final and DMA'd to HBM, then the stripe shifts by
    ``rblk``.  Clamp semantics match jax.grad of ops/deform_conv.py: the
    offset gradient is zero where the raw position is clamped to the halo
    or fails the CUDA (-1, size) validity rule."""
    bi = pl.program_id(0)
    yb = pl.program_id(1)
    rbuf = 2 * halo + 3 + rblk
    wwin = _round16(tile + 2 * halo + 4)
    swin = _swin(sub, halo)
    rwin = 2 * halo + 2
    ksub = rwin * swin
    n_tiles = w // tile
    n_sub = tile // sub

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    r_of = roff_ref[0, :][None]
    m_of = moff_ref[0, :][None]
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (sub, 1), 0).astype(jnp.float32)

    @pl.when((bi == 0) & (yb == 0))
    def _init_dw():
        dw_ref[...] = jnp.zeros(dw_ref.shape, dw_ref.dtype)

    @pl.when(yb == 0)
    def _init_stripe():
        stripe[...] = jnp.zeros(stripe.shape, stripe.dtype)

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

        def tap_w(rr, s, ky, kx):
            """(M, dM/dpy, dM/dpx): [sub, ksub] one-hot interpolation rows
            and their position derivatives for one tap (same geometry as
            the forward kernel's tap_m)."""
            y = yb * rblk + rr
            yf = y.astype(jnp.float32)
            k = ky * 3 + kx
            px0 = t * tile + s * sub
            dy = off_ref[0, rr, 2 * k, pl.ds(px0, sub)][:, None]
            dxo = off_ref[0, rr, 2 * k + 1, pl.ds(px0, sub)][:, None]
            rig_y = yf + (ky - 1.0)
            rig_x = col_iota + (px0 + kx - 1.0)
            py_raw = rig_y + dy
            px_raw = rig_x + dxo
            valid = ((py_raw > -1.0) & (py_raw < h)
                     & (px_raw > -1.0) & (px_raw < w))
            # clip passes gradient on the closed interval (jax lax.max/min
            # tie rule), zero outside
            ncy = (py_raw >= rig_y - halo) & (py_raw <= rig_y + halo)
            ncx = (px_raw >= rig_x - halo) & (px_raw <= rig_x + halo)
            py = jnp.clip(py_raw, rig_y - halo, rig_y + halo)
            px = jnp.clip(px_raw, rig_x - halo, rig_x + halo)
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            fy = (py - y0).astype(jnp.float32)
            fx = (px - x0).astype(jnp.float32)
            y0r = y0.astype(jnp.int32) - y + (halo + 1) - ky
            x0r = x0.astype(jnp.int32) + (halo + 2) - t * tile - s * sub
            is_x0 = m_of == x0r
            is_x1 = m_of == x0r + 1
            is_y0 = r_of == y0r
            is_y1 = r_of == y0r + 1
            wtop = 1.0 - fy
            wx1 = jnp.where(valid, fx, 0.0)
            wx0 = jnp.where(valid, 1.0 - fx, 0.0)
            colw = jnp.where(is_x0, wx0, 0.0) + jnp.where(is_x1, wx1, 0.0)
            m = (jnp.where(is_y0, colw * wtop, 0.0)
                 + jnp.where(is_y1, colw * fy, 0.0))
            # d sample / d py = (bottom - top) column-interp, gated on
            # not-clamped (valid already folded into colw)
            gy = jnp.where(ncy, 1.0, 0.0)
            dmy = (jnp.where(is_y1, colw, 0.0)
                   - jnp.where(is_y0, colw, 0.0)) * gy
            roww = jnp.where(is_y0, wtop, 0.0) + jnp.where(is_y1, fy, 0.0)
            gx = jnp.where(valid & ncx, 1.0, 0.0)
            dmx = (jnp.where(is_x1, roww, 0.0)
                   - jnp.where(is_x0, roww, 0.0)) * gx
            return m, dmy, dmx

        # per-tap forward samples stashed for one batched dW contraction
        # per tile (K = rblk*tile instead of 9*rblk*n_sub K=sub matmuls)
        dw_parts = [[[None] * (rblk * n_sub) for _ in range(3)]
                    for _ in range(3)]
        for rr in range(rblk):
            for s in range(n_sub):
                px0 = t * tile + s * sub
                g_s = g_ref[0, rr, pl.ds(px0, sub), :]  # [sub, C_out]
                # all 9 taps' dsample in one matmul: [sub, 9*C_in]
                dsamp = jax.lax.dot_general(
                    g_s, wt_ref[...], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision).astype(compute_dtype)
                doff_cols = [None] * 18
                for ky in range(3):
                    mm = [tap_w(rr, s, ky, kx) for kx in range(3)]
                    m_g = jnp.concatenate(
                        [a[0] for a in mm], axis=0).astype(compute_dtype)
                    ds_g = jnp.concatenate(
                        [dsamp[:, (ky * 3 + kx) * c_in:
                               (ky * 3 + kx + 1) * c_in]
                         for kx in range(3)], axis=0)  # [3*sub, C_in]
                    win = xwin[slot, rr + ky:rr + ky + rwin,
                               pl.ds(s * sub, swin), :].reshape(ksub, c_in)
                    # forward samples (for dW)
                    s_g = jax.lax.dot_general(
                        m_g, win, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                    for kx in range(3):
                        dw_parts[ky][kx][rr * n_sub + s] = s_g[
                            kx * sub:(kx + 1) * sub].astype(compute_dtype)
                    # dx scatter: S[q, ci] = sum_j M[j, q] dsample[j, ci]
                    sc = jax.lax.dot_general(
                        m_g, ds_g, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)
                    stripe[rr + ky:rr + ky + rwin,
                           pl.ds(t * tile + s * sub, swin), :] += (
                        sc.reshape(rwin, swin, c_in))
                    # doffset: Pt[j, q] = dsample[j, :] . win[q, :]
                    pt = jax.lax.dot_general(
                        ds_g, win, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=precision)  # [3*sub, ksub]
                    for kx in range(3):
                        pts = pt[kx * sub:(kx + 1) * sub]
                        k = ky * 3 + kx
                        doff_cols[2 * k] = jnp.sum(
                            mm[kx][1] * pts, axis=1, keepdims=True)
                        doff_cols[2 * k + 1] = jnp.sum(
                            mm[kx][2] * pts, axis=1, keepdims=True)
                doff_ref[0, rr, pl.ds(px0, sub), :] = jnp.concatenate(
                    doff_cols, axis=1)

        g_cat = g_ref[0, :, pl.ds(t * tile, tile), :].reshape(
            rblk * tile, c_out)
        for ky in range(3):
            for kx in range(3):
                parts = dw_parts[ky][kx]
                samp = parts[0] if len(parts) == 1 \
                    else jnp.concatenate(parts, axis=0)
                dw_ref[ky * 3 + kx, :, :] += jax.lax.dot_general(
                    samp, g_cat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)

    # rows [0, rblk) of the stripe are final (later blocks' windows start
    # at stripe row rblk): flush to padded dx rows [yb*rblk+1, +rblk)
    row0 = yb * rblk + 1
    cp = pltpu.make_async_copy(
        stripe.at[0:rblk], dx_hbm.at[bi, pl.ds(row0, rblk)], osem)
    cp.start()
    cp.wait()

    @pl.when(yb == nyb - 1)
    def _flush_tail():
        cp2 = pltpu.make_async_copy(
            stripe.at[rblk:rbuf],
            dx_hbm.at[bi, pl.ds(row0 + rblk, rbuf - rblk)], osem)
        cp2.start()
        cp2.wait()

    @pl.when(yb != nyb - 1)
    def _shift():
        for r in range(rbuf - rblk):
            stripe[r] = stripe[r + rblk]
        zero = jnp.zeros(stripe.shape[1:], stripe.dtype)
        for r in range(rbuf - rblk, rbuf):
            stripe[r] = zero


def _backward_impl(x, offset, weight, g, halo, compute_dtype, sub, rblk):
    b, h, w, c_in = x.shape
    c_out = weight.shape[-1]
    tile = _tile_for_width(w)
    sub = min(sub, tile)
    import math
    rblk = math.gcd(min(rblk, h), h)
    assert w % tile == 0 and tile % sub == 0, (w, tile, sub)
    rbuf = 2 * halo + 3 + rblk
    wwin = _round16(tile + 2 * halo + 4)
    swin = _swin(sub, halo)
    rwin = 2 * halo + 2
    ksub = rwin * swin
    pad = halo + 2
    hp = h + 2 * pad + 2
    wp = w + wwin - tile
    nyb = h // rblk

    xp = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (pad, pad + 2), (pad, wwin - tile - pad), (0, 0)))
    # W^T laid out [C_out, 9*C_in] so one matmul gives all taps' dsample
    wt = weight.reshape(9, c_in, c_out).transpose(2, 0, 1).reshape(
        c_out, 9 * c_in).astype(compute_dtype)
    off_t = offset.astype(jnp.float32).transpose(0, 1, 3, 2)
    gc = g.astype(compute_dtype)

    q = np.arange(ksub, dtype=np.int32)
    r_of = jnp.asarray((q // swin)[None], jnp.int32)
    m_of = jnp.asarray((q % swin)[None], jnp.int32)

    kernel = functools.partial(
        _dcn_bwd_kernel, halo=halo, h=h, w=w, c_in=c_in, c_out=c_out,
        tile=tile, sub=sub, rblk=rblk, nyb=nyb,
        compute_dtype=compute_dtype)

    dx_pad, doff, dw = pl.pallas_call(
        kernel,
        grid=(b, nyb),
        in_specs=[
            pl.BlockSpec((1, ksub), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ksub), lambda bi, y: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, 18, w), lambda bi, y: (bi, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rblk, w, c_out), lambda bi, y: (bi, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),   # wt
            pl.BlockSpec(memory_space=pl.ANY),    # xp
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),    # dx_pad
            pl.BlockSpec((1, rblk, w, 18), lambda bi, y: (bi, y, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c_in, c_out), lambda bi, y: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp, c_in), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w, 18), jnp.float32),
            jax.ShapeDtypeStruct((9, c_in, c_out), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rbuf, wwin, c_in), compute_dtype),
            pltpu.VMEM((rbuf, wp, c_in), jnp.float32),
            pltpu.SemaphoreType.DMA((2, rbuf)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            # the dx stripe and dW accumulator carry state between steps:
            # the grid must execute sequentially
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * (w // sub) * 9 * sub
            * (3 * (ksub // 3) + 2 * c_out) * c_in,
            bytes_accessed=b * (nyb * (w // tile) * rbuf * wwin * c_in * 2
                                + h * w * (18 * 8 + c_out * 4)
                                + hp * wp * c_in * 4),
            transcendentals=0,
        ),
    )(r_of, m_of, off_t, gc, wt, xp)

    dx = dx_pad[:, pad:pad + h, pad:pad + w, :].astype(x.dtype)
    return dx, doff.astype(offset.dtype), dw.reshape(
        3, 3, c_in, c_out).astype(weight.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _dcn_pallas(x, offset, weight, halo, compute_dtype, sub, rblk, rowfuse):
    return _forward_impl(x, offset, weight, halo, compute_dtype, sub, rblk,
                         rowfuse)


def _dcn_pallas_fwd(x, offset, weight, halo, compute_dtype, sub, rblk,
                    rowfuse):
    out = _forward_impl(x, offset, weight, halo, compute_dtype, sub, rblk,
                        rowfuse)
    return out, (x, offset, weight)


def _dcn_pallas_bwd(halo, compute_dtype, sub, rblk, rowfuse, res, g):
    x, offset, weight = res
    return _backward_impl(x, offset, weight, g, halo, compute_dtype, sub,
                          rblk)


_dcn_pallas.defvjp(_dcn_pallas_fwd, _dcn_pallas_bwd)


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
    beyond +-halo are clamped (exact inside the halo).  Differentiable:
    a custom vjp runs the Pallas backward kernel (grads w.r.t. x, offset,
    and weight; clamp/validity gradient semantics match jax.grad of the
    XLA path at the same halo).

    Widths that don't divide into column tiles are zero-padded on the
    right and sliced back — exact, because a padded column is sampled
    either as an explicitly-zero bilinear corner (the CUDA out-of-range
    rule) or with a zero one-hot row, and gradient contributions into the
    padding are discarded by the pad transpose."""
    w = x.shape[2]
    if w % 128 == 0 or (w < 128 and w % 32 == 0):
        wpad = w
    elif w >= 128:
        c128 = -(-w // 128) * 128
        wpad = c128 if c128 - w <= 32 else -(-w // 64) * 64
    else:
        wpad = max(32, -(-w // 32) * 32)
    if wpad != w:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
        offset = jnp.pad(offset, ((0, 0), (0, 0), (0, wpad - w), (0, 0)))
        out = _dcn_pallas(x, offset, weight, halo, compute_dtype, sub,
                          rblk, rowfuse)
        return out[:, :, :w]
    return _dcn_pallas(x, offset, weight, halo, compute_dtype, sub, rblk,
                       rowfuse)
