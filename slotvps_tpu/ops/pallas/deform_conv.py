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

_GROUP = 9  # taps per matmul group (VMEM vs matmul-size tradeoff)


def _dcn_kernel(roff_ref, moff_ref, off_ref, x_hbm, w_ref, o_ref,
                xflat, sems, *, halo, h, w, c_in, c_out, tile,
                compute_dtype):
    y = pl.program_id(0)
    rbuf = 2 * halo + 4
    wwin = -(-(tile + 2 * halo + 4) // 16) * 16  # sublane-aligned DMA
    flat_k = rbuf * wwin
    n_tiles = w // tile

    precision = (jax.lax.Precision.HIGHEST
                 if compute_dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (tile, 1), 0).astype(jnp.float32)
    yf = y.astype(jnp.float32)
    r_of = roff_ref[:]  # [1, flat_k] int32: q // wwin
    m_of = moff_ref[:]  # [1, flat_k] int32: q %  wwin

    # double-buffered tile windows: tile t+1's rows stream in while tile t
    # computes.  window rows [y+1, y+1+rbuf), cols [t*tile, t*tile+wwin) of
    # padded x, written flat: xflat[s, r*wwin:(r+1)*wwin] = xp[y+1+r, cols]
    def tile_dma(t, slot):
        return [pltpu.make_async_copy(
            x_hbm.at[y + 1 + r, pl.ds(t * tile, wwin)],
            xflat.at[slot, pl.ds(r * wwin, wwin)],
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

        out = jnp.zeros((tile, c_out), jnp.float32)
        for g in range(0, 9, _GROUP):
            m_rows = []
            for k in range(g, g + _GROUP):
                ky, kx = k // 3, k % 3
                dy = off_ref[0, 2 * k, pl.ds(t * tile, tile)][:, None]
                dx = off_ref[0, 2 * k + 1, pl.ds(t * tile, tile)][:, None]
                rig_y = yf + (ky - 1.0)
                rig_x = col_iota + (t * tile + kx - 1.0)
                py = rig_y + dy
                px = rig_x + dx
                valid = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
                py = jnp.clip(py, rig_y - halo, rig_y + halo)
                px = jnp.clip(px, rig_x - halo, rig_x + halo)
                y0 = jnp.floor(py)
                x0 = jnp.floor(px)
                fy = (py - y0).astype(jnp.float32)
                fx = (px - x0).astype(jnp.float32)
                y0r = y0.astype(jnp.int32) - y + (halo + 1)         # [T,1]
                x0r = x0.astype(jnp.int32) + (halo + 2) - t * tile  # [T,1]
                wx1 = jnp.where(valid, fx, 0.0)
                wx0 = jnp.where(valid, 1.0 - fx, 0.0)
                # corner (a, b) hits flat index (y0r+a)*wwin + (x0r+b)
                top = jnp.where(m_of == x0r, wx0, 0.0) \
                    + jnp.where(m_of == x0r + 1, wx1, 0.0)
                row_top = jnp.where(r_of == y0r, top, 0.0) * (1.0 - fy)
                row_bot = jnp.where(r_of == y0r + 1, top, 0.0) * fy
                m_rows.append((row_top + row_bot).astype(compute_dtype))
            m_g = jnp.concatenate(m_rows, axis=0)        # [G*tile, flat_k]
            s_g = jax.lax.dot_general(
                m_g, xflat[slot], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=precision)                      # [G*tile, C]
            for i, k in enumerate(range(g, g + _GROUP)):
                out += jax.lax.dot_general(
                    s_g[i * tile:(i + 1) * tile].astype(compute_dtype),
                    w_ref[k], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=precision)
        o_ref[0, pl.ds(t * tile, tile), :] = out.astype(o_ref.dtype)


def deform_conv2d_pallas(
    x: jnp.ndarray,       # [B, H, W, C_in]
    offset: jnp.ndarray,  # [B, H, W, 18]
    weight: jnp.ndarray,  # [3, 3, C_in, C_out]
    halo: int = 4,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """3x3 stride-1 pad-1 deformable conv (the semantic-tower case).

    Matches ops/deform_conv.py:deform_conv2d with
    ``max_displacement=halo`` up to ``compute_dtype`` precision; offsets
    beyond +-halo are clamped (exact inside the halo).
    """
    b, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    assert (kh, kw) == (3, 3) and wc_in == c_in
    tile = min(128, w)
    assert w % tile == 0, (w, tile)
    rbuf = 2 * halo + 4
    wwin = -(-(tile + 2 * halo + 4) // 16) * 16  # sublane-aligned DMA
    flat_k = rbuf * wwin

    # zero-pad: top/left halo+2; bottom/right so the last window fits
    pad = halo + 2
    xp = jnp.pad(x.astype(compute_dtype),
                 ((0, 0), (pad, pad + 2), (pad, wwin - tile - pad), (0, 0)))
    w9 = weight.reshape(9, c_in, c_out).astype(compute_dtype)

    q = np.arange(flat_k, dtype=np.int32)
    r_of = jnp.asarray((q // wwin)[None], jnp.int32)
    m_of = jnp.asarray((q % wwin)[None], jnp.int32)

    kernel = functools.partial(
        _dcn_kernel, halo=halo, h=h, w=w, c_in=c_in, c_out=c_out,
        tile=tile, compute_dtype=compute_dtype)

    def one_batch(xp_b, off_b):
        return pl.pallas_call(
            kernel,
            grid=(h,),
            in_specs=[
                pl.BlockSpec((1, flat_k), lambda y: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, flat_k), lambda y: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 18, w), lambda y: (y, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, w, c_out), lambda y: (y, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, w, c_out), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, flat_k, c_in), compute_dtype),
                pltpu.SemaphoreType.DMA((2, rbuf)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            cost_estimate=pl.CostEstimate(
                flops=2 * h * (w // tile) * 9 * tile * (flat_k + c_out)
                * c_in,
                bytes_accessed=h * (w // tile) * flat_k * c_in * 2
                + h * w * (18 * 4 + c_out * 4),
                transcendentals=0,
            ),
        )(r_of, m_of, off_b, xp_b, w9)

    # offsets laid out [B, H, 18, W] so the kernel slices taps from the
    # sublane dim and pixels from the lane dim.
    # NOTE: explicit python loop over batch — vmap of a kernel that does
    # manual DMA from an ANY-space ref mis-indexes the mapped axis.
    off_t = offset.astype(jnp.float32).transpose(0, 1, 3, 2)
    outs = [one_batch(xp[i], off_t[i]) for i in range(b)]
    return jnp.stack(outs).astype(x.dtype)
