"""Deformable convolution v1/v2 — pure-XLA forward (differentiable).

TPU-native replacement for the reference CUDA extension
(reference mmdet/ops/dcn/src/deform_conv_cuda.cpp:152+,
deform_conv_cuda_kernel.cu ``deformable_im2col``): for every kernel tap k
the sampling position is

    y = oy * stride - pad + ky * dilation + offset_y[k]
    x = ox * stride - pad + kx * dilation + offset_x[k]

sampled bilinearly with zeros outside the image (a sample contributes iff
its position lies in the open interval (-1, H) x (-1, W); out-of-bounds
corners read as 0 — matching the CUDA kernel's boundary rule), followed by
the weighted reduction over taps and input channels.  The modulated (v2)
variant multiplies each tap sample by a mask.

Layouts are TPU-native: activations NHWC, offsets NHWC with channel order
[tap0_dy, tap0_dx, tap1_dy, tap1_dx, ...] (same tap order as the torch
``DeformConvPack`` offset conv output), weights [kh, kw, C_in, C_out].

Instead of gathers, the bilinear sample is computed from integer-shifted
*slices* of a zero-padded input: offsets produced by a zero-initialised,
3x3-conv predictor (reference mmdet/models/utils/deform_conv_with_offset.py)
stay small in practice, so each tap's sample lies within a bounded halo of
its rigid position.  ``max_displacement`` sets that halo; positions beyond
it are clamped (exact DCN inside the halo).  The default halo of 8 pixels
at every pyramid level is far above anything a trained offset head emits at
P2..P5; raise it if a converted checkpoint needs more.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_sample_4corners(x_pad, y0i, x0i, fy, fx, halo, h, w):
    """Bilinear sample of x_pad at fractional positions (y0i+fy, x0i+fx):
    ONE fused gather for all 4 corners (compile- and backward-friendly —
    one scatter-add in the vjp instead of four).

    y0i/x0i are per-pixel integer floors in unpadded space, already clamped
    to [-halo-1, size+halo+1]; x_pad is padded by halo+2 per side so every
    corner (floor and floor+1) is strictly in range: an out-of-range gather
    would have a clipped (finite) forward but NaN offset gradients."""
    pad = halo + 2
    hp = h + 2 * pad
    wp = w + 2 * pad
    b, hh, ww = y0i.shape
    c = x_pad.shape[-1]
    flat = x_pad.reshape(b, hp * wp, c)
    base = (y0i + pad) * wp + (x0i + pad)              # [B, H, W]
    # corner order: (0,0), (0,1), (1,0), (1,1)
    idx = jnp.stack([base, base + 1, base + wp, base + wp + 1],
                    axis=-1)                            # [B, H, W, 4]
    wgt = jnp.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                     fy * (1 - fx), fy * fx], axis=-1)  # [B, H, W, 4]
    vals = jnp.take_along_axis(
        flat, idx.reshape(b, hh * ww * 4, 1), axis=1, mode="clip"
    ).reshape(b, hh, ww, 4, c)
    return jnp.einsum("bhwkc,bhwk->bhwc", vals, wgt)


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    max_displacement: int = 8,
) -> jnp.ndarray:
    """Deformable conv forward.

    x:      [B, H, W, C_in]
    offset: [B, H_out, W_out, 2*kh*kw]  ([dy, dx] per tap)
    weight: [kh, kw, C_in, C_out]
    mask:   optional [B, H_out, W_out, kh*kw] modulation (DCNv2)
    """
    b, h, w, c_in = x.shape
    kh, kw, wc_in, c_out = weight.shape
    assert wc_in == c_in
    h_out = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    w_out = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    assert offset.shape == (b, h_out, w_out, 2 * kh * kw), offset.shape

    halo = int(max_displacement)
    # pad by halo+2 so every clamped sample's 4 corners are strictly in
    # range (+1 for bilinear's second corner, +1 for the conv padding)
    x_pad = jnp.pad(
        x.astype(jnp.float32),
        ((0, 0), (halo + 2, halo + 2), (halo + 2, halo + 2), (0, 0)))

    oy = jnp.arange(h_out, dtype=jnp.float32) * stride - padding
    ox = jnp.arange(w_out, dtype=jnp.float32) * stride - padding
    base_y = oy[:, None]  # [H_out, 1]
    base_x = ox[None, :]  # [1, W_out]

    out = jnp.zeros((b, h_out, w_out, c_out), jnp.float32)
    for ky in range(kh):
        for kx in range(kw):
            k = ky * kw + kx
            dy = offset[..., 2 * k].astype(jnp.float32)
            dx = offset[..., 2 * k + 1].astype(jnp.float32)
            py = base_y + ky * dilation + dy  # [B, H_out, W_out]
            px = base_x + kx * dilation + dx
            # CUDA-kernel rule: contribute iff -1 < p < size
            valid = ((py > -1) & (py < h) & (px > -1) & (px < w))
            # clamp into the halo window around the rigid position
            rig_y = base_y + ky * dilation
            rig_x = base_x + kx * dilation
            py = jnp.clip(py, rig_y - halo, rig_y + halo)
            px = jnp.clip(px, rig_x - halo, rig_x + halo)
            y0 = jnp.floor(py)
            x0 = jnp.floor(px)
            fy = py - y0
            fx = px - x0
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            sample = _bilinear_sample_4corners(x_pad, y0i, x0i, fy, fx,
                                               halo, h, w)
            sample = jnp.where(valid[..., None], sample, 0.0)
            if mask is not None:
                sample = sample * mask[..., k:k + 1].astype(jnp.float32)
            # HIGHEST precision: this einsum is a tiny fraction of DCN cost
            # (gathers dominate) but its error feeds the semantic head parity
            out = out + jnp.einsum(
                "bhwc,co->bhwo", sample, weight[ky, kx].astype(jnp.float32),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return out.astype(x.dtype)


def offset_clamp_stats(offset: jnp.ndarray, halo: int):
    """Clamp diagnostic for a DCN offset field.

    The reference CUDA kernel samples at unbounded offsets
    (deform_conv_cuda_kernel.cu ``deformable_im2col``); our TPU paths clamp
    samples into a +-halo window of each tap's rigid position.  This
    measures how much a given offset tensor would actually clamp:

    offset: [..., 2*kh*kw] ([dy, dx] per tap).  Returns
    ``(max_abs, clamp_rate)`` — the largest |offset| component and the
    fraction of taps with either component beyond ``halo``."""
    a = jnp.abs(offset.astype(jnp.float32))
    max_abs = a.max()
    per_tap = a.reshape(*offset.shape[:-1], -1, 2).max(axis=-1)
    clamp_rate = (per_tap > halo).mean()
    return max_abs, clamp_rate


def deform_conv2d_reference(x, offset, weight, mask=None, stride=1,
                            padding=1, dilation=1):
    """Slow numpy-style reference (no halo clamp) for kernel parity tests."""
    import numpy as np

    x = np.asarray(x, np.float64)
    offset = np.asarray(offset, np.float64)
    weight = np.asarray(weight, np.float64)
    b, h, w, c_in = x.shape
    kh, kw, _, c_out = weight.shape
    h_out = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    w_out = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    out = np.zeros((b, h_out, w_out, c_out))

    def samp(img, py, px):
        if not (-1 < py < h and -1 < px < w):
            return np.zeros(c_in)
        y0, x0 = int(np.floor(py)), int(np.floor(px))
        fy, fx = py - y0, px - x0
        acc = np.zeros(c_in)
        for cy, wy in ((y0, 1 - fy), (y0 + 1, fy)):
            for cx, wx in ((x0, 1 - fx), (x0 + 1, fx)):
                if 0 <= cy < h and 0 <= cx < w and wy * wx != 0:
                    acc += img[cy, cx] * wy * wx
        return acc

    for bi in range(b):
        for oy in range(h_out):
            for ox in range(w_out):
                for ky in range(kh):
                    for kx in range(kw):
                        k = ky * kw + kx
                        py = oy * stride - padding + ky * dilation \
                            + offset[bi, oy, ox, 2 * k]
                        px = ox * stride - padding + kx * dilation \
                            + offset[bi, oy, ox, 2 * k + 1]
                        s = samp(x[bi], py, px)
                        if mask is not None:
                            s = s * mask[bi, oy, ox, k]
                        out[bi, oy, ox] += s @ weight[ky, kx]
    return out
