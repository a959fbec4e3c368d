"""Deformable PSRoI pooling — API-parity implementation.

The reference ships a CUDA extension for this
(reference mmdet/ops/dcn/src/deform_pool_cuda.cpp:84-88, python wrappers
mmdet/ops/dcn/deform_pool.py:10-174) but nothing in the live Slot-VPS path
uses it; it exists so ``import mmdet.ops`` works.  We provide a working
pure-JAX equivalent for the same reason (capability parity), implemented
with average pooling over bilinear samples per output bin.
"""

from __future__ import annotations

import jax.numpy as jnp


def deform_roi_pooling(
    x: jnp.ndarray,
    rois: jnp.ndarray,
    offset: jnp.ndarray | None,
    spatial_scale: float,
    out_size: int,
    sample_per_part: int = 4,
    gamma: float = 0.1,
) -> jnp.ndarray:
    """Deformable position-sensitive RoI pooling (forward).

    x:      [H, W, C]
    rois:   [R, 4] (x1, y1, x2, y2) in image coords
    offset: optional [R, out_size, out_size, 2] normalized bin offsets
    returns [R, out_size, out_size, C]
    """
    h, w, c = x.shape
    r = rois.shape[0]
    x1 = rois[:, 0] * spatial_scale - 0.5
    y1 = rois[:, 1] * spatial_scale - 0.5
    x2 = (rois[:, 2] + 1.0) * spatial_scale - 0.5
    y2 = (rois[:, 3] + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / out_size  # [R]
    bin_h = roi_h / out_size

    gy = jnp.arange(out_size, dtype=jnp.float32)
    gx = jnp.arange(out_size, dtype=jnp.float32)
    sub = (jnp.arange(sample_per_part, dtype=jnp.float32) + 0.5) / sample_per_part

    # sample grid per roi/bin/subsample: [R, G, S]
    py = (y1[:, None, None] + (gy[None, :, None] + sub[None, None, :])
          * bin_h[:, None, None])
    px = (x1[:, None, None] + (gx[None, :, None] + sub[None, None, :])
          * bin_w[:, None, None])
    # full grid [R, gy, gx, sy, sx]
    py_full = jnp.broadcast_to(
        py[:, :, None, :, None],
        (r, out_size, out_size, sample_per_part, sample_per_part))
    px_full = jnp.broadcast_to(
        px[:, None, :, None, :],
        (r, out_size, out_size, sample_per_part, sample_per_part))
    if offset is not None:
        py_full = py_full + (gamma * roi_h)[:, None, None, None, None] \
            * offset[..., 0][:, :, :, None, None]
        px_full = px_full + (gamma * roi_w)[:, None, None, None, None] \
            * offset[..., 1][:, :, :, None, None]

    py_c = jnp.clip(py_full, 0.0, h - 1.0)
    px_c = jnp.clip(px_full, 0.0, w - 1.0)
    y0 = jnp.floor(py_c).astype(jnp.int32)
    x0 = jnp.floor(px_c).astype(jnp.int32)
    y1i = jnp.minimum(y0 + 1, h - 1)
    x1i = jnp.minimum(x0 + 1, w - 1)
    fy = py_c - y0
    fx = px_c - x0

    flat = x.reshape(h * w, c)

    def g(yy, xx):
        return flat[(yy * w + xx).reshape(-1)].reshape(yy.shape + (c,))

    val = (g(y0, x0) * ((1 - fy) * (1 - fx))[..., None]
           + g(y0, x1i) * ((1 - fy) * fx)[..., None]
           + g(y1i, x0) * (fy * (1 - fx))[..., None]
           + g(y1i, x1i) * (fy * fx)[..., None])
    # in-bounds check against the original (unclipped) positions
    valid = ((py_full > -1) & (py_full < h) & (px_full > -1) & (px_full < w))
    val = jnp.where(valid[..., None], val, 0.0)
    count = jnp.maximum(valid.sum(axis=(-2, -1)), 1)[..., None]
    return val.sum(axis=(-3, -2)) / count
