"""UPSNet-style FPN semantic head.

Reference: mmdet/models/panoptic/upsnetFPN.py:11-98 (``UPSNetFPN``) and the
DCN wrapper mmdet/models/utils/deform_conv_with_offset.py.

One *shared* tower of three (deformable conv -> GN(32) -> ReLU) blocks is
applied to each of P2..P5 (the reference builds ``deform_convs`` as a list
but only ever uses ``deform_convs[0]`` on every level, upsnetFPN.py:70):

    DCN(256->256) GN ReLU, DCN(256->128) GN ReLU, DCN(128->128) GN ReLU

Each deformable conv predicts its own offsets with a zero-initialised 3x3
conv.  Outputs:
  * ``feat_before`` — the per-level 128-ch tower outputs, coarsest-first
    [P5, P4, P3, P2] (feeds the slot decoder, upsnetFPN.py:72-75),
  * ``fcn_score`` — all levels bilinearly upsampled to 1/4 scale, concat
    (512ch) -> 1x1 conv -> 19-class logits,
  * ``fcn_output`` — fcn_score upsampled x4 (bilinear, align_corners=False).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from slotvps_tpu.config import SemanticHeadConfig
from slotvps_tpu.models import layers as L
from slotvps_tpu.ops.deform_conv import deform_conv2d
from slotvps_tpu.ops.interpolate import (upsample_int_bilinear, upsample_x4_bilinear)


def _init_dcn_block(key, c_in, c_out):
    k1, k2 = jax.random.split(key)
    return {
        # offset predictor: zero-init (deform_conv_with_offset.py:21-27)
        "offset": {"w": jnp.zeros((3, 3, c_in, 18), jnp.float32),
                   "b": jnp.zeros((18,), jnp.float32)},
        "conv": L.init_conv(k1, 3, 3, c_in, c_out, bias=False, init="xavier"),
        "gn": L.init_norm(c_out),
    }


def init_semantic_head(key, cfg: SemanticHeadConfig) -> Dict:
    ks = jax.random.split(key, 4)
    return {
        "tower": [
            _init_dcn_block(ks[0], cfg.in_channels, cfg.in_channels),
            _init_dcn_block(ks[1], cfg.in_channels, cfg.out_channels),
            _init_dcn_block(ks[2], cfg.out_channels, cfg.out_channels),
        ],
        "conv_pred": L.init_conv(ks[3], 1, 1, cfg.out_channels * 4,
                                 cfg.num_classes, init="xavier"),
    }


def _dcn_block(p, x, gn_groups, impl="jax", halo=0):
    offset = L.conv2d(p["offset"], x, padding=1)
    if impl == "pallas":
        from slotvps_tpu.ops.pallas.deform_conv import deform_conv2d_pallas
        out = deform_conv2d_pallas(x, offset, p["conv"]["w"],
                                   halo=halo or 4)
    elif impl == "pallas_f32":
        from slotvps_tpu.ops.pallas.deform_conv import deform_conv2d_pallas
        out = deform_conv2d_pallas(x, offset, p["conv"]["w"],
                                   halo=halo or 4,
                                   compute_dtype=jnp.float32)
    else:
        out = deform_conv2d(x, offset, p["conv"]["w"], padding=1,
                            max_displacement=halo or 8)
    out = L.group_norm(p["gn"], out, num_groups=gn_groups)
    return L.relu(out)


def apply_semantic_head(
    params: Dict,
    inputs: Sequence[jnp.ndarray],
    cfg: SemanticHeadConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, List[jnp.ndarray]]:
    """inputs: FPN [P2, P3, P4, P5] (NHWC).

    Returns (fcn_output [B, 4h, 4w, 19], fcn_score [B, h, w, 19],
    feat_before — 128-ch tower outputs coarsest-first [P5, P4, P3, P2]).
    """
    assert len(inputs) == cfg.num_levels
    fpn_px = []
    for lvl, x in enumerate(inputs):
        for block in params["tower"]:
            x = _dcn_block(block, x, cfg.gn_groups, impl=cfg.dcn_impl,
                           halo=cfg.level_halo(lvl))
        fpn_px.append(x)

    feat_before = fpn_px[:cfg.num_levels][::-1]

    h, w = fpn_px[0].shape[1:3]
    ups = [fpn_px[0]]
    for lvl in range(1, 4):
        ups.append(upsample_int_bilinear(fpn_px[lvl], 2 ** lvl))
    feat = jnp.concatenate(ups, axis=-1)
    fcn_score = L.conv2d(params["conv_pred"], feat, padding=0)
    if cfg.fused_sseg:
        # quarter-res logits flow to postprocess, which fuses the x4
        # upsample into the sseg argmax kernel (models/postprocess.py)
        return fcn_score, fcn_score, feat_before
    fcn_output = upsample_x4_bilinear(fcn_score)
    return fcn_output, fcn_score, feat_before


def semantic_loss(fcn_score: jnp.ndarray, seg_label: jnp.ndarray,
                  cfg: SemanticHeadConfig) -> jnp.ndarray:
    """Weighted CE with ignore label (reference upsnetFPN.py:87-98)."""
    num_classes = fcn_score.shape[-1]
    valid = seg_label != cfg.ignore_label
    labels = jnp.where(valid, seg_label, 0)
    logp = jax.nn.log_softmax(fcn_score, axis=-1)
    ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss = -(ll * valid).sum() / jnp.maximum(valid.sum(), 1)
    return cfg.loss_weight * loss
