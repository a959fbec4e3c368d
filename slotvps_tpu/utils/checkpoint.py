"""Checkpointing: orbax save/load + torch->jax weight conversion.

The reference loads mmcv ``.pth`` checkpoints with a ``meta['CLASSES']``
sidecar (reference tools/test_eval_vpq.py:108-116).  The converter below
maps that checkpoint's ``state_dict`` key tree (module layout documented in
SURVEY.md §2.1) onto our parameter pytree so published Slot-VPS weights can
be evaluated directly.  ``convert_torchvision_resnet`` covers the
``modelzoo://resnet50`` pretrained backbone path
(reference configs/cityscapes/r50_fpn_slotvps.py:4).

Layout transforms: conv OIHW->HWIO, linear [out,in]->[in,out],
MHA packed in_proj [3d,d]->[d,3d].
"""

from __future__ import annotations

import copy
from typing import Dict, Mapping

import jax.numpy as jnp
import numpy as np


def save_checkpoint(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, like)


# ---------------------------------------------------------------------------
# torch -> jax conversion
# ---------------------------------------------------------------------------


def _conv_w(t):
    return jnp.asarray(np.asarray(t).transpose(2, 3, 1, 0))  # OIHW -> HWIO


def _lin_w(t):
    return jnp.asarray(np.asarray(t).T)


def _arr(t):
    return jnp.asarray(np.asarray(t))


def _bn(sd, prefix):
    return {"scale": _arr(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"]),
            "mean": _arr(sd[f"{prefix}.running_mean"]),
            "var": _arr(sd[f"{prefix}.running_var"])}


def _norm(sd, prefix):
    return {"scale": _arr(sd[f"{prefix}.weight"]),
            "bias": _arr(sd[f"{prefix}.bias"])}


def _conv(sd, prefix, bias=True):
    p = {"w": _conv_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _arr(sd[f"{prefix}.bias"])
    return p


def _linear(sd, prefix, bias=True):
    p = {"w": _lin_w(sd[f"{prefix}.weight"])}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _arr(sd[f"{prefix}.bias"])
    return p


def convert_torchvision_resnet(sd: Mapping, depth: int = 50) -> Dict:
    """torchvision/mmcv ResNet state_dict -> our backbone tree."""
    from slotvps_tpu.models.resnet import ARCH_SETTINGS

    block, stage_blocks = ARCH_SETTINGS[depth]
    out = {"conv1": _conv(sd, "conv1", bias=False), "bn1": _bn(sd, "bn1")}
    if "conv3.weight" in sd:
        # R52 deep stem (reference resnet.py:472-515): top-level
        # conv2/bn2 + conv3/bn3 exist only in this variant
        out["conv2"] = _conv(sd, "conv2", bias=False)
        out["bn2"] = _bn(sd, "bn2")
        out["conv3"] = _conv(sd, "conv3", bias=False)
        out["bn3"] = _bn(sd, "bn3")
    n_convs = 3 if block == "bottleneck" else 2
    for si, nb in enumerate(stage_blocks):
        stage = []
        for bi in range(nb):
            pre = f"layer{si + 1}.{bi}"
            bp = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = _conv(sd, f"{pre}.conv{ci}", bias=False)
                bp[f"bn{ci}"] = _bn(sd, f"{pre}.bn{ci}")
            if f"{pre}.downsample.0.weight" in sd:
                bp["downsample"] = {
                    "conv": _conv(sd, f"{pre}.downsample.0", bias=False),
                    "bn": _bn(sd, f"{pre}.downsample.1"),
                }
            stage.append(bp)
        out[f"layer{si + 1}"] = stage
    return out


def convert_swin(sd: Mapping, cfg) -> Dict:
    """Reference SwinTransformer state_dict -> our backbone tree.

    Key layout: mmdet/models/backbones/swin_transformer.py —
    ``patch_embed.proj/.norm``, ``layers.{s}.blocks.{b}.{norm1, attn.qkv,
    attn.proj, attn.relative_position_bias_table, norm2, mlp.fc1, mlp.fc2}``,
    ``layers.{s}.downsample.{reduction, norm}``, out norms ``norm{i}``.
    ``relative_position_index`` is a derived buffer (recomputed here).
    """
    out: Dict = {
        "patch_embed": {
            "proj": _conv(sd, "patch_embed.proj"),
            "norm": (_norm(sd, "patch_embed.norm")
                     if "patch_embed.norm.weight" in sd else None),
        },
    }
    for si, depth in enumerate(cfg.depths):
        blocks = []
        for bi in range(depth):
            pre = f"layers.{si}.blocks.{bi}"
            blocks.append({
                "norm1": _norm(sd, f"{pre}.norm1"),
                "qkv": _linear(sd, f"{pre}.attn.qkv"),
                "proj": _linear(sd, f"{pre}.attn.proj"),
                "rel_pos_bias": _arr(
                    sd[f"{pre}.attn.relative_position_bias_table"]),
                "norm2": _norm(sd, f"{pre}.norm2"),
                "fc1": _linear(sd, f"{pre}.mlp.fc1"),
                "fc2": _linear(sd, f"{pre}.mlp.fc2"),
            })
        stage: Dict = {"blocks": blocks}
        if f"layers.{si}.downsample.reduction.weight" in sd:
            stage["downsample"] = {
                "reduction": _linear(
                    sd, f"layers.{si}.downsample.reduction", bias=False),
                "norm": _norm(sd, f"layers.{si}.downsample.norm"),
            }
        out[f"stage{si}"] = stage
    for i in cfg.out_indices:
        out[f"out_norm{i}"] = _norm(sd, f"norm{i}")
    return out


def _retriever(sd, pre):
    return {
        "to_q": _linear(sd, f"{pre}.to_q"),
        "to_k": _linear(sd, f"{pre}.to_k"),
        "to_v": _linear(sd, f"{pre}.to_v"),
        "norm_q": _norm(sd, f"{pre}.norm_q"),
        "norm_k": _norm(sd, f"{pre}.norm_k"),
        "norm_v": _norm(sd, f"{pre}.norm_v"),
        "norm1": _norm(sd, f"{pre}.norm1"),
    }


def convert_slotvps_checkpoint(sd: Mapping, cfg) -> Dict:
    """Full reference checkpoint (VPS_Temporal_Slots state_dict) -> params.

    ``cfg`` is a ModelConfig; key layout follows
    mmdet/models/detectors/{vps_temporal_slots,vps_capsule,
    dynamic_mask_head,simple_track_head}.py.
    """
    sd = {k: v for k, v in sd.items()}
    im = "image_model"
    params: Dict = {}
    bb_sd = {k[len(f"{im}.backbone."):]: v for k, v in sd.items()
             if k.startswith(f"{im}.backbone.")}
    if cfg.backbone == "swin":
        params["backbone"] = convert_swin(bb_sd, cfg.swin)
    else:
        params["backbone"] = convert_torchvision_resnet(
            bb_sd, cfg.resnet.depth)
    # FPN
    n_lat = len(cfg.fpn_in_channels())
    params["fpn"] = {
        "lateral": [_conv(sd, f"{im}.neck.lateral_convs.{i}.conv")
                    for i in range(n_lat)],
        "fpn": [_conv(sd, f"{im}.neck.fpn_convs.{i}.conv")
                for i in range(n_lat)],
    }
    # semantic head: shared tower = deform_convs.0 Sequential
    # indices 0/3/6 = DCNWithOffset, 1/4/7 = GroupNorm
    tower = []
    for i in (0, 3, 6):
        pre = f"{im}.panopticFPN.deform_convs.0.{i}"
        tower.append({
            "offset": _conv(sd, f"{pre}.conv_offset"),
            "conv": _conv(sd, f"{pre}.conv", bias=False),
            "gn": _norm(sd, f"{im}.panopticFPN.deform_convs.0.{i + 1}"),
        })
    params["semantic_head"] = {
        "tower": tower,
        "conv_pred": _conv(sd, f"{im}.panopticFPN.conv_pred.conv"),
    }
    # slot decoder
    stages = []
    flat = 0
    for lvl, n in enumerate(cfg.slot_head.per_dh_num_heads):
        for j in range(n):
            pre = f"{im}.dynamic_mask_head.head_series_{lvl}.{j}"
            sp = {
                "self_attn": {
                    "in_proj": {
                        "w": _lin_w(sd[f"{pre}.self_attn.in_proj_weight"]),
                        "b": _arr(sd[f"{pre}.self_attn.in_proj_bias"]),
                    },
                    "out_proj": _linear(sd, f"{pre}.self_attn.out_proj"),
                },
                "inst_interact": _retriever(sd, f"{pre}.inst_interact"),
                "linear1": _linear(sd, f"{pre}.linear1"),
                "linear2": _linear(sd, f"{pre}.linear2"),
                "norm1": _norm(sd, f"{pre}.norm1"),
                "norm2": _norm(sd, f"{pre}.norm2"),
                "norm3": _norm(sd, f"{pre}.norm3"),
                "cls_module": [
                    {"lin": _linear(sd, f"{pre}.cls_module.{3 * i}",
                                    bias=False),
                     "ln": _norm(sd, f"{pre}.cls_module.{3 * i + 1}")}
                    for i in range(cfg.slot_head.num_cls)
                ],
                "reg_module": [
                    {"lin": _linear(sd, f"{pre}.reg_module.{3 * i}",
                                    bias=False),
                     "ln": _norm(sd, f"{pre}.reg_module.{3 * i + 1}")}
                    for i in range(cfg.slot_head.num_reg)
                ],
                "class_logits": _linear(sd, f"{pre}.class_logits"),
            }
            tq = f"{pre}.temporal_query_head"
            if f"{tq}.linear1.weight" in sd:
                sp["temporal"] = {
                    "inst_interact": _retriever(sd, f"{tq}.inst_interact"),
                    "linear1": _linear(sd, f"{tq}.linear1"),
                    "linear2": _linear(sd, f"{tq}.linear2"),
                    "norm2": _norm(sd, f"{tq}.norm2"),
                    "norm3": _norm(sd, f"{tq}.norm3"),
                }
            stages.append(sp)
            flat += 1
    params["slot_head"] = {
        "stages": stages,
        "conv_trans": _conv(sd, f"{im}.dynamic_mask_head.conv_trans.conv"),
    }
    params["track_head"] = {
        "fcs": [_linear(sd, f"temporal_track_head.fcs_query.{i}")
                for i in range(cfg.track_head.num_fcs_query)],
    }
    params["init_mask_query"] = _arr(sd[f"{im}.init_mask_query.weight"])
    params["conv_trans"] = _conv(sd, f"{im}.conv_trans.conv")
    params["fg_bn"] = _bn(sd, f"{im}.fg_bn")
    params["feat_bn"] = _bn(sd, f"{im}.feat_bn")
    return params


def load_torch_checkpoint(path: str, cfg) -> Dict:
    """Load a reference ``.pth`` (mmcv format: {'state_dict': ..., 'meta':
    ...} or a bare state_dict) and convert."""
    import torch

    ckpt = torch.load(path, map_location="cpu")
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return convert_slotvps_checkpoint(sd, cfg)
