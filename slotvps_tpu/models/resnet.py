"""ResNet backbone (functional, NHWC, frozen BatchNorm).

Capability parity with the reference backbone
(reference mmdet/models/backbones/resnet.py:338 ``ResNet``; r50 settings in
configs/cityscapes/r50_fpn_slotvps.py:5-12: depth=50, out_indices (0,1,2,3),
frozen_stages=1, norm_eval=True, style='pytorch').

``style='pytorch'`` puts the stride-2 on each bottleneck's 3x3 conv
(reference resnet.py Bottleneck), i.e. torchvision layout — so torchvision
``resnet50`` checkpoints convert directly (utils/checkpoint.py).

All BatchNorms are applied with running statistics (``norm_eval=True`` in
the reference freezes them even during training), so inference and the
training step share one code path.
"""

from __future__ import annotations

import functools

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from slotvps_tpu.models import layers as L

ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def _init_block(key, block, c_in, planes, stride, expansion,
                dcn=False, gcb=False, gcb_ratio=1.0 / 16):
    ks = jax.random.split(key, 8)
    p = {}
    if block == "bottleneck":
        p["conv1"] = L.init_conv(ks[0], 1, 1, c_in, planes, bias=False)
        p["bn1"] = L.init_bn(planes)
        p["conv2"] = L.init_conv(ks[1], 3, 3, planes, planes, bias=False)
        p["bn2"] = L.init_bn(planes)
        p["conv3"] = L.init_conv(ks[2], 1, 1, planes, planes * expansion,
                                 bias=False)
        p["bn3"] = L.init_bn(planes * expansion)
        c_out = planes * expansion
        if dcn:
            # offset head: zero init (reference resnet.py:176-182,
            # init_offset zeroes weight+bias)
            p["conv2_offset"] = {
                "w": jnp.zeros((3, 3, planes, 18), jnp.float32),
                "b": jnp.zeros((18,), jnp.float32),
            }
        if gcb:
            from slotvps_tpu.models.context_block import init_context_block

            p["gcb"] = init_context_block(ks[4], c_out, gcb_ratio)
    else:
        p["conv1"] = L.init_conv(ks[0], 3, 3, c_in, planes, bias=False)
        p["bn1"] = L.init_bn(planes)
        p["conv2"] = L.init_conv(ks[1], 3, 3, planes, planes, bias=False)
        p["bn2"] = L.init_bn(planes)
        c_out = planes
    if stride != 1 or c_in != c_out:
        p["downsample"] = {
            "conv": L.init_conv(ks[3], 1, 1, c_in, c_out, bias=False),
            "bn": L.init_bn(c_out),
        }
    return p, c_out


def init_resnet(key, depth=50, dcn_stages=None, gcb_stages=None,
                gcb_ratio=1.0 / 16, r52_stem=False) -> Dict:
    block, stage_blocks = ARCH_SETTINGS[depth]
    expansion = 4 if block == "bottleneck" else 1
    dcn_stages = dcn_stages or (False,) * len(stage_blocks)
    gcb_stages = gcb_stages or (False,) * len(stage_blocks)
    ks = jax.random.split(key, 1 + len(stage_blocks))
    if r52_stem:
        # R52 deep stem (reference resnet.py:421-424,472-515
        # ``turn_into_r52``): 7x7/2 -> three 3x3 convs, stage 1 input
        # becomes 128 channels
        sk = jax.random.split(ks[0], 3)
        params: Dict = {
            "conv1": L.init_conv(sk[0], 3, 3, 3, 64, bias=False),
            "bn1": L.init_bn(64),
            "conv2": L.init_conv(sk[1], 3, 3, 64, 64, bias=False),
            "bn2": L.init_bn(64),
            "conv3": L.init_conv(sk[2], 3, 3, 64, 128, bias=False),
            "bn3": L.init_bn(128),
        }
        c_in = 128
    else:
        params = {
            "conv1": L.init_conv(ks[0], 7, 7, 3, 64, bias=False),
            "bn1": L.init_bn(64),
        }
        c_in = 64
    for si, nblocks in enumerate(stage_blocks):
        planes = 64 * 2 ** si
        stride = 1 if si == 0 else 2
        stage = []
        bkeys = jax.random.split(ks[1 + si], nblocks)
        for bi in range(nblocks):
            bp, c_in = _init_block(bkeys[bi], block, c_in, planes,
                                   stride if bi == 0 else 1, expansion,
                                   dcn=dcn_stages[si], gcb=gcb_stages[si],
                                   gcb_ratio=gcb_ratio)
            stage.append(bp)
        params[f"layer{si + 1}"] = stage
    return params


def _max_pool_3x3_s2(x):
    """torch ``nn.MaxPool2d(3, stride=2, padding=1)`` on NHWC."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def _bottleneck(p, x, stride, bn=L.batch_norm_eval):
    out = L.conv2d(p["conv1"], x, padding=0)
    out = L.relu(bn(p["bn1"], out))
    if "conv2_offset" in p:
        # DCN stage plugin (reference resnet.py:235-244: conv2_offset on
        # the SAME stride as conv2, then deformable conv2)
        from slotvps_tpu.ops.deform_conv import deform_conv2d

        offset = L.conv2d(p["conv2_offset"], out, stride=stride, padding=1)
        out = deform_conv2d(out, offset, p["conv2"]["w"], stride=stride,
                            padding=1)
    else:
        out = L.conv2d(p["conv2"], out, stride=stride, padding=1)
    out = L.relu(bn(p["bn2"], out))
    out = L.conv2d(p["conv3"], out, padding=0)
    out = bn(p["bn3"], out)
    if "gcb" in p:
        from slotvps_tpu.models.context_block import apply_context_block

        out = apply_context_block(p["gcb"], out)
    if "downsample" in p:
        identity = bn(
            p["downsample"]["bn"],
            L.conv2d(p["downsample"]["conv"], x, stride=stride, padding=0))
    else:
        identity = x
    return L.relu(out + identity)


def _basic_block(p, x, stride, bn=L.batch_norm_eval):
    out = L.conv2d(p["conv1"], x, stride=stride, padding=1)
    out = L.relu(bn(p["bn1"], out))
    out = L.conv2d(p["conv2"], out, padding=1)
    out = bn(p["bn2"], out)
    if "downsample" in p:
        identity = bn(
            p["downsample"]["bn"],
            L.conv2d(p["downsample"]["conv"], x, stride=stride, padding=0))
    else:
        identity = x
    return L.relu(out + identity)


def apply_resnet(
    params: Dict,
    x: jnp.ndarray,
    depth: int = 50,
    out_indices: Sequence[int] = (0, 1, 2, 3),
    bn=L.batch_norm_eval,
) -> List[jnp.ndarray]:
    """x: [B, H, W, 3] -> feature maps at strides 4/8/16/32.

    ``bn`` is the BatchNorm application used at every site — the default
    is frozen running-stats eval BN (the only mode the reference ever
    runs, norm_eval=True); ``calibrate_bn_stats`` passes a collecting
    variant."""
    block, stage_blocks = ARCH_SETTINGS[depth]
    blk_fn = _bottleneck if block == "bottleneck" else _basic_block
    if "conv3" in params:  # R52 deep stem (reference resnet.py:570-576)
        x = L.conv2d(params["conv1"], x, stride=2, padding=1)
        x = L.relu(bn(params["bn1"], x))
        x = L.conv2d(params["conv2"], x, padding=1)
        x = L.relu(bn(params["bn2"], x))
        x = L.conv2d(params["conv3"], x, padding=1)
        x = L.relu(bn(params["bn3"], x))
    else:
        x = L.conv2d(params["conv1"], x, stride=2, padding=3)
        x = L.relu(bn(params["bn1"], x))
    x = _max_pool_3x3_s2(x)
    outs = []
    for si in range(len(stage_blocks)):
        stage = params[f"layer{si + 1}"]
        stride = 1 if si == 0 else 2
        for bi, bp in enumerate(stage):
            x = blk_fn(bp, x, stride if bi == 0 else 1, bn=bn)
        if si in out_indices:
            outs.append(x)
    return outs


def _iter_bns(params: Dict, depth: int):
    """Yield the backbone's BN param dicts in forward call order (must
    mirror ``apply_resnet``/``_bottleneck``/``_basic_block`` exactly —
    validated by ``calibrate_bn_stats``'s replay identity check)."""
    yield params["bn1"]
    if "conv3" in params:
        yield params["bn2"]
        yield params["bn3"]
    block, stage_blocks = ARCH_SETTINGS[depth]
    n_bns = 3 if block == "bottleneck" else 2
    for si in range(len(stage_blocks)):
        for bp in params[f"layer{si + 1}"]:
            for ci in range(1, n_bns + 1):
                yield bp[f"bn{ci}"]
            if "downsample" in bp:
                yield bp["downsample"]["bn"]


@functools.lru_cache(maxsize=None)
def _bn_stat_collector(depth: int, eps: float):
    """Jitted (params, x) -> (stats, outs) collecting per-site batch
    statistics in forward call order.  Cached so per-step recalibration
    (synthetic.overfit) doesn't retrace every call."""
    import jax as _jax

    def collect(params, x):
        stats = []

        def bn(p, xx):
            xf = xx.astype(jnp.float32)
            m = xf.mean(axis=(0, 1, 2))
            v = xf.var(axis=(0, 1, 2))
            stats.append((m, v))
            return L.batch_norm_eval(dict(p, mean=m, var=v), xx, eps=eps)

        outs = apply_resnet(params, x, depth=depth, bn=bn)
        return stats, outs

    return _jax.jit(collect)


def calibrate_bn_stats(params: Dict, x: jnp.ndarray, depth: int = 50,
                       eps: float = 1e-5, check: bool = True) -> Dict:
    """Write every backbone BN's running stats from the batch statistics
    of one forward pass over ``x`` (torch train-mode BN semantics).

    Why: a random-init backbone under frozen identity stats (mean 0,
    var 1 — ``init_bn``) compounds activation magnitude multiplicatively
    across its ~50 BN sites; measured ~1e22 on the FPN outputs at
    flagship depth, which poisons every consumer of raw (pre-GroupNorm)
    features — notably the semantic tower's DCN offset heads.  A
    pretrained checkpoint never exhibits this because its running stats
    normalize each layer; this calibration is the random-init analog,
    used by the synthetic trained-regime recipe (utils/synthetic.overfit)
    before training with the reference's norm_eval=True frozen-stat
    semantics.

    Mutates ``params`` in place (host pytree of plain dicts) and returns
    it.  Correct stat->site pairing is verified by replay: the frozen
    eval forward with the written stats must reproduce the collecting
    forward's outputs exactly.
    """
    import jax as _jax

    stats, outs = _bn_stat_collector(depth, eps)(params, x)
    sites = list(_iter_bns(params, depth))
    assert len(sites) == len(stats), (len(sites), len(stats))
    for p, (m, v) in zip(sites, stats):
        p["mean"] = m
        p["var"] = v
    if not check:
        return params
    # replay identity: mis-paired stats would change the eval forward
    replay = _jax.jit(lambda pr, xx: apply_resnet(pr, xx, depth=depth))(
        params, x)
    for a, b in zip(replay, outs):
        ok = bool(jnp.all(jnp.abs(a - b) <= 1e-3 * jnp.abs(b).max()))
        assert ok, "BN stat calibration replay mismatch (pairing bug)"
    return params
