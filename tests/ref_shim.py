"""Import shim: make the UNMODIFIED reference (/root/reference) importable
and runnable on CPU torch, so golden tests can execute the actual reference
modules against this repo's JAX implementation.

The reference needs mmcv, timm, pycocotools, panopticapi, and its own CUDA
extensions (mmdet.ops).  None are installed; each is a ~10-line surface:

  * mmcv.cnn init fns + mmcv.runner/parallel stubs (reference
    mmdet/models/utils/conv_module.py:4, backbones/resnet.py:5-6,
    detectors/vps_temporal_slots.py:18),
  * timm.models.layers DropPath/to_2tuple/trunc_normal_ (reference
    detectors/dynamic_mask_head.py:31, backbones/swin_transformer.py:13),
  * panopticapi.utils rgb2id/id2rgb (detectors/vps_temporal_slots.py:27),
  * mmdet.ops.DeformConv re-implemented in pure torch (the CUDA
    deformable_im2col convention, mmdet/ops/dcn/src/
    deform_conv_cuda_kernel.cu: offset channels [dy0, dx0, dy1, dx1, ...],
    zero outside the open interval (-1, H) x (-1, W)),
  * torch.Tensor.cuda / torch.cuda.current_device patched to stay on CPU
    (the reference hardcodes .cuda() in its test path,
    vps_temporal_slots.py:345, simple_track_head.py:89).

Nothing from the reference is copied; this file only provides the
third-party API surface the reference imports.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _module(name):
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_mmcv(torch, nn):
    mmcv = _module("mmcv")
    mmcv.is_str = lambda x: isinstance(x, str)

    cnn = _module("mmcv.cnn")

    def constant_init(module, val, bias=0):
        if getattr(module, "weight", None) is not None:
            nn.init.constant_(module.weight, val)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu",
                     bias=0, distribution="normal"):
        if distribution == "uniform":
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    def xavier_init(module, gain=1, bias=0, distribution="normal"):
        if distribution == "uniform":
            nn.init.xavier_uniform_(module.weight, gain=gain)
        else:
            nn.init.xavier_normal_(module.weight, gain=gain)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    def normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if getattr(module, "bias", None) is not None:
            nn.init.constant_(module.bias, bias)

    cnn.constant_init = constant_init
    cnn.kaiming_init = kaiming_init
    cnn.xavier_init = xavier_init
    cnn.normal_init = normal_init
    mmcv.cnn = cnn

    runner = _module("mmcv.runner")

    def load_checkpoint(*a, **k):
        raise NotImplementedError("shim: no checkpoint IO")

    runner.load_checkpoint = load_checkpoint
    runner.load_state_dict = lambda module, sd, *a, **k: \
        module.load_state_dict(sd)

    class OptimizerHook:
        def __init__(self, *a, **k):
            pass

    class Hook:
        pass

    runner.OptimizerHook = OptimizerHook
    runner.Hook = Hook
    runner.get_dist_info = lambda: (0, 1)
    runner.obj_from_dict = None
    mmcv.runner = runner
    runner_utils = _module("mmcv.runner.utils")
    runner_utils.get_dist_info = runner.get_dist_info
    runner.utils = runner_utils

    parallel = _module("mmcv.parallel")

    class DataContainer:
        def __init__(self, data, **kwargs):
            self._data = data

        @property
        def data(self):
            return self._data

    parallel.DataContainer = DataContainer
    parallel.collate = lambda *a, **k: None
    parallel.scatter = lambda *a, **k: None
    mmcv.parallel = parallel
    return mmcv


def _install_timm(torch, nn):
    timm = _module("timm")
    models = _module("timm.models")
    layers = _module("timm.models.layers")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob or 0.0

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rand = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            rand.floor_()
            return x.div(keep) * rand

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = nn.init.trunc_normal_
    timm.models = models
    models.layers = layers
    return timm


def _install_panopticapi():
    papi = _module("panopticapi")
    utils = _module("panopticapi.utils")

    def rgb2id(color):
        if isinstance(color, np.ndarray) and len(color.shape) == 3:
            color = color.astype(np.uint32)
            return (color[:, :, 0] + 256 * color[:, :, 1]
                    + 256 * 256 * color[:, :, 2])
        return int(color[0] + 256 * color[1] + 256 * 256 * color[2])

    def id2rgb(id_map):
        if isinstance(id_map, np.ndarray):
            id_map = id_map.copy()
            rgb = np.zeros(id_map.shape + (3,), dtype=np.uint8)
            for i in range(3):
                rgb[..., i] = id_map % 256
                id_map = id_map // 256
            return rgb
        color = []
        for _ in range(3):
            color.append(id_map % 256)
            id_map //= 256
        return color

    class IdGenerator:
        def __init__(self, categories):
            self.categories = categories
            self.taken = set()

        def get_color(self, cat_id):  # pragma: no cover - unused in tests
            raise NotImplementedError

    utils.rgb2id = rgb2id
    utils.id2rgb = id2rgb
    utils.IdGenerator = IdGenerator
    papi.utils = utils
    return papi


def _install_terminaltables():
    tt = _module("terminaltables")

    class AsciiTable:  # pragma: no cover - print-only helper
        def __init__(self, table_data, *a, **k):
            self.table_data = table_data
            self.inner_footing_row_border = False

        @property
        def table(self):
            return "\n".join(" | ".join(str(c) for c in row)
                             for row in self.table_data)

    tt.AsciiTable = AsciiTable
    return tt


def _install_pycocotools():
    pct = _module("pycocotools")

    coco = _module("pycocotools.coco")

    class COCO:  # pragma: no cover - never instantiated by golden tests
        def __init__(self, *a, **k):
            raise NotImplementedError("shim")

    coco.COCO = COCO

    cocoeval = _module("pycocotools.cocoeval")

    class COCOeval:  # pragma: no cover
        def __init__(self, *a, **k):
            raise NotImplementedError("shim")

    cocoeval.COCOeval = COCOeval

    maskm = _module("pycocotools.mask")

    def _unavailable(*a, **k):  # pragma: no cover
        raise NotImplementedError("shim")

    maskm.decode = _unavailable
    maskm.encode = _unavailable
    maskm.frPyObjects = _unavailable
    pct.coco = coco
    pct.cocoeval = cocoeval
    pct.mask = maskm
    return pct


def torch_deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1):
    """Pure-torch deformable conv v1 forward, CUDA-kernel convention.

    x: [B, Cin, H, W]; offset: [B, 2*kh*kw, Ho, Wo] ([dy, dx] per tap);
    weight: [Cout, Cin, kh, kw].  groups == deformable_groups == 1.
    """
    import torch

    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    ys = torch.arange(ho, dtype=x.dtype) * stride - padding
    xs = torch.arange(wo, dtype=x.dtype) * stride - padding

    def sample(py, px):
        """Bilinear with zero outside; corners out of range read 0."""
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        wy1 = py - y0
        wx1 = px - x0
        out = torch.zeros(b, cin, ho, wo, dtype=x.dtype)
        inside = (py > -1) & (py < h) & (px > -1) & (px < w)
        for dy, wy_ in ((0, 1 - wy1), (1, wy1)):
            for dx, wx_ in ((0, 1 - wx1), (1, wx1)):
                cy = (y0 + dy).long()
                cx = (x0 + dx).long()
                ok = inside & (cy >= 0) & (cy < h) & (cx >= 0) & (cx < w)
                cyc = cy.clamp(0, h - 1)
                cxc = cx.clamp(0, w - 1)
                vals = x[torch.arange(b)[:, None, None, None],
                         torch.arange(cin)[None, :, None, None],
                         cyc[:, None], cxc[:, None]]
                out = out + vals * (wy_ * wx_ * ok.to(x.dtype))[:, None]
        return out

    cols = []
    for i in range(kh):
        for j in range(kw):
            k = i * kw + j
            py = ys.view(1, ho, 1) + i * dilation + offset[:, 2 * k]
            px = xs.view(1, 1, wo) + j * dilation + offset[:, 2 * k + 1]
            cols.append(sample(py, px))
    col = torch.stack(cols, dim=2)  # [B, Cin, K, Ho, Wo]
    return torch.einsum("bckhw,ock->bohw", col,
                        weight.reshape(cout, cin, kh * kw))


def _install_mmdet_ops(torch, nn):
    """Fake ``mmdet.ops`` with a pure-torch DeformConv (the only op the
    live model path uses — reference models/utils/
    deform_conv_with_offset.py:6)."""
    import math

    ops = _module("mmdet.ops")

    class DeformConv(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     stride=1, padding=0, dilation=1, groups=1,
                     deformable_groups=1, bias=False):
            super().__init__()
            assert groups == 1 and deformable_groups == 1 and not bias
            self.stride = stride
            self.padding = padding
            self.dilation = dilation
            k = (kernel_size if isinstance(kernel_size, tuple)
                 else (kernel_size, kernel_size))
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels, *k))
            n = in_channels * k[0] * k[1]
            stdv = 1.0 / math.sqrt(n)
            self.weight.data.uniform_(-stdv, stdv)

        def forward(self, x, offset):
            return torch_deform_conv2d(x, offset, self.weight,
                                       self.stride, self.padding,
                                       self.dilation)

    ops.DeformConv = DeformConv
    ops.DeformConvPack = None
    ops.DeformRoIPooling = None
    ops.DeformRoIPoolingPack = None
    ops.ModulatedDeformConv = None
    ops.ModulatedDeformConvPack = None
    ops.ModulatedDeformRoIPoolingPack = None
    ops.deform_conv = None
    ops.deform_roi_pooling = None
    ops.modulated_deform_conv = None
    ops.SigmoidFocalLoss = None
    ops.sigmoid_focal_loss = None
    ops.ContextBlock = None
    return ops


_installed = False


def install():
    """Install all shims + sys.path; idempotent.  Returns the imported
    ``mmdet.models`` package of the reference."""
    global _installed
    import torch
    import torch.nn as nn

    if not _installed:
        if REFERENCE_ROOT not in sys.path:
            sys.path.insert(0, REFERENCE_ROOT)
        _install_mmcv(torch, nn)
        _install_timm(torch, nn)
        _install_panopticapi()
        _install_pycocotools()
        _install_terminaltables()
        # datasets/pipelines/transforms.py imports `corrupt` at module level
        ic = _module("imagecorruptions")

        def corrupt(*a, **k):  # pragma: no cover
            raise NotImplementedError("shim")

        ic.corrupt = corrupt
        # core/utils/misc.py only version-checks torchvision and calls
        # torchvision._is_tracing(); report a modern version
        tv = _module("torchvision")
        tv.__version__ = "0.15.0"
        tv._is_tracing = lambda: False
        tv_ops = _module("torchvision.ops")
        tv_ops_misc = _module("torchvision.ops.misc")
        tv_ops_misc.interpolate = torch.nn.functional.interpolate
        tv_ops.misc = tv_ops_misc
        tv.ops = tv_ops
        import mmdet  # noqa: F401  (real package, trivial __init__)

        _install_mmdet_ops(torch, nn)
        # the reference's test path hardcodes .cuda(); keep it on CPU
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.cuda.current_device = lambda: "cpu"
        _installed = True

    import mmdet.models
    return mmdet.models


def load_reference_config(name="r50_fpn_slotvps"):
    """Exec a reference config file (mmcv.Config.fromfile equivalent) and
    return its namespace dict (model / train_cfg / test_cfg / data...)."""
    path = f"{REFERENCE_ROOT}/configs/cityscapes/{name}.py"
    ns: dict = {}
    with open(path) as f:
        exec(compile(f.read(), path, "exec"), ns)
    return ns


class AttrDict(dict):
    """Minimal mmcv.Config-style dict with attribute access."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def deep_attr(obj):
    """Recursively convert dicts to AttrDict (so ``.get()`` results also
    support attribute access, as mmcv.Config does)."""
    if isinstance(obj, dict):
        return AttrDict({k: deep_attr(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(deep_attr(v) for v in obj)
    return obj


def build_reference_detector(seed=0, config_name="r50_fpn_slotvps"):
    """Instantiate the reference VPS_Temporal_Slots from its own config,
    randomly initialised (pretrained disabled), in eval mode."""
    import torch

    models = install()
    ns = load_reference_config(config_name)
    model_cfg = deep_attr(ns["model"])
    model_cfg["pretrained"] = None
    torch.manual_seed(seed)
    det = models.build_detector(model_cfg, train_cfg=None,
                                test_cfg=deep_attr(ns["test_cfg"]))
    det.eval()
    return det, ns
