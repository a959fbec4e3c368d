"""Core numeric ops with exact reference (PyTorch) semantics.

TPU-native replacements for the reference's native CUDA extensions
(reference mmdet/ops/: deform_conv_cuda, deform_pool_cuda,
sigmoid_focal_loss_cuda) plus the interpolation primitives the model and
post-processing depend on.  Each op has a pure-XLA implementation; the hot
ones additionally have Pallas TPU kernels (slotvps_tpu/ops/pallas/).
"""

from slotvps_tpu.ops.interpolate import (  # noqa: F401
    interpolate_bilinear, interpolate_nearest, upsample_x2_bilinear)
from slotvps_tpu.ops.deform_conv import deform_conv2d  # noqa: F401
from slotvps_tpu.ops.focal_loss import sigmoid_focal_loss  # noqa: F401
