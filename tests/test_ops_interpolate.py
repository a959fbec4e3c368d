"""Interpolation parity vs torch.nn.functional.interpolate (CPU)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

from slotvps_tpu.ops.interpolate import (
    interpolate_bilinear, interpolate_nearest, upsample_x2_nearest)


def _torch_resize(x_nhwc, size, mode, align_corners=None):
    t = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    kwargs = {} if mode == "nearest" else {"align_corners": align_corners}
    out = F.interpolate(t, size=size, mode=mode, **kwargs)
    return np.transpose(out.numpy(), (0, 2, 3, 1))


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("in_size,out_size", [
    ((8, 12), (16, 24)),     # x2 up
    ((7, 9), (28, 36)),      # x4 up
    ((16, 24), (8, 12)),     # x2 down
    ((10, 10), (13, 7)),     # odd ratios
    ((5, 5), (5, 5)),        # identity
    ((1, 3), (4, 6)),        # degenerate height
])
def test_bilinear_matches_torch(rng, align_corners, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(interpolate_bilinear(x, out_size, align_corners))
    theirs = _torch_resize(x, out_size, "bilinear", align_corners)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("in_size,out_size", [
    ((8, 12), (16, 24)),
    ((16, 24), (8, 12)),
    ((10, 10), (13, 7)),
])
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, *in_size, 3), dtype=np.float32)
    ours = np.asarray(interpolate_nearest(x, out_size))
    theirs = _torch_resize(x, out_size, "nearest")
    np.testing.assert_array_equal(ours, theirs)


def test_x2_nearest_fast_path(rng):
    x = rng.standard_normal((1, 6, 8, 4), dtype=np.float32)
    ours = np.asarray(upsample_x2_nearest(x))
    theirs = _torch_resize(x, (12, 16), "nearest")
    np.testing.assert_array_equal(ours, theirs)


def test_bilinear_x4_align_true_matches_torch(rng):
    # semantic-head upsample (reference vps_capsule.py:99-101 uses
    # align_corners=True)
    x = rng.standard_normal((1, 16, 20, 19), dtype=np.float32)
    ours = np.asarray(interpolate_bilinear(x, (64, 80), align_corners=True))
    theirs = _torch_resize(x, (64, 80), "bilinear", True)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


def test_upsample_x4_exact_matches_torch(rng):
    from slotvps_tpu.ops.interpolate import upsample_x4_bilinear

    x = rng.standard_normal((2, 9, 13, 5), dtype=np.float32)
    ours = np.asarray(upsample_x4_bilinear(x))
    theirs = _torch_resize(x, (36, 52), "bilinear", False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("s", [2, 3, 4, 8])
def test_upsample_int_matches_torch(rng, s):
    from slotvps_tpu.ops.interpolate import upsample_int_bilinear

    x = rng.standard_normal((1, 7, 9, 4), dtype=np.float32)
    ours = np.asarray(upsample_int_bilinear(x, s))
    theirs = _torch_resize(x, (7 * s, 9 * s), "bilinear", False)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)
