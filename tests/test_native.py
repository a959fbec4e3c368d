"""Native C++ fusion kernels vs the numpy implementations."""

import numpy as np
import pytest

from slotvps_tpu import native
from slotvps_tpu.eval.fusion import unify_pan_result

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def _random_frames(rng, n=4, h=48, w=64, n_ins=5):
    segs, pans, cls_inds, obj_ids = [], [], [], []
    for _ in range(n):
        seg = rng.integers(0, 19, (h, w)).astype(np.uint8)
        pan = rng.integers(0, 11 + n_ins, (h, w)).astype(np.uint8)
        pan[rng.random((h, w)) < 0.02] = 255
        segs.append(seg)
        pans.append(pan)
        cls_inds.append(rng.integers(1, 9, n_ins).astype(np.int64))
        obj_ids.append(rng.permutation(n_ins).astype(np.int64))
    return segs, pans, cls_inds, obj_ids


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("with_obj", [True, False])
def test_native_unify_matches_numpy(seed, with_obj):
    rng = np.random.default_rng(seed)
    segs, pans, cls_inds, obj_ids = _random_frames(rng)
    if not with_obj:
        obj_ids = None
    kw = dict(stuff_area_limit=30, id_last_stuff=10)
    ref = unify_pan_result(segs, [p.copy() for p in pans], cls_inds,
                           None if obj_ids is None else
                           [o.copy() for o in obj_ids],
                           use_native=False, **kw)
    nat = unify_pan_result(segs, [p.copy() for p in pans], cls_inds,
                           None if obj_ids is None else
                           [o.copy() for o in obj_ids],
                           use_native=True, **kw)
    for a, b in zip(nat, ref):
        np.testing.assert_array_equal(a, b)


def test_region_stats_matches_numpy(rng):
    keys = rng.integers(0, 9, (37, 53)).astype(np.int32) * 1000 \
        + rng.integers(0, 4, (37, 53)).astype(np.int32)
    res = native.region_stats_native(keys)
    assert res is not None
    out_keys, counts, bboxes = res
    ref_keys, ref_counts = np.unique(keys, return_counts=True)
    np.testing.assert_array_equal(out_keys, ref_keys)
    np.testing.assert_array_equal(counts, ref_counts)
    for i, k in enumerate(ref_keys):
        ys, xs = np.where(keys == k)
        np.testing.assert_array_equal(
            bboxes[i], [xs.min(), ys.min(), xs.max(), ys.max()])


def test_paint_regions(rng):
    keys = rng.integers(0, 5, (20, 30)).astype(np.int32)
    lut_keys = np.arange(5, dtype=np.int32)
    lut_rgb = rng.integers(0, 255, (5, 3)).astype(np.uint8)
    out = native.paint_regions_native(keys, lut_keys, lut_rgb)
    assert out is not None
    np.testing.assert_array_equal(out, lut_rgb[keys])
