"""Aspect-ratio group samplers (data/sampler.py) vs the reference's
GroupSampler/DistributedGroupSampler invariants
(reference mmdet/datasets/loader/sampler.py:37-158)."""

import numpy as np
import pytest

from slotvps_tpu.data.sampler import (aspect_ratio_flags,
                                      distributed_group_indices,
                                      group_shuffled_indices)


def _mixed_infos():
    # 7 landscape (w/h > 1), 5 portrait — deliberately not multiples of
    # the batch size so the padding path is exercised
    return ([{"width": 2048, "height": 1024}] * 7
            + [{"width": 768, "height": 1024}] * 5)


def test_flags():
    flags = aspect_ratio_flags(_mixed_infos())
    assert flags.tolist() == [1] * 7 + [0] * 5


@pytest.mark.parametrize("batch", [2, 3, 4])
def test_batches_are_single_group(batch):
    flags = aspect_ratio_flags(_mixed_infos())
    for seed in range(5):
        order = group_shuffled_indices(
            flags, batch, np.random.default_rng(seed))
        assert len(order) % batch == 0
        # every index appears (padding repeats, never drops)
        assert set(order.tolist()) == set(range(len(flags)))
        for b in range(len(order) // batch):
            window = order[b * batch:(b + 1) * batch]
            assert len(set(flags[window])) == 1, (b, window)


def test_group_padding_matches_reference_count():
    # reference GroupSampler.num_samples: per-group ceil to batch multiple
    flags = aspect_ratio_flags(_mixed_infos())
    order = group_shuffled_indices(flags, 4, np.random.default_rng(0))
    assert len(order) == 8 + 8  # ceil(7/4)*4 + ceil(5/4)*4


def test_uniform_dataset_degenerates_to_permutation():
    flags = np.ones(12, np.uint8)
    order = group_shuffled_indices(flags, 4, np.random.default_rng(0))
    assert sorted(order.tolist()) == list(range(12))


def test_distributed_ranks_disjoint_and_single_group():
    flags = aspect_ratio_flags(_mixed_infos() * 3)  # 36 images
    spg, nrep = 2, 4
    per_rank = [distributed_group_indices(
        flags, spg, nrep, r, np.random.default_rng(7)) for r in range(nrep)]
    lens = {len(o) for o in per_rank}
    assert len(lens) == 1
    for order in per_rank:
        for b in range(len(order) // spg):
            window = order[b * spg:(b + 1) * spg]
            assert len(set(flags[window])) == 1
    # same epoch rng on every rank => globally disjoint batch windows
    all_windows = []
    for order in per_rank:
        all_windows += [tuple(order[b * spg:(b + 1) * spg])
                        for b in range(len(order) // spg)]
    assert len(all_windows) == len(set(all_windows))


def test_deterministic_in_seed():
    flags = aspect_ratio_flags(_mixed_infos())
    a = group_shuffled_indices(flags, 3, np.random.default_rng((1, 2)))
    b = group_shuffled_indices(flags, 3, np.random.default_rng((1, 2)))
    np.testing.assert_array_equal(a, b)
