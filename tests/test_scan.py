"""Standalone scan/reduce ops (SURVEY.md §3.5 reduction kernels analog)."""

import numpy as np

from giddy_tpu.scan import group_prefix_sum, group_reduce
from giddy_tpu.util import GROUP


def test_group_prefix_sum_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 1000, 2 * GROUP + 123).astype(np.int32)
    out = np.asarray(group_prefix_sum(x)).view(np.int32)
    ref = np.concatenate(
        [np.cumsum(c.astype(np.int64)) for c in np.split(np.pad(x, (0, 3 * GROUP - x.shape[0])), 3)]
    ).astype(np.uint32).view(np.int32)[: x.shape[0]]
    np.testing.assert_array_equal(out, ref)


def test_exclusive_prefix_sum():
    x = np.array([3, 1, 4, 1, 5], dtype=np.int32)
    out = np.asarray(group_prefix_sum(x, exclusive=True)).view(np.int32)
    np.testing.assert_array_equal(out, [0, 3, 4, 8, 9])


def test_group_reduce():
    rng = np.random.default_rng(1)
    x = rng.integers(-1000, 1000, 2 * GROUP).astype(np.int32)
    np.testing.assert_array_equal(
        np.asarray(group_reduce(x, "sum")), x.reshape(2, GROUP).sum(axis=1, dtype=np.int32)
    )
    np.testing.assert_array_equal(
        np.asarray(group_reduce(x, "max")), x.reshape(2, GROUP).max(axis=1)
    )
