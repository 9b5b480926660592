"""Zone maps: group pruning, pruned counting, sorted-column search."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.util import GROUP
from giddy_tpu.zonemap import (
    candidate_groups, count_where_pruned, searchsorted, zone_map,
)


def test_zone_map_minmax():
    rng = np.random.default_rng(80)
    v = rng.integers(-500, 500, 4 * GROUP + 99).astype(np.int32)
    col = gt.encode(v, "nbit" if False else "raw")
    zm = zone_map(col)
    assert zm.ng == 5
    for g in range(zm.ng):
        seg = v[g * GROUP : min((g + 1) * GROUP, col.n)]
        assert zm.mins[g] == seg.min() and zm.maxs[g] == seg.max(), g
    assert zone_map(col) is zm  # cached


@pytest.mark.parametrize("op", ["lt", "le", "gt", "ge", "eq", "ne"])
def test_count_where_pruned_matches_numpy(op):
    rng = np.random.default_rng(81)
    # clustered data so pruning actually fires: sorted-ish ramp + noise
    v = (np.arange(5 * GROUP + 7) // 100 + rng.integers(0, 5, 5 * GROUP + 7)).astype(np.int32)
    col = gt.encode(v, "delta")
    cmp = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
           "le": np.less_equal, "gt": np.greater, "ge": np.greater_equal}[op]
    for thr in (0, 500, 1200, 10**6):
        assert count_where_pruned(col, op, thr) == int(cmp(v, thr).sum()), (op, thr)


def test_candidate_groups_prunes():
    v = np.arange(4 * GROUP, dtype=np.int32)  # strictly increasing
    col = gt.encode(v, "delta")
    zm = zone_map(col)
    m = candidate_groups(zm, "lt", GROUP // 2)  # only group 0 can match
    assert m.tolist() == [True, False, False, False]


def test_searchsorted_matches_numpy():
    rng = np.random.default_rng(82)
    v = np.sort(rng.integers(0, 10**6, 5 * GROUP + 123)).astype(np.int32)
    col = gt.encode(v, "delta")
    q = np.concatenate([
        rng.integers(-10, 10**6 + 10, 200),
        [int(v[0]), int(v[-1]), int(v[0]) - 1, int(v[-1]) + 1],
        v[rng.integers(0, v.size, 20)].astype(np.int64),  # exact hits
    ])
    for side in ("left", "right"):
        np.testing.assert_array_equal(
            searchsorted(col, q, side=side), np.searchsorted(v, q, side=side), err_msg=side
        )
    # scalar form
    assert searchsorted(col, int(v[7])) == np.searchsorted(v, v[7])


def test_searchsorted_rejects_unsorted():
    v = np.array([5, 3, 1], np.int32)
    col = gt.encode(v, "raw")
    with pytest.raises(ValueError, match="sorted"):
        searchsorted(col, 3)


def test_zonemap_float_total_order():
    rng = np.random.default_rng(83)
    v = np.sort(rng.normal(0, 100, 2 * GROUP + 9)).astype(np.float32)
    col = gt.encode(v, "raw")
    q = np.array([-250.0, 0.0, 37.5, 1e9], np.float32)
    np.testing.assert_array_equal(searchsorted(col, q), np.searchsorted(v, q))
    assert count_where_pruned(col, "lt", 0.0) == int((v < 0).sum())


def test_zonemap_wide_column():
    rng = np.random.default_rng(84)
    v = np.sort(rng.integers(0, 2**40, 3 * GROUP, dtype=np.int64))
    col = gt.encode(v, "wide", base_scheme="delta")
    q = rng.integers(0, 2**40, 20, dtype=np.int64)
    np.testing.assert_array_equal(searchsorted(col, q), np.searchsorted(v, q))
    assert count_where_pruned(col, "ge", int(v[GROUP])) == int((v >= v[GROUP]).sum())
