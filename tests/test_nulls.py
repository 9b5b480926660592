"""Nullable columns: validity bitmaps, canonical fill, null-aware scans
and aggregates (nulls.py; FORMAT.md §0.3)."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import nulls
from giddy_tpu.util import GROUP

from helpers import gen_column


def _mask(n, rng, frac=0.13):
    m = rng.random(n) >= frac  # True = valid
    if n > 2:  # exercise leading nulls too
        m[:2] = False
    return m


def test_fill_nulls_canonical():
    v = np.array([7, 1, 2, 3, 4, 5], np.int32)
    m = np.array([False, True, False, False, True, False])
    f = nulls.fill_nulls(v, m)
    # leading nulls back-fill from the first valid; others forward-fill
    np.testing.assert_array_equal(f, [1, 1, 1, 1, 4, 4])
    np.testing.assert_array_equal(nulls.fill_nulls(v, np.ones(6, bool)), v)
    np.testing.assert_array_equal(nulls.fill_nulls(v, np.zeros(6, bool)), np.zeros(6, np.int32))


def test_pack_unpack_valid_roundtrip():
    rng = np.random.default_rng(0)
    for n in (1, GROUP - 1, GROUP, 3 * GROUP + 17):
        m = rng.random(n) < 0.5
        words = nulls.pack_valid(m)
        np.testing.assert_array_equal(nulls.unpack_valid(words, n), m)


@pytest.mark.parametrize("scheme", ["nbit", "for", "delta", "dict", "rle", "patched", "cascade", "dzbv", "raw"])
def test_nullable_roundtrip_and_filters(scheme):
    from giddy_tpu.query import count_where, select_where

    rng = np.random.default_rng(hash(scheme) % 2**32)
    n = 3 * GROUP + 17
    v = gen_column(scheme, n, rng)
    m = _mask(n, rng)
    col = gt.encode(v, scheme, valid=m)

    # container round-trip preserves nullability
    cols2 = gt.read_container(gt.container_bytes([col]))
    assert nulls.is_nullable(cols2[0])
    np.testing.assert_array_equal(nulls.valid_mask(cols2[0]), m)

    # decode returns the canonical fill; decode_masked returns the mask
    vals, mask = gt.decode_masked(col)
    np.testing.assert_array_equal(mask, m)
    np.testing.assert_array_equal(vals, nulls.fill_nulls(v, m))
    assert gt.null_count(col) == int((~m).sum())
    assert gt.count_valid(col) == int(m.sum())

    # SQL predicate semantics: NULL never matches
    thr = int(np.median(v[m]))
    assert count_where(col, "lt", thr) == int((v[m] < thr).sum())
    assert count_where(col, "ne", thr) == int((v[m] != thr).sum())
    sel = select_where(col, "ge", thr)
    np.testing.assert_array_equal(np.sort(sel), np.sort(v[m][v[m] >= thr]))


@pytest.mark.parametrize("scheme", ["nbit", "for", "delta", "dict", "rle", "patched", "cascade", "raw"])
def test_nullable_aggregates(scheme):
    from giddy_tpu.aggregate import avg_, distinct_count, max_, min_, sum_

    rng = np.random.default_rng(1000 + hash(scheme) % 2**16)
    n = 2 * GROUP + 33
    v = gen_column(scheme, n, rng)
    m = _mask(n, rng)
    col = gt.encode(v, scheme, valid=m)
    vv = v[m].astype(np.int64)
    assert sum_(col) == int(vv.sum())
    assert min_(col) == int(vv.min())
    assert max_(col) == int(vv.max())
    assert avg_(col) == pytest.approx(float(vv.sum()) / vv.size)
    assert distinct_count(col) == int(np.unique(vv).size)


def test_nullable_signed_and_float():
    from giddy_tpu.aggregate import min_, sum_
    from giddy_tpu.query import count_where

    rng = np.random.default_rng(5)
    n = 2 * GROUP + 5
    v = rng.integers(-(2**30), 2**30, n, dtype=np.int64).astype(np.int32)
    m = _mask(n, rng, frac=0.4)
    col = gt.encode(v, "raw", valid=m)
    assert sum_(col) == int(v[m].astype(np.int64).sum())
    assert min_(col) == int(v[m].min())
    assert count_where(col, "lt", 0) == int((v[m] < 0).sum())

    fv = rng.normal(0, 100, n).astype(np.float32)
    fcol = gt.encode(fv, "raw", valid=m)
    assert sum_(fcol) == pytest.approx(float(fv[m].astype(np.float64).sum()))
    assert count_where(fcol, "gt", 1.5) == int((fv[m] > 1.5).sum())


def test_nullable_wide_int64():
    from giddy_tpu import wide
    from giddy_tpu.aggregate import max_, sum_
    from giddy_tpu.query import count_where

    rng = np.random.default_rng(6)
    n = 2 * GROUP + 9
    v = rng.integers(-(2**40), 2**40, n, dtype=np.int64)
    m = _mask(n, rng)
    filled = nulls.fill_nulls(v, m)
    col = nulls.attach_valid(wide.encode(filled, base_scheme="raw"), m)
    assert sum_(col) == int(v[m].sum())
    assert max_(col) == int(v[m].max())
    thr = int(np.median(v[m]))
    assert count_where(col, "le", thr) == int((v[m] <= thr).sum())


def test_all_null_edge_cases():
    from giddy_tpu.aggregate import avg_, distinct_count, min_, sum_

    n = GROUP + 3
    v = np.arange(n, dtype=np.int32)
    col = gt.encode(v, "nbit", valid=np.zeros(n, bool))
    assert sum_(col) == 0
    assert distinct_count(col) == 0
    with pytest.raises(ValueError, match="all-null"):
        min_(col)
    with pytest.raises(ValueError, match="all-null"):
        avg_(col)
    from giddy_tpu.query import count_where

    assert count_where(col, "ge", -(2**31)) == 0


def test_nullable_groupby():
    from giddy_tpu.groupby import group_reduce

    rng = np.random.default_rng(7)
    n = 2 * GROUP + 21
    keys = gen_column("dict", n, rng)
    vals = rng.integers(0, 10_000, n, dtype=np.int64).astype(np.int32)
    km = _mask(n, rng)
    vm = _mask(n, rng, frac=0.2)
    kc = gt.encode(keys, "dict", valid=km)
    vc = gt.encode(vals, "raw", valid=vm)
    res = group_reduce(kc, vc, ("count", "sum", "min", "max"))
    both = km & vm  # rows with a null key or measure are excluded
    for i, kv in enumerate(res.keys):
        rows = both & (keys == kv)
        assert res.count[i] == int(rows.sum())
        if rows.any():
            assert res.sum[i] == int(vals[rows].astype(np.int64).sum())
            assert res.min[i] == int(vals[rows].min())
            assert res.max[i] == int(vals[rows].max())


def test_nullable_streaming_and_partial():
    from giddy_tpu.partial import take
    from giddy_tpu.query import count_where
    from giddy_tpu.stream import stream_count_where

    rng = np.random.default_rng(8)
    n = 7 * GROUP + 11
    for scheme in ("for", "patched"):
        v = gen_column(scheme, n, rng)
        m = _mask(n, rng)
        col = gt.encode(v, scheme, valid=m)
        thr = int(np.median(v[m]))
        want = count_where(col, "lt", thr)
        assert want == int((v[m] < thr).sum())
        assert stream_count_where(col, "lt", thr, chunk_groups=2) == want
        # point lookups return the canonical fill
        idx = rng.integers(0, n, 50)
        np.testing.assert_array_equal(take(col, idx), nulls.fill_nulls(v, m)[idx])


def test_nullable_zonemap_pruned():
    from giddy_tpu.query import count_where
    from giddy_tpu.zonemap import count_where_pruned

    rng = np.random.default_rng(9)
    n = 5 * GROUP
    v = gen_column("delta", n, rng)  # sorted: zone pruning actually prunes
    m = _mask(n, rng)
    col = gt.encode(v, "delta", valid=m)
    thr = int(v[n // 2])
    want = int((v[m] < thr).sum())
    assert count_where_pruned(col, "lt", thr) == want
    assert count_where(col, "lt", thr) == want


def test_null_bitmap_algebra():
    from giddy_tpu.query import bitmap_and, count_bits, filter_bitmap

    rng = np.random.default_rng(10)
    n = 2 * GROUP + 3
    v = gen_column("nbit", n, rng)
    m = _mask(n, rng)
    col = gt.encode(v, "nbit", valid=m)
    assert count_bits(nulls.isnull_bitmap(col), n) == int((~m).sum())
    assert count_bits(nulls.notnull_bitmap(col), n) == int(m.sum())
    # NOT over a nullable predicate: exclude nulls explicitly
    from giddy_tpu.query import bitmap_not

    bm = filter_bitmap(col, "lt", 100)
    not_bm = bitmap_and(bitmap_not(bm, n), nulls.notnull_bitmap(col))
    assert count_bits(not_bm, n) == int((v[m] >= 100).sum())


def test_nullable_column_vs_column():
    from giddy_tpu.query import count_where_cols

    rng = np.random.default_rng(11)
    n = 2 * GROUP + 7
    a = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
    b = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
    ma = _mask(n, rng)
    ca = gt.encode(a, "nbit", valid=ma)
    cb = gt.encode(b, "nbit")
    assert count_where_cols(ca, cb, "lt") == int((a[ma] < b[ma]).sum())
