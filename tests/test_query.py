"""Predicate pushdown: fused decode+filter bitmaps (the DBMS-scan shape
the reference feeds — SURVEY.md §1)."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.query import count_where, where_mask
from giddy_tpu.util import GROUP

OPS = {"eq": np.equal, "ne": np.not_equal, "lt": np.less,
       "le": np.less_equal, "gt": np.greater, "ge": np.greater_equal}


@pytest.mark.parametrize("scheme", ["nbit", "for", "dzbf", "delta", "dict", "rle"])
@pytest.mark.parametrize("op", ["eq", "lt", "ge"])
def test_where_matches_numpy(scheme, op):
    rng = np.random.default_rng(40)
    v = gen_column(scheme, 2 * GROUP + 999, rng)
    col = gt.encode(v, scheme)
    value = int(np.median(v))
    mask = where_mask(col, op, value)
    np.testing.assert_array_equal(mask, OPS[op](v, value), err_msg=f"{scheme}/{op}")


@pytest.mark.parametrize("scheme", ["nbit", "rle"])
def test_count_where(scheme):
    rng = np.random.default_rng(41)
    v = gen_column(scheme, 3 * GROUP + 17, rng)
    col = gt.encode(v, scheme)
    value = int(np.median(v))
    assert count_where(col, "le", value) == int(np.sum(v <= value))


def test_signed_comparison():
    v = np.array([-5, -1, 0, 3, 7] * GROUP, dtype=np.int32)[: GROUP + 10]
    col = gt.encode(v, "raw")
    np.testing.assert_array_equal(where_mask(col, "lt", 0), v < 0)


def test_signed_narrow_dtypes():
    """int8/int16 payloads are zero-extended on disk; predicates must
    sign-extend before comparing (review regression)."""
    rng = np.random.default_rng(42)
    for dt in ("int16", "int8"):
        v = rng.integers(-100, 100, GROUP + 13).astype(np.dtype(dt))
        col = gt.encode(v, "dict")
        np.testing.assert_array_equal(where_mask(col, "lt", 0), v < 0, err_msg=dt)
        col2 = gt.encode(v, "raw")
        assert count_where(col2, "ge", -3) == int((v >= -3).sum()), dt


def test_value_is_runtime_argument():
    """Distinct comparison values must reuse one compiled kernel."""
    from giddy_tpu.query import _FILTER_CACHE

    rng = np.random.default_rng(43)
    v = rng.integers(0, 512, GROUP).astype(np.int32)
    col = gt.encode(v, "nbit")
    before = len(_FILTER_CACHE)
    for thr in (10, 100, 300):
        assert count_where(col, "lt", thr) == int((v < thr).sum())
    assert len(_FILTER_CACHE) == before + 1


def test_wide_predicates():
    """64-bit columns: plane-split comparison must match int64 semantics,
    including values where only the hi or only the lo half differs and
    negative ranges (signed hi ordering, unsigned lo ordering)."""
    rng = np.random.default_rng(44)
    base = rng.integers(-(2**40), 2**40, 3 * GROUP, dtype=np.int64)
    base[:5] = [0, -1, 2**33, -(2**33), 2**33 + 7]
    col = gt.encode(base, "wide")
    for op, npop in [("lt", np.less), ("ge", np.greater_equal), ("eq", np.equal), ("ne", np.not_equal)]:
        for thr in (0, -1, 2**33, 2**33 + 7, -(2**33) + 1):
            assert count_where(col, op, thr) == int(npop(base, thr).sum()), (op, thr)
    np.testing.assert_array_equal(where_mask(col, "lt", 0), base < 0)


def test_wide_unsigned_predicates():
    rng = np.random.default_rng(45)
    v = rng.integers(0, 2**62, GROUP + 31, dtype=np.uint64)
    v[0] = 2**63 + 5  # above int64 range: must still order correctly
    col = gt.encode(v, "wide")
    for thr in (2**40, 2**63, 2**63 + 5):
        assert count_where(col, "ge", thr) == int((v >= thr).sum()), thr


def test_bitmap_algebra_and_ranges():
    from giddy_tpu.query import (
        between_bitmap, bitmap_and, bitmap_not, bitmap_or,
        count_between, count_bits, filter_bitmap, isin_bitmap,
    )

    rng = np.random.default_rng(46)
    v = rng.integers(0, 1000, 2 * GROUP + 77).astype(np.int32)
    col = gt.encode(v, "nbit")
    n = col.n
    assert count_between(col, 100, 500) == int(((v >= 100) & (v <= 500)).sum())
    a = filter_bitmap(col, "lt", 200)
    b = filter_bitmap(col, "ge", 800)
    assert count_bits(bitmap_or(a, b), n) == int(((v < 200) | (v >= 800)).sum())
    assert count_bits(bitmap_and(a, b), n) == 0
    assert count_bits(bitmap_not(a, n), n) == int((v >= 200).sum())
    want = np.isin(v, [3, 700, 999]).sum()
    assert count_bits(isin_bitmap(col, [3, 700, 999, 3]), n) == int(want)
    assert count_bits(isin_bitmap(col, []), n) == 0
    assert count_bits(between_bitmap(col, 0, 999), n) == n  # pad masked


def test_cli_query(tmp_path, capsys):
    import json

    from giddy_tpu.cli import main
    from giddy_tpu.format import write_container

    rng = np.random.default_rng(47)
    v = rng.integers(0, 100, GROUP + 9).astype(np.int32)
    col = gt.encode(v, "nbit", name="c")
    path = tmp_path / "q.gtp"
    with open(path, "wb") as f:
        write_container([col], f)
    main(["query", str(path), "--op", "lt", "--value", "50"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == int((v < 50).sum())
    main(["query", str(path), "--between", "10", "20"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["count"] == int(((v >= 10) & (v <= 20)).sum())


def test_bad_op_rejected():
    col = gt.encode(np.zeros(10, np.int32), "nbit")
    with pytest.raises(ValueError):
        count_where(col, "between", 3)


# --- cascade dict-domain pushdown ----------------------------------------


@pytest.mark.parametrize("inner", ["rle", "nbit", "delta"])
@pytest.mark.parametrize("op", ["eq", "ne", "lt", "le", "gt", "ge"])
def test_cascade_pushdown_matches_numpy(inner, op):
    rng = np.random.default_rng(50)
    v = gen_column("cascade", 2 * GROUP + 999, rng)
    col = gt.encode(v, "cascade", codes_scheme=inner)
    value = int(np.median(v))
    np.testing.assert_array_equal(
        where_mask(col, op, value), OPS[op](v, value), err_msg=f"{inner}/{op}"
    )


def test_cascade_pushdown_rewrites_to_code_ranges():
    """A sorted (auto-built) dictionary must produce <=1 code range for
    ordered int predicates — the pushdown path, not decode+compare."""
    from giddy_tpu.query import _dict_code_ranges

    rng = np.random.default_rng(51)
    v = gen_column("cascade", GROUP, rng)
    col = gt.encode(v, "cascade")
    ranges = _dict_code_ranges(col, "lt", int(np.median(v)))
    assert ranges is not None and len(ranges) <= 1
    # absent value, eq -> zero ranges -> all-false bitmap
    absent = int(v.max()) + 1 if int(v.max()) < 2**31 - 1 else int(v.min()) - 1
    assert _dict_code_ranges(col, "eq", absent) == []
    assert count_where(col, "eq", absent) == 0


def test_cascade_pushdown_float_two_ranges():
    """Bitpattern-sorted float dictionaries split the negatives into a
    second contiguous block: ordered predicates still push down (<=2
    ranges) and match total-order semantics."""
    rng = np.random.default_rng(52)
    vocab = np.concatenate([-rng.random(6), rng.random(6)]).astype(np.float32)
    v = vocab[rng.integers(0, 12, 2 * GROUP + 33)]
    col = gt.encode(v, "cascade")
    from giddy_tpu.query import _dict_code_ranges

    ranges = _dict_code_ranges(col, "lt", 0.5)
    assert ranges is not None and 1 <= len(ranges) <= 2
    np.testing.assert_array_equal(where_mask(col, "lt", 0.5), v < 0.5)
    np.testing.assert_array_equal(where_mask(col, "ge", 0.0), v >= 0.0)


def test_cascade_unsorted_dict_falls_back():
    """An explicit unsorted dictionary fragments ordered match sets; the
    scan must still be correct via the decode+compare fallback."""
    rng = np.random.default_rng(53)
    vocab = np.array([50, 1, 99, 3, 70, 5, 80, 7, 60, 9, 90, 11], np.int32)
    v = vocab[rng.integers(0, 12, GROUP + 7)]
    col = gt.encode(v, "cascade", dictionary=vocab, codes_scheme="nbit")
    from giddy_tpu.query import _dict_code_ranges

    assert _dict_code_ranges(col, "lt", 55) is None  # fragmented
    np.testing.assert_array_equal(where_mask(col, "lt", 55), v < 55)
    assert count_where(col, "lt", 55) == int(np.sum(v < 55))


def test_cascade_narrow_signed_pushdown():
    rng = np.random.default_rng(54)
    vocab = np.array([-90, -3, 0, 4, 77], np.int16)
    v = vocab[rng.integers(0, 5, GROUP + 21)]
    col = gt.encode(v, "cascade", codes_scheme="rle")
    np.testing.assert_array_equal(where_mask(col, "lt", 0), v < 0)
    np.testing.assert_array_equal(where_mask(col, "ge", 4), v >= 4)


# --- selection materialization --------------------------------------------


def test_select_where_matches_numpy():
    from giddy_tpu.query import filter_bitmap, select, select_where

    rng = np.random.default_rng(60)
    n = 3 * GROUP + 201
    v = rng.integers(0, 1000, n).astype(np.int32)
    col = gt.encode(v, "for")
    np.testing.assert_array_equal(select_where(col, "lt", 100), v[v < 100])
    # cross-column: predicate on one column materializes another
    w = rng.integers(-500, 500, n).astype(np.int32)
    wcol = gt.encode(w, "raw")
    bm = filter_bitmap(col, "ge", 900)
    np.testing.assert_array_equal(select(wcol, bm), w[v >= 900])
    # empty result
    assert select_where(col, "gt", 10**6).size == 0


def test_cli_query_select_and_groupby(tmp_path, capsys):
    import json

    from giddy_tpu.cli import main
    from giddy_tpu.format import write_container

    rng = np.random.default_rng(61)
    n = GROUP + 33
    k = np.array([5, 8, 13], np.int32)[rng.integers(0, 3, n)]
    v = rng.integers(0, 10**6, n).astype(np.int32)
    cols = [gt.encode(k, "cascade", name="k"), gt.encode(v, "nbit", name="v")]
    path = tmp_path / "t.gtp"
    with open(path, "wb") as f:
        write_container(cols, f)
    sel = tmp_path / "sel.npy"
    main(["query", str(path), "--column", "1", "--op", "lt", "--value", "1000",
          "--select", str(sel)])
    np.testing.assert_array_equal(np.load(sel), v[v < 1000])
    capsys.readouterr()
    main(["groupby", str(path), "--keys", "0", "--vals", "1",
          "--aggs", "count,sum,min,max", "--where", "1", "--op", "ge",
          "--value", "500000"])
    rows = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
    mask = v >= 500000
    for row in rows:
        sel_v = v[mask & (k == row["key"])]
        assert row["count"] == sel_v.size
        assert row["sum"] == int(sel_v.astype(np.int64).sum())
        if sel_v.size:
            assert row["min"] == sel_v.min() and row["max"] == sel_v.max()


def test_dict_scheme_pushdown():
    """Plain dict columns get the same dict-domain rewriting as cascade."""
    from giddy_tpu.query import _dict_code_ranges

    rng = np.random.default_rng(62)
    vocab = np.sort(rng.choice(10**5, 40, replace=False)).astype(np.int32)
    v = vocab[rng.integers(0, 40, 2 * GROUP + 55)]
    col = gt.encode(v, "dict")
    assert col.params["dense"]
    med = int(np.median(v))
    ranges = _dict_code_ranges(col, "lt", med)
    assert ranges is not None and len(ranges) <= 1
    for op, npop in OPS.items():
        np.testing.assert_array_equal(where_mask(col, op, med), npop(v, med), err_msg=op)
    # explicit unsorted dictionary: fallback stays correct
    uv = np.array([50, 1, 99, 3, 70, 5], np.int32)
    v2 = uv[rng.integers(0, 6, GROUP + 5)]
    col2 = gt.encode(v2, "dict", dictionary=uv)
    assert not col2.params["dense"]
    np.testing.assert_array_equal(where_mask(col2, "lt", 55), v2 < 55)


def test_column_vs_column_predicates():
    from giddy_tpu.query import count_where_cols, filter_bitmap_cols
    from giddy_tpu.query import count_bits

    rng = np.random.default_rng(63)
    n = 2 * GROUP + 313
    a = rng.integers(-1000, 1000, n).astype(np.int32)
    b = rng.integers(-1000, 1000, n).astype(np.int32)
    ca, cb = gt.encode(a, "for"), gt.encode(b, "raw")
    for op, npop in OPS.items():
        assert count_where_cols(ca, cb, op) == int(npop(a, b).sum()), op
    # narrow signed: sign-extension on both sides
    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    assert count_where_cols(gt.encode(a16, "raw"), gt.encode(b16, "dict"), "lt") == int(
        (a16 < b16).sum()
    )
    # floats compare in total order (regular values match float semantics)
    fa = rng.normal(0, 5, n).astype(np.float32)
    fb = rng.normal(0, 5, n).astype(np.float32)
    assert count_where_cols(gt.encode(fa, "raw"), gt.encode(fb, "raw"), "le") == int(
        (fa <= fb).sum()
    )
    # bitmap composes with single-column predicates
    bm = filter_bitmap_cols(ca, cb, "gt")
    from giddy_tpu.query import filter_bitmap

    both = bm & filter_bitmap(ca, "ge", 0)
    assert count_bits(both, n) == int(((a > b) & (a >= 0)).sum())
    # validation
    import pytest

    with pytest.raises(ValueError, match="length"):
        count_where_cols(ca, gt.encode(a[:10], "raw"), "lt")
    with pytest.raises(ValueError, match="dtype"):
        count_where_cols(ca, gt.encode(a16, "raw"), "lt")
