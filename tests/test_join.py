"""Inner equi-join / anti-join (join.py) + the membership-scan paths they
lean on (wide/float isin regressions)."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import strings
from giddy_tpu.join import anti_join_bitmap, join_indices
from giddy_tpu.table import Table
from giddy_tpu.util import GROUP

from helpers import gen_column


def ref_pairs(lv, rv, lvalid=None, rvalid=None):
    """Left-major reference pairs; right partners in original order."""
    idx: dict = {}
    for j, v in enumerate(rv):
        if rvalid is None or rvalid[j]:
            idx.setdefault(v, []).append(j)
    out = []
    for i, v in enumerate(lv):
        if lvalid is None or lvalid[i]:
            for j in idx.get(v, []):
                out.append((i, j))
    return out


def check(left_col, right_col, lv, rv, lvalid=None, rvalid=None):
    li, ri = join_indices(left_col, right_col)
    got = list(zip(li.tolist(), ri.tolist()))
    assert got == ref_pairs(list(lv), list(rv), lvalid, rvalid)


def test_join_int_duplicates():
    rng = np.random.default_rng(0)
    nl, nr = GROUP + 37, GROUP // 2 + 11
    lv = rng.integers(0, 200, nl, dtype=np.int64).astype(np.int32)
    rv = rng.integers(100, 300, nr, dtype=np.int64).astype(np.int32)
    check(gt.encode(lv, "nbit", name="l"), gt.encode(rv, "nbit", name="r"), lv, rv)


def test_join_dict_and_rle_keys():
    rng = np.random.default_rng(1)
    nl, nr = GROUP + 5, GROUP + 61
    vocab = (np.arange(40, dtype=np.int32) * 13) - 60
    lv = vocab[rng.integers(0, 40, nl)]
    rv = np.repeat(vocab[rng.integers(20, 40, nr // 50 + 1)], 50)[:nr]
    check(gt.encode(lv, "dict", name="l"), gt.encode(rv, "rle", name="r"), lv, rv)


def test_join_string_keys():
    rng = np.random.default_rng(2)
    nl, nr = GROUP + 3, GROUP // 4 + 9
    words = [b"alpha", b"beta", b"gamma", b"delta", b"eps"]
    lv = [words[i] for i in rng.integers(0, 5, nl)]
    rv = [words[i] for i in rng.integers(2, 5, nr)]
    lc = strings.encode_strings(lv, name="l")
    rc = strings.encode_strings(rv, name="r")
    check(lc, rc, lv, rv)


def test_join_wide_int64_keys():
    # >8 distinct survivors forces the lexicographic plane search
    rng = np.random.default_rng(3)
    nl, nr = GROUP + 21, GROUP + 7
    pool = rng.integers(-(2**40), 2**40, 60).astype(np.int64)
    lv = pool[rng.integers(0, 60, nl)]
    rv = pool[rng.integers(30, 60, nr)]
    check(gt.encode(lv, "wide", name="l"), gt.encode(rv, "wide", name="r"), lv, rv)


def test_join_float_keys():
    rng = np.random.default_rng(4)
    nl, nr = GROUP + 13, GROUP + 29
    pool = (rng.standard_normal(25) * 100).astype(np.float32)
    lv = pool[rng.integers(0, 25, nl)]
    rv = pool[rng.integers(10, 25, nr)]
    check(gt.encode(lv, "raw", name="l"), gt.encode(rv, "raw", name="r"), lv, rv)


def test_join_nullable_keys_never_match():
    rng = np.random.default_rng(5)
    nl, nr = GROUP + 9, GROUP + 17
    lv = rng.integers(0, 50, nl, dtype=np.int64).astype(np.int32)
    rv = rng.integers(0, 50, nr, dtype=np.int64).astype(np.int32)
    lm = rng.random(nl) >= 0.2
    rm = rng.random(nr) >= 0.2
    lc = gt.encode(lv, "nbit", name="l", valid=lm)
    rc = gt.encode(rv, "nbit", name="r", valid=rm)
    check(lc, rc, lv, rv, lm, rm)


def test_join_empty_intersection():
    lv = np.arange(100, dtype=np.int32)
    rv = np.arange(1000, 1100, dtype=np.int32)
    li, ri = join_indices(gt.encode(lv, "raw", name="l"), gt.encode(rv, "raw", name="r"))
    assert li.size == 0 and ri.size == 0


def test_join_tables_select_and_suffix():
    rng = np.random.default_rng(6)
    nl, nr = GROUP + 3, GROUP // 2 + 5
    lk = rng.integers(0, 64, nl, dtype=np.int64).astype(np.int32)
    lx = rng.integers(0, 1000, nl, dtype=np.int64).astype(np.int32)
    rk = rng.integers(32, 96, nr, dtype=np.int64).astype(np.int32)
    rx = rng.integers(0, 1000, nr, dtype=np.int64).astype(np.int32)
    tl = Table([gt.encode(lk, "nbit", name="k"), gt.encode(lx, "nbit", name="x")])
    tr = Table([gt.encode(rk, "nbit", name="k"), gt.encode(rx, "nbit", name="x")])
    rows, li, ri = tl.join("k", tr)
    pairs = ref_pairs(list(lk), list(rk))
    assert list(zip(li.tolist(), ri.tolist())) == pairs
    np.testing.assert_array_equal(rows["k"], lk[li])
    np.testing.assert_array_equal(rows["x"], lx[li])
    np.testing.assert_array_equal(rows["x_r"], rx[ri])
    # explicit selection, no collision
    rows2, _, _ = tl.join("k", tr, select=["k"], other_select=["x"])
    assert set(rows2) == {"k", "x"}
    np.testing.assert_array_equal(rows2["x"], rx[ri])


def test_anti_join():
    from giddy_tpu.query import count_bits

    rng = np.random.default_rng(7)
    n = GROUP + 45
    lv = rng.integers(0, 100, n, dtype=np.int64).astype(np.int32)
    rv = rng.integers(50, 150, GROUP // 8, dtype=np.int64).astype(np.int32)
    lm = rng.random(n) >= 0.15
    lc = gt.encode(lv, "nbit", name="l", valid=lm)
    rc = gt.encode(rv, "nbit", name="r")
    bm = anti_join_bitmap(lc, rc)
    want = int((lm & ~np.isin(lv, rv)).sum())
    assert count_bits(bm, n) == want
    # empty build side: every valid probe row survives
    empty = gt.encode(np.zeros(16, np.int32), "raw", name="e",
                      valid=np.zeros(16, bool))
    bm = anti_join_bitmap(lc, empty)
    assert count_bits(bm, n) == int(lm.sum())


def test_isin_wide_and_float_regressions():
    from giddy_tpu.query import count_bits, isin_bitmap

    rng = np.random.default_rng(8)
    n = GROUP + 3
    v64 = rng.integers(-(2**40), 2**40, n).astype(np.int64)
    col = gt.encode(v64, "wide", name="w")
    vals = [int(x) for x in v64[:20]] + [2**62, -(2**62)]  # incl. non-matches
    assert count_bits(isin_bitmap(col, vals), n) == int(np.isin(v64, vals).sum())
    # small wide set still goes through the searched path
    vals = [int(v64[0]), int(v64[1])]
    assert count_bits(isin_bitmap(col, vals), n) == int(np.isin(v64, vals).sum())

    vf = rng.standard_normal(n).astype(np.float32)
    colf = gt.encode(vf, "raw", name="f")
    small = [float(vf[0]), float(vf[5]), 1e30]
    assert count_bits(isin_bitmap(colf, small), n) == int(np.isin(vf, small).sum())
    big = [float(x) for x in vf[:40]]
    assert count_bits(isin_bitmap(colf, big), n) == int(np.isin(vf, big).sum())
    assert count_bits(isin_bitmap(colf, []), n) == 0

    vu = rng.integers(0, 2**64, n, dtype=np.uint64)
    colu = gt.encode(vu, "wide", name="u")
    vals = [int(x) for x in vu[:12]]
    assert count_bits(isin_bitmap(colu, vals), n) == int(np.isin(vu, vals).sum())


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_join_fuzz_vs_pandas(seed):
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(100 + seed)
    nl = int(rng.integers(500, GROUP + 200))
    nr = int(rng.integers(500, GROUP + 200))
    span = int(rng.integers(20, 3000))
    lv = rng.integers(-span, span, nl, dtype=np.int64).astype(np.int32)
    rv = rng.integers(-span, span, nr, dtype=np.int64).astype(np.int32)
    lscheme = ["raw", "nbit", "dict", "for"][seed % 4]
    rscheme = ["dict", "raw", "rle", "nbit"][seed % 4]
    if lscheme == "nbit" or rscheme == "nbit":
        lv, rv = np.abs(lv), np.abs(rv)
    if rscheme == "rle":
        rv = np.repeat(rv[: nr // 8 + 1], 8)[:nr]
    li, ri = join_indices(gt.encode(lv, lscheme, name="l"),
                          gt.encode(rv, rscheme, name="r"))
    m = pd.DataFrame({"k": lv, "li": np.arange(nl)}).merge(
        pd.DataFrame({"k": rv, "ri": np.arange(nr)}), on="k", how="inner")
    assert sorted(zip(li.tolist(), ri.tolist())) == sorted(
        zip(m["li"].tolist(), m["ri"].tolist()))


def test_join_nul_byte_string_keys():
    # b"a" and b"a\x00" are distinct keys; the fixed-width host sort must
    # not alias them (regression: S-dtype trailing-NUL padding paired them)
    lv = [b"a", b"a\x00"] * 200
    rv = [b"a", b"a\x00"] * 100
    lc = strings.encode_strings(lv, name="l")
    rc = strings.encode_strings(rv, name="r")
    check(lc, rc, lv, rv)


def test_left_outer_join_vs_pandas():
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(200)
    nl, nr = GROUP + 11, GROUP // 2 + 7
    lv = rng.integers(0, 300, nl, dtype=np.int64).astype(np.int32)
    rv = rng.integers(150, 450, nr, dtype=np.int64).astype(np.int32)
    li, ri = join_indices(gt.encode(lv, "nbit", name="l"),
                          gt.encode(rv, "nbit", name="r"), how="left")
    m = pd.DataFrame({"k": lv, "li": np.arange(nl)}).merge(
        pd.DataFrame({"k": rv, "ri": np.arange(nr)}), on="k", how="left")
    want_ri = m["ri"].fillna(-1).astype(np.int64)
    assert sorted(zip(li.tolist(), ri.tolist())) == sorted(
        zip(m["li"].tolist(), want_ri.tolist()))
    # every left row appears at least once; output is li-ordered
    assert np.array_equal(np.unique(li), np.arange(nl))
    assert (np.diff(li) >= 0).all()


def test_left_join_nullable_left_keys_kept():
    rng = np.random.default_rng(201)
    n = GROUP + 5
    lv = rng.integers(0, 40, n, dtype=np.int64).astype(np.int32)
    lm = rng.random(n) >= 0.2
    lc = gt.encode(lv, "nbit", name="l", valid=lm)
    rc = gt.encode(np.arange(20, dtype=np.int32), "raw", name="r")
    li, ri = join_indices(lc, rc, how="left")
    # null-key rows survive as unmatched
    null_rows = np.flatnonzero(~lm)
    assert set(null_rows) <= set(li[ri == -1])
    matched = lm & (lv < 20)
    assert set(li[ri >= 0]) == set(np.flatnonzero(matched))


def test_left_join_tables_placeholder_mask():
    rng = np.random.default_rng(202)
    nl, nr = 3000, 1000
    lk = rng.integers(0, 2000, nl, dtype=np.int64).astype(np.int32)
    rk = np.arange(nr, dtype=np.int32)
    rx = (rk * 3).astype(np.int32)
    tl = Table([gt.encode(lk, "raw", name="k")])
    tr = Table([gt.encode(rk, "raw", name="k"), gt.encode(rx, "raw", name="x")])
    rows, li, ri = tl.join("k", tr, how="left")
    matched = ri >= 0
    np.testing.assert_array_equal(rows["x"][matched], lk[li][matched] * 3)
    assert (lk[li][~matched] >= nr).all()


def test_full_outer_join_vs_pandas():
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(203)
    nl, nr = GROUP // 2 + 9, GROUP // 2 + 17
    lv = rng.integers(0, 200, nl, dtype=np.int64).astype(np.int32)
    rv = rng.integers(100, 300, nr, dtype=np.int64).astype(np.int32)
    li, ri = join_indices(gt.encode(lv, "nbit", name="l"),
                          gt.encode(rv, "nbit", name="r"), how="outer")
    m = pd.DataFrame({"k": lv, "li": np.arange(nl)}).merge(
        pd.DataFrame({"k": rv, "ri": np.arange(nr)}), on="k", how="outer")
    want = sorted(zip(m["li"].fillna(-1).astype(np.int64).tolist(),
                      m["ri"].fillna(-1).astype(np.int64).tolist()))
    assert sorted(zip(li.tolist(), ri.tolist())) == want
    # every row of both sides appears
    assert set(li[li >= 0]) == set(range(nl))
    assert set(ri[ri >= 0]) == set(range(nr))


def test_sort_by_multi_key():
    from giddy_tpu.table import Table
    from giddy_tpu import strings as st

    rng = np.random.default_rng(204)
    n = GROUP + 13
    reg = [["e", "w"][i] for i in rng.integers(0, 2, n)]
    amt = rng.integers(0, 50, n, dtype=np.int64).astype(np.int32)
    t = Table([st.encode_strings(reg, name="r"), gt.encode(amt, "nbit", name="a")])
    ts = t.sort_by(["r", "a"], ascending=[True, False])
    got_r = ts.select(["r"])["r"].tolist()
    got_a = ts.select(["a"])["a"]
    order = np.lexsort((np.arange(n), -amt, np.array([x == "w" for x in reg])))
    want_r = [reg[i] for i in order]
    want_a = amt[order]
    assert got_r == want_r
    np.testing.assert_array_equal(got_a, want_a)


def test_outer_join_empty_side():
    # LEFT/OUTER against an empty side must not crash on the placeholder
    # take (regression: row-0 clamp indexed into an n=0 column)
    lv = np.arange(5, dtype=np.int32)
    tl = Table([gt.encode(lv, "raw", name="k")])
    tr = Table([gt.encode(np.empty(0, np.int32), "raw", name="k"),
                gt.encode(np.empty(0, np.int32), "raw", name="x")])
    rows, li, ri = tl.join("k", tr, how="left")
    assert (ri == -1).all() and np.array_equal(li, np.arange(5))
    np.testing.assert_array_equal(rows["k"], lv)
    assert rows["x"].shape == (5,)
    # outer with empty LEFT: all right rows appended with li = -1
    rows2, li2, ri2 = tr.join("k", tl, how="outer", other_select=["k"])
    assert (li2 == -1).all() and set(ri2.tolist()) == set(range(5))


def test_sorted_factorize_na_handling():
    from giddy_tpu.util import sorted_factorize

    u, c = sorted_factorize(np.array([1.0, np.nan, 2.0, np.nan]))
    nu, nc = np.unique(np.array([1.0, np.nan, 2.0, np.nan]), return_inverse=True)
    np.testing.assert_array_equal(u, nu)
    np.testing.assert_array_equal(c, nc)


def test_join_table_encoded_nulls_left():
    """join_table materializes LEFT OUTER unmatched cells as encoded NULL
    rows (validity bitmaps) that round-trip the container (VERDICT r1 #9)."""
    rng = np.random.default_rng(301)
    nl, nr = 2500, 900
    lk = rng.integers(0, 1800, nl, dtype=np.int64).astype(np.int32)
    rk = np.arange(nr, dtype=np.int32)
    rx = (rk * 3 + 1).astype(np.int32)
    tl = Table([gt.encode(lk, "raw", name="k")])
    tr = Table([gt.encode(rk, "raw", name="k"), gt.encode(rx, "raw", name="x")])
    out = tl.join_table("k", tr, how="left")
    from giddy_tpu import nulls

    assert out.n == nl
    xcol = out["x"]
    assert nulls.is_nullable(xcol)
    valid = nulls.valid_mask(xcol)
    np.testing.assert_array_equal(valid, lk < nr)  # matched iff key exists
    vals = np.asarray(gt.decode(xcol))
    np.testing.assert_array_equal(vals[valid], lk[valid] * 3 + 1)
    # container round-trip preserves the null story
    import io

    from giddy_tpu.format import read_container, write_container

    buf = io.BytesIO()
    write_container(list(out._cols.values()), buf)
    cols2 = read_container(buf.getvalue())
    x2 = [c for c in cols2 if c.name == "x"][0]
    np.testing.assert_array_equal(nulls.valid_mask(x2), valid)
    # null-aware aggregates work on the joined output directly
    assert out.agg("x", "count") == int(valid.sum())


def test_join_table_outer_and_null_propagation():
    """FULL OUTER: left cells null on right-only rows; source nulls
    propagate through the join."""
    lk = np.array([1, 2, 3, 4], np.int32)
    lv = np.array([10, 20, 30, 40], np.int32)
    lvalid = np.array([True, False, True, True])
    rk = np.array([3, 4, 5], np.int32)
    tl = Table([gt.encode(lk, "raw", name="k"),
                gt.encode(lv, "raw", name="v", valid=lvalid)])
    tr = Table([gt.encode(rk, "raw", name="k")])
    out = tl.join_table("k", tr, how="outer", other_select=["k"])
    from giddy_tpu import nulls

    assert out.n == 5  # 2 matched + 2 left-only + 1 right-only
    kvalid = nulls.valid_mask(out["k"])
    assert kvalid.sum() == 4  # left key null on the appended right-only row
    vvalid = nulls.valid_mask(out["v"])
    # v is null where the source was null (the k=2 row) and on the
    # appended right-only row: 5 rows - 2 nulls = 3 valid
    assert int(vvalid.sum()) == 3
    df = out.to_pandas()
    assert df["v"].isna().sum() == 2
