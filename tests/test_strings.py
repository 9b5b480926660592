"""String columns (strings.py): dictionary-encoded text, predicate
pushdown over the dictionary, GROUP BY with string keys, nullability."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import strings
from giddy_tpu.util import GROUP


WORDS = [b"alpha", b"bravo", b"charlie", b"delta", b"echo", b"fox", b"golf", b"hotel"]


def _col(n, rng, kind="bytes", codes_scheme="rle"):
    if kind == "str":
        vocab = [w.decode() for w in WORDS]
    else:
        vocab = WORDS
    # runs suit the rle inner scheme
    idx = np.repeat(rng.integers(0, len(vocab), max(1, n // 50)), 50)[:n]
    idx = np.pad(idx, (0, n - idx.size), constant_values=0)
    vals = [vocab[i] for i in idx]
    return vals, strings.encode_strings(vals, codes_scheme=codes_scheme, name="s")


def test_roundtrip_and_container():
    rng = np.random.default_rng(0)
    n = 2 * GROUP + 17
    vals, col = _col(n, rng)
    assert col.scheme == "strdict"
    np.testing.assert_array_equal(strings.decode_ref(col), np.array(vals, object))
    np.testing.assert_array_equal(gt.decode(col), np.array(vals, object))
    # container round-trip (registry entry makes strdict self-describing)
    cols2 = gt.read_container(gt.container_bytes([col]))
    np.testing.assert_array_equal(gt.decode_ref(cols2[0]), np.array(vals, object))


def test_str_kind_roundtrip():
    rng = np.random.default_rng(1)
    vals, col = _col(GROUP + 5, rng, kind="str", codes_scheme="nbit")
    assert col.params["kind"] == "str"
    out = strings.decode(col)
    assert out[0] == vals[0] and isinstance(out[0], str)
    np.testing.assert_array_equal(out, np.array(vals, object))


@pytest.mark.parametrize("op,value,pyop", [
    ("eq", b"delta", lambda e, v: e == v),
    ("ne", b"delta", lambda e, v: e != v),
    ("lt", b"charlie", lambda e, v: e < v),
    ("ge", b"echo", lambda e, v: e >= v),
    ("startswith", b"c", lambda e, v: e.startswith(v)),
    ("contains", b"o", lambda e, v: v in e),
])
def test_string_predicates(op, value, pyop):
    rng = np.random.default_rng(2)
    n = 3 * GROUP + 41
    vals, col = _col(n, rng)
    want = sum(1 for e in vals if pyop(e, value))
    assert strings.count_where_str(col, op, value) == want
    sel = strings.select_where_str(col, op, value)
    assert len(sel) == want and all(pyop(e, value) for e in sel)


def test_string_predicates_absent_value():
    rng = np.random.default_rng(3)
    vals, col = _col(GROUP, rng)
    assert strings.count_where_str(col, "eq", b"zulu") == 0
    assert strings.count_where_str(col, "ne", b"zulu") == len(vals)


def test_string_groupby():
    from giddy_tpu.groupby import group_reduce

    rng = np.random.default_rng(4)
    n = 2 * GROUP + 13
    vals, keys = _col(n, rng)
    mv = rng.integers(-1000, 1000, n, dtype=np.int64).astype(np.int32)
    vc = gt.encode(mv, "raw")
    res = group_reduce(keys, vc, ("count", "sum", "min", "max"))
    va = np.array(vals, object)
    for i, kv in enumerate(res.keys):
        rows = va == kv
        assert res.count[i] == int(rows.sum())
        if rows.any():
            assert res.sum[i] == int(mv[rows].astype(np.int64).sum())
            assert res.min[i] == int(mv[rows].min())
            assert res.max[i] == int(mv[rows].max())


def test_string_minmax_distinct():
    rng = np.random.default_rng(5)
    vals, col = _col(GROUP + 9, rng)
    assert strings.min_str(col) == min(vals)
    assert strings.max_str(col) == max(vals)
    assert strings.distinct_count_str(col) == len(set(vals))


def test_nullable_strings():
    from giddy_tpu import nulls

    rng = np.random.default_rng(6)
    n = 2 * GROUP + 7
    if True:
        vocab = WORDS
        idx = rng.integers(0, len(vocab), n)
        vals = [vocab[i] for i in idx]
    m = rng.random(n) >= 0.15
    m[:2] = False
    col = strings.encode_strings(vals, codes_scheme="nbit", valid=m)
    assert nulls.is_nullable(col)
    va = np.array(vals, object)
    # SQL: null rows never match
    assert strings.count_where_str(col, "eq", b"alpha") == int(((va == b"alpha") & m).sum())
    assert strings.count_where_str(col, "ge", b"delta") == sum(
        1 for e, ok in zip(vals, m) if ok and e >= b"delta"
    )
    out, mask = strings.decode_masked_strings(col)
    np.testing.assert_array_equal(mask, m)
    first = int(np.flatnonzero(m)[0])
    assert out[0] == vals[first]  # leading nulls back-fill
    # groupby excludes null keys
    from giddy_tpu.groupby import group_reduce

    res = group_reduce(col, None, ("count",))
    assert int(res.count.sum()) == int(m.sum())


def test_all_null_strings():
    col = strings.encode_strings([b"x", b"y"], valid=np.zeros(2, bool))
    assert strings.distinct_count_str(col) == 0
    with pytest.raises(ValueError, match="all-null"):
        strings.min_str(col)
