"""Differential fuzz: random tables × random queries vs pandas.

One generator builds tables mixing schemes, dtypes, strings and nulls;
random predicate sets then drive count/select/agg/groupby through the
device scan stack and every answer is recomputed with pandas/NumPy
semantics. Catches cross-feature interactions no targeted test covers.
"""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import strings
from giddy_tpu.table import Table
from giddy_tpu.util import GROUP


def _rand_table(rng, n):
    """(Table, dict of logical numpy columns, dict of valid masks)."""
    cols, data, masks = [], {}, {}
    # numeric column 1: skewed ints, random scheme
    v1 = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
    s1 = rng.choice(["nbit", "for", "raw", "dzbv", "patched"])
    m1 = (rng.random(n) >= 0.15) if rng.random() < 0.5 else None
    cols.append(gt.encode(v1, s1, name="a", valid=m1))
    data["a"], masks["a"] = v1, m1
    # numeric column 2: runs (rle/cascade/dict families)
    v2 = np.repeat(rng.integers(-20, 20, n // 30 + 1).astype(np.int32), 30)[:n]
    s2 = rng.choice(["rle", "rpe", "dict", "cascade", "bitmap"])
    if s2 == "bitmap":
        v2 = np.abs(v2) % 4  # low cardinality
    m2 = (rng.random(n) >= 0.1) if rng.random() < 0.5 else None
    cols.append(gt.encode(v2, s2, name="b", valid=m2))
    data["b"], masks["b"] = v2, m2
    # string column
    words = ["apple", "bee", "cat", "dog", "elk", "fox"]
    sv = [words[i] for i in rng.integers(0, len(words), n)]
    ms = (rng.random(n) >= 0.1) if rng.random() < 0.5 else None
    cols.append(strings.encode_strings(sv, name="s", valid=ms))
    data["s"], masks["s"] = np.array(sv, object), ms
    return Table(cols), data, masks


def _np_pred(data, masks, name, op, value):
    v = data[name]
    m = {"eq": v == value, "ne": v != value, "lt": v < value,
         "le": v <= value, "gt": v > value, "ge": v >= value}[op]
    if masks[name] is not None:
        m = m & masks[name]
    return m


def _rand_pred(rng, data):
    name = rng.choice(["a", "b", "s"])
    op = rng.choice(["eq", "ne", "lt", "le", "gt", "ge"])
    if name == "s":
        value = ["apple", "bee", "cat", "dog", "elk", "fox"][rng.integers(0, 6)]
    elif name == "a":
        value = int(rng.integers(0, 1000))
    else:
        value = int(rng.integers(-20, 20))
    return (name, op, value)


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_scan_stack_vs_numpy(seed):
    rng = np.random.default_rng(3000 + seed)
    n = int(rng.integers(GROUP // 2, 2 * GROUP + 500))
    t, data, masks = _rand_table(rng, n)

    for _ in range(4):
        preds = [_rand_pred(rng, data) for _ in range(int(rng.integers(1, 4)))]
        want = np.ones(n, bool)
        for p in preds:
            want &= _np_pred(data, masks, *p)
        assert t.count(*preds) == int(want.sum()), preds
        # OR of the same predicates
        want_or = np.zeros(n, bool)
        for p in preds:
            want_or |= _np_pred(data, masks, *p)
        from giddy_tpu.query import count_bits

        assert count_bits(t.where_any(*preds), n) == int(want_or.sum()), preds
        # select a numeric column under the AND (null cells materialize
        # their canonical fill, so compare against the filled expectation)
        from giddy_tpu.nulls import fill_nulls

        exp_a = (data["a"] if masks["a"] is None
                 else fill_nulls(data["a"], masks["a"]))
        rows = t.select(["a"], None, *preds)
        np.testing.assert_array_equal(rows["a"], exp_a[want], err_msg=str(preds))

    # aggregates incl. null skipping
    av, am = data["a"], masks["a"]
    valid_a = av if am is None else av[am]
    assert t.agg("a", "sum") == int(valid_a.astype(np.int64).sum())
    assert t.agg("a", "min") == int(valid_a.min())
    assert t.agg("a", "max") == int(valid_a.max())
    assert t.agg("a", "count") == valid_a.size

    # groupby string key x numeric measure under a random predicate
    p = _rand_pred(rng, data)
    bm_np = _np_pred(data, masks, *p)
    r = t.groupby("s", "a", ("count", "sum"), p)
    key_mask = np.ones(n, bool) if masks["s"] is None else masks["s"]
    a_mask = np.ones(n, bool) if masks["a"] is None else masks["a"]
    for j, k in enumerate(r.keys):
        sel = bm_np & key_mask & a_mask & (data["s"] == k)
        assert r.count[j] == int(sel.sum()), (p, k)
        assert r.sum[j] == int(av[sel].astype(np.int64).sum()), (p, k)
