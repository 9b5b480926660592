"""Table façade (table.py): multi-column scans, mixed numeric/string
predicates, groupby, top-k with row materialization."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import strings
from giddy_tpu.table import Table
from giddy_tpu.util import GROUP

from helpers import gen_column


def _table(n, rng):
    ts = gen_column("delta", n, rng)
    amount = rng.integers(0, 10_000, n, dtype=np.int64).astype(np.int32)
    status_v = [b"err", b"new", b"ok"]
    idx = np.repeat(rng.integers(0, 3, n // 30 + 1), 30)[:n]
    status = [status_v[i] for i in idx]
    cols = [
        gt.encode(ts, "delta", name="ts"),
        gt.encode(amount, "nbit", name="amount"),
        strings.encode_strings(status, codes_scheme="rle", name="status"),
    ]
    return Table(cols), ts, amount, np.array(status, object)


def test_table_basic():
    rng = np.random.default_rng(0)
    n = 2 * GROUP + 19
    t, ts, amount, status = _table(n, rng)
    assert t.names == ["ts", "amount", "status"] and len(t) == n
    # container round-trip through the façade
    t2 = Table.read(t.to_bytes())
    assert t2.names == t.names and t2.n == n

    thr = int(np.median(amount))
    assert t.count(("amount", "lt", thr)) == int((amount < thr).sum())
    # multi-column AND across numeric + string predicates
    want = int(((amount < thr) & (status == b"ok")).sum())
    assert t.count(("amount", "lt", thr), ("status", "eq", b"ok")) == want


def test_table_select_rows():
    rng = np.random.default_rng(1)
    n = GROUP + 41
    t, ts, amount, status = _table(n, rng)
    thr = int(np.median(amount))
    rows = t.select(["ts", "status"], None, ("amount", "ge", thr), ("status", "ne", b"err"))
    m = (amount >= thr) & (status != b"err")
    np.testing.assert_array_equal(rows["ts"], ts[m])
    np.testing.assert_array_equal(rows["status"], status[m])
    # no-predicate select decodes everything
    full = t.select(["amount"])
    np.testing.assert_array_equal(full["amount"], amount)


def test_table_agg_and_groupby():
    rng = np.random.default_rng(2)
    n = GROUP + 7
    t, ts, amount, status = _table(n, rng)
    assert t.agg("amount", "sum") == int(amount.astype(np.int64).sum())
    assert t.agg("status", "min") == b"err"
    assert t.agg("status", "distinct") == len(set(status.tolist()))
    with pytest.raises(ValueError, match="string columns"):
        t.agg("status", "sum")

    thr = int(np.median(amount))
    r = t.groupby("status", "amount", ("count", "sum"), ("amount", "lt", thr))
    m = amount < thr
    for i, kv in enumerate(r.keys):
        rows = m & (status == kv)
        assert r.count[i] == int(rows.sum())
        assert r.sum[i] == int(amount[rows].astype(np.int64).sum())


def test_table_top_k_with_rows():
    rng = np.random.default_rng(3)
    n = GROUP + 11
    t, ts, amount, status = _table(n, rng)
    vals, pos, rows = t.top_k("amount", 5, largest=True, select=["ts", "status"])
    np.testing.assert_array_equal(vals, np.sort(amount)[::-1][:5])
    np.testing.assert_array_equal(rows["ts"], ts[pos])
    np.testing.assert_array_equal(rows["status"], status[pos])


def test_table_validation():
    a = gt.encode(np.arange(10, dtype=np.int32), "raw", name="a")
    b = gt.encode(np.arange(20, dtype=np.int32), "raw", name="b")
    with pytest.raises(ValueError, match="n="):
        Table([a, b])
    with pytest.raises(ValueError, match="duplicate"):
        Table([a, a])
    t = Table([a])
    with pytest.raises(KeyError, match="no column"):
        t["zzz"]
