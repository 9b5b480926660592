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


def test_isin_and_semi_join():
    rng = np.random.default_rng(5)
    n = GROUP + 33
    t, ts, amount, status = _table(n, rng)
    from giddy_tpu.query import count_bits

    want_vals = [b"ok", b"err"]
    bm = t.isin("status", want_vals)
    assert count_bits(bm, n) == int(np.isin(status, want_vals).sum())

    # large numeric set -> the device binary-search path
    vals = rng.choice(10_000, 200, replace=False).tolist()
    bm = t.isin("amount", vals)
    assert count_bits(bm, n) == int(np.isin(amount, vals).sum())

    # semi-join: rows of t whose amount appears in another table's column
    other_amounts = rng.integers(0, 10_000, 500, dtype=np.int64).astype(np.int32)
    other = Table([gt.encode(other_amounts, "nbit", name="amt2")])
    bm = t.semi_join("amount", other, "amt2")
    assert count_bits(bm, n) == int(np.isin(amount, other_amounts).sum())

    # dictionary-backed probe side: cascade column joined against raw
    kv = np.array([3, 7, 11, 20, 40, 55], np.int32)[rng.integers(0, 6, n)]
    t2 = Table([gt.encode(kv, "cascade", name="k")])
    build = gt.encode(np.array([7, 40, 999], np.int32), "raw", name="b")
    bm = t2.semi_join("k", build)
    assert count_bits(bm, n) == int(np.isin(kv, [7, 40]).sum())

    # string semi-join against another string column
    other_status = strings.encode_strings([b"ok", b"ok", b"new"], name="s2")
    bm = t.semi_join("status", other_status)
    assert count_bits(bm, n) == int(np.isin(status, [b"ok", b"new"]).sum())


def test_dict_mask_fragmented_lut():
    from giddy_tpu.query import count_bits, dict_mask_bitmap

    rng = np.random.default_rng(6)
    n = GROUP + 9
    vocab = (np.arange(64, dtype=np.int32) * 3) - 50
    v = vocab[rng.integers(0, 64, n)]
    col = gt.encode(v, "dict", name="d")
    mask = rng.random(64) < 0.5  # fragmented: forces the lookup-table path
    assert int(np.flatnonzero(np.diff(mask.astype(np.int8), prepend=0, append=0)).size) > 16
    bm = dict_mask_bitmap(col, mask)
    assert count_bits(bm, n) == int(np.isin(v, vocab[mask]).sum())


def test_isin_narrow_and_nullable():
    from giddy_tpu.query import count_bits, isin_bitmap

    rng = np.random.default_rng(7)
    n = GROUP + 5
    v = rng.integers(-100, 100, n, dtype=np.int64).astype(np.int32)
    m = rng.random(n) >= 0.2
    col = gt.encode(v, "raw", valid=m)
    vals = list(range(-50, -20)) + [999999]  # >8 values: searchsorted path
    bm = isin_bitmap(col, vals)
    assert count_bits(bm, n) == int((np.isin(v, vals) & m).sum())


def test_to_pandas_with_nulls():
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(8)
    n = GROUP + 3
    v = rng.integers(0, 100, n, dtype=np.int64).astype(np.int32)
    m = rng.random(n) >= 0.3
    t = Table([gt.encode(v, "raw", name="x", valid=m),
               gt.encode(v * 2, "raw", name="y")])
    df = t.to_pandas()
    assert len(df) == n
    assert int(df["x"].isna().sum()) == int((~m).sum())
    np.testing.assert_array_equal(df["y"].to_numpy(), v * 2)
    # filtered materialization
    df2 = t.to_pandas(None, ("y", "lt", 50))
    sel = v * 2 < 50
    assert len(df2) == int(sel.sum())
    assert int(df2["x"].isna().sum()) == int((~m & sel).sum())


def test_table_from_arrays_and_pandas():
    rng = np.random.default_rng(21)
    n = GROUP + 27
    ids = rng.permutation(n).astype(np.int64) + 3_000_000_000  # 64-bit
    amount = rng.integers(0, 500, n, dtype=np.int64).astype(np.int32)
    status = [["ok", "err", "new"][i] for i in rng.integers(0, 3, n)]
    t = Table.from_arrays({"id": ids, "amount": amount, "status": status})
    assert t["id"].scheme == "wide"
    assert t["status"].scheme == "strdict"
    np.testing.assert_array_equal(t.select(["id"])["id"], ids)
    np.testing.assert_array_equal(t.select(["amount"])["amount"], amount)
    assert t.select(["status"])["status"].tolist() == status

    # pandas round trip incl. missing values
    import pandas as pd

    na = rng.random(n) < 0.1
    amt = pd.array(amount, dtype="Int32")
    amt[na] = pd.NA
    sv = pd.array(status, dtype=object)
    sv[na] = None
    df = pd.DataFrame({"amount": amt, "status": sv})
    t2 = Table.from_pandas(df)
    from giddy_tpu.nulls import is_nullable, valid_mask

    assert is_nullable(t2["amount"]) and is_nullable(t2["status"])
    np.testing.assert_array_equal(valid_mask(t2["amount"]), ~na)
    back = t2.to_pandas()
    assert back["amount"].isna().to_numpy().tolist() == na.tolist()
    got = back["amount"].to_numpy()
    np.testing.assert_array_equal(
        np.asarray([x for x, m in zip(got, na) if not m], np.int64),
        amount[~na].astype(np.int64),
    )


def test_table_from_arrays_explicit_scheme_and_valid():
    rng = np.random.default_rng(22)
    n = GROUP + 3
    v = np.repeat(rng.integers(0, 6, n // 50 + 1).astype(np.int32), 50)[:n]
    m = rng.random(n) >= 0.2
    t = Table.from_arrays({"st": (v, m)}, schemes={"st": "rle"})
    assert t["st"].scheme == "rle"
    from giddy_tpu.nulls import is_nullable

    assert is_nullable(t["st"])
    assert t.count(("st", "ge", 0)) == int(m.sum())


def test_cli_import_export_roundtrip(tmp_path, capsys):
    import pandas as pd

    from giddy_tpu.cli import main

    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({
        "id": np.arange(n) + 3_000_000_000,
        "amount": rng.integers(0, 500, n),
        "status": [["ok", "err", "new"][i] for i in rng.integers(0, 3, n)],
    })
    csv, gtp, back = tmp_path / "t.csv", tmp_path / "t.gtp", tmp_path / "b.csv"
    df.to_csv(csv, index=False)
    main(["import", str(csv), "--out", str(gtp)])
    out = capsys.readouterr().out
    assert "3 columns x 5000 rows" in out
    assert "status=strdict" in out
    assert "amount=wide" not in out  # int64 CSV default downcast to 32-bit
    main(["export", str(gtp), "--out", str(back)])
    b = pd.read_csv(back)
    np.testing.assert_array_equal(df["id"], b["id"])
    np.testing.assert_array_equal(df["amount"], b["amount"])
    assert (df["status"] == b["status"]).all()


def test_from_pandas_datetime_roundtrip():
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(24)
    n = 3000
    ts = pd.date_range("2024-01-01", periods=n, freq="s")
    df = pd.DataFrame({"when": ts, "x": rng.integers(0, 9, n)})
    df.loc[rng.integers(0, n, 100), "when"] = pd.NaT
    t = Table.from_pandas(df)
    assert t["when"].scheme == "wide"
    assert t["when"].params["logical"].startswith("datetime64")
    back = t.to_pandas()
    assert str(back["when"].dtype).startswith("datetime64")
    na = df["when"].isna()
    assert (back["when"].isna() == na).all()
    assert (back["when"][~na] == df["when"][~na]).all()


def test_from_pandas_scheme_override_still_downcasts():
    pd = pytest.importorskip("pandas")
    df = pd.DataFrame({"amount": np.arange(2000) % 500})  # int64 by default
    t = Table.from_pandas(df, schemes={"amount": "nbit"})
    assert t["amount"].scheme == "nbit" and t["amount"].dtype == "int32"
    assert t.agg("amount", "max") == 499


def test_join_non_ascii_string_keys():
    from giddy_tpu.join import join_indices
    from giddy_tpu import strings

    lv = ["héllo", "wörld", "héllo", "naïve"]
    rv = ["wörld", "héllo"]
    lc = strings.encode_strings(lv * 300, name="l")
    rc = strings.encode_strings(rv * 100, name="r")
    li, ri = join_indices(lc, rc)
    lva, rva = np.array(lv * 300, object), np.array(rv * 100, object)
    assert li.size == sum(int((rva == x).sum()) for x in lva if x in rv)
    assert all(lva[i] == rva[j] for i, j in zip(li[:50], ri[:50]))


def test_table_sort_by():
    rng = np.random.default_rng(25)
    n = GROUP + 55
    v = rng.integers(0, 300, n, dtype=np.int64).astype(np.int32)
    w = rng.standard_normal(n).astype(np.float32)
    s = [["x", "y", "z"][i] for i in rng.integers(0, 3, n)]
    m = rng.random(n) >= 0.1
    t = Table.from_arrays({"v": (v, m), "w": w, "s": s})
    ts = t.sort_by("v")
    # nulls last (in original order), valid ascending and stable
    valid_idx, null_idx = np.flatnonzero(m), np.flatnonzero(~m)
    order = np.concatenate([valid_idx[np.argsort(v[m], kind="stable")], null_idx])
    got = ts.select(["v", "w", "s"])
    np.testing.assert_array_equal(got["w"], w[order])
    assert got["s"].tolist() == [s[i] for i in order]
    from giddy_tpu.nulls import valid_mask

    np.testing.assert_array_equal(valid_mask(ts["v"]), m[order])
    nvalid = int(m.sum())
    np.testing.assert_array_equal(got["v"][:nvalid], np.sort(v[m]))

    # descending on the string column sorts by bytes-lex descending
    td = t.sort_by("s", ascending=False)
    sd = td.select(["s"])["s"].tolist()
    assert sd == sorted(s, reverse=True)

    # sorted numeric column now delta/rle-friendly and zone-map sorted
    from giddy_tpu.zonemap import zone_map

    assert zone_map(ts["v"]).sorted_ or int(m.sum()) < n  # nulls pad the tail


def test_where_between_isin_and_or():
    from giddy_tpu.query import count_bits

    rng = np.random.default_rng(26)
    n = GROUP + 19
    t, ts, amount, status = _table(n, rng)
    lo, hi = 2000, 7000
    bm = t.where("amount", "between", (lo, hi))
    assert count_bits(bm, n) == int(((amount >= lo) & (amount <= hi)).sum())
    assert t.count(("amount", "between", (lo, hi)), ("status", "ne", b"err")) == int(
        ((amount >= lo) & (amount <= hi) & (status != b"err")).sum())
    vals = [5, 77, 4242]
    bm = t.where("amount", "isin", vals)
    assert count_bits(bm, n) == int(np.isin(amount, vals).sum())
    # string between via dictionary ranges
    bm = t.where("status", "between", (b"err", b"new"))
    assert count_bits(bm, n) == int(((status >= b"err") & (status <= b"new")).sum())
    # OR composition
    bm = t.where_any(("amount", "lt", 100), ("status", "eq", b"err"))
    assert count_bits(bm, n) == int(((amount < 100) | (status == b"err")).sum())


def test_table_filter_materializes_new_table():
    rng = np.random.default_rng(27)
    n = GROUP + 31
    t, ts, amount, status = _table(n, rng)
    thr = int(np.median(amount))
    t2 = t.filter(("amount", "ge", thr), ("status", "ne", b"err"))
    m = (amount >= thr) & (status != b"err")
    assert len(t2) == int(m.sum())
    np.testing.assert_array_equal(t2.select(["ts"])["ts"], ts[m])
    assert t2.select(["status"])["status"].tolist() == list(np.array(status, object)[m])
    # the filtered table is itself scannable
    assert t2.count(("amount", "lt", thr + 500)) == int(
        (amount[m] < thr + 500).sum())
    with pytest.raises(ValueError, match="no rows"):
        t.filter(("amount", "lt", -1))


def test_from_pandas_tz_aware_datetime():
    pd = pytest.importorskip("pandas")
    ts = pd.date_range("2024-03-01", periods=2000, freq="h", tz="US/Eastern")
    df = pd.DataFrame({"when": ts})
    t = Table.from_pandas(df)
    assert t["when"].params["logical"].startswith("datetime64")
    back = t.to_pandas()
    # round-trips as naive UTC instants
    want = ts.tz_convert("UTC").tz_localize(None)
    assert (back["when"] == pd.Series(want)).all()
