"""Partitioned datasets (dataset.py): manifest zones, partition pruning,
merged scans."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.dataset import Dataset, _prune
from giddy_tpu.table import Table
from giddy_tpu.util import GROUP


def _part(lo, hi, n, rng, seed_keys=("a", "b", "c")):
    ts = np.sort(rng.integers(lo, hi, n)).astype(np.int32)
    amt = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
    key = [seed_keys[i] for i in rng.integers(0, len(seed_keys), n)]
    from giddy_tpu import strings

    return Table([
        gt.encode(ts, "delta", name="ts"),
        gt.encode(amt, "nbit", name="amt"),
        strings.encode_strings(key, name="key"),
    ]), ts, amt, np.array(key, object)


def test_prune_verdicts():
    z = [10, 20]
    assert _prune(z, "lt", 10) == "skip" and _prune(z, "lt", 21) == "all"
    assert _prune(z, "lt", 15) == "scan"
    assert _prune(z, "ge", 21) == "skip" and _prune(z, "ge", 10) == "all"
    assert _prune(z, "eq", 5) == "skip" and _prune(z, "eq", 15) == "scan"
    assert _prune([7, 7], "eq", 7) == "all" and _prune([7, 7], "ne", 7) == "skip"
    assert _prune(None, "lt", 0) == "scan"


def test_dataset_write_scan_agg(tmp_path):
    rng = np.random.default_rng(0)
    n = GROUP // 2 + 13
    parts, tss, amts, keys = [], [], [], []
    for k, (lo, hi) in enumerate([(0, 1000), (2000, 3000), (5000, 6000)]):
        t, ts, amt, key = _part(lo, hi, n + k, rng)
        parts.append(t)
        tss.append(ts); amts.append(amt); keys.append(key)
    ds = Dataset.write(str(tmp_path / "d"), parts)
    assert ds.n_partitions == 3 and len(ds) == 3 * n + 3
    ts_all = np.concatenate(tss); amt_all = np.concatenate(amts)
    key_all = np.concatenate(keys)

    # reopen from disk
    ds = Dataset.open(str(tmp_path / "d"))
    # partition pruning: predicate only partition 1 can match
    plan = ds._plan([("ts", "ge", 2000), ("ts", "lt", 3000)])
    assert [v for _, v in plan] == ["skip", "all", "skip"]
    assert ds.count(("ts", "ge", 2000), ("ts", "lt", 3000)) == int(
        ((ts_all >= 2000) & (ts_all < 3000)).sum())
    # mixed scan/all/skip
    thr = 500
    assert ds.count(("ts", "ge", thr)) == int((ts_all >= thr).sum())
    assert ds.count(("amt", "lt", 300), ("ts", "lt", 2500)) == int(
        ((amt_all < 300) & (ts_all < 2500)).sum())

    # aggregates: min/max straight from the manifest
    assert ds.agg("ts", "min") == int(ts_all.min())
    assert ds.agg("ts", "max") == int(ts_all.max())
    assert ds.agg("amt", "sum") == int(amt_all.astype(np.int64).sum())
    assert ds.agg("amt", "count") == amt_all.size
    assert abs(ds.agg("amt", "avg") - amt_all.mean()) < 1e-9
    assert ds.agg("key", "distinct") == 3

    # select across partitions, pruned
    rows = ds.select(["ts", "key"], ("ts", "ge", 2000), ("ts", "lt", 3000))
    m = (ts_all >= 2000) & (ts_all < 3000)
    np.testing.assert_array_equal(rows["ts"], ts_all[m])
    np.testing.assert_array_equal(rows["key"], key_all[m])

    # groupby merged across partitions (string keys), with a filter
    r = ds.groupby("key", "amt", ("count", "sum", "min", "max"), ("amt", "ge", 100))
    mm = amt_all >= 100
    for j, k in enumerate(r.keys):
        sel = amt_all[mm & (key_all == k)]
        assert r.count[j] == sel.size
        assert r.sum[j] == int(sel.astype(np.int64).sum())
        assert r.min[j] == sel.min() and r.max[j] == sel.max()


def test_dataset_append_and_pandas(tmp_path):
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(1)
    n = 4000
    df = pd.DataFrame({
        "x": rng.integers(0, 100, 3 * n),
        "s": [["p", "q"][i] for i in rng.integers(0, 2, 3 * n)],
    })
    ds = Dataset.from_pandas(str(tmp_path / "d"), df, rows_per_partition=n)
    assert ds.n_partitions == 3 and len(ds) == 3 * n
    assert ds.count(("x", "lt", 50)) == int((df["x"] < 50).sum())
    back = ds.to_pandas(("x", "ge", 90))
    sel = df[df["x"] >= 90].reset_index(drop=True)
    np.testing.assert_array_equal(back["x"].to_numpy(), sel["x"].to_numpy())
    assert (back["s"] == sel["s"]).all()

    # append one more partition; manifest and scans update
    t, ts, amt, key = _part(9000, 9500, 1000, rng)
    with pytest.raises(ValueError, match="partition columns"):
        ds.append(t)
    extra = pd.DataFrame({"x": np.arange(1000) % 100, "s": ["p"] * 1000})
    ds.append(Table.from_pandas(extra))
    assert len(ds) == 3 * n + 1000
    ds2 = Dataset.open(str(tmp_path / "d"))
    assert ds2.n_partitions == 4
    assert ds2.count(("x", "lt", 50)) == int((df["x"] < 50).sum()) + 500


def test_dataset_write_refuses_overwrite(tmp_path):
    rng = np.random.default_rng(2)
    t, *_ = _part(0, 10, 100, rng)
    Dataset.write(str(tmp_path / "d"), [t])
    with pytest.raises(FileExistsError):
        Dataset.write(str(tmp_path / "d"), [t])
    Dataset.write(str(tmp_path / "d"), [t], overwrite=True)


def test_prune_stages_values_like_the_device(tmp_path):
    # int column of constant 2: device 'lt 2.5' truncates to x<2 -> 0 rows;
    # the zone verdict must agree (regression: raw-python compare said 'all')
    t = Table([gt.encode(np.full(500, 2, np.int32), "raw", name="x")])
    ds = Dataset.write(str(tmp_path / "di"), [t])
    assert ds.count(("x", "lt", 2.5)) == Table([t["x"]]).count(("x", "lt", 2.5)) == 0
    assert ds.count(("x", "le", 2.5)) == 500  # le stages to le 2 -> all

    # float32 column of 1.0: a double just above 1.0 rounds to 1.0f
    tf = Table([gt.encode(np.full(400, 1.0, np.float32), "raw", name="f")])
    dsf = Dataset.write(str(tmp_path / "df"), [tf])
    v = 1.0000000000000002
    assert dsf.count(("f", "lt", v)) == Table([tf["f"]]).count(("f", "lt", v)) == 0


def test_dataset_all_shortcut_uses_manifest_nullability(tmp_path):
    rng = np.random.default_rng(3)
    v = rng.integers(0, 10, 600).astype(np.int32)
    m = rng.random(600) >= 0.25
    t = Table([gt.encode(v, "raw", name="x", valid=m)])
    ds = Dataset.write(str(tmp_path / "dn"), [t])
    ds2 = Dataset.open(str(tmp_path / "dn"))
    assert ds2.manifest["partitions"][0]["nullable"] == ["x"]
    # proven-'all' zone + nullable column: nulls still excluded
    assert ds2.count(("x", "ge", 0)) == int(m.sum())
    # empty select keeps real dtypes
    out = ds2.select(["x"], ("x", "gt", 10**6))
    assert out["x"].dtype == np.int32 and out["x"].size == 0


def test_dataset_from_csv_streaming(tmp_path):
    pd = pytest.importorskip("pandas")
    rng = np.random.default_rng(4)
    n = 9000
    df = pd.DataFrame({
        "x": rng.integers(0, 1000, n),
        "s": [["a", "b", "c"][i] for i in rng.integers(0, 3, n)],
    })
    csv = tmp_path / "big.csv"
    df.to_csv(csv, index=False)
    ds = Dataset.from_csv(str(tmp_path / "d"), str(csv), rows_per_partition=2500)
    assert ds.n_partitions == 4 and len(ds) == n
    assert ds.manifest["dtypes"]["x"] == "int32"  # downcast held across chunks
    assert ds.count(("x", "lt", 500)) == int((df["x"] < 500).sum())
    r = ds.groupby("s", "x", ("count", "sum"))
    for j, k in enumerate(r.keys):
        sel = df["x"][df["s"] == k]
        assert r.count[j] == len(sel) and r.sum[j] == int(sel.sum())


def test_dataset_from_csv_dtype_pin_rejects_overflow(tmp_path):
    pd = pytest.importorskip("pandas")
    # first chunk fits int32 -> pinned; second chunk needs 64 bits -> error
    df = pd.DataFrame({"x": [1] * 100 + [2**40] * 100})
    csv = tmp_path / "o.csv"
    df.to_csv(csv, index=False)
    with pytest.raises(ValueError, match="pinned dtype"):
        Dataset.from_csv(str(tmp_path / "d"), str(csv), rows_per_partition=100)


def test_dataset_append_dtype_mismatch(tmp_path):
    t32 = Table([gt.encode(np.arange(100, dtype=np.int32), "raw", name="x")])
    ds = Dataset.write(str(tmp_path / "d"), [t32])
    t64 = Table([gt.encode(np.arange(100, dtype=np.int64), "wide", name="x")])
    with pytest.raises(ValueError, match="dtype"):
        ds.append(t64)


def test_dataset_compact(tmp_path):
    rng = np.random.default_rng(5)
    # many small ragged partitions, nullable appears mid-stream
    parts, vs, ms = [], [], []
    for i in range(5):
        n = 700 + 13 * i
        v = rng.integers(0, 50, n).astype(np.int32)
        if i >= 2:
            m = rng.random(n) >= 0.2
            parts.append(Table([gt.encode(v, "raw", name="x", valid=m)]))
        else:
            m = np.ones(n, bool)
            parts.append(Table([gt.encode(v, "raw", name="x")]))
        vs.append(v); ms.append(m)
    ds = Dataset.write(str(tmp_path / "src"), parts)
    with pytest.raises(ValueError, match="different directory"):
        ds.compact(str(tmp_path / "src"))
    out = ds.compact(str(tmp_path / "dst"), rows_per_partition=1500)
    va, ma = np.concatenate(vs), np.concatenate(ms)
    assert len(out) == va.size
    assert out.n_partitions == int(np.ceil(va.size / 1500))
    assert out.count(("x", "lt", 25)) == int((ma & (va < 25)).sum())
    # null slots refill canonically on re-encode; valid rows are preserved
    rows = out.select(["x"])
    np.testing.assert_array_equal(rows["x"][ma], va[ma])
    from giddy_tpu.nulls import is_nullable, valid_mask

    got_m = np.concatenate([
        valid_mask(out.part(i)["x"]) if is_nullable(out.part(i)["x"])
        else np.ones(out.part(i).n, bool)
        for i in range(out.n_partitions)
    ])
    np.testing.assert_array_equal(got_m, ma)


def test_dataset_multikey_groupby_and_distinct(tmp_path):
    from giddy_tpu import strings

    rng = np.random.default_rng(6)
    parts, regs, sts, amts = [], [], [], []
    for _ in range(3):
        n = 1200
        reg = [["e", "w"][i] for i in rng.integers(0, 2, n)]
        st = np.array([1, 2], np.int32)[rng.integers(0, 2, n)]
        amt = rng.integers(0, 100, n).astype(np.int32)
        parts.append(Table([
            strings.encode_strings(reg, name="r"),
            gt.encode(st, "dict", name="s"),
            gt.encode(amt, "nbit", name="a"),
        ]))
        regs += reg; sts.append(st); amts.append(amt)
    ds = Dataset.write(str(tmp_path / "d"), parts)
    ra = np.array(regs, object)
    st_all, amt_all = np.concatenate(sts), np.concatenate(amts)
    r = ds.groupby(["r", "s"], "a", ("count", "sum"))
    assert len(r.keys) == 4
    for j, (rg, sv) in enumerate(r.keys):
        sel = amt_all[(ra == rg) & (st_all == sv)]
        assert r.count[j] == sel.size
        assert r.sum[j] == int(sel.astype(np.int64).sum())
    # Table.distinct on one partition
    t0 = ds.part(0)
    assert sorted(t0.distinct("s")) == [1, 2]
    combos = t0.distinct(["r", "s"])
    assert sorted(combos) == [("e", 1), ("e", 2), ("w", 1), ("w", 2)]


def test_dataset_between_isin_pruning(tmp_path):
    rng = np.random.default_rng(7)
    parts, alls = [], []
    for lo in (0, 1000, 2000):
        v = rng.integers(lo, lo + 500, 800).astype(np.int32)
        parts.append(Table([gt.encode(v, "raw", name="x")]))
        alls.append(v)
    ds = Dataset.write(str(tmp_path / "d"), parts)
    va = np.concatenate(alls)
    plan = ds._plan([("x", "between", (1100, 1300))])
    assert [v for _, v in plan] == ["skip", "scan", "skip"]
    assert ds.count(("x", "between", (1100, 1300))) == int(
        ((va >= 1100) & (va <= 1300)).sum())
    plan = ds._plan([("x", "isin", [700, 2100])])
    assert [v for _, v in plan] == ["skip", "skip", "scan"]
    assert ds.count(("x", "isin", [700, 2100])) == int(np.isin(va, [700, 2100]).sum())


def test_prune_signed_zero_total_order(tmp_path):
    # -0.0 column: device compares in IEEE total order (-0.0 < +0.0); the
    # zone verdicts must agree (regression: python float compare said skip)
    v = np.full(500, -0.0, np.float32)
    t = Table([gt.encode(v, "raw", name="f")])
    ds = Dataset.write(str(tmp_path / "dz"), [t])
    want_lt = Table([t["f"]]).count(("f", "lt", 0.0))
    want_ge = Table([t["f"]]).count(("f", "ge", 0.0))
    assert ds.count(("f", "lt", 0.0)) == want_lt == 500
    assert ds.count(("f", "ge", 0.0)) == want_ge == 0
