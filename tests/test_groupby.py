"""GROUP BY pushdown: per-key count/sum/min/max vs NumPy references."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.groupby import group_count, group_reduce
from giddy_tpu.query import filter_bitmap
from giddy_tpu.util import GROUP


def _mk_keys(rng, n, vocab, scheme="cascade", **opts):
    v = vocab[rng.integers(0, len(vocab), n)]
    return v, gt.encode(v, scheme, **opts)


def _np_sums(codes, vals, d, mask=None):
    if mask is not None:
        codes, vals = codes[mask], vals[mask]
    s = np.zeros(d, np.int64)
    np.add.at(s, codes, vals.astype(np.int64))
    return s


def test_group_count_matches_bincount():
    rng = np.random.default_rng(300)
    vocab = np.arange(10, 10 + 37, dtype=np.int32) * 3
    kv, keys = _mk_keys(rng, 2 * GROUP + 111, vocab)
    r = group_count(keys)
    np.testing.assert_array_equal(r.keys, vocab)
    codes = np.searchsorted(vocab, kv)
    np.testing.assert_array_equal(r.count, np.bincount(codes, minlength=37))
    assert int(r.count.sum()) == keys.n  # pads never counted


@pytest.mark.parametrize("key_scheme,val_scheme", [("cascade", "for"), ("dict", "delta")])
def test_group_sum_minmax_int32(key_scheme, val_scheme):
    rng = np.random.default_rng(301)
    n = GROUP + 777
    vocab = np.sort(rng.choice(10**6, 23, replace=False)).astype(np.int32)
    kv, keys = _mk_keys(rng, n, vocab, key_scheme)
    v = np.sort(rng.integers(-(2**20), 2**20, n).astype(np.int32))  # delta-friendly
    vals = gt.encode(v, val_scheme)
    r = group_reduce(keys, vals, ("count", "sum", "min", "max"))
    codes = np.searchsorted(vocab, kv)
    np.testing.assert_array_equal(r.sum, _np_sums(codes, v, 23))
    for c in range(23):
        sel = v[codes == c]
        if sel.size:
            assert r.min[c] == sel.min() and r.max[c] == sel.max(), c
        else:
            assert r.count[c] == 0


def test_group_sum_signed_narrow_exact():
    """int16 measures: zero-extended payloads must recover true signed sums
    (per-key sign-bit counts), including keys whose sum is negative."""
    rng = np.random.default_rng(302)
    n = GROUP + 13
    vocab = np.array([2, 5, 11], np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.integers(-(2**15), 2**15, n).astype(np.int16)
    vals = gt.encode(v, "raw")
    r = group_reduce(keys, vals, ("sum", "min", "max"))
    codes = np.searchsorted(vocab, kv)
    np.testing.assert_array_equal(r.sum, _np_sums(codes, v, 3))
    for c in range(3):
        sel = v[codes == c]
        assert r.min[c] == sel.min() and r.max[c] == sel.max()


def test_group_reduce_filtered_by_bitmap():
    """HAVING-less WHERE: aggregate only rows passing a predicate on a
    third column — the full scan pipeline (filter -> grouped aggregate)."""
    rng = np.random.default_rng(303)
    n = 2 * GROUP + 99
    vocab = np.arange(8, dtype=np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.integers(0, 1000, n).astype(np.int32)
    w = rng.integers(0, 100, n).astype(np.int32)
    vals, wcol = gt.encode(v, "nbit"), gt.encode(w, "nbit")
    bm = filter_bitmap(wcol, "lt", 50)
    r = group_reduce(keys, vals, ("count", "sum", "min", "max"), bitmap=bm)
    codes = np.searchsorted(vocab, kv)
    mask = w < 50
    np.testing.assert_array_equal(r.count, np.bincount(codes[mask], minlength=8))
    np.testing.assert_array_equal(r.sum, _np_sums(codes, v, 8, mask))
    for c in range(8):
        sel = v[mask & (codes == c)]
        if sel.size:
            assert r.min[c] == sel.min() and r.max[c] == sel.max()


def test_group_float32_vals():
    rng = np.random.default_rng(304)
    n = GROUP + 55
    vocab = np.array([1, 4, 9, 16], np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.normal(0, 50, n).astype(np.float32)
    vals = gt.encode(v, "raw")
    r = group_reduce(keys, vals, ("count", "sum", "min", "max"))
    codes = np.searchsorted(vocab, kv)
    for c in range(4):
        sel = v[codes == c]
        assert r.sum[c] == pytest.approx(np.sum(sel, dtype=np.float64), rel=1e-12)
        assert r.min[c] == sel.min() and r.max[c] == sel.max()


def test_group_wide_int64_vals():
    """64-bit measures: per-plane device sums recombine to exact Python
    ints (beyond int64 for uint64 data); min/max via the host fallback."""
    rng = np.random.default_rng(305)
    n = GROUP + 31
    vocab = np.array([3, 7], np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.integers(-(2**50), 2**50, n, dtype=np.int64)
    vals = gt.encode(v, "wide")
    r = group_reduce(keys, vals, ("count", "sum", "min", "max"))
    codes = np.searchsorted(vocab, kv)
    for c in range(2):
        sel = v[codes == c]
        assert r.sum[c] == int(np.sum(sel, dtype=object))
        assert r.min[c] == sel.min() and r.max[c] == sel.max()
    # uint64 sums beyond 2**63 stay exact (object ints)
    u = np.full(GROUP, 2**63 + 11, np.uint64)
    ru = group_reduce(keys := gt.encode(np.zeros(GROUP, np.int32), "cascade"),
                      gt.encode(u, "wide"), ("sum",))
    assert ru.sum[0] == (2**63 + 11) * GROUP


def test_group_explicit_dict_empty_groups():
    rng = np.random.default_rng(306)
    vocab = np.array([-5, 0, 5, 10], np.int32)
    v = vocab[rng.integers(1, 3, GROUP)]  # only codes 1..2 appear
    keys = gt.encode(v, "cascade", dictionary=vocab)
    vals = gt.encode(np.ones(GROUP, np.int32), "rle")
    r = group_reduce(keys, vals, ("count", "sum"))
    assert r.count[0] == 0 and r.count[3] == 0 and r.sum[0] == 0
    assert int(r.count.sum()) == GROUP


def test_group_keys_must_be_dictionary_backed():
    col = gt.encode(np.zeros(10, np.int32), "nbit")
    with pytest.raises(ValueError, match="dict"):
        group_count(col)
    with pytest.raises(ValueError, match="length mismatch"):
        group_reduce(
            gt.encode(np.zeros(10, np.int32), "cascade"),
            gt.encode(np.zeros(11, np.int32), "nbit"),
            ("sum",),
        )
    with pytest.raises(ValueError, match="require a values column"):
        group_reduce(gt.encode(np.zeros(10, np.int32), "cascade"), None, ("sum",))


def test_group_sum_chunk_boundaries(monkeypatch):
    """Byte-plane sums chunk over group blocks; shrink the chunk so a small
    column crosses several boundaries and must still be exact."""
    import giddy_tpu.groupby as gb

    monkeypatch.setattr(gb, "CHUNK_GROUPS", 1)
    rng = np.random.default_rng(307)
    n = 3 * GROUP + 41
    vocab = np.array([1, 2, 3], np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.integers(0, 2**31, n).astype(np.int32)
    r = group_reduce(keys, gt.encode(v, "nbit"), ("sum",))
    codes = np.searchsorted(vocab, kv)
    np.testing.assert_array_equal(r.sum, _np_sums(codes, v, 3))


def test_group_wide_float64_sums():
    """float64 measures (wide scheme) must sum as floats, not bitpatterns
    (code-review regression)."""
    rng = np.random.default_rng(308)
    n = GROUP + 17
    vocab = np.array([1, 2, 3], np.int32)
    kv, keys = _mk_keys(rng, n, vocab)
    v = rng.normal(0, 25, n).astype(np.float64)
    vals = gt.encode(v, "wide")
    r = group_reduce(keys, vals, ("sum", "min", "max"))
    codes = np.searchsorted(vocab, kv)
    for c in range(3):
        sel = v[codes == c]
        assert r.sum[c] == pytest.approx(np.sum(sel, dtype=np.float64), rel=1e-12)
        assert r.min[c] == sel.min() and r.max[c] == sel.max()


def test_cli_groupby_where_needs_value(tmp_path, capsys):
    from giddy_tpu.cli import main
    from giddy_tpu.format import write_container

    k = np.zeros(10, np.int32)
    cols = [gt.encode(k, "cascade", name="k"), gt.encode(k, "raw", name="v")]
    path = tmp_path / "t.gtp"
    with open(path, "wb") as f:
        write_container(cols, f)
    with pytest.raises(SystemExit):
        main(["groupby", str(path), "--keys", "0", "--where", "1"])


def test_group_reduce_multi_key():
    from giddy_tpu.table import Table

    rng = np.random.default_rng(31)
    n = GROUP + 77
    region_v = [["east", "west"][i] for i in rng.integers(0, 2, n)]
    status_v = np.array([3, 7, 11], np.int32)[rng.integers(0, 3, n)]
    amt = rng.integers(0, 1000, n, dtype=np.int64).astype(np.int32)
    from giddy_tpu import strings

    t = Table([
        strings.encode_strings(region_v, name="region"),
        gt.encode(status_v, "dict", name="status"),
        gt.encode(amt, "for", name="amt"),
    ])
    r = t.groupby(["region", "status"], "amt", ("count", "sum", "min", "max"))
    ra = np.array(region_v, object)
    seen = 0
    for j, key in enumerate(r.keys):
        reg, st = key
        sel = amt[(ra == reg) & (status_v == st)]
        assert r.count[j] == sel.size
        if sel.size:
            assert r.sum[j] == int(sel.astype(np.int64).sum())
            assert r.min[j] == sel.min() and r.max[j] == sel.max()
            seen += 1
    assert seen == 6  # every (region, status) combo occurs at this n

    # filtered + nullable key: null rows drop out of every aggregate
    m = rng.random(n) >= 0.2
    t2 = Table([
        strings.encode_strings(region_v, name="region", valid=m),
        gt.encode(status_v, "dict", name="status"),
        gt.encode(amt, "for", name="amt"),
    ])
    r2 = t2.groupby(["region", "status"], "amt", ("count",))
    for j, key in enumerate(r2.keys):
        reg, st = key
        sel = m & (ra == reg) & (status_v == st)
        assert r2.count[j] == int(sel.sum())
