"""Aggregate pushdown: exact fused sum/min/max vs NumPy."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.aggregate import max_, min_, sum_
from giddy_tpu.datagen import gen_column
from giddy_tpu.util import GROUP

FUSED = ["nbit", "for", "dzbf"]
GENERAL = ["delta", "dict", "rle", "raw", "dzbv"]


@pytest.mark.parametrize("scheme", FUSED + GENERAL)
def test_sum_exact(scheme):
    rng = np.random.default_rng(100)
    v = gen_column(scheme, 3 * GROUP + 77, rng)
    col = gt.encode(v, scheme)
    assert sum_(col) == int(np.sum(v.astype(np.int64))), scheme


@pytest.mark.parametrize("scheme", FUSED + ["delta", "rle"])
def test_minmax_exact(scheme):
    rng = np.random.default_rng(101)
    v = gen_column(scheme, 2 * GROUP + 13, rng)
    col = gt.encode(v, scheme)
    assert min_(col) == int(v.min()), scheme
    assert max_(col) == int(v.max()), scheme


def test_sum_signed_and_narrow():
    rng = np.random.default_rng(102)
    for dt in ("int32", "int16", "int8"):
        info = np.iinfo(np.dtype(dt))
        v = rng.integers(info.min, info.max + 1, GROUP + 9).astype(np.dtype(dt))
        col = gt.encode(v, "raw")
        assert sum_(col) == int(np.sum(v.astype(np.int64))), dt
        assert min_(col) == int(v.min()) and max_(col) == int(v.max()), dt


def test_sum_overflow_64bit_safe():
    """Sums far beyond 2^32 (and int64 element sums beyond 2^63 via wide
    uint64) must stay exact."""
    v = np.full(4 * GROUP, 2**31 - 1, np.int32)
    col = gt.encode(v, "rle")
    assert sum_(col) == (2**31 - 1) * 4 * GROUP
    u = np.full(GROUP, 2**63 + 5, np.uint64)
    cu = gt.encode(u, "wide")
    assert sum_(cu) == (2**63 + 5) * GROUP


def test_wide_int64_aggregates():
    rng = np.random.default_rng(103)
    v = rng.integers(-(2**50), 2**50, 2 * GROUP + 5, dtype=np.int64)
    col = gt.encode(v, "wide")
    assert sum_(col) == int(np.sum(v, dtype=object))
    assert min_(col) == int(v.min()) and max_(col) == int(v.max())


def test_float_aggregates():
    rng = np.random.default_rng(104)
    v = rng.normal(0, 100, GROUP + 21).astype(np.float32)
    col = gt.encode(v, "raw")
    assert sum_(col) == pytest.approx(np.sum(v, dtype=np.float64), rel=1e-12)
    assert min_(col) == v.min() and max_(col) == v.max()
    # fused path on a float nbit column
    col2 = gt.encode(v, "nbit")
    assert min_(col2) == v.min() and max_(col2) == v.max()


def test_pad_positions_ignored():
    """Ragged tails: FOR pads decode to the frame reference, which must not
    leak into sums or maxima."""
    v = np.full(GROUP + 1, -7, np.int32)  # one element past the group edge
    col = gt.encode(v, "for")
    assert sum_(col) == -7 * (GROUP + 1)
    assert max_(col) == -7 and min_(col) == -7


def test_cascade_minmax_dense_dict():
    """Auto-built cascade dictionaries answer min/max host-side, O(d)."""
    rng = np.random.default_rng(105)
    v = gen_column("cascade", 2 * GROUP + 13, rng)
    col = gt.encode(v, "cascade")
    assert col.params["dense"]
    assert min_(col) == int(v.min()) and max_(col) == int(v.max())
    # floats: total-order extremes (matches the other schemes' semantics)
    vocab = np.array([-2.5, -0.5, 0.25, 3.75], np.float32)
    fv = vocab[rng.integers(0, 4, GROUP + 5)]
    fcol = gt.encode(fv, "cascade")
    assert min_(fcol) == fv.min() and max_(fcol) == fv.max()


def test_cascade_minmax_explicit_dict_general_path():
    """Explicit dictionaries may hold unused entries: the dense fast path
    must not fire, and the general path answers from the data."""
    rng = np.random.default_rng(106)
    vocab = np.array([-1000, 2, 5, 9, 1000], np.int32)
    v = vocab[rng.integers(1, 4, GROUP + 3)]  # never uses +-1000
    col = gt.encode(v, "cascade", dictionary=vocab, codes_scheme="rle")
    assert not col.params["dense"]
    assert min_(col) == int(v.min()) and max_(col) == int(v.max())


def test_cascade_sum_exact():
    rng = np.random.default_rng(107)
    v = gen_column("cascade", 3 * GROUP + 77, rng)
    col = gt.encode(v, "cascade")
    assert sum_(col) == int(np.sum(v.astype(np.int64)))


def test_cascade_sum_pushdown_signed_narrow():
    """Cascade sums answer from code counts x dictionary (no gather);
    negative narrow vocabularies must stay exact."""
    rng = np.random.default_rng(108)
    vocab = np.array([-30000, -7, 0, 12, 29999], np.int16)
    v = vocab[rng.integers(0, 5, 2 * GROUP + 19)]
    col = gt.encode(v, "cascade", codes_scheme="rle")
    assert sum_(col) == int(np.sum(v.astype(np.int64)))


def test_avg_and_distinct_count():
    from giddy_tpu.aggregate import avg_, distinct_count

    rng = np.random.default_rng(109)
    v = vocab = None
    vocab = np.array([2, 9, 2024, -5], np.int32)
    v = vocab[rng.integers(0, 4, GROUP + 77)]
    col = gt.encode(v, "cascade")
    assert distinct_count(col) == 4  # dense dictionary: O(1) from header
    assert avg_(col) == np.mean(v.astype(np.float64))
    # explicit dictionary with unused entries: device code scan
    big = np.concatenate([vocab, np.array([10**6], np.int32)])
    col2 = gt.encode(v, "cascade", dictionary=big)
    assert distinct_count(col2) == 4
    # non-dictionary scheme: decode + unique fallback
    w = rng.integers(0, 50, GROUP + 3).astype(np.int32)
    colw = gt.encode(w, "nbit")
    assert distinct_count(colw) == int(np.unique(w).size)
    assert avg_(colw) == np.mean(w.astype(np.float64))
    with pytest.raises(ValueError):
        avg_(gt.encode(np.zeros(0, np.int32), "raw"))


def test_dict_scheme_aggregate_pushdown():
    """Plain dict columns share cascade's dictionary pushdowns: min/max
    from the dense dictionary, sums from code counts x dictionary."""
    rng = np.random.default_rng(110)
    vocab = np.array([-900, -3, 0, 44, 1000], np.int32)
    v = vocab[rng.integers(0, 5, 2 * GROUP + 7)]
    col = gt.encode(v, "dict")
    assert min_(col) == int(v.min()) and max_(col) == int(v.max())
    assert sum_(col) == int(np.sum(v.astype(np.int64)))
