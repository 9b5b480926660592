"""64-bit (wide) columns: plane-split round-trip (SURVEY.md §3.1 element
width matrix)."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.util import GROUP


def _ts64(n, rng):
    # epoch-nanos style timestamps: hi plane nearly constant
    return (np.int64(1_700_000_000_000_000_000) + np.cumsum(rng.integers(0, 1000, n))).astype(np.int64)


@pytest.mark.parametrize("base", ["nbit", "delta", "dzbf", "raw"])
def test_wide_roundtrip(base):
    rng = np.random.default_rng(3)
    v = _ts64(GROUP + 55, rng)
    col = gt.encode(v, "wide", base_scheme=base)
    assert col.dtype == "int64"
    out = gt.decode_ref(col)
    assert out.dtype == np.int64
    np.testing.assert_array_equal(out, v)
    np.testing.assert_array_equal(gt.decode(col), v)


def test_wide_compresses_hi_plane():
    rng = np.random.default_rng(4)
    v = _ts64(4 * GROUP, rng)
    col = gt.encode(v, "wide", base_scheme="delta")
    # 8-byte timestamps with near-constant hi plane must beat 2x
    assert col.ratio > 2.0, col.ratio


def test_wide_uint64_full_range():
    rng = np.random.default_rng(5)
    v = rng.integers(0, 2**64, GROUP, dtype=np.uint64)
    col = gt.encode(v, "wide", base_scheme="raw")
    assert col.dtype == "uint64"
    np.testing.assert_array_equal(gt.decode_ref(col), v)
    np.testing.assert_array_equal(gt.decode(col), v)


def test_wide_container_roundtrip():
    rng = np.random.default_rng(6)
    v = _ts64(GROUP, rng)
    col = gt.encode(v, "wide", base_scheme="delta")
    back = gt.read_container(gt.container_bytes([col]))[0]
    np.testing.assert_array_equal(gt.decode_ref(back), v)


def test_wide_partial_decode():
    from giddy_tpu.partial import decode_groups

    rng = np.random.default_rng(7)
    v = _ts64(4 * GROUP + 9, rng)
    col = gt.encode(v, "wide", base_scheme="delta")
    np.testing.assert_array_equal(decode_groups(col, 1, 3), v[GROUP : 3 * GROUP])


def test_wide_rejects_narrow():
    with pytest.raises(ValueError):
        gt.encode(np.zeros(10, np.int32), "wide")
