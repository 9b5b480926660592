"""Element-type matrix: narrow dtypes end-to-end (the reference's
element/uint-width template parameters — SURVEY.md §3.1 'parameterized on
element/side-stream types')."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.util import GROUP

N = GROUP + 77
CASES = [
    ("uint8", 0, 200, ["nbit", "dict", "rle", "dzbf"]),
    ("int16", -100, 100, ["dict", "rle", "raw"]),
    ("uint16", 0, 60000, ["nbit", "for", "dzbv"]),
    ("int8", -50, 50, ["dict", "raw"]),
]


@pytest.mark.parametrize("dt,lo,hi,schemes", CASES)
def test_narrow_dtype_roundtrip(dt, lo, hi, schemes):
    rng = np.random.default_rng(1)
    v = rng.integers(lo, hi, N).astype(np.dtype(dt))
    for s in schemes:
        col = gt.encode(v, s)
        r = gt.decode_ref(col)
        d = np.asarray(gt.decode(col))
        assert r.dtype == v.dtype and d.dtype == v.dtype, (dt, s)
        np.testing.assert_array_equal(r, v, err_msg=f"{dt}/{s} ref")
        np.testing.assert_array_equal(d, v, err_msg=f"{dt}/{s} dev")


def test_uint32_full_range():
    rng = np.random.default_rng(2)
    v = rng.integers(0, 2**32, N, dtype=np.uint64).astype(np.uint32)
    for s in ("raw", "dzbv", "rle", "nbit"):
        col = gt.encode(v, s)
        np.testing.assert_array_equal(gt.decode_ref(col), v)
        np.testing.assert_array_equal(np.asarray(gt.decode(col)), v)
