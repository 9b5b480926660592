"""Top-k / order-by (topk.py): device lax.top_k on monotone keys, host
fallbacks, null awareness, sentinel-collision safety."""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.topk import argmax_, argmin_, order_by, top_k
from giddy_tpu.util import GROUP

from helpers import gen_column


def _check(col, v, m, k, largest):
    vals, pos = top_k(col, k, largest=largest)
    vv = v[m] if m is not None else v
    want = np.sort(vv)
    want = want[::-1][:k] if largest else want[:k]
    np.testing.assert_array_equal(vals, want.astype(vals.dtype))
    # positions must be valid, unique, and hold the returned values
    assert len(set(pos.tolist())) == len(pos)
    np.testing.assert_array_equal(v[pos], vals)
    if m is not None:
        assert m[pos].all()


@pytest.mark.parametrize("scheme", ["nbit", "for", "delta", "dict", "rle", "patched"])
def test_top_k_schemes(scheme):
    rng = np.random.default_rng(hash(scheme) % 2**31)
    n = 2 * GROUP + 77
    v = gen_column(scheme, n, rng)
    col = gt.encode(v, scheme)
    _check(col, v, None, 10, True)
    _check(col, v, None, 10, False)


def test_top_k_signed_float():
    rng = np.random.default_rng(1)
    n = GROUP + 13
    v = rng.integers(-(2**30), 2**30, n, dtype=np.int64).astype(np.int32)
    col = gt.encode(v, "raw")
    _check(col, v, None, 7, True)
    _check(col, v, None, 7, False)
    fv = rng.normal(0, 50, n).astype(np.float32)
    fcol = gt.encode(fv, "raw")
    _check(fcol, fv, None, 7, True)
    _check(fcol, fv, None, 7, False)


def test_top_k_nullable():
    rng = np.random.default_rng(2)
    n = 2 * GROUP + 5
    v = rng.integers(0, 10**6, n, dtype=np.int64).astype(np.int32)
    m = rng.random(n) >= 0.2
    col = gt.encode(v, "raw", valid=m)
    _check(col, v, m, 12, True)
    _check(col, v, m, 12, False)
    # k larger than the valid count truncates
    small = gt.encode(v[:10], "raw", valid=np.arange(10) < 3)
    vals, pos = top_k(small, 8, largest=True)
    assert len(vals) == 3


def test_top_k_sentinel_collision():
    """INT32_MIN rows map to the mask sentinel: the host fallback must
    keep positions pointing at real (valid) rows."""
    n = GROUP + 3
    v = np.full(n, -(2**31), np.int32)
    v[5] = 7
    m = np.ones(n, bool)
    m[0] = False  # a null row holding the sentinel value
    col = gt.encode(v, "raw", valid=m)
    vals, pos = top_k(col, 3, largest=False)
    assert (vals == -(2**31)).all()
    assert m[pos].all() and (pos != 0).all()


def test_top_k_wide():
    rng = np.random.default_rng(3)
    n = GROUP + 9
    v = rng.integers(-(2**40), 2**40, n, dtype=np.int64)
    col = gt.encode(v, "wide")
    _check(col, v, None, 9, True)
    _check(col, v, None, 9, False)


def test_argminmax_and_order_by():
    rng = np.random.default_rng(4)
    n = GROUP + 21
    v = rng.permutation(n).astype(np.int32)  # all distinct: argmax unique
    col = gt.encode(v, "raw")
    assert v[argmax_(col)] == v.max()
    assert v[argmin_(col)] == v.min()
    vals, pos = order_by(col, ascending=True)
    np.testing.assert_array_equal(vals, np.sort(v))
    np.testing.assert_array_equal(v[pos], vals)
    vals, pos = order_by(col, ascending=False, limit=5)
    np.testing.assert_array_equal(vals, np.sort(v)[::-1][:5])


def test_top_k_bad_k():
    col = gt.encode(np.arange(10, dtype=np.int32), "raw")
    with pytest.raises(ValueError, match="positive"):
        top_k(col, 0)
