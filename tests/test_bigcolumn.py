"""Transparent >2**31-element decode (VERDICT r1 item #8; the libgiddy
``IndexSize`` template analog, SURVEY.md §3.1/§6 long-column row).

A real 2**31-element column needs >8 GiB of host RAM, so the routing is
unit-tested by forcing the addressing limit down: gt.decode must switch to
chunked group decode (bit-exact, host-assembled) instead of raising, while
the single-call internals (get_decoder) still enforce the real guard.
"""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu import util
from giddy_tpu.datagen import gen_column
from giddy_tpu.util import GROUP


@pytest.fixture
def tiny_limit(monkeypatch):
    monkeypatch.setattr(util, "MAX_DEVICE_ELEMS", 4 * GROUP)


@pytest.mark.parametrize("scheme", ["nbit", "delta", "rle", "dict", "dzbv", "patched"])
def test_decode_auto_chunks(scheme, tiny_limit):
    rng = np.random.default_rng(13)
    n = 10 * GROUP + 321  # 11 padded groups >> the forced 4-group limit
    v = gen_column(scheme, n, rng)
    col = gt.encode(v, scheme, name=f"big_{scheme}")
    out = gt.decode(col)
    assert isinstance(out, np.ndarray)
    np.testing.assert_array_equal(out, gt.decode_ref(col))
    padded = gt.decode(col, pad=True)
    assert padded.shape == (11 * GROUP,)
    np.testing.assert_array_equal(padded[:n], v)


def test_decode_auto_chunks_wide(tiny_limit):
    rng = np.random.default_rng(14)
    n = 9 * GROUP + 5
    v = rng.integers(-(2**62), 2**62, n, dtype=np.int64)
    col = gt.encode(v, "wide")
    np.testing.assert_array_equal(gt.decode(col), v)


def test_single_call_guard_still_enforced(tiny_limit):
    rng = np.random.default_rng(15)
    col = gt.encode(gen_column("nbit", 6 * GROUP, rng), "nbit")
    with pytest.raises(NotImplementedError, match="addressing limit"):
        gt.get_decoder(col)
