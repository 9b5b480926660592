"""LMP layout round-trip + adversarial widths (SURVEY.md §5.2.2:
B=1 and B=32 edges, straddling word boundaries)."""

import numpy as np
import pytest

from giddy_tpu.ref.lmp import lmp_pack, lmp_unpack
from giddy_tpu.util import GROUP, LANES


@pytest.mark.parametrize("bits", list(range(1, 33)))
def test_roundtrip_all_widths(bits):
    rng = np.random.default_rng(bits)
    n = GROUP + 12345
    hi = (1 << bits) - 1
    v = rng.integers(0, hi, n, dtype=np.uint64).astype(np.uint32) if bits < 64 else None
    if bits == 32:
        v = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    packed = lmp_pack(v, bits)
    assert packed.shape == (2, bits * LANES)
    out = lmp_unpack(packed, bits, n)
    np.testing.assert_array_equal(out, v)


def test_extremes():
    for bits in (1, 9, 31, 32):
        hi = np.uint32((1 << bits) - 1) if bits < 32 else np.uint32(0xFFFFFFFF)
        v = np.full(GROUP, hi, dtype=np.uint32)
        np.testing.assert_array_equal(lmp_unpack(lmp_pack(v, bits), bits, GROUP), v)


def test_out_of_range_rejected():
    with pytest.raises(ValueError):
        lmp_pack(np.array([2], dtype=np.uint32), 1)


def test_tiny_and_empty():
    for n in (0, 1, 2, LANES, LANES + 1):
        v = np.arange(n, dtype=np.uint32) % 8
        np.testing.assert_array_equal(lmp_unpack(lmp_pack(v, 3), 3, n), v)


def test_size():
    # 9-bit packing of GROUP values = 9*LANES words (the configs[0] ratio)
    v = np.zeros(GROUP, dtype=np.uint32)
    assert lmp_pack(v, 9).size == 9 * LANES
