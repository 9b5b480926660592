"""Native (C++) host codec vs NumPy reference — bit parity + availability."""

import numpy as np
import pytest

from giddy_tpu import native
from giddy_tpu.util import GROUP, num_groups


def _numpy_pack(v, bits):
    """Inline copy of the normative NumPy algorithm (ref/lmp.py)."""
    from giddy_tpu.util import SLOTS, LANES, U32

    ng = num_groups(v.shape[0])
    vv = np.zeros(ng * GROUP, np.uint32)
    vv[: v.shape[0]] = v
    vv = vv.reshape(ng, SLOTS, LANES)
    words = np.zeros((ng, bits, LANES), dtype=np.uint32)
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        words[:, w0] |= (vv[:, i] << U32(s)) & U32(0xFFFFFFFF)
        if s + bits > 32:
            words[:, w0 + 1] |= vv[:, i] >> U32(32 - s)
    return words.reshape(ng, bits * LANES)


@pytest.mark.skipif(native.get_lib() is None, reason="no C++ toolchain")
@pytest.mark.parametrize("bits", [1, 7, 9, 13, 16, 24, 31, 32])
def test_native_matches_numpy(bits):
    rng = np.random.default_rng(bits)
    n = 3 * GROUP
    hi = (1 << bits) - 1 if bits < 32 else 2**32 - 1
    v = rng.integers(0, hi + 1, n, dtype=np.uint64).astype(np.uint32)
    ng = num_groups(n)
    nat = native.lmp_pack(v, bits, ng)
    np.testing.assert_array_equal(nat, _numpy_pack(v, bits))
    back = native.lmp_unpack(nat, bits, ng)
    np.testing.assert_array_equal(back[:n], v)


@pytest.mark.skipif(native.get_lib() is None, reason="no C++ toolchain")
def test_native_dzbv_split_matches_numpy():
    rng = np.random.default_rng(7)
    # mix of widths incl. boundaries, in awkward (non-chunk-aligned) count
    n = (1 << 16) * 3 + 12345
    u = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
    u[rng.random(n) < 0.5] &= 0xFF
    u[rng.random(n) < 0.3] &= 0xFFFF
    u[:4] = [0, 0xFF, 0x100, 0xFFFFFF + 1]
    wm1, planes = native.dzbv_split(u)
    w = np.ones(n, np.int32)
    w[u > 0xFF] = 2
    w[u > 0xFFFF] = 3
    w[u > 0xFFFFFF] = 4
    np.testing.assert_array_equal(wm1, (w - 1).astype(np.uint32))
    for k in range(4):
        sel = u[w > k] if k else u
        np.testing.assert_array_equal(planes[k], (sel >> np.uint32(8 * k)) & np.uint32(0xFF), err_msg=f"plane{k}")


def test_dzbv_encode_native_and_numpy_agree():
    """Container bytes must be identical whichever encode path runs."""
    import os

    import giddy_tpu as gt

    rng = np.random.default_rng(8)
    v = (rng.integers(0, 2**28, GROUP + 99, dtype=np.int64)
         >> rng.integers(0, 24, GROUP + 99, dtype=np.int64)).astype(np.int32)
    a = gt.encode(v, "dzbv")
    os.environ["GIDDY_TPU_NO_NATIVE"] = "1"
    native._LIB, native._TRIED = None, False
    try:
        b = gt.encode(v, "dzbv")
    finally:
        del os.environ["GIDDY_TPU_NO_NATIVE"]
        native._TRIED = False
    assert a.params == b.params
    for k in a.streams:
        np.testing.assert_array_equal(a.streams[k], b.streams[k], err_msg=k)


@pytest.mark.skipif(native.get_lib() is None, reason="no C++ toolchain")
def test_native_zigzag_matches_numpy():
    rng = np.random.default_rng(9)
    d = rng.integers(-(2**31), 2**31 - 1, 100000, dtype=np.int64).astype(np.int32)
    d[:3] = [0, -(2**31), 2**31 - 1]
    z_np = ((d.astype(np.uint32) << np.uint32(1)) ^ (d >> 31).astype(np.uint32))
    np.testing.assert_array_equal(native.zigzag(d), z_np)
    np.testing.assert_array_equal(native.unzigzag(z_np), d)


def test_ref_uses_native_transparently():
    """ref/lmp.py must produce identical bytes whichever path runs."""
    import importlib
    import os

    from giddy_tpu.ref import lmp as ref_lmp

    rng = np.random.default_rng(0)
    v = rng.integers(0, 512, GROUP + 5, dtype=np.uint64).astype(np.uint32)
    a = ref_lmp.lmp_pack(v, 9)
    os.environ["GIDDY_TPU_NO_NATIVE"] = "1"
    native._LIB, native._TRIED = None, False
    try:
        b = ref_lmp.lmp_pack(v, 9)
    finally:
        del os.environ["GIDDY_TPU_NO_NATIVE"]
        native._TRIED = False
    np.testing.assert_array_equal(a, b)
