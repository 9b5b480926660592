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
