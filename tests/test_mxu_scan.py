"""Algorithm tests for the MXU byte-plane matmul cumsum (kernels/lanes.py
``_mxu_cumsum``) — the round-3 scan-family hot-loop redesign.

These run the exact traced computation on the CPU backend (``_lane_roll``
falls back to ``jnp.roll`` there), proving the *math* — byte decomposition,
int8 bias, plane folding in uint32 wrap space, tile-carry scan, repeat
broadcast — against ``np.cumsum``. The Mosaic *lowering* (int8 matmul,
reshapes, ``jnp.repeat``) is proved bit-exact on real hardware by
``python -m giddy_tpu.selftest`` every bench round and was validated for
all plane subsets, row counts 1/3/8/16 and multi-step grids when built.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from giddy_tpu.kernels import lanes
from giddy_tpu.kernels.lanes import _mxu_cumsum, _roll_cumsum
from giddy_tpu.util import GROUP


@pytest.fixture(autouse=True)
def _algorithm_roll(monkeypatch):
    """These are algorithm tests evaluated at the top JAX level (outside
    any pallas_call), where ``pltpu.roll`` has no lowering on either
    backend — substitute the semantically identical ``jnp.roll``. The
    real Mosaic lowering is exercised by test_device_vs_oracle and the
    hardware selftest."""
    monkeypatch.setattr(lanes, "_lane_roll", lambda x, k: jnp.roll(x, k, axis=1))


def _want(x: np.ndarray) -> np.ndarray:
    return np.cumsum(x, axis=1, dtype=np.uint32)


@pytest.mark.parametrize("rows", [1, 3, 8])
def test_full_range_u32(rows):
    rng = np.random.default_rng(rows)
    x = rng.integers(0, 2**32, (rows, GROUP), dtype=np.uint32)
    out = np.asarray(_mxu_cumsum(jnp.asarray(x), (0, 1, 2, 3), False))
    assert (out == _want(x)).all()


@pytest.mark.parametrize(
    "planes,small",
    [
        ((0,), True),  # dzbv 0/1 masks and the w<=3 scan
        ((0,), False),
        ((0, 2), True),  # dzbv packed 16-bit mask fields
        ((0, 2), False),
        ((0, 1), False),
        ((1, 3), False),  # zero low byte: shifts/masks still line up
        ((3,), True),
    ],
)
def test_plane_subsets(planes, small):
    rng = np.random.default_rng(hash((planes, small)) % 2**31)
    hi = 128 if small else 256
    x = np.zeros((5, GROUP), np.uint32)
    for k in planes:
        x |= rng.integers(0, hi, (5, GROUP), dtype=np.uint32) << np.uint32(8 * k)
    out = np.asarray(_mxu_cumsum(jnp.asarray(x), planes, small))
    assert (out == _want(x)).all()


def test_binary_mask_small():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 2, (4, GROUP), dtype=np.uint32)
    out = np.asarray(_mxu_cumsum(jnp.asarray(x), (0,), True))
    assert (out == _want(x)).all()


def test_wraparound():
    # adversarial: constant huge values force uint32 wrap in every tile
    x = np.full((2, GROUP), 0xFFFF_FFF1, np.uint32)
    x[1] = 0x8000_0001
    out = np.asarray(_mxu_cumsum(jnp.asarray(x), (0, 1, 2, 3), False))
    assert (out == _want(x)).all()


@pytest.mark.parametrize("bits", [1, 3, 7, 8, 9, 15, 16, 17, 24, 25, 32])
def test_signed_cumsum(bits):
    """Biased narrow-plane scan of unzigzagged <bits>-wide deltas (round 4):
    exact for the full signed range at every width, including the >=25-bit
    passthrough to the generic 4-plane scan."""
    rng = np.random.default_rng(bits)
    lo = -(1 << (bits - 1))
    d = rng.integers(lo, 1 << (bits - 1), (3, GROUP), dtype=np.int64).astype(
        np.int32
    ).view(np.uint32)
    # force the compiled path: group_cumsum consults use_interpret()
    from giddy_tpu.kernels.common import force_compiled_trace

    with force_compiled_trace():
        out = np.asarray(lanes.signed_cumsum(jnp.asarray(d), bits))
    assert (out == _want(d)).all()


def test_roll_scan_matches():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 2**32, (3, GROUP), dtype=np.uint32)
    out = np.asarray(_roll_cumsum(jnp.asarray(x)))
    assert (out == _want(x)).all()


@pytest.mark.parametrize("bits", [1, 3, 7, 8, 9, 15, 16, 24, 25, 32])
@pytest.mark.parametrize("rows", [1, 3])
def test_signed_double_cumsum(bits, rows):
    """Closed-form double prefix (bf16 ramp matmul + tile carries) vs two
    np.cumsum passes, full signed range per width; >=25 bits falls back to
    the scan pair."""
    from giddy_tpu.kernels.common import force_compiled_trace

    rng = np.random.default_rng(bits * 10 + rows)
    d = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), (rows, GROUP),
                     dtype=np.int64).astype(np.int32).view(np.uint32)
    with force_compiled_trace():
        out = np.asarray(lanes.signed_double_cumsum(jnp.asarray(d), bits))
    want = np.cumsum(np.cumsum(d, axis=1, dtype=np.uint32), axis=1, dtype=np.uint32)
    assert (out == want).all()


def _want_xor(x: np.ndarray) -> np.ndarray:
    return np.bitwise_xor.accumulate(x, axis=1)


@pytest.mark.parametrize("rows", [1, 3, 8])
def test_tiled_cumxor(rows):
    rng = np.random.default_rng(rows + 100)
    x = rng.integers(0, 2**32, (rows, GROUP), dtype=np.uint32)
    out = np.asarray(lanes._tiled_cumxor(jnp.asarray(x)))
    assert (out == _want_xor(x)).all()
    flat = np.asarray(lanes._flat_cumxor(jnp.asarray(x)))
    assert (flat == _want_xor(x)).all()


@pytest.mark.parametrize("bits", [1, 2, 4, 9, 32])
def test_mxu_cumxor(bits):
    rng = np.random.default_rng(bits + 200)
    x = rng.integers(0, 1 << bits, (3, GROUP), dtype=np.uint64).astype(np.uint32)
    out = np.asarray(lanes._mxu_cumxor(jnp.asarray(x), bits))
    assert (out == _want_xor(x)).all()
