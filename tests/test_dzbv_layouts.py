"""dzbv's three prep-time layouts (kernels/dzbv.py, round 5): the tile
layout (default), the group-row layout, and the two-pass XLA fallback must
all decode bit-exactly, and the layout chooser must pick tile -> group-row
-> XLA as skew rises. The on-disk format is layout-independent."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.format import EncodedColumn
from giddy_tpu.kernels import dzbv as kdzbv
from giddy_tpu.util import GROUP


def _mixed(n, seed=0):
    rng = np.random.default_rng(seed)
    mag = rng.integers(0, 4, n)
    return (
        (rng.integers(0, 2**31, n).astype(np.uint32) >> (8 * (3 - mag)).astype(np.uint32))
        .astype(np.uint32)
    )


def _decode_with_streams(col, streams):
    """Decode forcing a specific prepped-stream layout (kernels/dzbv._prep
    passes pre-anchored streams through untouched)."""
    forced = EncodedColumn(
        name=col.name, scheme="dzbv", dtype=col.dtype, n=col.n,
        params=col.params, streams=streams,
    )
    return np.asarray(gt.decode(forced)).view(np.uint32)


@pytest.mark.parametrize("n", [100, GROUP, 3 * GROUP + 17])
def test_three_layouts_agree(n):
    v = _mixed(n)
    col = gt.encode(v.view(np.int32), "dzbv")
    tile = kdzbv.tile_prep(col)
    grow = kdzbv.group_prep(col)
    assert tile is not None and grow is not None
    d_tile = _decode_with_streams(col, tile)
    d_grow = _decode_with_streams(col, grow)
    d_xla = _decode_with_streams(col, col.streams)  # raw planes -> XLA path
    np.testing.assert_array_equal(d_tile[:n], v)
    np.testing.assert_array_equal(d_grow[:n], v)
    np.testing.assert_array_equal(d_xla[:n], v)


def test_tile_layout_is_default_and_padding_capped():
    v = _mixed(8 * GROUP, seed=3)
    col = gt.encode(v.view(np.int32), "dzbv")
    pre = kdzbv._prep(col)
    assert any(f"trow{k}" in pre for k in (1, 2, 3))
    # the stride quantization must respect the documented cap: prepped
    # stream bytes <= compressed + PAD_CAP * decoded
    prep_bytes = sum(a.nbytes for a in pre.values())
    cap = col.nbytes_compressed + kdzbv.PAD_CAP * col.nbytes_decoded
    assert prep_bytes <= cap + 4 * GROUP, (prep_bytes, cap)


def test_skewed_column_falls_back():
    """All wide values clustered in a few tiles: the per-tile stride would
    be 128 with near-empty tiles elsewhere -> tile layout declines; the
    group-row layout (coarser quantum) or the XLA path must still decode."""
    n = 8 * GROUP
    v = np.ones(n, np.uint32)
    # one fully-wide tile per group, the rest 1-byte
    for g in range(8):
        v[g * GROUP : g * GROUP + 128] = 0x7F00_0001
    col = gt.encode(v.view(np.int32), "dzbv")
    assert kdzbv.tile_prep(col) is None
    np.testing.assert_array_equal(np.asarray(gt.decode(col)).view(np.uint32), v)


def test_slicer_uses_tile_layout():
    from giddy_tpu.partial import GroupSlicer

    v = _mixed(6 * GROUP + 5, seed=7)
    col = gt.encode(v.view(np.int32), "dzbv")
    sl = GroupSlicer(col)
    assert sl._dz_tile_s is not None
    sub = sl.slice(2, 5)
    assert any(f"trow{k}" in sub.streams for k in (1, 2, 3))
    got = np.asarray(gt.decode(sub)).view(np.uint32)
    np.testing.assert_array_equal(got, v[2 * GROUP : 5 * GROUP])


def test_slicer_zero_byte_plane_slice():
    """A slice whose window contains no plane-3 bytes still builds a
    (zero) trow of the forced global stride."""
    n = 4 * GROUP
    v = np.ones(n, np.uint32)
    v[3 * GROUP + 50] = 0x0500_0000  # single 4-byte value in the last group
    # spread some 2-byte values so plane1 is dense everywhere
    v[::3] = 600
    col = gt.encode(v.view(np.int32), "dzbv")
    from giddy_tpu.partial import GroupSlicer

    sl = GroupSlicer(col)
    if sl._dz_tile_s is None:
        pytest.skip("column chose a non-tile layout")
    sub = sl.slice(0, 2)  # no plane-3 bytes in this window
    got = np.asarray(gt.decode(sub)).view(np.uint32)
    np.testing.assert_array_equal(got, v[: 2 * GROUP])
