"""Random-access / resume decode: any group range independently
(SURVEY.md §6 checkpoint/resume analog)."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.partial import decode_groups, decode_ref_groups
from giddy_tpu.util import GROUP

SCHEMES = ["nbit", "for", "delta", "delta2", "dict", "rle", "rpe", "model", "bitmap", "dzbf", "dzbv", "raw", "patched", "alp"]


def test_dzbv_chunks_share_specializations():
    """Equal-size dzbv slices must produce few distinct static keys (plane
    lengths are data-dependent; the slicer quantizes them so streaming does
    not recompile per chunk)."""
    from giddy_tpu.partial import GroupSlicer

    rng = np.random.default_rng(23)
    v = gen_column("dzbv", 16 * GROUP, rng)
    col = gt.encode(v, "dzbv")
    s = GroupSlicer(col)
    keys = {s.slice(g, g + 2).static_key() for g in range(0, 16, 2)}
    assert len(keys) <= 3, len(keys)
    for g in range(0, 16, 2):
        np.testing.assert_array_equal(s.decode(g, g + 2), v[g * GROUP : (g + 2) * GROUP])


@pytest.mark.parametrize("scheme", SCHEMES)
def test_group_range_matches_full_decode(scheme):
    rng = np.random.default_rng(21)
    v = gen_column(scheme, 5 * GROUP + 77, rng)
    col = gt.encode(v, scheme)
    for g0, g1 in [(0, 1), (2, 4), (5, 6), (0, 6)]:
        out = decode_groups(col, g0, g1)
        np.testing.assert_array_equal(out, decode_ref_groups(col, g0, g1), err_msg=f"{scheme} [{g0},{g1})")


def test_patched_compressed_range():
    rng = np.random.default_rng(22)
    v = gen_column("patched", 4 * GROUP, rng)
    col = gt.encode(v, "patched", kind="compressed")
    out = decode_groups(col, 1, 3)
    np.testing.assert_array_equal(out, v[GROUP : 3 * GROUP])


def test_take_point_lookups():
    """take() gathers arbitrary positions, decoding only containing groups."""
    from giddy_tpu.partial import take

    rng = np.random.default_rng(24)
    from giddy_tpu.datagen import CORE_SCHEMES

    for scheme in CORE_SCHEMES:
        v = gen_column(scheme, 6 * GROUP + 45, rng)
        col = gt.encode(v, scheme)
        idx = np.concatenate([
            rng.integers(0, col.n, 50),
            [0, col.n - 1, GROUP - 1, GROUP, 3 * GROUP + 7],
        ])
        rng.shuffle(idx)
        np.testing.assert_array_equal(take(col, idx), v[idx], err_msg=scheme)
    # empty + shape preservation + bounds
    assert take(col, np.empty((0,), np.int64)).shape == (0,)
    np.testing.assert_array_equal(take(col, idx.reshape(5, 11)), v[idx].reshape(5, 11))
    with pytest.raises(IndexError):
        take(col, [col.n])


def test_take_touches_only_needed_groups(monkeypatch):
    """The point-lookup cost contract (VERDICT r3 next #7): touched groups
    ∝ touched indices, never the whole column — 3 scattered points in a
    200-group column must decode a handful of (pow2-rounded) ranges."""
    from giddy_tpu import partial

    calls: list[tuple[int, int]] = []
    orig = partial.GroupSlicer.decode

    def spy(self, g0, g1):
        calls.append((g0, g1))
        return orig(self, g0, g1)

    monkeypatch.setattr(partial.GroupSlicer, "decode", spy)
    v = np.arange(200 * GROUP, dtype=np.int32) % 100000
    col = gt.encode(v, "delta")
    idx = np.array([5, 3 * GROUP + 7, 150 * GROUP + 1])
    np.testing.assert_array_equal(partial.take(col, idx), v[idx])
    touched = sum(g1 - g0 for g0, g1 in calls)
    assert touched <= 6, calls  # 3 isolated points, pow2-rounded ranges


def test_take_wide_column():
    from giddy_tpu.partial import take

    rng = np.random.default_rng(25)
    v = rng.integers(-(2**50), 2**50, 3 * GROUP + 5, dtype=np.int64)
    col = gt.encode(v, "wide")
    idx = rng.integers(0, col.n, 64)
    np.testing.assert_array_equal(take(col, idx), v[idx])


def test_bad_range_rejected():
    col = gt.encode(np.zeros(GROUP, np.int32), "nbit")
    with pytest.raises(ValueError):
        decode_groups(col, 1, 1)
