"""Seeded randomized sweep: scheme x size x data-shape combinations,
oracle round-trip + device-vs-oracle bit-exactness (SURVEY.md §5.2's
property-test role without a hypothesis dependency)."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.util import GROUP

SCHEMES = ["nbit", "for", "delta", "dict", "rle", "rpe", "model", "bitmap", "dzbf", "dzbv", "patched", "raw"]


@pytest.mark.parametrize("trial", range(24))
def test_fuzz_roundtrip(trial):
    rng = np.random.default_rng(1000 + trial)
    scheme = SCHEMES[trial % len(SCHEMES)]
    n = int(rng.integers(1, 3 * GROUP))
    hard = bool(rng.integers(0, 2))
    v = gen_column(scheme, n, rng, hard=hard)
    col = gt.encode(v, scheme)
    ref = gt.decode_ref(col)
    np.testing.assert_array_equal(ref, v, err_msg=f"{scheme} n={n} hard={hard} (oracle)")
    dev = np.asarray(gt.decode(col))
    np.testing.assert_array_equal(dev, ref, err_msg=f"{scheme} n={n} hard={hard} (device)")


@pytest.mark.parametrize("trial", range(6))
def test_fuzz_partial_ranges(trial):
    from giddy_tpu.partial import GroupSlicer, decode_ref_groups

    rng = np.random.default_rng(2000 + trial)
    scheme = ["nbit", "delta", "rle", "for", "dict", "patched"][trial]
    ng = int(rng.integers(2, 7))
    v = gen_column(scheme, ng * GROUP + int(rng.integers(0, GROUP)), rng)
    col = gt.encode(v, scheme)
    sl = GroupSlicer(col)
    for _ in range(3):
        g0 = int(rng.integers(0, sl.ng))
        g1 = int(rng.integers(g0 + 1, sl.ng + 1))
        np.testing.assert_array_equal(
            sl.decode(g0, g1), decode_ref_groups(col, g0, g1),
            err_msg=f"{scheme} [{g0},{g1})",
        )
