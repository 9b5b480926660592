"""Launch-config resolution (registry.plan — the analog of libgiddy's
resolve_launch_configuration, SURVEY.md §3.8)."""

import numpy as np

from giddy_tpu.registry import plan
from giddy_tpu.util import GROUP, cdiv


def test_blocks_are_tileable():
    """Mosaic needs block rows %8 or == array rows; grid covers all groups."""
    for n in [1, GROUP, 7 * GROUP, 127 * GROUP + 5, 8192 * GROUP]:
        for bpg in [4 * (1024 + GROUP), 4 * (32 * 1024 + GROUP) * 2]:
            p = plan(n, bpg)
            assert p.groups_per_block == p.n_groups or p.groups_per_block % 8 == 0
            assert p.grid * p.groups_per_block >= p.n_groups
            assert (p.grid - 1) * p.groups_per_block < max(p.n_groups, 1)


def test_budget_respected_for_large_columns():
    p = plan(8192 * GROUP, 2 * 4 * (9 * 1024 + GROUP))
    # double-buffered working set stays near the budget (min 8 rows)
    assert 8 <= p.groups_per_block <= 64
    assert p.groups_per_block & (p.groups_per_block - 1) == 0  # power of two


def test_tiny_column_single_block():
    p = plan(3 * GROUP, 4 * (1024 + GROUP))
    assert p.grid == 1 and p.groups_per_block == 3


def test_device_addressing_limit_guard():
    """Columns beyond 2**31 padded elements must fail fast with a pointer
    to the chunked paths, not silently mis-index int32 positions."""
    import pytest

    from giddy_tpu.api import get_decoder
    from giddy_tpu.format import EncodedColumn

    big = EncodedColumn(
        name="huge", scheme="nbit", dtype="int32", n=2**31 + 1,
        params={"bits": 9}, streams={},
    )
    with pytest.raises(NotImplementedError, match="stream_decode"):
        get_decoder(big)
