"""RLE / RPE — device decoders (FORMAT.md §1.5–1.6; BASELINE configs[3]).

The irregular kernel of the family (libgiddy ``run_length_encoding.cuh``,
SURVEY.md call stack CS-4). Where the CUDA reference expands runs with a
block-local scan + per-thread binary search, we reformulate run expansion
as a **sparse delta problem**: scatter each run's value-jump
(vals[r] - vals[r-1], a handful per group) onto its start position, then
one dense per-group inclusive cumsum — the same VPU log-scan the delta
kernel uses — reconstructs the column. The scatter touches ~R_pad values
per 32768-element group; the cumsum runs at delta-kernel speed, so decode
is O(1) vector work per element regardless of run lengths.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .. import registry
from ..format import EncodedColumn
from ..registry import plan
from ..util import GROUP, num_groups
from .common import block_spec, use_interpret
from .lanes import group_cumsum


def _cumsum_rows_call(ng: int):
    pl_plan = plan(ng * GROUP, 2 * 4 * (GROUP + GROUP))
    r = pl_plan.groups_per_block

    def kernel(in_ref, out_ref):
        out_ref[:] = group_cumsum(in_ref[:])

    return pl.pallas_call(
        kernel,
        grid=(pl_plan.grid,),
        in_specs=[block_spec((r, GROUP), lambda i: (i, 0))],
        out_specs=block_spec((r, GROUP), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ng, GROUP), jnp.uint32),
        interpret=use_interpret(),
    )


def _build(col: EncodedColumn, *, positions: bool):
    r_pad = col.params["r_pad"]
    ng = num_groups(col.n)
    cumsum = _cumsum_rows_call(ng)
    key = "run_starts" if positions else "run_ends"

    def decode(streams):
        vals = streams["run_values"].reshape(ng, r_pad)
        bounds = streams[key].reshape(ng, r_pad).astype(jnp.int32)
        if positions:
            starts = bounds
        else:
            # start of run r = end of run r-1; padded runs start at the
            # sentinel GROUP (their value-jump is 0, so collisions with the
            # next group's position 0 are harmless under scatter-add).
            starts = jnp.concatenate(
                [jnp.zeros((ng, 1), jnp.int32), bounds[:, :-1]], axis=1
            )
        # value jump at each run start (uint32 wrap); padded runs repeat the
        # last real value -> jump 0 by construction (FORMAT §1.5).
        prev = jnp.concatenate([jnp.zeros((ng, 1), vals.dtype), vals[:, :-1]], axis=1)
        dv = vals - prev
        gidx = jnp.arange(ng, dtype=jnp.int32).reshape(ng, 1)
        pos = (gidx * GROUP + starts).reshape(-1)
        dense = jnp.zeros((ng * GROUP,), jnp.uint32)
        dense = dense.at[pos].add(dv.reshape(-1), mode="drop")
        return cumsum(dense.reshape(ng, GROUP)).reshape(ng * GROUP)

    return decode


def build_rle(col: EncodedColumn):
    return _build(col, positions=False)


def build_rpe(col: EncodedColumn):
    return _build(col, positions=True)


registry.register_device("rle", build_rle)
registry.register_device("rpe", build_rpe)
