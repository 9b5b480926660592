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


def scatter_prep(run_values: "np.ndarray", bounds: "np.ndarray", *, positions: bool, ng_local: int | None = None) -> dict:
    """Host-side: run tables -> (pos, dv) scatter pairs.

    pos = shard-local flat position of each run start (padded runs land on
    the sentinel GROUP, i.e. the next group's position 0 — harmless under
    scatter-add since their value-jump dv is 0 by the padding rules).
    dv = value jump at each start (uint32 wrap); cumsum(scatter(pos, dv))
    reconstructs the column.
    """
    import numpy as np

    ng, r_pad = bounds.shape
    ng_local = ng if ng_local is None else ng_local
    if positions:
        starts = bounds.astype(np.int64)
    else:
        starts = np.concatenate(
            [np.zeros((ng, 1), np.int64), bounds[:, :-1].astype(np.int64)], axis=1
        )
    vals = run_values.view(np.uint32)
    prev = np.concatenate([np.zeros((ng, 1), np.uint32), vals[:, :-1]], axis=1)
    dv = vals - prev
    g_local = (np.arange(ng, dtype=np.int64) % ng_local).reshape(ng, 1)
    pos = (g_local * GROUP + starts).astype(np.int32)
    return {"pos": pos, "dv": dv}


def _prep(col: EncodedColumn, *, positions: bool) -> dict:
    if "pos" in col.streams:  # already in scatter (dist/slice) form
        return col.streams
    r_pad = col.params["r_pad"]
    ng = num_groups(col.n)
    key = "run_starts" if positions else "run_ends"
    bounds = col.streams[key].reshape(ng, r_pad)
    vals = col.streams["run_values"].reshape(ng, r_pad)
    return scatter_prep(vals, bounds, positions=positions)


def _build(col: EncodedColumn, *, positions: bool):
    ng = num_groups(col.n)
    cumsum = _cumsum_rows_call(ng)

    def decode(streams):
        dense = jnp.zeros((ng * GROUP,), jnp.uint32)
        # flattened scatter positions are nondecreasing by construction
        # (run starts ascend within a group; padded runs land on the next
        # group boundary, dv = 0) — the hint lets XLA skip its sort pass.
        # Not unique: padding sentinels collide with first-run starts.
        dense = dense.at[streams["pos"].astype(jnp.int32).reshape(-1)].add(
            streams["dv"].reshape(-1), mode="drop", indices_are_sorted=True
        )
        return cumsum(dense.reshape(ng, GROUP)).reshape(ng * GROUP)

    return decode


def build_rle(col: EncodedColumn):
    return _build(col, positions=False)


def build_rpe(col: EncodedColumn):
    return _build(col, positions=True)


registry.register_device("rle", build_rle, lambda col: _prep(col, positions=False))
registry.register_device("rpe", build_rpe, lambda col: _prep(col, positions=True))
