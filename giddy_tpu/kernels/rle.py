"""RLE / RPE — device decoders (FORMAT.md §1.5–1.6; BASELINE configs[3]).

The irregular kernel of the family (libgiddy ``run_length_encoding.cuh``,
SURVEY.md call stack CS-4). Encode-time run splitting gives every GROUP a
fixed-stride, self-contained run table, so decode is a batched vectorized
search (compare-all against the small per-group table) + a row gather —
run expansion with zero cross-tile dependencies. v1 runs the search in XLA
(`searchsorted(method='compare_all')`); a fused Pallas select-accumulate
kernel is the planned fast path for small R_pad.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, num_groups
from .lanes import linear_iota


def _build(col: EncodedColumn, *, positions: bool):
    r_pad = col.params["r_pad"]
    ng = num_groups(col.n)
    key = "run_starts" if positions else "run_ends"

    # compare_all is a dense (queries x runs) compare — ideal on the VPU for
    # the small per-group run tables the scheme exists for; fall back to
    # binary search when a group degenerates to run-per-element.
    method = "compare_all" if r_pad <= 256 else "scan_unrolled"

    def decode(streams):
        vals = streams["run_values"].reshape(ng, r_pad)
        bounds = streams[key].reshape(ng, r_pad).astype(jnp.int32)
        j = jnp.arange(GROUP, dtype=jnp.int32)

        def one_group(b, v):
            rid = jnp.searchsorted(b, j, side="right", method=method)
            if positions:
                rid = jnp.maximum(rid - 1, 0)
            return jnp.take(v, rid, axis=0)

        out = jax.vmap(one_group)(bounds, vals)
        return out.reshape(ng * GROUP)

    return decode


def build_rle(col: EncodedColumn):
    return _build(col, positions=False)


def build_rpe(col: EncodedColumn):
    return _build(col, positions=True)


registry.register_device("rle", build_rle)
registry.register_device("rpe", build_rpe)
