"""Per-frame linear model — Pallas decoder (FORMAT.md §1.7).

Prediction a + b·p is evaluated per element on the VPU. The per-group
affine terms (A_g = a_f + b_f·p0, B_g = b_f) are expanded on the HOST
(prep_streams) and cross the jit boundary as (ng, 1) arguments — an XLA
constant-gather prologue for this costs milliseconds of dispatch on some
backends, host NumPy costs microseconds. (libgiddy ``model.cuh`` analog,
SURVEY.md §3.1.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import unpack_map_to, unzigzag


def prep(col: EncodedColumn) -> dict:
    if "a_g" in col.streams:  # already in per-group (dist/slice) form
        return col.streams
    frame_len = col.params["frame_len"]
    ng = num_groups(col.n)
    g = np.arange(ng, dtype=np.int64)
    f = (g * GROUP) // frame_len
    p0 = (g * GROUP) % frame_len
    a = col.streams["coef_a"].astype(np.int64)[f]
    b = col.streams["coef_b"].astype(np.int64)[f]
    a_g = ((a + b * p0) & 0xFFFFFFFF).astype(np.uint32)
    b_g = (b & 0xFFFFFFFF).astype(np.uint32)
    return {
        "packed": col.streams["packed"],
        "a_g": a_g.reshape(ng, 1),
        "b_g": b_g.reshape(ng, 1),
    }


def build(col: EncodedColumn, out_store=None):
    bits = col.params["bits"]
    ng = num_groups(col.n)

    def kernel(in_ref, a_ref, b_ref, out_ref):
        rows = a_ref.shape[0]
        # slot i's positions are i*LANES + lane:
        # pred = (a + b*lane) + (b*LANES)*i — materialize both lane
        # broadcasts once; the per-slot term is a full-vector multiply-add.
        lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, LANES), 1)
        base = jnp.broadcast_to(a_ref[:], (rows, LANES)) + b_ref[:] * lane
        step = jnp.broadcast_to(b_ref[:] * jnp.uint32(LANES), (rows, LANES))
        unpack_map_to(
            out_ref,
            in_ref[:],
            bits,
            lambda v, i: base + step * jnp.uint32(i) + unzigzag(v),
        )

    call = row_blocked_call(
        kernel, ng=ng, in_widths=[bits * LANES, 1, 1],
        out_dtype=out_store or jnp.uint32,
    )

    def decode(streams):
        return call(streams["packed"], streams["a_g"], streams["b_g"]).reshape(ng * GROUP)

    return decode


registry.register_device("model", build, prep, narrow_store=True)
