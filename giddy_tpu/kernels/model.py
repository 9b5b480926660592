"""Per-frame linear model — Pallas decoder (FORMAT.md §1.7).

Prediction a + b·p is evaluated per element on the VPU: the per-group
affine terms (A_g = a_f + b_f·p0, B_g = b_f) ride in as (rows, 1) blocks
and multiply a linear-position iota (libgiddy ``model.cuh`` analog,
SURVEY.md §3.1).
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
from ..util import LANES as _LANES


def build(col: EncodedColumn):
    bits = col.params["bits"]
    frame_len = col.params["frame_len"]
    ng = num_groups(col.n)
    g = np.arange(ng, dtype=np.int64)
    fidx = jnp.asarray((g * GROUP) // frame_len)
    p0 = jnp.asarray(((g * GROUP) % frame_len).astype(np.uint32))

    def kernel(in_ref, a_ref, b_ref, out_ref):
        rows = a_ref.shape[0]
        # slot i's positions are i*LANES + lane:
        # pred = (a + b*lane) + (b*LANES)*i — materialize both lane-broadcasts
        # once; the per-slot term is then a full-vector multiply-add.
        lane = jax.lax.broadcasted_iota(jnp.uint32, (rows, _LANES), 1)
        base = jnp.broadcast_to(a_ref[:], (rows, _LANES)) + b_ref[:] * lane
        step = jnp.broadcast_to(b_ref[:] * jnp.uint32(_LANES), (rows, _LANES))
        unpack_map_to(
            out_ref,
            in_ref[:],
            bits,
            lambda v, i: base + step * jnp.uint32(i) + unzigzag(v),
        )

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES, 1, 1])

    def decode(streams):
        a = streams["coef_a"][fidx]
        b = streams["coef_b"][fidx]
        a_g = (a + b * p0).reshape(ng, 1)
        b_g = b.reshape(ng, 1)
        return call(streams["packed"], a_g, b_g).reshape(ng * GROUP)

    return decode


registry.register_device("model", build)
