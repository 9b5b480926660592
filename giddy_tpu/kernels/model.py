"""Per-frame linear model — Pallas decoder (FORMAT.md §1.7).

Prediction a + b·p is evaluated per element on the VPU: the per-group
affine terms (A_g = a_f + b_f·p0, B_g = b_f) ride in as (rows, 1) blocks
and multiply a linear-position iota (libgiddy ``model.cuh`` analog,
SURVEY.md §3.1).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import linear_iota, unpack_lanes, unzigzag


def build(col: EncodedColumn):
    bits = col.params["bits"]
    frame_len = col.params["frame_len"]
    ng = num_groups(col.n)
    g = np.arange(ng, dtype=np.int64)
    fidx = jnp.asarray((g * GROUP) // frame_len)
    p0 = jnp.asarray(((g * GROUP) % frame_len).astype(np.uint32))

    def kernel(in_ref, a_ref, b_ref, out_ref):
        resid = unzigzag(unpack_lanes(in_ref[:], bits))
        rows = resid.shape[0]
        pred = a_ref[:] + b_ref[:] * linear_iota(rows)
        out_ref[:] = pred + resid

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES, 1, 1])

    def decode(streams):
        a = streams["coef_a"][fidx]
        b = streams["coef_b"][fidx]
        a_g = (a + b * p0).reshape(ng, 1)
        b_g = b.reshape(ng, 1)
        return call(streams["packed"], a_g, b_g).reshape(ng * GROUP)

    return decode


registry.register_device("model", build)
