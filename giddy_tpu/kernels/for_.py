"""Frame-of-reference — Pallas decoder (FORMAT.md §1.2).

The reference broadcasts the frame ref via shared memory / warp shuffle
(libgiddy ``frame_of_reference.cuh``, SURVEY.md §3.1); here the per-group
reference is expanded on the host (prep_streams — 4 bytes per 128 KiB of
output) and rides in as a (rows, 1) block that broadcasts over lanes for
free, fused into the unpack loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import unpack_map_to


def prep(col: EncodedColumn) -> dict:
    if "refs_g" in col.streams:  # already in per-group (dist/slice) form
        return col.streams
    gpf = col.params["frame_len"] // GROUP
    ng = num_groups(col.n)
    refs_g = np.repeat(col.streams["refs"], gpf)[:ng]
    return {"packed": col.streams["packed"], "refs_g": refs_g.reshape(ng, 1)}


def build(col: EncodedColumn, out_store=None):
    bits = col.params["bits"]
    ng = num_groups(col.n)
    lut = col.params.get("_lut_d_pad")  # cascade's fused dictionary stage

    def kernel(in_ref, ref_ref, out_ref):
        # materialize the lane broadcast once, not per slot
        ref = jnp.broadcast_to(ref_ref[:], (ref_ref.shape[0], LANES))
        unpack_map_to(out_ref, in_ref[:], bits, lambda v, i: v + ref)

    call = row_blocked_call(
        kernel, ng=ng, in_widths=[bits * LANES, 1], lut_d_pad=lut,
        out_dtype=out_store or jnp.uint32,
    )

    def decode(streams):
        args = (streams["_lut"],) if lut else ()
        return call(*args, streams["packed"], streams["refs_g"]).reshape(ng * GROUP)

    return decode


registry.register_device("for", build, prep, narrow_store=True)
