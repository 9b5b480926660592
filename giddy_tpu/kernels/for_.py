"""Frame-of-reference — Pallas decoder (FORMAT.md §1.2).

The reference broadcasts the frame ref via shared memory / warp shuffle
(libgiddy ``frame_of_reference.cuh``, SURVEY.md §3.1); here the per-group
reference rides in as a (rows, 1) block and broadcasts over lanes for free.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import block_spec, row_blocked_call
from .lanes import unpack_map_to


def build(col: EncodedColumn):
    bits = col.params["bits"]
    frame_len = col.params["frame_len"]
    ng = num_groups(col.n)
    gpf = frame_len // GROUP  # groups per frame

    def kernel(in_ref, ref_ref, out_ref):
        # materialize the lane broadcast once, not per slot
        ref = jnp.broadcast_to(ref_ref[:], (ref_ref.shape[0], LANES))
        unpack_map_to(out_ref, in_ref[:], bits, lambda v, i: v + ref)

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES, 1])

    def decode(streams):
        refs = streams["refs"]  # (nf,) uint32
        per_group = jnp.repeat(refs, gpf, total_repeat_length=refs.shape[0] * gpf)
        per_group = per_group[:ng].reshape(ng, 1)
        return call(streams["packed"], per_group).reshape(ng * GROUP)

    return decode


registry.register_device("for", build)
