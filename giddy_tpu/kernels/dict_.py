"""Dictionary — device decoder (FORMAT.md §1.4; BASELINE configs[2]).

Codes unpack in the Pallas LMP kernel; the dictionary gather itself runs as
an XLA `take` for now (libgiddy stages the dictionary in shared memory,
``dictionary.cuh`` SURVEY.md §3.1 — the VMEM analog is automatic here since
the dictionary is small and XLA keeps it resident). A fused Pallas
gather-by-select path for tiny dictionaries is a planned optimization.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import unpack_to


def build(col: EncodedColumn):
    bits = col.params["bits"]
    ng = num_groups(col.n)

    def kernel(in_ref, out_ref):
        unpack_to(out_ref, in_ref[:], bits)

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES])

    def decode(streams):
        codes = call(streams["codes"]).reshape(ng * GROUP)
        return jnp.take(streams["values"], codes.astype(jnp.int32), axis=0)

    return decode


registry.register_device("dict", build)
