"""NBit unpack — Pallas decoder (FORMAT.md §1.1; BASELINE configs[0]).

Replaces libgiddy's per-lane ``bfe``/funnel-shift unpack inner loop
(SURVEY.md call stack CS-2 hot loop) with 32 constant-shift full-vector ops
per block row. Also backs dzbf (B = 8·w, FORMAT §1.9).
"""

from __future__ import annotations

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import unpack_to


def build(col: EncodedColumn):
    bits = col.params["bits"] if col.scheme == "nbit" else 8 * col.params["width"]
    ng = num_groups(col.n)

    def kernel(in_ref, out_ref):
        unpack_to(out_ref, in_ref[:], bits)

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES])

    def decode(streams):
        return call(streams["packed"]).reshape(ng * GROUP)

    return decode


registry.register_device("nbit", build)
registry.register_device("dzbf", build)
