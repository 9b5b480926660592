"""XOR-delta — Pallas decoder (FORMAT.md §1.15; beyond-parity scheme).

Gorilla-style float compression recast for the TPU: the decoder is the
delta kernel with the adds swapped for XORs — unpack, per-group
prefix-XOR log-scan, XOR the anchor. Same anchor machinery, same
zero-cross-tile-dependency story, so sharding works unchanged.
"""

from __future__ import annotations

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import group_cumxor, unpack_lanes


def build(col: EncodedColumn):
    bits = col.params["bits"]
    ng = num_groups(col.n)

    def kernel(in_ref, anchor_ref, out_ref):
        z = unpack_lanes(in_ref[:], bits)
        out_ref[:] = group_cumxor(z, bits) ^ anchor_ref[:]

    call = row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES, 1])

    def decode(streams):
        anchors = streams["anchors"].reshape(ng, 1)
        return call(streams["packed"], anchors).reshape(ng * GROUP)

    return decode


registry.register_device("xordelta", build)
