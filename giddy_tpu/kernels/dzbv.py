"""Discard zero bytes, variable — device decoder (FORMAT.md §1.10).

Byte planes unpack in the Pallas LMP(8) kernel; rank computation (global
cumsum of width masks) and the plane gathers run in XLA. The byte-plane
redesign (vs. the reference's per-element byte offsets,
``discard_zero_bytes_variable.cuh`` SURVEY.md §3.1) keeps every gather
narrow and monotone.
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups
from .common import row_blocked_call
from .lanes import unpack_to


def _unpack_call(ng: int, bits: int):
    def kernel(in_ref, out_ref):
        unpack_to(out_ref, in_ref[:], bits)

    return row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES])


def build(col: EncodedColumn):
    plane_lens = col.params["plane_lens"]
    ng = num_groups(col.n)
    n_pad = ng * GROUP
    width_call = _unpack_call(ng, 2)
    plane_calls = {k: _unpack_call(num_groups(plane_lens[k]), 8) for k in range(4) if k == 0 or plane_lens[k] > 0}

    def decode(streams):
        w = width_call(streams["widths"]).reshape(n_pad) + jnp.uint32(1)
        out = plane_calls[0](streams["plane0"]).reshape(-1)[:n_pad]
        for k in (1, 2, 3):
            if plane_lens[k] == 0:
                continue
            plane = plane_calls[k](streams[f"plane{k}"]).reshape(-1)
            mask = w > k
            rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
            vals = jnp.take(plane, jnp.clip(rank, 0), axis=0)
            out = out | (jnp.where(mask, vals, 0) << jnp.uint32(8 * k))
        return out

    return decode


registry.register_device("dzbv", build)
