"""Cascade — device decoder (FORMAT.md §1.14).

Decode = the inner scheme's registered Pallas decoder on the ``c_``-prefixed
code streams, then a dictionary gather (same XLA ``take`` the plain dict
decoder uses; the dictionary stays VMEM-resident). The inner builder is
metadata-only, so any registered inner scheme composes without new kernel
code — the device analog of the reference composing schemes in the caller
(SURVEY.md §3.2 compressed-indices patching is the same pattern).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..ref.cascade import codes_column


def build(col: EncodedColumn):
    inner = codes_column(col, streams={})
    inner_decode = registry.get(inner.scheme).decode_device(inner)

    def decode(streams):
        c_streams = {k[2:]: v for k, v in streams.items() if k.startswith("c_")}
        codes = inner_decode(c_streams)
        return jnp.take(streams["values"], codes.astype(jnp.int32), axis=0)

    return decode


def prep(col: EncodedColumn) -> dict:
    inner = codes_column(col)
    p = registry.get(inner.scheme).prep_streams
    c_streams = p(inner) if p is not None else inner.streams
    return {"values": col.streams["values"], **{f"c_{k}": v for k, v in c_streams.items()}}


registry.register_device("cascade", build, prep)
