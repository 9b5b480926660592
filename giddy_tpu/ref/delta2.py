"""Delta-of-delta with per-group anchor + slope — CPU reference codec
(FORMAT.md §1.17).

Beyond-parity scheme (libgiddy stops at first-order delta,
``src/kernels/decompression/delta.cuh`` — SURVEY.md §3.1; the idea here is
Gorilla's timestamp compression, Pelkonen et al. VLDB'15, recast onto this
framework's anchor machinery): regularly-sampled series have near-constant
deltas, so the *second* difference concentrates near zero and LMP-packs
narrower than the deltas themselves. Each group carries two anchors — the
entering value and the entering delta (slope) — which keeps decode
tile-local exactly like delta: no cross-group (or cross-chip) carry.

Group-local decode identity (wrapping int32; see kernels/delta2.py for the
device twin): with ``s`` the packed second differences,
``v[g*G + j] = anchor[g] + (j+1)*slope[g] + cumsum(cumsum(s))[j]``.
"""

from __future__ import annotations

import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import (
    GROUP,
    bits_needed,
    dtype_to_u32,
    num_groups,
    pad_to_groups,
    u32_to_dtype,
    unzigzag,
    zigzag,
)
from .lmp import lmp_pack, lmp_unpack


def encode(values: np.ndarray, *, bits: int | None = None, name: str = "col") -> EncodedColumn:
    values = np.asarray(values)
    n = values.shape[0]
    ng = num_groups(n)
    u = dtype_to_u32(values).astype(np.int32, copy=False)  # wrapping arithmetic
    # Group 0 gets a VIRTUAL predecessor continuing the series backward at
    # the first real delta (anchors[0] = v[0] - slope0, slopes[0] = slope0
    # = v[1] - v[0]): without it, s[1] would carry the full first delta and
    # a single 2000-ish entry forces the global width from ~3 to ~11 bits
    # on regularly-sampled data. Pad s entries are 0 (pad positions
    # extrapolate the last slope) — every consumer masks pads by global
    # position (aggregate._slot_fold, query filter bitmaps, topk sentinels,
    # zonemap slices to n), so pad VALUES are free to be anything.
    slope0 = np.int32(0)
    if n >= 2:  # array op: silent wrap (scalar ops warn on overflow)
        slope0 = np.subtract(u[1:2], u[0:1])[0]
    d = np.zeros(n, dtype=np.int32)
    if n:
        d[0] = slope0  # the virtual d[0]; s[0] = d[0] - slope0 = 0
        np.subtract(u[1:], u[:-1], out=d[1:])
    s = np.zeros(n, dtype=np.int32)
    if n:
        np.subtract(d[1:], d[:-1], out=s[1:])  # s[0] := 0; s[1] = 0 too
    z = pad_to_groups(zigzag(s))  # pad s entries are 0
    anchors = np.zeros(ng, dtype=np.int32)
    slopes = np.zeros(ng, dtype=np.int32)
    if n:
        anchors[0] = np.subtract(u[0:1], slope0)[0]  # virtual v[-1]
        slopes[0] = slope0
        idx = np.arange(1, ng, dtype=np.int64) * GROUP  # g*G <= n-1 for g < ng
        anchors[1:] = u[idx - 1]
        np.subtract(u[idx - 1], u[idx - 2], out=slopes[1:])  # d[g*G - 1]
    if bits is None:
        bits = bits_needed(int(z.max(initial=0)))
    return EncodedColumn(
        name=name,
        scheme="delta2",
        dtype=str(values.dtype),
        n=n,
        params={"bits": int(bits)},
        streams={"packed": lmp_pack(z, bits), "anchors": anchors, "slopes": slopes},
    )


def decode(col: EncodedColumn) -> np.ndarray:
    bits = col.params["bits"]
    ng = num_groups(col.n)
    z = lmp_unpack(col.streams["packed"], bits, ng * GROUP)
    s = unzigzag(z).reshape(ng, GROUP).astype(np.int64)
    # |s| < 2^31, GROUP = 2^15: |cumsum| < 2^46, |cumsum^2| < 2^61 — exact
    # in int64; wrap to uint32 once at the end (FORMAT §1.17).
    cc = np.cumsum(np.cumsum(s, axis=1), axis=1)
    anchors = col.streams["anchors"].astype(np.int64)
    slopes = col.streams["slopes"].astype(np.int64)
    pos1 = np.arange(1, GROUP + 1, dtype=np.int64)
    u = (anchors[:, None] + slopes[:, None] * pos1 + cc).astype(np.uint32)
    return u32_to_dtype(u.reshape(-1)[: col.n], col.dtype)


registry.register("delta2", encode, decode)
