"""Per-frame linear model — CPU reference codec (FORMAT.md §1.7).

Upstream analog: libgiddy ``src/kernels/decompression/model.cuh``
(SURVEY.md §3.1): a per-frame model predicts values, the stream stores
residuals; constant model = FOR, linear model handles sorted/sequential
columns. Coefficients are integer (wrapping int32) so decode is bit-exact.
"""

from __future__ import annotations

import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import (
    GROUP,
    bits_needed,
    cdiv,
    dtype_to_u32,
    pad_to_groups,
    u32_to_dtype,
    unzigzag,
    zigzag,
)
from .lmp import lmp_pack, lmp_unpack


def encode(
    values: np.ndarray,
    *,
    bits: int | None = None,
    frame_len: int = GROUP,
    name: str = "col",
) -> EncodedColumn:
    if frame_len % GROUP:
        raise ValueError(f"frame_len must be a multiple of GROUP={GROUP}")
    values = np.asarray(values)
    n = values.shape[0]
    u32 = dtype_to_u32(values)
    # Pad with the last value: a zero tail would wreck the last frame's
    # linear fit (endpoint slope through 0) and force 32-bit residuals.
    fill = int(u32[-1]) if n else 0
    u = pad_to_groups(u32, fill=fill)
    n_pad = u.shape[0]
    nf = cdiv(n_pad, frame_len)
    upad = np.full(nf * frame_len, fill, dtype=np.uint32)
    upad[:n_pad] = u
    frames = upad.reshape(nf, frame_len)
    # Integer linear fit, all frames at once: slope = rounded float64
    # endpoint slope, intercept = unsigned-min residual (keeps offsets
    # non-negative-ish and zigzag small). Any (a, b) decodes losslessly —
    # only compression is at stake. All arithmetic wraps in uint32; frames
    # are always full (padded), so frame_len >= 2 is guaranteed.
    b64 = np.round(
        (frames[:, -1].astype(np.float64) - frames[:, 0].astype(np.float64)) / (frame_len - 1)
    ).astype(np.int64)
    coef_b = b64.astype(np.uint32).view(np.int32)
    pos = np.arange(frame_len, dtype=np.uint32)
    slope = coef_b.view(np.uint32)[:, None] * pos  # wraps like (i*b) & 0xFFFFFFFF
    resid0 = frames - slope  # uint32 wrap == (frame - pred(a=0)) mod 2^32
    coef_a = resid0.min(axis=1).view(np.int32)
    pred = coef_a.view(np.uint32)[:, None] + slope
    resid = (frames - pred).view(np.int32)
    z = zigzag(resid.reshape(-1)[:n_pad])
    if bits is None:
        bits = bits_needed(int(z.max(initial=0)))
    return EncodedColumn(
        name=name,
        scheme="model",
        dtype=str(values.dtype),
        n=n,
        params={"bits": int(bits), "frame_len": int(frame_len), "kind": "linear"},
        streams={"packed": lmp_pack(z, bits), "coef_a": coef_a, "coef_b": coef_b},
    )


def decode(col: EncodedColumn) -> np.ndarray:
    bits, frame_len = col.params["bits"], col.params["frame_len"]
    z = lmp_unpack(col.streams["packed"], bits, col.n)
    resid = unzigzag(z).astype(np.int64)
    a = col.streams["coef_a"].astype(np.int64)
    b = col.streams["coef_b"].astype(np.int64)
    j = np.arange(col.n, dtype=np.int64)
    f = j // frame_len
    p = j % frame_len
    u = ((a[f] + b[f] * p + resid) & 0xFFFFFFFF).astype(np.uint32)
    return u32_to_dtype(u, col.dtype)


registry.register("model", encode, decode)
