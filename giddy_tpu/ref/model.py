"""Per-frame model (linear / quadratic) — CPU reference codec (FORMAT.md §1.7).

Upstream analog: libgiddy ``src/kernels/decompression/model.cuh``
(SURVEY.md §3.1): a per-frame model predicts values, the stream stores
residuals; constant model = FOR, linear model handles sorted/sequential
columns. Coefficients are integer (wrapping int32) so decode is bit-exact.

Round 4 (VERDICT r3 next #8 — closes SURVEY §3.1's [M] "linear at
minimum"): per-frame model SELECTION. The encoder fits both the endpoint
linear model and an integer quadratic (least-squares curvature, then the
same endpoint slope/min intercept construction) per frame and keeps
whichever needs the narrower residual; if any frame keeps a curvature
term the column ships as ``kind="poly2"`` with a third coefficient stream
(zero for linear-winning frames — the decode stays ONE fused epilogue
``a + b·p + c·p²``), otherwise the column ships in the round-1 linear
FORMAT (no coef_c). Round 4 also changed linear encodes themselves in two
deliberate ways — the signed-window endpoint slope and the model-
extrapolated tail-frame pad fill — so the golden digests (incl.
``model_linear``) were re-frozen; see FORMAT.md §1.7.
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


def _fit_slope(base: np.ndarray, d: np.ndarray, pos: np.ndarray):
    """Endpoint-slope fit for one reading ``d`` of each frame's wrapped
    first-to-last difference: slope + unsigned-min intercept, residual
    zigzags. All arithmetic wraps in uint32."""
    frame_len = base.shape[1]
    b64 = np.round(d / (frame_len - 1)).astype(np.int64)
    coef_b = b64.astype(np.uint32).view(np.int32)
    slope = coef_b.view(np.uint32)[:, None] * pos  # wraps like (i*b) & 0xFFFFFFFF
    resid0 = base - slope  # uint32 wrap == (frame - pred(a=0)) mod 2^32
    coef_a = resid0.min(axis=1).view(np.int32)
    pred = coef_a.view(np.uint32)[:, None] + slope
    resid = (base - pred).view(np.int32)
    return coef_a, coef_b, zigzag(resid)


def _fit(frames: np.ndarray, c: np.ndarray):
    """Given per-frame curvature ``c`` (int64, 0 = linear), build the
    endpoint slope + unsigned-min intercept the round-1 linear path used —
    with the curvature term subtracted first, so c=0 reproduces it exactly.
    Returns (coef_a, coef_b, zig) — zig per padded element, uint32."""
    nf, frame_len = frames.shape
    pos = np.arange(frame_len, dtype=np.uint32)
    curve = (c.astype(np.uint32)[:, None] * (pos * pos)) if c.any() else 0
    base = frames - curve  # uint32 wrap
    # Endpoint slope: the wrapped mod-2^32 first-to-last difference admits
    # two readings — SIGNED (recentered into [-2^31, 2^31): right for
    # descending frames, which curvature-removed arcs routinely are) and
    # UNSIGNED (the round-1 reading: right for ascending frames whose true
    # span exceeds 2^31, which the signed window misreads as descending —
    # ADVICE r4). Either decodes losslessly (wrap space); fit both per
    # frame and keep the narrower residual, preferring signed on ties so
    # ordinary columns (span < 2^31: the readings agree) are unchanged.
    d = base[:, -1].astype(np.int64) - base[:, 0].astype(np.int64)
    ds = ((d + 2**31) % 2**32) - 2**31
    du = d % 2**32
    a_s, b_s, z_s = _fit_slope(base, ds, pos)
    if np.array_equal(ds, du):
        return a_s, b_s, z_s
    a_u, b_u, z_u = _fit_slope(base, du, pos)
    use_u = z_u.max(axis=1) < z_s.max(axis=1)
    return (
        np.where(use_u, a_u, a_s).astype(np.int32),
        np.where(use_u, b_u, b_s).astype(np.int32),
        np.where(use_u[:, None], z_u, z_s),
    )


def _extrapolate_tail(frames: np.ndarray, re: int, try_quad: bool) -> None:
    """Replace the last frame's pad region with the model's own
    extrapolation, fitted on the real prefix [0, re). The last-value fill
    the other schemes use puts a step at the real/pad boundary that neither
    a line nor a parabola can follow, and the resulting pad residuals
    (packed — pads inside the group padding ship in the stream) set the
    global width. Pads decode to don't-care values, so any fill is lossless;
    an on-model fill makes their residuals ~0. (Round 4, with the poly2
    selection; also narrows ragged linear columns.)"""
    fl = frames.shape[1]
    if re >= fl or re < 2:
        return
    t = frames[-1]
    c = 0
    if try_quad and re >= 3:
        pos = np.arange(re, dtype=np.float64)
        X = np.stack([np.ones(re), pos, pos * pos])
        c = int(np.round((np.linalg.pinv(X.T)[2] * t[:re].astype(np.float64)).sum()))
    d = int(t[re - 1]) - int(t[0]) - c * (re - 1) * (re - 1)
    d = ((d + 2**31) % 2**32) - 2**31
    b = round(d / (re - 1))
    a = int(t[0])
    q = np.arange(re, fl, dtype=np.int64)
    t[re:] = ((a + b * q + c * q * q) & 0xFFFFFFFF).astype(np.uint32)


def encode(
    values: np.ndarray,
    *,
    bits: int | None = None,
    frame_len: int = GROUP,
    kind: str = "auto",
    name: str = "col",
) -> EncodedColumn:
    if frame_len % GROUP:
        raise ValueError(f"frame_len must be a multiple of GROUP={GROUP}")
    if kind not in ("auto", "linear", "poly2"):
        raise ValueError(f"kind must be auto|linear|poly2, got {kind!r}")
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
    if n:
        _extrapolate_tail(frames, n - (nf - 1) * frame_len, kind != "linear")
    # Per-frame selection: linear always; quadratic when it narrows the
    # frame's residual. Any (a, b, c) decodes losslessly — only compression
    # is at stake. All arithmetic wraps in uint32; frames are always full
    # (padded), so frame_len >= 2 is guaranteed.
    zero_c = np.zeros(nf, np.int64)
    a_lin, b_lin, z_lin = _fit(frames, zero_c)
    coef_a, coef_b, z = a_lin, b_lin, z_lin
    coef_c = None
    if kind != "linear" and frame_len >= 3:
        # least-squares quadratic coefficient per frame (closed form for
        # equally spaced positions), on the same float64 lift the endpoint
        # slope uses; rounded to int so decode wraps exactly
        posf = np.arange(frame_len, dtype=np.float64)
        X = np.stack([np.ones(frame_len), posf, posf * posf])
        pinv = np.linalg.pinv(X.T)  # (3, frame_len)
        c64 = np.round(frames.astype(np.float64) @ pinv[2]).astype(np.int64)
        a_q, b_q, z_q = _fit(frames, c64)
        # keep the quadratic only where it strictly narrows the frame
        wl = np.array([bits_needed(int(m)) for m in z_lin.max(axis=1, initial=0)])
        wq = np.array([bits_needed(int(m)) for m in z_q.max(axis=1, initial=0)])
        use_q = (wq < wl) & (c64 != 0)
        if kind == "poly2" or use_q.any():
            c_sel = np.where(use_q, c64, 0)
            coef_a = np.where(use_q, a_q, a_lin).astype(np.int32)
            coef_b = np.where(use_q, b_q, b_lin).astype(np.int32)
            coef_c = c_sel.astype(np.uint32).view(np.int32)
            z = np.where(use_q[:, None], z_q, z_lin)
    z = z.reshape(-1)[:n_pad]
    if bits is None:
        bits = bits_needed(int(z.max(initial=0)))
    params = {"bits": int(bits), "frame_len": int(frame_len),
              "kind": "linear" if coef_c is None else "poly2"}
    streams = {"packed": lmp_pack(z, bits), "coef_a": coef_a, "coef_b": coef_b}
    if coef_c is not None:
        streams["coef_c"] = coef_c
    return EncodedColumn(
        name=name, scheme="model", dtype=str(values.dtype), n=n,
        params=params, streams=streams,
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
    pred = a[f] + b[f] * p
    if col.params.get("kind") == "poly2":
        c = col.streams["coef_c"].astype(np.int64)
        pred = pred + c[f] * (p * p)
    u = ((pred + resid) & 0xFFFFFFFF).astype(np.uint32)
    return u32_to_dtype(u, col.dtype)


registry.register("model", encode, decode)
