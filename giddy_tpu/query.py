"""Predicate pushdown: decode-and-filter in one fused kernel.

libgiddy exists to feed DBMS scans (SURVEY.md §1 — MonetDB columns); the
natural TPU extension is evaluating the scan predicate *inside* the decode
kernel so the full-width column never touches HBM: the kernel reads the
packed stream and writes a 1-bit incidence bitmap (LMP(1) layout, 1/32 of
the decoded bytes). Supported for the unpack-epilogue schemes (nbit, dzbf,
for); other schemes fall back to decode + compare in one jit.

Comparisons use the column's logical dtype signedness.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .format import EncodedColumn
from .registry import plan
from .util import GROUP, LANES, SLOTS, np_dtype, num_groups

_OPS = ("eq", "ne", "lt", "le", "gt", "ge")


def _cmp(v, value, op: str, signed: bool):
    if signed:
        v = jax.lax.bitcast_convert_type(v, jnp.int32)
        c = jnp.int32(value)
    else:
        c = jnp.uint32(value)
    return {
        "eq": v == c, "ne": v != c, "lt": v < c,
        "le": v <= c, "gt": v > c, "ge": v >= c,
    }[op]


def _epilogue_filter_call(col: EncodedColumn, op: str, value: int):
    """Fused unpack+compare kernel -> (ng, LANES) bitmap words."""
    from jax.experimental import pallas as pl

    from .kernels.common import block_spec, use_interpret

    scheme = col.scheme
    bits = col.params["bits"] if scheme in ("nbit", "for") else 8 * col.params["width"]
    ng = num_groups(col.n)
    signed = np_dtype(col.dtype).kind == "i"
    pl_plan = plan(ng * GROUP, 2 * 4 * (bits * LANES + LANES))
    r = pl_plan.groups_per_block

    def body(x, ref):
        # constants must be materialized inside the kernel trace
        mask32 = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
        acc = jnp.zeros((x.shape[0], LANES), jnp.uint32)
        for i in range(SLOTS):
            w0, s = divmod(i * bits, 32)
            v = x[:, w0 * LANES : (w0 + 1) * LANES]
            if s:
                v = v >> jnp.uint32(s)
            if s + bits > 32:
                v = v | (x[:, (w0 + 1) * LANES : (w0 + 2) * LANES] << jnp.uint32(32 - s))
            if bits < 32:
                v = v & mask32
            if ref is not None:
                v = v + ref
            acc = acc | (_cmp(v, value, op, signed).astype(jnp.uint32) << jnp.uint32(i))
        return acc

    if scheme == "for":

        def kernel(in_ref, ref_ref, out_ref):
            ref = jnp.broadcast_to(ref_ref[:], (ref_ref.shape[0], LANES))
            out_ref[:] = body(in_ref[:], ref)

        call = pl.pallas_call(
            kernel,
            grid=(pl_plan.grid,),
            in_specs=[block_spec((r, bits * LANES), lambda i: (i, 0)),
                      block_spec((r, 1), lambda i: (i, 0))],
            out_specs=block_spec((r, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ng, LANES), jnp.uint32),
            interpret=use_interpret(),
        )

        def run(streams):
            return call(streams["packed"], streams["refs_g"])

    else:

        def kernel(in_ref, out_ref):
            out_ref[:] = body(in_ref[:], None)

        call = pl.pallas_call(
            kernel,
            grid=(pl_plan.grid,),
            in_specs=[block_spec((r, bits * LANES), lambda i: (i, 0))],
            out_specs=block_spec((r, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((ng, LANES), jnp.uint32),
            interpret=use_interpret(),
        )

        def run(streams):
            return call(streams["packed"])

    return run


_FILTER_CACHE: dict[tuple, object] = {}


def filter_bitmap(col: EncodedColumn, op: str, value: int) -> jax.Array:
    """(ng, LANES) uint32 bitmap words in LMP(1) layout: bit i of word
    [g, c] = predicate(col[g*GROUP + i*LANES + c]). Pad positions beyond n
    are garbage — mask with position_mask() or slice after unpacking."""
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    from .api import device_streams, get_decoder

    key = (col.static_key(), op, int(value))
    fn = _FILTER_CACHE.get(key)
    if fn is None:
        if col.scheme in ("nbit", "dzbf", "for"):
            fn = jax.jit(_epilogue_filter_call(col, op, value))
        else:
            ng = num_groups(col.n)
            signed = np_dtype(col.dtype).kind == "i"
            decoder = get_decoder(col)

            def general(streams):
                u = decoder(streams).reshape(ng, SLOTS, LANES)
                bits = _cmp(u, value, op, signed).astype(jnp.uint32)
                i = jax.lax.broadcasted_iota(jnp.uint32, (1, SLOTS, 1), 1)
                # bits occupy distinct positions, so sum == bitwise-or
                return jnp.sum(bits << i, axis=1, dtype=jnp.uint32)

            fn = jax.jit(general)
        _FILTER_CACHE[key] = fn
    return fn(device_streams(col))


def count_where(col: EncodedColumn, op: str, value: int) -> int:
    """Number of elements satisfying the predicate (pad bits masked)."""
    words = filter_bitmap(col, op, value)
    ng = num_groups(col.n)
    n_pad = ng * GROUP
    # mask pad tail: position of bit i in word [g, c] is g*GROUP + i*LANES + c
    if col.n < n_pad:
        g = np.arange(ng)[:, None, None]
        i = np.arange(SLOTS)[None, :, None]
        c = np.arange(LANES)[None, None, :]
        valid = (g * GROUP + i * LANES + c) < col.n
        keep = np.zeros((ng, LANES), np.uint32)
        for ii in range(SLOTS):
            keep |= valid[:, ii, :].astype(np.uint32) << np.uint32(ii)
        words = words & jnp.asarray(keep)
    # SWAR popcount on uint32 words
    x = words
    x = x - ((x >> jnp.uint32(1)) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> jnp.uint32(2)) & jnp.uint32(0x33333333))
    x = (x + (x >> jnp.uint32(4))) & jnp.uint32(0x0F0F0F0F)
    x = (x * jnp.uint32(0x01010101)) >> jnp.uint32(24)
    return int(jnp.sum(x))


def where_mask(col: EncodedColumn, op: str, value: int) -> np.ndarray:
    """Boolean mask of length n (host) — unpacked bitmap for verification
    and small results; big pipelines should consume the bitmap directly."""
    from .ref.lmp import lmp_unpack

    words = np.asarray(filter_bitmap(col, op, value))
    ng = num_groups(col.n)
    return lmp_unpack(words.reshape(ng, LANES), 1, col.n).astype(bool)
