"""Shared device-side idioms: lane-sliced bit extraction, zigzag, cumsum.

This is the TPU re-think of libgiddy's on-device primitives library
(``src/cuda/on_device/primitives/warp.cuh``, ``ptx.cuh`` bfe/funnel-shift —
SURVEY.md §3.6): because the encoder emits the lane-major packed-group
layout (FORMAT.md §0.1), every warp-shuffle/bit-field-extract trick becomes
a full-vector shift by a compile-time constant. These helpers are plain
traced functions usable inside any Pallas kernel body (and, unchanged, in
XLA-level decode paths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..util import GROUP, LANES, SLOTS


def unpack_lanes(x: jax.Array, bits: int) -> jax.Array:
    """LMP unpack: (R, bits*LANES) uint32 words -> (R, GROUP) uint32 values.

    Column j = i*LANES + c of the result is the group's value at linear
    position j — outputs land in linear order by construction (FORMAT §0.1).
    All shift distances are Python-level constants; every operand is a full
    (R, 1024) vector: 8 vregs wide, no gathers, no sublane traffic.
    """
    if x.dtype != jnp.uint32:
        x = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
    cols = []
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        v = x[:, w0 * LANES : (w0 + 1) * LANES]
        if s:
            v = v >> jnp.uint32(s)
        if s + bits > 32:
            v = v | (x[:, (w0 + 1) * LANES : (w0 + 2) * LANES] << jnp.uint32(32 - s))
        cols.append(v & mask if bits < 32 else v)
    return jnp.concatenate(cols, axis=1)


def unpack_to(out_ref, x: jax.Array, bits: int) -> None:
    """LMP unpack writing each slot's vector straight into ``out_ref``
    (a (R, GROUP) ref) — avoids materializing the concatenation when the
    kernel has no further use for the full block (nbit/dzbf)."""
    if x.dtype != jnp.uint32:
        x = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        v = x[:, w0 * LANES : (w0 + 1) * LANES]
        if s:
            v = v >> jnp.uint32(s)
        if s + bits > 32:
            v = v | (x[:, (w0 + 1) * LANES : (w0 + 2) * LANES] << jnp.uint32(32 - s))
        out_ref[:, i * LANES : (i + 1) * LANES] = v & mask if bits < 32 else v


def unpack_map_to(out_ref, x: jax.Array, bits: int, epilogue) -> None:
    """LMP unpack with a fused per-slot epilogue: ``epilogue(v, i)`` maps the
    (R, LANES) slot vector before it is stored. Keeps FOR/model/dict decode
    one pass with zero intermediate materialization (the analog of the
    reference fusing the frame-ref add into the unpack loop, SURVEY.md CS-2).
    """
    if x.dtype != jnp.uint32:
        x = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        v = x[:, w0 * LANES : (w0 + 1) * LANES]
        if s:
            v = v >> jnp.uint32(s)
        if s + bits > 32:
            v = v | (x[:, (w0 + 1) * LANES : (w0 + 2) * LANES] << jnp.uint32(32 - s))
        if bits < 32:
            v = v & mask
        out_ref[:, i * LANES : (i + 1) * LANES] = epilogue(v, i)


def unpack_fold(x: jax.Array, bits: int, fold, init):
    """LMP unpack folding each slot vector into an accumulator:
    ``acc = fold(acc, v, i)`` over the 32 slots. The reduction sibling of
    unpack_map_to — used by fused predicate scans (query.py) where the
    kernel's output is smaller than the decoded block."""
    if x.dtype != jnp.uint32:
        x = jax.lax.bitcast_convert_type(x, jnp.uint32)
    mask = jnp.uint32(0xFFFFFFFF) if bits == 32 else jnp.uint32((1 << bits) - 1)
    acc = init
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        v = x[:, w0 * LANES : (w0 + 1) * LANES]
        if s:
            v = v >> jnp.uint32(s)
        if s + bits > 32:
            v = v | (x[:, (w0 + 1) * LANES : (w0 + 2) * LANES] << jnp.uint32(32 - s))
        if bits < 32:
            v = v & mask
        acc = fold(acc, v, i)
    return acc


LUT_LANE = 128  # Mosaic dynamic_gather width: one hardware lane-tile


def gather_lut(table: jax.Array, idx: jax.Array) -> jax.Array:
    """In-kernel dictionary gather: ``out[r, j] = table[0, idx[r, j]]``.

    The TPU re-think of libgiddy's shared-memory dictionary staging
    (``dictionary.cuh``, SURVEY.md §3.1 DICT row): Mosaic's dynamic_gather
    (``jnp.take_along_axis`` on the lane dim) is exact only *within* one
    128-lane tile, so the table (1, d_pad) is split into d_pad/128 lane
    blocks; each 128-lane slice of ``idx`` gathers from every block and a
    select chain on the high index bits picks the right one. Cost per value:
    d_pad/128 gathers+selects — O(d/128) where a naive select chain is O(d).
    Works identically under the CPU interpreter (plain jnp semantics).

    ``table``: (R, d_pad) uint32 — every row the same dictionary, d_pad a
    multiple of 128 (entries past the real dictionary size are never
    selected when codes are in range). Mosaic rejects an in-kernel
    (1, 128) -> (R, 128) vector.broadcast, so the caller stages the table
    row-tiled; with a constant block index Pallas DMAs it into VMEM once.
    ``idx``: (R, C) uint32/int32 codes, C a multiple of 128.
    """
    R, C = idx.shape
    d_pad = table.shape[-1]
    nb = d_pad // LUT_LANE
    if R == 1:
        # Mosaic's gather lowering rejects single-sublane operands; widen to
        # a full sublane tile (concat: sublane broadcasts of sliced values
        # fail layout inference) and keep row 0 (only ng==1 columns hit this)
        return gather_lut(
            jnp.concatenate([table[:1]] * 8, axis=0),
            jnp.concatenate([idx] * 8, axis=0),
        )[0:1]
    if table.shape[0] != R:  # interpret-mode convenience (plain jnp semantics)
        table = jnp.broadcast_to(table, (R, d_pad))
    blocks = [table[:, b * LUT_LANE : (b + 1) * LUT_LANE] for b in range(nb)]
    idx = idx.astype(jnp.int32)
    outs = []
    for j in range(C // LUT_LANE):
        ij = idx[:, j * LUT_LANE : (j + 1) * LUT_LANE]
        low = ij & (LUT_LANE - 1)
        r = jnp.take_along_axis(blocks[0], low, axis=1)
        for b in range(1, nb):
            g = jnp.take_along_axis(blocks[b], low, axis=1)
            r = jnp.where((ij >> 7) == b, g, r)
        outs.append(r)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def expand_monotone(x: jax.Array, rank: jax.Array) -> jax.Array:
    """Monotone in-row gather: ``out[r, j] = x[r, rank[r, j]]`` for
    nondecreasing ``rank`` with per-step increments in {0, 1} and
    ``rank[r, 0] == 0`` (an exclusive cumsum of a 0/1 mask).

    The TPU re-think of stream-compaction *inverse* (expand): Mosaic's
    dynamic gather is exact only 128 lanes at a time, so instead every
    destination pulls its value through a log2(width) conditional-roll
    network — the same hardware idiom as :func:`group_cumsum`. Let
    ``z[j] = j - rank[j]`` (the displacement; nondecreasing, steps in
    {0,1}). Processing bits high→low, step ``b`` rolls right by ``2**b``
    where bit ``b`` of the *destination's* z is set; monotonicity gives
    ``z[j] - z[j - 2**b] <= 2**b``, which keeps the source's remaining
    high bits equal to the destination's — the invariant that makes the
    network compute ``x0[j - z[j]]`` exactly. Wrapped lanes from the roll
    are never selected (``z[j] >= 2**b`` implies ``j >= 2**b``).

    Used by dzbv plane alignment (kernels/dzbv.py) — the vreg-native
    replacement for the reference's per-element byte addressing
    (``discard_zero_bytes_variable.cuh``, SURVEY.md §3.1).
    """
    from .common import use_interpret  # deferred: avoid import cycle at init

    if use_interpret():
        return jnp.take_along_axis(x, rank.astype(jnp.int32), axis=1)
    from jax.experimental.pallas import tpu as pltpu

    cols = x.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    z = col - rank.astype(jnp.int32)
    b = 1 << ((cols - 1).bit_length() - 1)
    while b:
        x = jnp.where((z & b) != 0, pltpu.roll(x, b, 1), x)
        b //= 2
    return x


def unzigzag(z: jax.Array) -> jax.Array:
    """uint32 zigzag -> uint32 two's-complement signed payload (FORMAT §0.2)."""
    return (z >> jnp.uint32(1)) ^ (-(z & jnp.uint32(1)))


def group_cumsum(x: jax.Array) -> jax.Array:
    """Per-row inclusive cumsum over the GROUP dimension, wrapping uint32.

    Rows are groups; columns are already in linear order, so this is the
    whole of delta reconstruction within a tile (anchors remove any
    cross-tile carry — SURVEY.md §8.1 "anchors everywhere").

    Mosaic has no cumsum primitive, so inside kernels this is the classic
    Hillis–Steele log-scan: 15 steps of lane-roll + mask + add — the VPU
    counterpart of libgiddy's warp-shuffle inclusive scan
    (``primitives/warp.cuh``, SURVEY.md §3.6), with `pltpu.roll` playing
    the role of ``__shfl_up_sync``.
    """
    from .common import use_interpret  # deferred: avoid import cycle at init

    if use_interpret():
        return jnp.cumsum(x, axis=1, dtype=jnp.uint32)
    from jax.experimental.pallas import tpu as pltpu

    rows = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, GROUP), 1)
    k = 1
    while k < GROUP:
        shifted = pltpu.roll(x, k, 1)
        x = x + jnp.where(col >= k, shifted, jnp.uint32(0))
        k *= 2
    return x


def group_cumxor(x: jax.Array) -> jax.Array:
    """Per-row inclusive prefix-XOR over the GROUP dimension — the XOR
    twin of :func:`group_cumsum` (same Hillis–Steele roll-scan; XOR is
    associative with identity 0). Backbone of xordelta decode."""
    from .common import use_interpret  # deferred: avoid import cycle at init

    if use_interpret():
        return jax.lax.associative_scan(jnp.bitwise_xor, x, axis=1)
    from jax.experimental.pallas import tpu as pltpu

    rows = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, GROUP), 1)
    k = 1
    while k < GROUP:
        shifted = pltpu.roll(x, k, 1)
        x = x ^ jnp.where(col >= k, shifted, jnp.uint32(0))
        k *= 2
    return x


def linear_iota(rows: int) -> jax.Array:
    """(rows, GROUP) uint32 iota of within-group linear positions."""
    return jax.lax.broadcasted_iota(jnp.uint32, (rows, GROUP), 1)
