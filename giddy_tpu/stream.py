"""Streaming decode: overlap host->device feeding with on-chip decode.

The reference's headline scenario is decode outrunning the host link
(PCIe there, the host->HBM DMA here): it overlaps the H2D copy of chunk
k+1 with the decode of chunk k using CUDA streams (SURVEY.md §3.11
pipeline row). JAX's async dispatch gives the same overlap for free —
``device_put`` and the jitted decode are both non-blocking — so streaming
a column is: slice group-chunks (partial.GroupSlicer keeps every scheme
self-contained and amortizes the per-column rewrite), enqueue
upload+decode per chunk, and only synchronize at the consumer.

Equal-size chunks share one jit specialization via the decoder cache, so
the whole stream compiles twice at most (body + ragged tail).
"""

from __future__ import annotations

from typing import Iterator

import jax
import numpy as np

from .format import EncodedColumn
from .partial import GroupSlicer
from .util import num_groups


def stream_decode(
    col: EncodedColumn, *, chunk_groups: int = 64, to_host: bool = False
) -> Iterator[np.ndarray | jax.Array]:
    """Yield decoded chunks of ``chunk_groups`` GROUPs each, in order.

    Uploads and decodes are enqueued ahead (async dispatch) so the device
    decodes chunk k while chunk k+1 is still crossing the link. With
    ``to_host`` the chunks come back as NumPy (synchronizing per chunk);
    otherwise they are device arrays the caller may keep resident.
    """
    import jax.numpy as jnp

    from .api import _to_logical, get_decoder
    from .kernels.common import to_device_streams

    if col.scheme == "wide":
        # Stream the 32-bit planes and recombine per chunk. Chunks come back
        # as NumPy regardless of to_host: int64 lives outside the device hot
        # path (wide.py), and the plane iterators already overlap the device
        # work.
        from . import wide

        lo_it = stream_decode(wide._sub(col, "lo"), chunk_groups=chunk_groups)
        hi_it = stream_decode(wide._sub(col, "hi"), chunk_groups=chunk_groups)
        for lo, hi in zip(lo_it, hi_it):
            yield wide._combine(
                np.asarray(lo).view(np.uint32), np.asarray(hi).view(np.uint32), col.dtype
            )
        return

    slicer = GroupSlicer(col)
    ng = num_groups(col.n)
    pending: list[tuple[jax.Array, int]] = []
    depth = 2  # chunks in flight beyond the one being consumed
    for c0 in range(0, ng, chunk_groups):
        c1 = min(c0 + chunk_groups, ng)
        sub = slicer.slice(c0, c1)
        if sub.scheme == "_patched_slice":
            out = slicer.decode(c0, c1)
            yield out if to_host else jnp.asarray(out)
            continue
        u = get_decoder(sub)(to_device_streams(sub.streams))  # enqueued
        pending.append((u, sub.n))
        if len(pending) > depth:
            yield _emit(pending.pop(0), col.dtype, to_host)
    while pending:
        yield _emit(pending.pop(0), col.dtype, to_host)


def _emit(item, dtype: str, to_host: bool):
    from .api import _to_logical

    u, n = item
    out = _to_logical(u, dtype)[:n]
    return np.asarray(out) if to_host else out


def decode_streamed(col: EncodedColumn, *, chunk_groups: int = 64) -> np.ndarray:
    """Convenience: stream the whole column back to host, concatenated."""
    return np.concatenate(list(stream_decode(col, chunk_groups=chunk_groups, to_host=True)))


def stream_count_where(col: EncodedColumn, op: str, value, *, chunk_groups: int = 64) -> int:
    """Predicate count over a column streamed in group chunks — bounded
    device memory regardless of column size (the larger-than-HBM scan).
    Chunks run the same fused filter kernels as query.filter_bitmap (one
    jit specialization for all equal-size chunks); only 1-bit match words
    per chunk exist on device, and a small in-flight window keeps the
    upload/decode overlap without accumulating all bitmaps. Semantics
    match query.count_where, including float total order and the
    mod-2^32 staging of out-of-range integer values."""
    from . import nulls
    from .query import _OPS, count_bits, filter_bitmap, host_cmp_mask
    from .util import GROUP, NP_CMP, dtype_to_u32

    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    ng = num_groups(col.n)
    # nullable chunks carry their validity window (GroupSlicer.slice), so
    # the device path is null-correct per chunk; the host fallbacks below
    # mask explicitly
    vmask = nulls.valid_mask(col) if nulls.is_nullable(col) else None

    if col.scheme == "wide":
        # planes recombine at the host boundary anyway: compare streamed
        # chunks host-side on total-order keys (same 64-bit-exact
        # semantics as the device path in query._wide_filter_fn)
        from .zonemap import _key_scalar, _keys

        vk = _key_scalar(value, col.dtype)
        total = 0
        pos = 0
        for chunk in stream_decode(col, chunk_groups=chunk_groups):
            keys = _keys(np.asarray(chunk), col.dtype)
            m = NP_CMP[op](keys, vk)
            if vmask is not None:
                m = m & vmask[pos : pos + keys.shape[0]]
            total += int(m.sum())
            pos += keys.shape[0]
        return total

    slicer = GroupSlicer(col)
    pending: list[tuple[jax.Array, int]] = []
    depth = 4  # chunk bitmaps in flight; bounds device memory
    total = 0
    for c0 in range(0, ng, chunk_groups):
        c1 = min(c0 + chunk_groups, ng)
        sub = slicer.slice(c0, c1)
        if sub.scheme == "_patched_slice":
            # patched chunks decode via the slicer's scatter epilogue and
            # compare host-side with the SAME staged semantics as the
            # device chunks (exceptions are rare; the base path below
            # covers the steady state)
            u = dtype_to_u32(slicer.decode(c0, c1))
            m = host_cmp_mask(u, op, value, col.dtype)
            if vmask is not None:
                m = m & vmask[c0 * GROUP : c0 * GROUP + sub.n]
            total += int(m.sum())
            continue
        pending.append((filter_bitmap(sub, op, value), sub.n))  # enqueued
        if len(pending) > depth:
            bm, n = pending.pop(0)
            total += count_bits(bm, n)
    for bm, n in pending:
        total += count_bits(bm, n)
    return total
