"""Top-k / order-by over compressed columns.

The DBMS ORDER BY ... LIMIT k shape. The reference left ordering to its
MonetDB caller over decoded columns; here the selection fuses with the
decode in one jitted program: decode -> monotone int32 keys (the same
key space aggregate.py reduces in, so float semantics are IEEE total
order everywhere) -> ``jax.lax.top_k`` -> only ``k`` (value, position)
pairs cross back to the host. The full-width sorted column never exists.

Smallest-k runs on the complemented keys (``~key`` = ``-key - 1``,
overflow-free on int32), so one compiled program per (column, direction)
serves every k of the same size. Pad rows and null rows (nulls.py) mask
to the key space's identity before selection.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .format import EncodedColumn
from .util import GROUP, LANES, SLOTS, np_dtype, num_groups

_TOPK_CACHE: dict[tuple, object] = {}


def _topk_fn(col: EncodedColumn, largest: bool, k: int):
    from .api import get_decoder
    from .aggregate import _key_map_traced

    ng = num_groups(col.n)
    n = col.n
    dt = np_dtype(col.dtype)
    kind, itemsize = dt.kind, dt.itemsize
    decoder = get_decoder(col)

    def fn(streams, vw):
        u = decoder(streams).reshape(ng, SLOTS, LANES)
        keys = _key_map_traced(u, kind, itemsize)
        g = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 0)
        s = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 2)
        pos = g * GROUP + s * LANES + lane
        valid = pos < n
        if vw is not None:
            bit = (vw[:, None, :] >> s.astype(jnp.uint32)) & jnp.uint32(1)
            valid = valid & (bit == jnp.uint32(1))
        if not largest:
            keys = ~keys  # monotone flip, overflow-free
        keys = jnp.where(valid, keys, jnp.int32(-(2**31)))
        # (ng, SLOTS, LANES) flattens position-major (row = g*G + s*C + c),
        # so top_k indices ARE global row ids
        topv, topi = jax.lax.top_k(keys.reshape(-1), k)
        return topv, topi

    return jax.jit(fn)


def top_k(col: EncodedColumn, k: int, *, largest: bool = True):
    """The k largest (or smallest) values and their row positions, sorted
    by rank. Null rows never qualify; if fewer than k rows qualify, the
    result is truncated. Returns (values, positions) — values in the
    column's logical dtype, positions int64."""
    from . import nulls
    from .groupby import _unmap_keys_host

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if col.scheme == "wide":
        return _top_k_host(col, k, largest)
    nullable = nulls.is_nullable(col)
    qualifying = nulls.count_valid(col) if nullable else col.n
    k_eff = min(k, qualifying)
    if k_eff == 0:
        return np.empty(0, np_dtype(col.dtype)), np.empty(0, np.int64)
    from .api import device_streams

    key = (col.static_key(), bool(largest), k_eff)
    fn = _TOPK_CACHE.get(key)
    if fn is None:
        fn = _TOPK_CACHE[key] = _topk_fn(col, largest, k_eff)
    vw = nulls.valid_words_device(col) if nullable else None
    topv, topi = fn(device_streams(col), vw)
    keys = np.asarray(topv)
    pos = np.asarray(topi, np.int64)
    # sentinel collision: a VALID row whose key equals the mask identity
    # (-2^31 — int32 min, or a float total-order extreme) ties with masked
    # pad/null rows and top_k may return one of those instead. Rare and
    # detectable: any returned position that is a pad or null row means the
    # selection brushed the sentinel — redo host-side, exactly.
    bad = pos >= col.n
    if nullable and not bad.any():
        bad = ~nulls.valid_mask(col)[pos]
    if bad.any():
        return _top_k_host(col, k_eff, largest)
    if not largest:
        keys = ~keys
    return _unmap_keys_host(keys, col.dtype).astype(np_dtype(col.dtype), copy=False), pos


def _top_k_host(col: EncodedColumn, k: int, largest: bool):
    """Host fallback (wide columns, sentinel collisions): decode, select
    host-side with the same total-order key semantics (zonemap._keys)."""
    from . import nulls
    from .api import decode
    from .zonemap import _keys

    v = np.asarray(decode(col))
    k_arr = _keys(v, col.dtype)  # already totally ordered in its own dtype
    if nulls.is_nullable(col):
        m = nulls.valid_mask(col)
        idx_all = np.flatnonzero(m)
        k_arr = k_arr[m]
    else:
        idx_all = np.arange(col.n, dtype=np.int64)
    k_eff = min(k, k_arr.shape[0])
    if k_eff == 0:
        return np.empty(0, v.dtype), np.empty(0, np.int64)
    part = np.argsort(k_arr, kind="stable")
    sel = part[-k_eff:][::-1] if largest else part[:k_eff]
    pos = idx_all[sel]
    return v[pos], pos.astype(np.int64)


def argmax_(col: EncodedColumn) -> int:
    """Row position of the maximum (total-order for floats; null-aware)."""
    return int(top_k(col, 1, largest=True)[1][0])


def argmin_(col: EncodedColumn) -> int:
    """Row position of the minimum."""
    return int(top_k(col, 1, largest=False)[1][0])


def order_by(col: EncodedColumn, *, ascending: bool = True, limit: int | None = None):
    """ORDER BY [LIMIT]: sorted (values, positions). With ``limit`` this is
    top_k; without, a full decode + host argsort on the monotone keys
    (sorting the whole column on-device has no bandwidth story to win —
    the output is the same size as the input)."""
    if limit is not None:
        return top_k(col, limit, largest=not ascending)
    from . import nulls
    from .api import decode
    from .zonemap import _keys

    v = np.asarray(decode(col))
    keys = _keys(v, col.dtype)
    if nulls.is_nullable(col):
        m = nulls.valid_mask(col)
        idx = np.flatnonzero(m)
        order = np.argsort(keys[m], kind="stable")
    else:
        idx = np.arange(col.n, dtype=np.int64)
        order = np.argsort(keys, kind="stable")
    if not ascending:
        order = order[::-1]
    pos = idx[order].astype(np.int64)
    return v[pos], pos
