"""Grouped aggregates (GROUP BY pushdown): per-key count/sum/min/max
computed from the *codes* of a dictionary-backed key column.

The DBMS shape the reference feeds (SURVEY.md §1 — MonetDB scans): group
by a categorical (dictionary-compressed) column, aggregate a measure
column, optionally under a scan predicate. Here the whole pipeline runs in
one jitted program on device: the key column's codes decode (never its
values — the gather is skipped, the dict-domain idea from query.py), the
measure decodes, and per-key partials reduce via XLA segment ops. Only
O(dict_size) partials cross back to the host.

Exactness (matching aggregate.py's contract):

- integer sums are exact: the measure splits into 8-bit byte planes and
  each plane segment-sums in uint32 within position *chunks* small enough
  that ``chunk_len * 255 < 2**32`` can't wrap; the host recombines chunks
  and byte weights in int64. Signed columns also count per-key sign bits
  (two's complement: ``sum = unsigned_sum - n_neg * 2**(8*w)``).
- min/max reduce on the same monotone int32 keys as aggregate.py
  (bias-mapped ints, IEEE total-order float32 — NaNs at the extremes).
- float sums reduce host-side in float64 after a decode (same rounding
  stance as aggregate.sum_).
- 64-bit (wide) measures aggregate per 32-bit plane on device and
  recombine host-side as exact Python ints; wide min/max falls back to a
  host pass over the decoded planes.

Pad positions and predicate-filtered rows route to an overflow segment
(bucket ``d``) that is dropped on the host, so they can never contaminate
a real group.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .format import EncodedColumn
from .util import GROUP, LANES, SLOTS, np_dtype, num_groups, u32_to_dtype

_AGGS = ("count", "sum", "min", "max")

# Byte-plane segment sums stay exact while chunk_len * 255 < 2**32;
# 256 groups = 8,388,608 elements leaves a 2x margin.
CHUNK_GROUPS = 256


# --- key-column code access -------------------------------------------------


def _codes_device_column(keys: EncodedColumn) -> EncodedColumn:
    """An int32 column decoding to the key codes (the value gather never
    runs — grouping only needs code identity). Memoized on the parent so
    repeated scans hand the SAME object to the identity-keyed placement
    caches (dist_query._ARGS_CACHE) instead of re-uploading streams."""
    cached = getattr(keys, "_codes_col", None)
    if cached is not None:
        return cached
    keys._codes_col = _build_codes_column(keys)
    return keys._codes_col


def _build_codes_column(keys: EncodedColumn) -> EncodedColumn:
    if keys.scheme == "strdict":
        from .strings import codes_column

        return codes_column(keys)
    if keys.scheme == "cascade":
        from .ref.cascade import codes_column

        return codes_column(keys)
    if keys.scheme == "dict":
        return EncodedColumn(
            name=f"{keys.name}._codes",
            scheme="nbit",
            dtype="int32",
            n=keys.n,
            params={"bits": keys.params["bits"]},
            streams={"packed": keys.streams["codes"]},
        )
    raise ValueError(
        f"group keys must be a 'dict', 'cascade' or 'strdict' column, got {keys.scheme!r}"
        " (encode the key column with gt.encode(v, 'cascade'))"
    )


def key_values(keys: EncodedColumn) -> np.ndarray:
    """The dictionary (code -> key value), logical dtype, length d."""
    if keys.scheme == "strdict":
        from .strings import dictionary

        return dictionary(keys)
    return u32_to_dtype(keys.streams["values"].view(np.uint32), keys.dtype)


def _codes_host(keys: EncodedColumn) -> np.ndarray:
    from . import registry

    ccol = _codes_device_column(keys)
    return registry.get(ccol.scheme).decode_ref(ccol).astype(np.int64)


# --- device program ----------------------------------------------------------


def _build_device_fn(
    keys: EncodedColumn,
    vals: EncodedColumn | None,
    *,
    want_count: bool,
    sum_bytes: int,  # 0 = no sum; else byte width w of the payload
    want_neg: bool,  # count per-key bit-31 sign bits (payload space)
    want_minmax: bool,
    has_bitmap: bool,
    val_kind: str = "u",
    val_itemsize: int = 4,
):
    """One jitted fn(kstreams, vstreams?, bitmap?) -> dict of partials."""
    from .api import get_decoder
    from .aggregate import _key_map_traced

    d = keys.params["dict_size"]
    n = keys.n
    ng = num_groups(n)
    nchunks = -(-ng // CHUNK_GROUPS)
    kdec = get_decoder(_codes_device_column(keys))
    vdec = get_decoder(vals) if vals is not None else None

    def fn(kstreams, vstreams, bm):
        codes = jax.lax.bitcast_convert_type(
            kdec(kstreams), jnp.int32
        ).reshape(ng, SLOTS, LANES)
        g = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 0)
        s = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ng, SLOTS, LANES), 2)
        valid = (g * GROUP + s * LANES + lane) < n
        if bm is not None:
            bit = (bm[:, None, :] >> s.astype(jnp.uint32)) & jnp.uint32(1)
            valid = valid & (bit == jnp.uint32(1))
        # invalid rows -> overflow bucket d (dropped host-side)
        seg = jnp.where(valid, codes, jnp.int32(d)).reshape(-1)
        out = {}
        if want_count:
            out["count"] = jax.ops.segment_sum(
                jnp.ones((ng * GROUP,), jnp.uint32), seg, num_segments=d + 1
            )
        if vdec is not None:
            v = vdec(vstreams).reshape(-1)
            if sum_bytes:
                chunk = (g // CHUNK_GROUPS).reshape(-1)
                cseg = chunk * (d + 1) + seg
                for b in range(sum_bytes):
                    plane = (v >> jnp.uint32(8 * b)) & jnp.uint32(0xFF)
                    out[f"b{b}"] = jax.ops.segment_sum(
                        plane, cseg, num_segments=nchunks * (d + 1)
                    )
            if want_neg:
                sign = (v >> jnp.uint32(8 * val_itemsize - 1)) & jnp.uint32(1)
                out["neg"] = jax.ops.segment_sum(sign, seg, num_segments=d + 1)
            if want_minmax:
                k = _key_map_traced(v, val_kind, val_itemsize)
                out["min"] = jax.ops.segment_min(k, seg, num_segments=d + 1)
                out["max"] = jax.ops.segment_max(k, seg, num_segments=d + 1)
        return out

    return jax.jit(fn)


_GB_CACHE: dict[tuple, object] = {}


def _run_device(keys, vals, bitmap, **flags):
    from .api import device_streams

    key = (
        keys.static_key(),
        vals.static_key() if vals is not None else None,
        tuple(sorted(flags.items())),
        bitmap is not None,
        CHUNK_GROUPS,
    )
    fn = _GB_CACHE.get(key)
    if fn is None:
        fn = _GB_CACHE[key] = _build_device_fn(
            keys, vals, has_bitmap=bitmap is not None, **flags
        )
    out = fn(
        device_streams(_codes_device_column(keys)),
        device_streams(vals) if vals is not None else None,
        jnp.asarray(bitmap) if bitmap is not None else None,
    )
    return {k: np.asarray(a) for k, a in out.items()}


def _finish_sum(out: dict, d: int, w: int, signed: bool) -> np.ndarray:
    s = np.zeros(d, np.int64)
    for b in range(w):
        plane = out[f"b{b}"].reshape(-1, d + 1)[:, :d].astype(np.int64)
        s += plane.sum(axis=0) << (8 * b)
    if signed:
        s -= out["neg"][:d].astype(np.int64) << (8 * w)
    return s


def _unmap_keys_host(k: np.ndarray, dtype: str) -> np.ndarray:
    """Vectorized inverse of aggregate._key_map_traced (int32 keys ->
    logical values); rows holding segment identities (empty groups) come
    out as garbage — callers mask on count."""
    dt = np_dtype(dtype)
    if dt.kind == "i":
        return k.astype(np.int64)
    u = k.view(np.uint32) ^ np.uint32(0x80000000)  # undo the sign bias
    if dt.kind == "f":
        u = np.where(
            u >> np.uint32(31),
            u ^ np.uint32(0x80000000),  # was non-negative: clear sign flip
            u ^ np.uint32(0xFFFFFFFF),  # was negative: undo the full flip
        ).astype(np.uint32)
        return u.view(np.float32)
    return u.astype(np.int64)


# --- host fallbacks -----------------------------------------------------------


def _host_mask(n: int, bitmap) -> np.ndarray | None:
    if bitmap is None:
        return None
    from .ref.lmp import lmp_unpack

    words = np.asarray(bitmap).reshape(num_groups(n), LANES)
    return lmp_unpack(words, 1, n).astype(bool)


def _host_decoded(vals: EncodedColumn) -> np.ndarray:
    from .api import decode

    return np.asarray(decode(vals))


def _host_group_sum_float(codes, v, d, mask) -> np.ndarray:
    if mask is not None:
        codes, v = codes[mask], v[mask]
    s = np.zeros(d, np.float64)
    np.add.at(s, codes, v.astype(np.float64))
    return s


def _host_group_minmax(codes, v, d, mask):
    """Host min/max with the same total-order float semantics as device."""
    if mask is not None:
        codes, v = codes[mask], v[mask]
    if v.dtype.kind == "f":
        u = v.view(np.uint64 if v.dtype.itemsize == 8 else np.uint32)
        bits = 8 * u.dtype.itemsize
        shift = np.array(bits - 1, u.dtype)
        top = np.array(1 << (bits - 1), u.dtype)
        allf = np.array((1 << bits) - 1, u.dtype)
        # IEEE total-order key: flip all bits of negatives, sign bit of
        # non-negatives (the 64-bit twin of query._total_order_u32)
        keys = u ^ np.where((u >> shift).astype(bool), allf, top)
        kmin = np.full(d, allf, u.dtype)
        kmax = np.zeros(d, u.dtype)
        np.minimum.at(kmin, codes, keys)
        np.maximum.at(kmax, codes, keys)

        def unmap_keys(k):
            nonneg = (k >> shift).astype(bool)
            return np.where(nonneg, k ^ top, k ^ allf).astype(u.dtype).view(v.dtype)

        return unmap_keys(kmin), unmap_keys(kmax)
    info = np.iinfo(v.dtype)
    mn = np.full(d, info.max, v.dtype)
    mx = np.full(d, info.min, v.dtype)
    np.minimum.at(mn, codes, v)
    np.maximum.at(mx, codes, v)
    return mn.astype(np.int64 if v.dtype.kind == "i" else np.uint64), mx.astype(
        np.int64 if v.dtype.kind == "i" else np.uint64
    )


def _and_validity(bitmap, *cols):
    """AND the validity words of any nullable columns into the filter
    bitmap (host numpy — validity is 1/1024 of the decoded bytes)."""
    from . import nulls

    vws = [c.streams["valid"] for c in cols if c is not None and nulls.is_nullable(c)]
    if not vws:
        return bitmap
    vb = vws[0]
    for w in vws[1:]:
        vb = vb & w
    return vb if bitmap is None else np.asarray(bitmap) & vb


# --- public API ----------------------------------------------------------------


@dataclass
class GroupResult:
    """Per-dictionary-entry aggregates. ``keys[i]`` is the i-th dictionary
    value; rows with ``count == 0`` (possible only with explicit
    dictionaries or a filter) have undefined min/max and zero sums."""

    keys: np.ndarray
    count: np.ndarray
    sum: np.ndarray | None = None
    min: np.ndarray | None = None
    max: np.ndarray | None = None


def group_reduce(
    keys: EncodedColumn,
    vals: EncodedColumn | None = None,
    aggs: tuple[str, ...] = ("count",),
    bitmap=None,
) -> GroupResult:
    """GROUP BY ``keys`` computing ``aggs`` over ``vals`` (optionally only
    where ``bitmap`` — a filter_bitmap over any same-length column — is
    set). ``keys`` must be dictionary-backed ('dict' or 'cascade');
    ``vals`` may use any scheme. Returns one row per dictionary entry.

    Nullable columns (nulls.py): rows whose key OR measure is null are
    excluded from every aggregate — the COUNT(col) contract, implemented
    by AND-ing the validity words into the filter bitmap."""
    bitmap = _and_validity(bitmap, keys, vals)
    aggs = tuple(aggs)
    for a in aggs:
        if a not in _AGGS:
            raise ValueError(f"agg must be one of {_AGGS}, got {a!r}")
    need_vals = any(a != "count" for a in aggs)
    if need_vals and vals is None:
        raise ValueError("sum/min/max require a values column")
    if vals is not None and vals.n != keys.n:
        raise ValueError(f"length mismatch: keys n={keys.n}, vals n={vals.n}")
    if keys.scheme not in ("dict", "cascade", "strdict"):
        _codes_device_column(keys)  # raises the explanatory ValueError

    d = keys.params["dict_size"]
    kv = key_values(keys)
    vdt = np_dtype(vals.dtype) if vals is not None else None

    want_sum = "sum" in aggs
    want_minmax = ("min" in aggs) or ("max" in aggs)

    # --- route: device for <=32-bit ints/float32 minmax; host for float
    # sums and wide minmax; wide sums via per-plane device passes.
    res = GroupResult(keys=kv, count=None)

    if vals is not None and vals.scheme == "wide":
        res.count = _group_count(keys, bitmap, d)
        if want_sum and vdt.kind == "f":
            # float64 planes sum as bitpatterns only losslessly via a
            # decode: finish host-side in float64 (aggregate.sum_ stance)
            codes = _codes_host(keys)
            res.sum = _host_group_sum_float(
                codes, _host_decoded(vals), d, _host_mask(keys.n, bitmap)
            )
        elif want_sum:
            from . import wide

            lo_p = _plane_group_parts(keys, wide._sub(vals, "lo"), bitmap, want_neg=False)
            hi_p = _plane_group_parts(
                keys, wide._sub(vals, "hi"), bitmap, want_neg=vdt.kind == "i"
            )
            lo_s = _finish_sum(lo_p, d, 4, signed=False)
            hi_s = _finish_sum(hi_p, d, 4, signed=False)
            total = [int(lo) + (int(h) << 32) for lo, h in zip(lo_s, hi_s)]
            if vdt.kind == "i":
                neg = hi_p["neg"][:d].astype(np.int64)
                total = [t - (int(nn) << 64) for t, nn in zip(total, neg)]
            res.sum = np.array(total, dtype=object)
        if want_minmax:
            codes = _codes_host(keys)
            v = _host_decoded(vals)
            mn, mx = _host_group_minmax(codes, v, d, _host_mask(keys.n, bitmap))
            if "min" in aggs:
                res.min = mn
            if "max" in aggs:
                res.max = mx
        return res

    # 32-bit (or narrower) measures
    flags = dict(
        want_count=True,
        sum_bytes=0,
        want_neg=False,
        want_minmax=False,
    )
    if vals is not None:
        flags["val_kind"] = vdt.kind
        flags["val_itemsize"] = vdt.itemsize
        if want_sum and vdt.kind != "f":
            flags["sum_bytes"] = vdt.itemsize
            flags["want_neg"] = vdt.kind == "i"
        if want_minmax:
            flags["want_minmax"] = True
    out = _run_device(keys, vals if need_vals else None, bitmap, **flags)
    res.count = out["count"][:d].astype(np.int64)
    if vals is not None and want_sum:
        if vdt.kind == "f":
            codes = _codes_host(keys)
            res.sum = _host_group_sum_float(
                codes, _host_decoded(vals), d, _host_mask(keys.n, bitmap)
            )
        else:
            res.sum = _finish_sum(out, d, vdt.itemsize, vdt.kind == "i")
    if vals is not None and want_minmax:
        if "min" in aggs:
            res.min = _unmap_keys_host(out["min"][:d], vals.dtype)
        if "max" in aggs:
            res.max = _unmap_keys_host(out["max"][:d], vals.dtype)
    return res


def _group_count(keys, bitmap, d) -> np.ndarray:
    out = _run_device(
        keys, None, bitmap, want_count=True, sum_bytes=0, want_neg=False, want_minmax=False
    )
    return out["count"][:d].astype(np.int64)


def _plane_group_parts(keys, plane_col, bitmap, *, want_neg) -> dict:
    """One device pass over a 32-bit plane: per-key byte sums (and, for
    the hi plane of signed measures, sign-bit counts in the same pass)."""
    return _run_device(
        keys,
        plane_col,
        bitmap,
        want_count=False,
        sum_bytes=4,
        want_neg=want_neg,
        want_minmax=False,
        val_kind="u",
        val_itemsize=4,
    )


def group_count(keys: EncodedColumn, bitmap=None) -> GroupResult:
    """Value-less GROUP BY: per-key row counts (optionally filtered)."""
    return group_reduce(keys, None, ("count",), bitmap)


def group_reduce_multi(
    key_cols: list,
    vals: EncodedColumn | None = None,
    aggs: tuple[str, ...] = ("count",),
    bitmap=None,
):
    """GROUP BY several dictionary-backed key columns at once.

    The composite key is built host-side from the columns' (narrow) code
    streams — np.unique over the PRESENT combinations only, so the
    synthetic dictionary never materializes the d1 x d2 x ... cross
    product — then the single-key device fold runs unchanged over a
    synthetic dense dict column. Returns a GroupResult whose ``keys`` is
    an object array of per-column key tuples (rows null in ANY key are
    excluded, like the single-key contract)."""
    from . import nulls
    from .api import encode as _encode
    from .format import EncodedColumn as _EC  # noqa: F401 (doc aid)

    if len(key_cols) == 1:
        return group_reduce(key_cols[0], vals, aggs, bitmap)
    if not key_cols:
        raise ValueError("group_reduce_multi needs at least one key column")
    n = key_cols[0].n
    for k in key_cols:
        if k.n != n:
            raise ValueError("key columns must share n")
    combined = np.zeros(n, dtype=np.int64)
    dims = []
    kvs = []
    for k in key_cols:
        c = _codes_host(k)
        d = int(key_values(k).shape[0])
        combined = combined * d + c
        dims.append(d)
        kvs.append(key_values(k))
    from .util import sorted_factorize

    # factorize over rows valid in EVERY key: canonical fills can form
    # combos that exist at no valid row, which would otherwise surface as
    # phantom output groups with count 0 and unmapped min/max garbage
    valid = np.ones(n, bool)
    for k in key_cols:
        if nulls.is_nullable(k):
            valid &= nulls.valid_mask(k)
    if valid.all() or not valid.any():
        # all-valid: plain factorize; all-null: keep the degenerate
        # zero-count groups (mirrors the single-key all-null contract)
        uniq, inv = sorted_factorize(combined)
    else:
        uniq, inv_v = sorted_factorize(combined[valid])
        inv = np.zeros(n, np.int64)  # null rows park on code 0; the
        inv[valid] = inv_v  # validity bitmap below zeroes their weight
    key_col = _encode(inv.astype(np.int32), "dict")
    # null rows in any key: AND their validity into the filter bitmap
    bitmap = _and_validity(bitmap, *key_cols)
    r = group_reduce(key_col, vals, aggs, bitmap)
    # unpack combo ids back into per-column key tuples
    out_keys = np.empty(uniq.shape[0], dtype=object)
    for j, u in enumerate(uniq):
        parts = []
        rem = int(u)
        for d in reversed(dims):
            parts.append(rem % d)
            rem //= d
        parts.reverse()
        out_keys[j] = tuple(kv[p] for kv, p in zip(kvs, parts))
    return GroupResult(keys=out_keys, count=r.count, sum=r.sum, min=r.min, max=r.max)
