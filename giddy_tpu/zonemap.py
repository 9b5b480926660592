"""Zone maps: per-GROUP min/max pruning and sorted-column search.

The DBMS-side structure the reference's MonetDB host kept around its
columns (SURVEY.md §1 — scheme choice and scan planning lived in the
caller); a standalone framework needs it in-house. A zone map stores the
min/max of every GROUP tile (FORMAT.md §0), so selective scans decide
per group: predicate definitely-all-true (count without decoding),
definitely-all-false (skip), or undecided (decode just that group via
partial.GroupSlicer). ``searchsorted`` uses the same structure as a
coarse index over sorted columns: binary-search the group maxima, decode
one group, finish with the in-group search.

Ordering is computed on monotone keys: logical values for integers,
IEEE total-order bitpattern keys for floats (query.py semantics: NaNs at
the extremes, -0.0 < +0.0).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .format import EncodedColumn
from .util import GROUP, np_dtype, num_groups


def _keys(values: np.ndarray, dtype: str) -> np.ndarray:
    """Logical values -> monotone orderable keys (see module docstring)."""
    dt = np_dtype(dtype)
    if dt.kind != "f":
        return values
    if dt.itemsize == 4:
        u = values.view(np.uint32)
        neg = np.where(u >> np.uint32(31), np.uint32(0xFFFFFFFF), np.uint32(0))
        return u ^ (np.uint32(0x80000000) | neg)
    u = values.view(np.uint64)
    neg = np.where(u >> np.uint64(63), np.uint64(0xFFFFFFFFFFFFFFFF), np.uint64(0))
    return u ^ (np.uint64(0x8000000000000000) | neg)


def _key_scalar(value, dtype: str):
    dt = np_dtype(dtype)
    if dt.kind != "f":
        return value
    return _keys(np.array([value], dt), dtype)[0]


@dataclasses.dataclass
class ZoneMap:
    """Per-group [min, max] in key space; sorted_ set if the column's key
    sequence is globally nondecreasing (enables searchsorted)."""

    mins: np.ndarray  # (ng,) key dtype
    maxs: np.ndarray
    n: int
    dtype: str
    sorted_: bool

    @property
    def ng(self) -> int:
        return self.mins.shape[0]


# id -> (col, ZoneMap); holding the column keeps the id from being reused
_ZM_CACHE: dict[int, tuple[EncodedColumn, ZoneMap]] = {}


def zone_map(col: EncodedColumn) -> ZoneMap:
    """Build (or fetch cached) the column's zone map — one oracle decode,
    the load-time scan a DBMS would do."""
    hit = _ZM_CACHE.get(id(col))
    if hit is not None and hit[0] is col:
        return hit[1]
    from .api import decode_ref

    full = decode_ref(col)
    keys = _keys(full, col.dtype)
    ng = num_groups(col.n)
    mins = np.empty(ng, keys.dtype)
    maxs = np.empty(ng, keys.dtype)
    for g in range(ng):
        seg = keys[g * GROUP : min((g + 1) * GROUP, col.n)]
        mins[g], maxs[g] = seg.min(), seg.max()
    sorted_ = bool(np.all(keys[1:] >= keys[:-1])) if col.n > 1 else True
    zm = ZoneMap(mins=mins, maxs=maxs, n=col.n, dtype=col.dtype, sorted_=sorted_)
    _ZM_CACHE[id(col)] = (col, zm)
    return zm


# Per-op (definitely-all-true, definitely-all-false) group predicates on
# (zmin, zmax, key): a group is all-true when every element satisfies the
# predicate, all-false when none can.
_PRUNE = {
    "lt": (lambda lo, hi, v: hi < v, lambda lo, hi, v: lo >= v),
    "le": (lambda lo, hi, v: hi <= v, lambda lo, hi, v: lo > v),
    "gt": (lambda lo, hi, v: lo > v, lambda lo, hi, v: hi <= v),
    "ge": (lambda lo, hi, v: lo >= v, lambda lo, hi, v: hi < v),
    "eq": (lambda lo, hi, v: (lo == v) & (hi == v), lambda lo, hi, v: (v < lo) | (v > hi)),
    "ne": (lambda lo, hi, v: (v < lo) | (v > hi), lambda lo, hi, v: (lo == v) & (hi == v)),
}


def candidate_groups(zm: ZoneMap, op: str, value) -> np.ndarray:
    """Boolean (ng,) mask of groups that MIGHT contain matches (all-false
    groups removed; all-true groups still set — use prune_groups for the
    three-way split)."""
    _, all_false = _split_masks(zm, op, value)
    return ~all_false


def _split_masks(zm: ZoneMap, op: str, value):
    if op not in _PRUNE:
        raise ValueError(f"op must be one of {tuple(_PRUNE)}, got {op!r}")
    v = _key_scalar(value, zm.dtype)
    t_fn, f_fn = _PRUNE[op]
    return t_fn(zm.mins, zm.maxs, v), f_fn(zm.mins, zm.maxs, v)


def _group_len(g: int, n: int) -> int:
    return min((g + 1) * GROUP, n) - g * GROUP


def count_where_pruned(col: EncodedColumn, op: str, value) -> int:
    """count_where that touches only undecided groups: all-true groups
    count by size, all-false groups are skipped, the rest decode
    group-by-group (partial.GroupSlicer). On selective predicates over
    clustered data this reads a small fraction of the column."""
    from . import nulls
    from .partial import GroupSlicer
    from .query import _OPS

    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    zm = zone_map(col)
    all_true, all_false = _split_masks(zm, op, value)
    # nullable: zone bounds are computed over the canonical fill, which
    # only repeats valid values, so pruning decisions stay sound — but
    # null rows must not be counted (SQL: NULL never matches), so
    # all-true groups count their VALID rows and undecided groups mask
    nullable = nulls.is_nullable(col)
    if nullable:
        vw = col.streams["valid"]
        vmask = nulls.valid_mask(col)
        count = int(np.bitwise_count(vw[all_true]).sum())
    else:
        count = sum(_group_len(int(g), col.n) for g in np.flatnonzero(all_true))
    undecided = np.flatnonzero(~all_true & ~all_false)
    if undecided.size == 0:
        return int(count)
    if col.scheme == "wide":
        from .partial import decode_groups

        dec = lambda g: decode_groups(col, int(g), int(g) + 1)  # noqa: E731
    else:
        slicer = GroupSlicer(col)
        dec = lambda g: slicer.decode(int(g), int(g) + 1)  # noqa: E731
    from .util import NP_CMP

    vk = _key_scalar(value, col.dtype)
    cmp = NP_CMP[op]
    for g in undecided:
        vals = _keys(dec(g), col.dtype)
        m = cmp(vals, vk)
        if nullable:
            m = m & vmask[int(g) * GROUP : int(g) * GROUP + vals.shape[0]]
        count += int(m.sum())
    return int(count)


def searchsorted(col: EncodedColumn, values, side: str = "left") -> np.ndarray:
    """np.searchsorted over a sorted compressed column: binary-search the
    zone-map maxima to find each value's group, decode only those groups,
    finish in-group. Raises if the column is not sorted (one-time check,
    part of the zone map build)."""
    if side not in ("left", "right"):
        raise ValueError(f"side must be 'left' or 'right', got {side!r}")
    zm = zone_map(col)
    if not zm.sorted_:
        raise ValueError(f"column {col.name!r} is not sorted; searchsorted needs a sorted column")
    vals = np.asarray(values)
    scalar = vals.ndim == 0
    vk = _keys(np.atleast_1d(vals).astype(np_dtype(col.dtype)), col.dtype)
    # group of the insertion point: first group whose max bounds the value
    bounds = zm.maxs
    g_of = np.searchsorted(bounds, vk, side=side)
    out = np.empty(vk.shape, np.int64)
    from .partial import GroupSlicer

    slicer = None if col.scheme == "wide" else GroupSlicer(col)
    for g in np.unique(g_of):
        m = g_of == g
        if g >= zm.ng:  # beyond every group's max: append position
            out[m] = col.n
            continue
        if slicer is None:
            from .partial import decode_groups

            seg = decode_groups(col, int(g), int(g) + 1)
        else:
            seg = slicer.decode(int(g), int(g) + 1)
        seg_k = _keys(seg, col.dtype)
        out[m] = int(g) * GROUP + np.searchsorted(seg_k, vk[m], side=side)
    return out[0] if scalar else out.reshape(vals.shape)
