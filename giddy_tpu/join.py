"""Inner equi-join over encoded columns — the step past `Table.semi_join`.

libgiddy stops at kernels; its DBMS caller (MonetDB) owned joins
(SURVEY.md §1). The framework's scan pipeline already covers WHERE /
aggregate / GROUP BY / ORDER BY / semi-join, so the natural completion is
a materializing equi-join that stays decode-minimal the same way the rest
of the pipeline does:

1. **Device prune (the scan part)**: membership bitmaps both ways —
   left rows whose key appears among the right's distinct keys, and
   right rows whose key appears among the *surviving* left keys. These
   ride the existing fused isin machinery (dictionary-domain rewrites for
   dict/strdict keys, device binary search for large sets), so the
   typical selective join never decodes non-matching groups at all.
2. **Host pair-match (the output part)**: sort–merge on the surviving
   keys only. Join output is host-materialized anyway (like `select`),
   so the pair expansion is O(|survivors| log |survivors| + |result|)
   NumPy — bounded by data we must touch regardless.

Null keys never match (SQL equality semantics); `anti_join_bitmap` keeps
the non-null rows *without* a partner (NOT EXISTS).
"""

from __future__ import annotations

import numpy as np

from .format import EncodedColumn
from .util import LANES, num_groups


def _match_bitmap(col: EncodedColumn, values, mesh=None) -> "np.ndarray":
    """Null-aware membership bitmap of ``col`` in ``values`` (device scan;
    dictionary-backed columns rewrite over their dictionary). With a mesh,
    the scan runs sharded (dist_query) — the prune is the O(n) part of a
    join, so it scales with the decode path."""
    if mesh is not None:
        from .dist_query import isin_bitmap_sharded

        if col.scheme == "strdict":
            from .strings import code_set, codes_column

            return np.asarray(
                isin_bitmap_sharded(codes_column(col), code_set(col, values), mesh)
            )
        return np.asarray(isin_bitmap_sharded(col, values, mesh))
    if col.scheme == "strdict":
        from .strings import isin_bitmap_str

        return np.asarray(isin_bitmap_str(col, list(values)))
    from .util import np_dtype as _npd

    if col.scheme in ("dict", "cascade") and _npd(col.dtype).kind != "f":
        from .groupby import key_values
        from .query import dict_mask_bitmap

        kv = key_values(col)
        want = set(int(v) for v in values)
        mask = np.fromiter((int(v) in want for v in kv), bool, count=kv.shape[0])
        return np.asarray(dict_mask_bitmap(col, mask))
    from .query import isin_bitmap

    return np.asarray(isin_bitmap(col, list(values)))


def _bitmap_indices(words: np.ndarray, n: int) -> np.ndarray:
    from .ref.lmp import lmp_unpack

    words = np.asarray(words).reshape(num_groups(n), LANES)
    return np.flatnonzero(lmp_unpack(words, 1, n).astype(bool))


def _take_keys(col: EncodedColumn, idx: np.ndarray) -> np.ndarray:
    """Key values at ``idx`` in a sort/searchsorted-friendly dtype
    (strings come back as fixed-width bytes)."""
    from .table import Table

    t = Table([col])
    k = t.take(col.name, idx)
    if k.dtype == object:  # str/bytes objects from a string dictionary
        from .strings import as_bytes

        # fixed-width "S" dtype treats trailing NULs as padding, which
        # would alias b"a" and b"a\x00"; a \x01 sentinel suffix keeps every
        # key's NULs interior (equality/grouping stay exact; strip the
        # sentinel before probing the device scan)
        k = np.array([as_bytes(x) + b"\x01" for x in k], dtype=np.bytes_)
    return k


def _common_key_dtype(a: np.ndarray, b: np.ndarray):
    if a.dtype.kind == "S" or b.dtype.kind == "S":
        if a.dtype.kind != b.dtype.kind:
            raise TypeError(
                f"cannot join string keys with numeric keys ({a.dtype} vs {b.dtype})"
            )
        return None  # bytes compare fine at mixed widths
    ct = np.promote_types(a.dtype, b.dtype)
    if ct.kind == "f" and a.dtype.kind != "f" and b.dtype.kind != "f":
        raise TypeError(
            f"no exact common integer type for join keys {a.dtype} vs {b.dtype}"
        )
    return ct


def join_indices(left: EncodedColumn, right: EncodedColumn, *, mesh=None,
                 how: str = "inner"):
    """Row-index pairs (li, ri) of the equi-join ``left == right``.

    Output is left-major: pairs are ordered by ``li``, and for one left
    row its right partners appear in original right order. Null keys on
    either side never match. With ``mesh``, both membership prunes run
    sharded over the device mesh (collective-free scans).

    ``how="left"`` additionally emits every unmatched left row (including
    null-key rows — SQL LEFT OUTER JOIN) once, with ``ri = -1``;
    ``how="outer"`` (FULL OUTER) also appends every unmatched right row
    once, with ``li = -1``, after the left-major block.
    """
    if how not in ("inner", "left", "outer"):
        raise ValueError(f"how must be 'inner', 'left' or 'outer', got {how!r}")
    li, ri = _inner_indices(left, right, mesh)
    if how == "inner":
        return li, ri
    unmatched = np.setdiff1d(np.arange(left.n, dtype=np.int64), li)
    li_all = np.concatenate([li, unmatched])
    ri_all = np.concatenate([ri, np.full(unmatched.size, -1, np.int64)])
    order = np.argsort(li_all, kind="stable")
    li_all, ri_all = li_all[order], ri_all[order]
    if how == "outer":
        r_un = np.setdiff1d(np.arange(right.n, dtype=np.int64), ri)
        li_all = np.concatenate([li_all, np.full(r_un.size, -1, np.int64)])
        ri_all = np.concatenate([ri_all, r_un])
    return li_all, ri_all


def _inner_indices(left: EncodedColumn, right: EncodedColumn, mesh):
    from .table import _distinct_values

    right_set = _distinct_values(right)
    if not right_set:
        e = np.empty(0, np.int64)
        return e, e
    li = _bitmap_indices(_match_bitmap(left, right_set, mesh), left.n)
    if li.size == 0:
        return li, np.empty(0, np.int64)
    lk = _take_keys(left, li)
    # prune the right side with the keys that actually survived the left scan
    if lk.dtype.kind == "f":
        # distinct + probe in bitpattern space (matches the device scan)
        w = np.unique(lk.view(np.uint32 if lk.dtype.itemsize == 4 else np.uint64))
        probe_vals = [float(x) for x in w.view(lk.dtype)]
    elif lk.dtype.kind == "S":
        # strip the \x01 sentinel _take_keys appended (see there)
        probe_vals = [bytes(v)[:-1] for v in np.unique(lk)]
    else:
        probe_vals = [int(v) for v in np.unique(lk)]
    ri = _bitmap_indices(_match_bitmap(right, probe_vals, mesh), right.n)
    if ri.size == 0:
        return np.empty(0, np.int64), ri
    rk = _take_keys(right, ri)
    ct = _common_key_dtype(lk, rk)
    if ct is not None:
        lk = lk.astype(ct)
        rk = rk.astype(ct)
    if lk.dtype.kind == "f":
        # pair-match on bitpatterns so host equality == device equality
        u = np.uint32 if lk.dtype.itemsize == 4 else np.uint64
        lk, rk = lk.view(u), rk.view(u)
    order = np.argsort(rk, kind="stable")
    rk_sorted = rk[order]
    lo = np.searchsorted(rk_sorted, lk, side="left")
    hi = np.searchsorted(rk_sorted, lk, side="right")
    counts = hi - lo
    total = int(counts.sum())
    if total == 0:
        e = np.empty(0, np.int64)
        return e, e
    starts = np.repeat(lo, counts)
    base = np.cumsum(counts) - counts
    offs = np.arange(total, dtype=np.int64) - np.repeat(base, counts)
    out_li = np.repeat(li, counts)
    out_ri = ri[order[starts + offs]]
    return out_li, out_ri


def anti_join_bitmap(probe: EncodedColumn, build: EncodedColumn):
    """LMP(1) bitmap of probe rows with a non-null key that has NO match
    in ``build`` (NOT EXISTS). The complement of the semi-join restricted
    to valid rows."""
    from . import nulls
    from .query import bitmap_not
    from .table import _distinct_values

    build_set = _distinct_values(build)
    if not build_set:
        if nulls.is_nullable(probe):
            return np.asarray(nulls.valid_words_device(probe))
        # every row matches "no partner"
        return np.asarray(
            bitmap_not(np.zeros((num_groups(probe.n), LANES), np.uint32), probe.n)
        )
    sem = _match_bitmap(probe, build_set)
    bm = np.asarray(bitmap_not(sem, probe.n))
    if nulls.is_nullable(probe):
        bm = bm & np.asarray(nulls.valid_words_device(probe))
    return bm


def join_tables(left, on: str, right, right_on: str | None = None,
                select=None, right_select=None, suffix: str = "_r", *,
                mesh=None, how: str = "inner"):
    """Materialized equi-join of two Tables.

    Returns ``(rows, li, ri)``: a dict of joined output columns (left
    ``select`` names as-is; right ``right_select`` names, suffixed on
    collision) and the underlying row-index pairs. ``select`` defaults to
    all left columns, ``right_select`` to all right columns except the
    key (which would duplicate the left key).

    ``how="left"``: unmatched left rows appear once with ``ri = -1``;
    their right-column cells hold placeholder values — mask with
    ``ri >= 0`` (the matched indicator) before use. ``how="outer"``
    additionally appends unmatched right rows with ``li = -1``, whose
    LEFT-column cells are placeholders the same way — mask those with
    ``li >= 0``.
    """
    right_on = on if right_on is None else right_on
    li, ri = join_indices(left[on], right[right_on], mesh=mesh, how=how)
    select = left.names if select is None else list(select)
    if right_select is None:
        right_select = [nm for nm in right.names if nm != right_on]
    rows: dict[str, np.ndarray] = {}
    for nm in select:
        rows[nm] = _take_placeholder(left, nm, li)
    for nm in right_select:
        out = nm if nm not in rows else nm + suffix
        if out in rows:
            raise ValueError(f"column name collision after suffix: {out!r}")
        rows[out] = _take_placeholder(right, nm, ri)
    return rows, li, ri


def _take_placeholder(tbl, nm: str, idx: np.ndarray) -> np.ndarray:
    """Rows at ``idx`` where -1 slots (outer-join placeholders) read row 0
    — or a zero value when the table is empty (an all-unmatched outer
    side has no row 0 to borrow)."""
    if tbl.n == 0:
        e = tbl.take(nm, np.empty(0, np.int64))
        return np.zeros(idx.shape[0], dtype=e.dtype)
    return tbl.take(nm, np.where(idx < 0, 0, idx))


def _take_valid(tbl, nm: str, idx: np.ndarray) -> np.ndarray:
    """Validity of rows at ``idx``: False at -1 placeholder slots AND at
    source rows that are themselves null (SQL null propagation)."""
    from . import nulls

    valid = idx >= 0
    if tbl.n == 0:  # all-placeholder side: no row 0 to probe
        return valid
    col = tbl[nm]
    if nulls.is_nullable(col):
        src = nulls.valid_mask(col)
        valid = valid & src[np.where(idx < 0, 0, idx)]
    return valid


def join_table(left, on: str, right, right_on: str | None = None,
               select=None, right_select=None, suffix: str = "_r", *,
               mesh=None, how: str = "inner", schemes=None):
    """Materialized equi-join returning an encoded :class:`~.table.Table`.

    The container-native sibling of :func:`join_tables` (VERDICT r1 item
    #9): unmatched LEFT/FULL OUTER cells become encoded NULL rows
    (validity bitmaps, nulls.py) instead of ``-1`` indices + placeholder
    values, and source-side nulls propagate — so the join output
    round-trips through the container, scans null-correctly, and
    ``to_pandas()`` surfaces NA, like any other table. The join key of a
    FULL OUTER join is null on appended right-only rows; select the right
    key into the output too if a coalesced key is needed.

    ``schemes`` optionally pins encode schemes per output column name
    (default: advisor auto-selection).
    """
    from .table import Table

    right_on = on if right_on is None else right_on
    li, ri = join_indices(left[on], right[right_on], mesh=mesh, how=how)
    select = left.names if select is None else list(select)
    if right_select is None:
        right_select = [nm for nm in right.names if nm != right_on]
    arrays: dict = {}

    def put(tbl, nm: str, out: str, idx: np.ndarray) -> None:
        if out in arrays:
            raise ValueError(f"column name collision after suffix: {out!r}")
        v = _take_placeholder(tbl, nm, idx)
        valid = _take_valid(tbl, nm, idx)
        arrays[out] = v if valid.all() else (v, valid)

    for nm in select:
        put(left, nm, nm, li)
    for nm in right_select:
        put(right, nm, nm if nm not in arrays else nm + suffix, ri)
    return Table.from_arrays(arrays, schemes)
