"""Table façade: the multi-column scan API over a container.

The reference is a kernel library; its DBMS caller (MonetDB) owned the
table abstraction (SURVEY.md §1). A standalone framework needs one: this
module binds same-length encoded columns into a ``Table`` and routes the
whole scan pipeline through the right per-column machinery — numeric
predicates to query.py's fused filter kernels, string predicates to
strings.py's dictionary range rewrite, GROUP BY to groupby.py, ORDER BY
to topk.py — composing everything on LMP(1) bitmaps so multi-column
WHERE clauses AND together on device and rows materialize only at the
very end (and only for the selected columns' matching groups).
"""

from __future__ import annotations

import numpy as np

from .format import EncodedColumn


def _distinct_values(col: EncodedColumn):
    """The distinct NON-NULL values of a column (the semi-join build set).
    Dictionary-backed columns answer from the dictionary (dense: every
    entry occurs; strdict dictionaries are always dense); anything else
    decodes and uniques host-side (null rows excluded)."""
    from . import nulls

    if col.scheme == "strdict":
        from .strings import dictionary

        d = dictionary(col)
        if nulls.is_nullable(col) and nulls.count_valid(col) == 0:
            return []
        return list(d)
    from .util import np_dtype

    is_float = np_dtype(col.dtype).kind == "f"
    if col.scheme in ("dict", "cascade") and col.params.get("dense") and not is_float:
        if nulls.is_nullable(col) and nulls.count_valid(col) == 0:
            return []
        from .groupby import key_values

        return [int(v) for v in key_values(col)]
    from .api import decode

    v = np.asarray(decode(col))
    if nulls.is_nullable(col):
        v = v[nulls.valid_mask(col)]
    if is_float:
        # distinct in bitpattern space (matches the device membership scan)
        w = np.unique(v.view(np.uint32 if v.dtype.itemsize == 4 else np.uint64))
        return [float(x) for x in w.view(v.dtype)]
    return [int(x) for x in np.unique(v)]


class Table:
    """Named, same-length encoded columns with a scan API."""

    def __init__(self, columns):
        cols = list(columns.values()) if isinstance(columns, dict) else list(columns)
        if not cols:
            raise ValueError("a Table needs at least one column")
        names = [c.name for c in cols]
        if len(set(names)) != len(names):
            raise ValueError(f"duplicate column names: {names}")
        n = cols[0].n
        for c in cols:
            if c.n != n:
                raise ValueError(f"column {c.name!r} has n={c.n}, expected {n}")
        self._cols = {c.name: c for c in cols}
        self.n = n

    # --- plumbing ---------------------------------------------------------

    @classmethod
    def from_arrays(cls, arrays, schemes=None) -> "Table":
        """Build a Table from named host arrays (the ingestion twin of
        ``select``). Numeric columns route through the advisor
        (``scheme='auto'``) unless ``schemes[name]`` overrides; 64-bit
        dtypes go through the ``wide`` plane split; str/bytes sequences
        become ``strdict`` columns. A value may be an ``(array, valid)``
        pair to make the column nullable."""
        from .api import encode
        from .strings import encode_strings

        schemes = schemes or {}
        cols = []
        for name, v in arrays.items():
            valid = None
            if isinstance(v, tuple):
                v, valid = v
                valid = np.asarray(valid, bool)
            arr = np.asarray(v)
            if arr.dtype.kind in ("U", "S", "O"):
                cols.append(encode_strings(list(v), name=name, valid=valid))
                continue
            if arr.dtype.kind in ("M", "m"):
                # datetime64/timedelta64: store the int64 ticks under the
                # wide split, tag the logical dtype so to_pandas restores it
                from .wide import encode as wide_encode

                logical = str(arr.dtype)
                iv = arr.view(np.int64)
                if valid is not None:
                    from . import nulls

                    col = nulls.attach_valid(
                        wide_encode(nulls.fill_nulls(iv, valid), name=name), valid
                    )
                else:
                    col = wide_encode(iv, name=name)
                col.params = {**col.params, "logical": logical}
                cols.append(col)
                continue
            scheme = schemes.get(name, "auto")
            if arr.dtype.itemsize == 8 and scheme in ("auto", "wide"):
                if valid is not None:
                    from . import nulls

                    filled = nulls.fill_nulls(arr, valid)
                    from .wide import encode as wide_encode

                    cols.append(nulls.attach_valid(wide_encode(filled, name=name), valid))
                else:
                    from .wide import encode as wide_encode

                    cols.append(wide_encode(arr, name=name))
                continue
            cols.append(encode(arr, scheme, valid=valid, name=name))
        return cls(cols)

    @classmethod
    def from_pandas(cls, df, schemes=None, *, downcast: bool = True,
                    dtypes=None) -> "Table":
        """Encode a pandas DataFrame (the inverse of ``to_pandas``).
        Missing values (pd.NA / None / NaN in float columns — the pandas
        missing-data convention) become null rows. ``downcast`` narrows
        64-bit integer columns that fit in 32 bits (pandas defaults CSV
        ints to int64 with no intent behind it; the narrow dtype unlocks
        the native 32-bit schemes and their compression). ``dtypes`` pins
        named numeric columns to exact target dtypes (values that do not
        fit raise instead of wrapping) — Dataset.from_csv uses this to
        keep chunked partitions schema-consistent."""
        arrays = {}
        for name in df.columns:
            ser = df[name]
            na = ser.isna().to_numpy()
            has_na = bool(na.any())
            if ser.dtype == object or str(ser.dtype) in ("string", "str"):
                vals = ["" if m else x for x, m in zip(ser.tolist(), na)]
                arrays[name] = (np.array(vals, dtype=object), ~na) if has_na else np.array(vals, dtype=object)
                continue
            if getattr(ser.dtype, "kind", "") in ("M", "m"):
                # tz-aware timestamps normalize to naive UTC first (numpy
                # has no tz concept; the logical tag records the unit)
                if getattr(ser.dtype, "tz", None) is not None:
                    ser = ser.dt.tz_convert("UTC").dt.tz_localize(None)
                v = ser.to_numpy()
                arrays[name] = (v, ~na) if has_na else v
                continue
            np_dt = getattr(ser.dtype, "numpy_dtype", None)  # masked ext. dtypes
            if np_dt is not None:
                v = ser.to_numpy(dtype=np_dt, na_value=0)
            else:
                v = ser.to_numpy()
            if v.dtype == object:
                v = np.where(na, 0, v).astype(np.int64)
            if v.dtype.kind == "b":
                v = v.astype(np.int8)
            if has_na and v.dtype.kind == "f":
                # NaN slots: give the filler a defined payload before the
                # canonical null fill
                v = np.where(na, np.zeros((), v.dtype), v)
            if (downcast and v.dtype.kind in "iu" and v.dtype.itemsize == 8
                    and (schemes or {}).get(name) != "wide" and v.size):
                lo, hi = int(v.min()), int(v.max())
                if -(2**31) <= lo and hi < 2**31:
                    v = v.astype(np.int32)
                elif 0 <= lo and hi < 2**32:
                    v = v.astype(np.uint32)
            want = (dtypes or {}).get(name)
            if (want is not None and v.dtype.kind in "iuf"
                    and v.dtype != np.dtype(want)):
                conv = v.astype(want)
                if not np.array_equal(conv.astype(v.dtype), v):
                    raise ValueError(
                        f"column {name!r}: values do not fit pinned dtype {want}"
                    )
                v = conv
            arrays[name] = (v, ~na) if has_na else v
        return cls.from_arrays(arrays, schemes)

    @classmethod
    def read(cls, data) -> "Table":
        """From container bytes / a file object (format.read_container)."""
        from .format import read_container

        return cls(read_container(data))

    @classmethod
    def open(cls, path: str) -> "Table":
        from .format import open_container

        return cls(open_container(path))

    def to_bytes(self) -> bytes:
        from .format import container_bytes

        return container_bytes(list(self._cols.values()))

    def save(self, path: str) -> None:
        from .format import write_container

        with open(path, "wb") as f:
            write_container(list(self._cols.values()), f)

    @property
    def names(self) -> list[str]:
        return list(self._cols)

    def __getitem__(self, name: str) -> EncodedColumn:
        try:
            return self._cols[name]
        except KeyError:
            raise KeyError(f"no column {name!r}; have {self.names}") from None

    def __len__(self) -> int:
        return self.n

    # --- predicates ---------------------------------------------------------

    def where(self, name: str, op: str, value):
        """LMP(1) match bitmap for one predicate — string columns route to
        the dictionary rewrite (incl. startswith/contains), numeric columns
        to the fused filter kernels. ``op`` may also be ``between``
        (value = (lo, hi), inclusive) or ``isin`` (value = iterable).
        Compose with bitmap_and/or/not."""
        col = self[name]
        if op == "isin":
            return self.isin(name, value)
        if op == "between":
            lo, hi = value
            if col.scheme == "strdict":
                from .strings import filter_bitmap_str

                return filter_bitmap_str(col, "ge", lo) & filter_bitmap_str(col, "le", hi)
            from .query import between_bitmap

            return between_bitmap(col, lo, hi)
        if col.scheme == "strdict":
            from .strings import filter_bitmap_str

            return filter_bitmap_str(col, op, value)
        from .query import filter_bitmap

        return filter_bitmap(col, op, value)

    def where_all(self, *predicates):
        """AND of (name, op, value) predicates — the multi-column WHERE.
        All filter kernels run in sequence on-device; only bitmaps live."""
        bm = None
        for name, op, value in predicates:
            b = self.where(name, op, value)
            bm = b if bm is None else (bm & b)
        if bm is None:
            raise ValueError("where_all needs at least one predicate")
        return bm

    def where_any(self, *predicates):
        """OR of (name, op, value) predicates. NOTE: unlike AND, an OR over
        nullable columns follows SQL three-valued logic only per-term
        (null rows never match any term, hence never the OR)."""
        bm = None
        for name, op, value in predicates:
            b = self.where(name, op, value)
            bm = b if bm is None else (bm | b)
        if bm is None:
            raise ValueError("where_any needs at least one predicate")
        return bm

    def count(self, *predicates) -> int:
        from .query import count_bits

        return count_bits(self.where_all(*predicates), self.n)

    def isin(self, name: str, values):
        """Membership bitmap: string columns via the dictionary, numeric
        via eq-scan OR (small sets) or device binary search (large sets)."""
        col = self[name]
        if col.scheme == "strdict":
            from .strings import isin_bitmap_str

            return isin_bitmap_str(col, values)
        from .query import isin_bitmap

        return isin_bitmap(col, values)

    def semi_join(self, name: str, other, other_name: str | None = None):
        """Bitmap of rows whose ``name`` value appears in another column —
        the DBMS semi-join (WHERE a.x IN (SELECT y FROM b)). ``other`` is a
        Table (with ``other_name``) or an EncodedColumn. Dictionary-backed
        probe columns evaluate membership over their dictionary (O(d) host
        set test + a range/lookup scan); others go through isin. The build
        side's distinct set comes from its dictionary when it has one,
        else a decode+unique. Null rows on either side never match (SQL:
        NULL IN (...) is unknown)."""
        col = self[name]
        build = other[other_name] if isinstance(other, Table) else other
        build_set = _distinct_values(build)
        if col.scheme == "strdict":
            from .strings import isin_bitmap_str

            return isin_bitmap_str(col, list(build_set))
        from .util import np_dtype

        if col.scheme in ("dict", "cascade") and np_dtype(col.dtype).kind != "f":
            from .groupby import key_values
            from .query import dict_mask_bitmap

            kv = key_values(col)
            want = set(int(v) for v in build_set)
            mask = np.fromiter((int(v) in want for v in kv), bool, count=kv.shape[0])
            return dict_mask_bitmap(col, mask)
        from .query import isin_bitmap

        return isin_bitmap(col, list(build_set))

    def join(self, on: str, other: "Table", other_on: str | None = None,
             select=None, other_select=None, suffix: str = "_r", *, mesh=None,
             how: str = "inner"):
        """Materialized equi-join (see join.join_tables): returns
        ``(rows, li, ri)`` — the joined output columns plus the matched
        row-index pairs. Device membership scans prune both sides before
        any materialization (sharded over ``mesh`` when given); null keys
        never match. ``how="left"`` keeps unmatched left rows with
        ``ri = -1`` (mask right columns with ``ri >= 0``); ``how="outer"``
        also appends unmatched right rows with ``li = -1`` (mask left
        columns with ``li >= 0``)."""
        from .join import join_tables

        return join_tables(self, on, other, other_on, select, other_select,
                           suffix, mesh=mesh, how=how)

    def join_table(self, on: str, other: "Table", other_on: str | None = None,
                   select=None, other_select=None, suffix: str = "_r", *,
                   mesh=None, how: str = "inner", schemes=None) -> "Table":
        """Like :meth:`join` but returns an encoded Table: LEFT/FULL OUTER
        unmatched cells (and propagated source nulls) are real encoded NULL
        rows with validity bitmaps, so the result round-trips through the
        container and scans null-correctly (see join.join_table)."""
        from .join import join_table

        return join_table(self, on, other, other_on, select, other_select,
                          suffix, mesh=mesh, how=how, schemes=schemes)

    def anti_join(self, name: str, other, other_name: str | None = None):
        """Bitmap of rows whose non-null ``name`` value has NO match in the
        other column (NOT EXISTS ... WHERE equal) — the complement of
        semi_join over valid rows."""
        from .join import anti_join_bitmap

        build = other[other_name or name] if isinstance(other, Table) else other
        return anti_join_bitmap(self[name], build)

    # --- materialization ------------------------------------------------------

    def select(self, names=None, bitmap=None, *predicates) -> dict[str, np.ndarray]:
        """Rows matching ``bitmap`` (or the AND of ``predicates``) for the
        requested columns; decodes only the groups containing matches.
        With neither bitmap nor predicates, decodes the full columns."""
        names = self.names if names is None else list(names)
        if predicates:
            pbm = self.where_all(*predicates)
            bitmap = pbm if bitmap is None else (np.asarray(bitmap) & np.asarray(pbm))
        out = {}
        if bitmap is None:
            from .api import decode

            for nm in names:
                out[nm] = np.asarray(decode(self[nm]))
            return out
        from .ref.lmp import lmp_unpack
        from .util import LANES, num_groups

        words = np.asarray(bitmap).reshape(num_groups(self.n), LANES)
        idx = np.flatnonzero(lmp_unpack(words, 1, self.n).astype(bool))
        return {nm: self.take(nm, idx) for nm in names}

    def take(self, name: str, indices) -> np.ndarray:
        col = self[name]
        if col.scheme == "strdict":
            from .partial import take
            from .strings import codes_column, dictionary

            codes = take(codes_column(col), indices)
            return dictionary(col)[codes.astype(np.int64)]
        from .partial import take

        return take(col, indices)

    # --- aggregates -------------------------------------------------------------

    def agg(self, name: str, agg: str):
        """sum/min/max/avg/count/distinct (null-aware; strings answer
        min/max/distinct from the dictionary)."""
        col = self[name]
        if col.scheme == "strdict":
            from . import strings

            fn = {"min": strings.min_str, "max": strings.max_str,
                  "distinct": strings.distinct_count_str}
            if agg == "count":
                from .nulls import count_valid

                return count_valid(col)
            if agg not in fn:
                raise ValueError(f"string columns support min/max/distinct/count, not {agg!r}")
            return fn[agg](col)
        from .aggregate import avg_, distinct_count, max_, min_, sum_
        from .nulls import count_valid

        fn = {"sum": sum_, "min": min_, "max": max_, "avg": avg_,
              "count": count_valid, "distinct": distinct_count}
        if agg not in fn:
            raise ValueError(f"agg must be one of {sorted(fn)}, got {agg!r}")
        return fn[agg](col)

    def groupby(self, keys, vals: str | None = None,
                aggs=("count",), *predicates):
        """GROUP BY one dictionary-backed (dict/cascade/strdict) key
        column — or several at once (pass a list of names; result keys
        are per-column tuples) — optionally under the AND of
        (name, op, value) predicates."""
        from .groupby import group_reduce, group_reduce_multi

        bm = self.where_all(*predicates) if predicates else None
        v = self[vals] if vals else None
        if isinstance(keys, (list, tuple)):
            return group_reduce_multi([self[k] for k in keys], v, tuple(aggs), bm)
        return group_reduce(self[keys], v, tuple(aggs), bm)

    def distinct(self, names):
        """SELECT DISTINCT: unique values of one column (dictionary
        answer when it has one), or unique combinations (list of tuples)
        of several dictionary-backed columns."""
        if isinstance(names, str):
            return _distinct_values(self[names])
        r = self.groupby(list(names))
        return [k for k, c in zip(r.keys, r.count) if c > 0]

    def to_pandas(self, bitmap=None, *predicates):
        """Materialize (optionally the matching rows of) the table as a
        pandas DataFrame — the interop boundary for everything downstream
        of the scan. Nullable columns surface as pandas NA values."""
        import pandas as pd

        from .nulls import is_nullable, valid_mask

        bm = None
        if predicates:
            bm = self.where_all(*predicates)
            if bitmap is not None:
                bm = np.asarray(bitmap) & np.asarray(bm)
        elif bitmap is not None:
            bm = bitmap
        rows = self.select(None, bm)
        idx = None
        if bm is not None:
            from .ref.lmp import lmp_unpack
            from .util import LANES, num_groups

            words = np.asarray(bm).reshape(num_groups(self.n), LANES)
            idx = np.flatnonzero(lmp_unpack(words, 1, self.n).astype(bool))
        df = pd.DataFrame(rows)
        for nm in self.names:
            col = self[nm]
            logical = col.params.get("logical", "")
            is_time = logical.startswith(("datetime64", "timedelta64"))
            if is_time:
                # stored as int64 ticks (from_arrays); NaT marks the nulls
                df[nm] = pd.Series(
                    np.asarray(rows[nm], np.int64).view(np.dtype(logical))
                )
            if is_nullable(col):
                m = valid_mask(col) if idx is None else valid_mask(col)[idx]
                if is_time:
                    s = df[nm].copy()
                    s[~m] = pd.NaT
                else:
                    s = df[nm].astype(object)
                    s[~m] = pd.NA
                df[nm] = s
        return df

    def _sort_key(self, name: str, ascending: bool):
        """(key, nulls_last) arrays for one sort column — monotone int
        keys (strdict via code order, floats total-order), descending via
        dense-rank negation (ties keep original order), null keys zeroed
        with a separate NULLS LAST flag."""
        from . import nulls
        from .zonemap import _keys

        col = self[name]
        if col.scheme == "strdict":
            from .api import decode_ref
            from .strings import codes_column

            # codes are ordered by the bytes-sorted dictionary: sorting by
            # code IS sorting by string
            key = decode_ref(codes_column(col)).astype(np.int64)
        else:
            from .api import decode

            v = np.asarray(decode(col))
            key = _keys(v, col.dtype)
        if not ascending:
            from .util import sorted_factorize

            _, inv = sorted_factorize(key)
            key = -inv.astype(np.int64)
        if nulls.is_nullable(col):
            m = nulls.valid_mask(col)
            nulls_last = ~m
            key = np.where(m, key, np.zeros((), key.dtype))
        else:
            nulls_last = np.zeros(self.n, bool)
        return key, nulls_last

    def sort_by(self, names, *, ascending=True, schemes=None) -> "Table":
        """A new Table with rows reordered by one or several columns and
        every column re-encoded (advisor unless ``schemes`` overrides).
        Sorted order is what the delta/RLE/zone-map machinery feeds on,
        so this is the standard preparation step for a scan-heavy column.
        Stable; null keys sort last per key (SQL NULLS LAST); floats
        order by IEEE total order. ``ascending`` may be one bool or a
        list matching ``names``."""
        names = [names] if isinstance(names, str) else list(names)
        if isinstance(ascending, bool):
            ascending = [ascending] * len(names)
        if len(ascending) != len(names):
            raise ValueError("ascending must match names")
        # lexsort: LAST key is primary; stability tiebreak is the index
        ks = [self._sort_key(nm, asc) for nm, asc in zip(names, ascending)]
        cols = [np.arange(self.n)]
        for key, nl in reversed(ks):
            cols += [key, nl]
        idx = np.lexsort(tuple(cols))
        return self._take_table(idx, schemes)

    def _take_table(self, idx: np.ndarray, schemes=None) -> "Table":
        """Rows at ``idx`` as a new re-encoded Table (validity masks and
        logical dtype tags preserved) — shared by sort_by and filter."""
        from . import nulls

        arrays = {}
        logical = {}
        for nm in self.names:
            c = self[nm]
            vals = self.take(nm, idx)
            if c.params.get("logical"):
                logical[nm] = c.params["logical"]
            if nulls.is_nullable(c):
                arrays[nm] = (vals, nulls.valid_mask(c)[idx])
            else:
                arrays[nm] = vals
        out = Table.from_arrays(arrays, schemes)
        for nm, lg in logical.items():
            out[nm].params = {**out[nm].params, "logical": lg}
        return out

    def filter(self, *predicates, bitmap=None, schemes=None) -> "Table":
        """A new Table holding only the rows matching the AND of
        (name, op, value) predicates (or an explicit bitmap), re-encoded
        with the advisor — the materializing sibling of ``select`` for
        when the filtered result is itself scanned or saved."""
        if predicates:
            pbm = self.where_all(*predicates)
            bitmap = pbm if bitmap is None else (np.asarray(bitmap) & np.asarray(pbm))
        if bitmap is None:
            raise ValueError("filter needs predicates or a bitmap")
        from .ref.lmp import lmp_unpack
        from .util import LANES, num_groups

        words = np.asarray(bitmap).reshape(num_groups(self.n), LANES)
        idx = np.flatnonzero(lmp_unpack(words, 1, self.n).astype(bool))
        if idx.size == 0:
            raise ValueError("filter matched no rows (a Table cannot be empty)")
        return self._take_table(idx, schemes)

    def top_k(self, name: str, k: int, *, largest: bool = True,
              select=None):
        """ORDER BY name LIMIT k: (values, positions), plus the other
        requested columns' rows at those positions."""
        from .topk import top_k

        vals, pos = top_k(self[name], k, largest=largest)
        if select is None:
            return vals, pos
        rows = {nm: self.take(nm, pos) for nm in select}
        return vals, pos, rows
