"""String columns: dictionary-encoded text with predicate pushdown.

The reference is integer-only — string columns in its DBMS context
(MonetDB) arrive dictionary-encoded, and libgiddy decompresses the *code*
column (SURVEY.md §1; the DICT kernel's dictionary is a device-side value
array). This module is that story made first-class for text: a column of
strings becomes a **byte-string dictionary (host)** + an **int32 code
column (device)** encoded with any registered inner scheme, exactly like
``cascade`` (FORMAT.md §1.14) — so string scans lower to integer code
scans and inherit the whole pipeline: fused filter kernels, zone-style
range rewrites, GROUP BY, sharded twins, nullability.

Scheme ``strdict``:

- params: ``codes_scheme``/``codes_params`` (the inner column),
  ``dict_size``, ``kind`` ("str" | "bytes"), ``dense`` (always true —
  the dictionary is built with np.unique, so it is lexicographically
  sorted by BYTES and every entry occurs).
- streams: ``values_bytes`` (uint8, concatenated dictionary entries),
  ``values_offsets`` (int64, d+1 boundaries), and the inner code column's
  streams under a ``c_`` prefix (plus ``valid`` when nullable).

Ordering is **bytes order** (UTF-8 for str inputs) — this is what makes
ordered predicates (lt/le/gt/ge) and ``startswith`` collapse to ≤1
contiguous code range on the sorted dictionary.
"""

from __future__ import annotations

import numpy as np

from . import registry
from .format import EncodedColumn
from .util import LANES, num_groups, sorted_factorize

STR_OPS = ("eq", "ne", "lt", "le", "gt", "ge", "startswith", "contains")


def _to_bytes_list(values) -> tuple[list[bytes], str]:
    out = []
    kind = "bytes"
    for v in values:
        if isinstance(v, str):
            kind = "str"
            out.append(v.encode("utf-8"))
        elif isinstance(v, (bytes, np.bytes_)):
            out.append(bytes(v))
        elif isinstance(v, np.str_):
            kind = "str"
            out.append(str(v).encode("utf-8"))
        else:
            raise TypeError(f"string column values must be str or bytes, got {type(v)}")
    return out, kind


def as_bytes(v) -> bytes:
    """One string value -> utf-8 bytes (the container's key space)."""
    if isinstance(v, (bytes, np.bytes_)):
        return bytes(v)
    if isinstance(v, (str, np.str_)):
        return str(v).encode("utf-8")
    raise TypeError(f"string value must be str or bytes, got {type(v)}")


def code_set(col: EncodedColumn, values) -> list[int]:
    """Codes of the dictionary entries matching a value set (utf-8 key
    space) — the shared semi-join/join rewrite for strdict probes."""
    want = {as_bytes(v) for v in values}
    off = col.streams["values_offsets"]
    blob = col.streams["values_bytes"].tobytes()
    d = col.params["dict_size"]
    return [i for i in range(d) if blob[int(off[i]) : int(off[i + 1])] in want]


AUTO_INNER = ("rle", "nbit", "delta", "for")


def encode_strings(
    values,
    *,
    codes_scheme: str = "auto",
    name: str = "col",
    valid=None,
    **codes_opts,
) -> EncodedColumn:
    """Encode a sequence of str/bytes. ``codes_scheme`` "auto" trial-
    encodes the code column with each of AUTO_INNER and keeps the
    smallest (runs of repeated strings land on rle, high-cardinality
    shuffles on nbit). ``valid``: optional bool[n] mask (nulls canonically
    fill with the previous valid value's CODE — the nulls.py contract,
    applied in code space)."""
    bl, kind = _to_bytes_list(values)
    n = len(bl)
    if n == 0:
        raise ValueError("cannot encode an empty string column")
    arr = np.array(bl, dtype=object)
    mask = None
    if valid is not None:
        from .nulls import fill_nulls

        mask = np.asarray(valid, bool)
        if not mask.any():  # all-null: canonical fill is the empty string
            arr = np.array([b""] * n, dtype=object)
        else:
            arr = fill_nulls(arr, mask)
    dic, codes = sorted_factorize(arr)  # bytes-lex sorted (hash factorize)
    codes = codes.astype(np.int32)
    if codes_scheme == "auto":
        trials = [registry.get(s).encode(codes, name="_codes") for s in AUTO_INNER]
        ccol = min(trials, key=lambda c: c.nbytes_compressed)
        codes_scheme = ccol.scheme
    else:
        ccol = registry.get(codes_scheme).encode(codes, name="_codes", **codes_opts)
    offsets = np.zeros(dic.shape[0] + 1, np.int64)
    np.cumsum([len(b) for b in dic], out=offsets[1:])
    blob = np.frombuffer(b"".join(dic), dtype=np.uint8).copy() if offsets[-1] else np.zeros(0, np.uint8)
    col = EncodedColumn(
        name=name,
        scheme="strdict",
        dtype="str",  # logical values never touch the device; see decode()
        n=n,
        params={
            "codes_scheme": codes_scheme,
            "codes_params": ccol.params,
            "dict_size": int(dic.shape[0]),
            "kind": kind,
            "dense": True,
        },
        streams={
            "values_bytes": blob,
            "values_offsets": offsets,
            **{f"c_{k}": v for k, v in ccol.streams.items()},
        },
    )
    if mask is not None:
        from .nulls import attach_valid

        col = attach_valid(col, mask)
    return col


def dictionary(col: EncodedColumn) -> np.ndarray:
    """The dictionary as an object array of bytes (or str, per ``kind``)."""
    off = col.streams["values_offsets"]
    blob = col.streams["values_bytes"].tobytes()
    ents = [blob[int(off[i]) : int(off[i + 1])] for i in range(col.params["dict_size"])]
    if col.params["kind"] == "str":
        return np.array([e.decode("utf-8") for e in ents], dtype=object)
    return np.array(ents, dtype=object)


def codes_column(col: EncodedColumn) -> EncodedColumn:
    """The inner int32 code column. Validity propagates so every code scan
    (local or sharded) is null-correct without outer fixups."""
    streams = {k[2:]: v for k, v in col.streams.items() if k.startswith("c_")}
    params = dict(col.params["codes_params"])
    if col.params.get("nullable") and "valid" in col.streams:
        streams["valid"] = col.streams["valid"]
        params["nullable"] = True
    return EncodedColumn(
        name=f"{col.name}._codes",
        scheme=col.params["codes_scheme"],
        dtype="int32",
        n=col.n,
        params=params,
        streams=streams,
    )


def decode(col: EncodedColumn) -> np.ndarray:
    """Codes decode on device, the string gather happens at the host
    boundary (strings cannot live in vregs). Returns an object array;
    null rows hold the canonical fill (nulls.decode_masked twin:
    ``decode_masked_strings``)."""
    from .api import decode as dev_decode

    codes = np.asarray(dev_decode(codes_column(col)))
    return dictionary(col)[codes]


def decode_ref(col: EncodedColumn) -> np.ndarray:
    """CPU oracle twin of :func:`decode`."""
    ccol = codes_column(col)
    codes = registry.get(ccol.scheme).decode_ref(ccol)
    return dictionary(col)[codes.astype(np.int64)]


def decode_masked_strings(col: EncodedColumn):
    from .nulls import valid_mask

    return decode(col), valid_mask(col)


# --- predicate pushdown -------------------------------------------------------


def _dict_mask(col: EncodedColumn, op: str, value) -> np.ndarray:
    """Evaluate the predicate over the dictionary (host, O(dict_size))."""
    if op not in STR_OPS:
        raise ValueError(f"op must be one of {STR_OPS}, got {op!r}")
    v = value.encode("utf-8") if isinstance(value, str) else bytes(value)
    off = col.streams["values_offsets"]
    blob = col.streams["values_bytes"].tobytes()
    d = col.params["dict_size"]
    ents = [blob[int(off[i]) : int(off[i + 1])] for i in range(d)]
    fns = {
        "eq": lambda e: e == v, "ne": lambda e: e != v,
        "lt": lambda e: e < v, "le": lambda e: e <= v,
        "gt": lambda e: e > v, "ge": lambda e: e >= v,
        "startswith": lambda e: e.startswith(v),
        "contains": lambda e: v in e,
    }
    return np.fromiter((fns[op](e) for e in ents), bool, count=d)


def _mask_ranges(mask: np.ndarray) -> list[tuple[int, int]]:
    bounds = np.flatnonzero(np.diff(mask.astype(np.int8), prepend=0, append=0))
    return list(zip(bounds[0::2].tolist(), bounds[1::2].tolist()))


def _ranges_bitmap(col: EncodedColumn, ranges, *, sharded=False, mesh=None, axis="d"):
    """OR of code-range scans over the inner column. The inner column
    carries the validity words (codes_column), so every term is already
    null-masked and the OR stays correct."""
    import jax.numpy as jnp

    inner = codes_column(col)
    d = col.params["dict_size"]
    if sharded:
        from .dist_query import filter_bitmap_sharded as fb
    else:
        from .query import filter_bitmap as fb

    def scan(op, v):
        return fb(inner, op, v, mesh, axis) if sharded else fb(inner, op, v)

    acc = None
    for s, e in ranges:
        if e - s == 1:
            bm = scan("eq", s)
        elif s == 0:
            bm = scan("lt", e)
        elif e == d:
            bm = scan("ge", s)
        else:
            bm = scan("ge", s) & scan("lt", e)
        acc = bm if acc is None else (acc | bm)
    if acc is None:
        acc = jnp.zeros((num_groups(col.n), LANES), jnp.uint32)
    return acc


def filter_bitmap_str(col: EncodedColumn, op: str, value):
    """(ng, LANES) LMP(1) match bitmap for a string predicate — composable
    with the query.py bitmap algebra. Ordered ops and startswith hit ≤1
    contiguous code range (sorted dictionary); eq/ne ≤2; contains may
    fragment, in which case the scan is an OR of the (few) ranges — still
    only code scans, never a string materialization."""
    if col.scheme != "strdict":
        raise ValueError(f"filter_bitmap_str needs a 'strdict' column, got {col.scheme!r}")
    return _ranges_bitmap(col, _mask_ranges(_dict_mask(col, op, value)))


def count_where_str(col: EncodedColumn, op: str, value) -> int:
    from .query import count_bits

    return count_bits(filter_bitmap_str(col, op, value), col.n)


def select_where_str(col: EncodedColumn, op: str, value) -> np.ndarray:
    """Matching strings (object array), decoding only the groups that
    contain matches (partial.take on the code column)."""
    from .partial import take
    from .ref.lmp import lmp_unpack

    words = np.asarray(filter_bitmap_str(col, op, value)).reshape(num_groups(col.n), LANES)
    idx = np.flatnonzero(lmp_unpack(words, 1, col.n).astype(bool))
    codes = take(codes_column(col), idx)
    return dictionary(col)[codes.astype(np.int64)]


def filter_bitmap_str_sharded(col: EncodedColumn, op: str, value, mesh=None, axis="d"):
    """Sharded twin: the same code-range rewrite over dist_query's sharded
    filter folds (group-sharded bitmap out, collective-free)."""
    if col.scheme != "strdict":
        raise ValueError(f"filter_bitmap_str_sharded needs a 'strdict' column, got {col.scheme!r}")
    return _ranges_bitmap(
        col, _mask_ranges(_dict_mask(col, op, value)), sharded=True, mesh=mesh, axis=axis
    )


def count_where_str_sharded(col: EncodedColumn, op: str, value, mesh=None, axis="d") -> int:
    from .query import count_bits

    return count_bits(filter_bitmap_str_sharded(col, op, value, mesh, axis), col.n)


def isin_bitmap_str(col: EncodedColumn, values):
    """Bitmap of membership in a set of strings — the set evaluates over
    the dictionary host-side, then a code-range scan (few ranges) or one
    device lookup-table pass (fragmented sets)."""
    want = {v.encode("utf-8") if isinstance(v, str) else bytes(v) for v in values}
    off = col.streams["values_offsets"]
    blob = col.streams["values_bytes"].tobytes()
    d = col.params["dict_size"]
    mask = np.fromiter(
        (blob[int(off[i]) : int(off[i + 1])] in want for i in range(d)), bool, count=d
    )
    return dict_mask_bitmap(col, mask)


def dict_mask_bitmap(col: EncodedColumn, mask: np.ndarray):
    """Bitmap of rows whose dictionary entry is set in ``mask`` (bool[d]) —
    delegates to the shared dictionary-mask machinery (range scans for
    contiguous masks, one lookup-table pass for fragmented ones)."""
    from .query import dict_mask_bitmap as dmb

    return dmb(col, mask)


# --- aggregates (dictionary answers, no decode) -------------------------------


def min_str(col: EncodedColumn):
    """Lexicographic (bytes-order) minimum — dictionary[0]: the dictionary
    is dense and sorted, so the column extreme is the dictionary extreme."""
    return _extreme(col, 0)


def max_str(col: EncodedColumn):
    return _extreme(col, -1)


def _extreme(col: EncodedColumn, pos: int):
    from . import nulls

    if nulls.is_nullable(col) and nulls.count_valid(col) == 0:
        raise ValueError("min/max of an all-null column")
    return dictionary(col)[pos]


def distinct_count_str(col: EncodedColumn) -> int:
    from . import nulls

    if nulls.is_nullable(col) and nulls.count_valid(col) == 0:
        return 0
    return col.params["dict_size"]


# registry entry: container round-trips + CPU oracle; device decode of the
# logical values is deliberately absent (strings never live on device — the
# CODES column is the device object; api.decode special-cases strdict)
registry.register("strdict", encode_strings, decode_ref)
