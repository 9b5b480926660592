"""Nullable columns: validity bitmaps + the canonical null fill.

The reference's "null suppression" is the DZB family (SURVEY.md §3.1 —
byte-width compaction, not SQL NULLs); actual NULL semantics lived in the
DBMS caller (MonetDB scans). Here nullability is a first-class column
property so the whole scan pipeline stays null-correct without decode:

- **Format** (FORMAT.md §0.3): any column may set ``params["nullable"]``
  and carry a ``valid`` stream — ``(ng, LANES)`` uint32 words in the same
  LMP(1) layout as filter bitmaps (bit i of word [g, c] = row
  ``g*GROUP + i*LANES + c`` is non-null; pad rows are 0). Validity is
  1/32 of a 32-bit column's decoded bytes and shards on the group dim
  like every other per-group stream.
- **Canonical fill**: the encoder replaces null slots with the previous
  valid value (back-fill for leading nulls; 0 when every row is null).
  This is load-bearing, not cosmetic: filled data compresses like the
  valid data around it (runs stay unbroken, deltas stay near zero), and
  because the fill only repeats values already present, ``min``/``max``/
  ``distinct`` over the filled column EQUAL those over the valid rows —
  no masking needed on those paths. Decode returns filled values;
  :func:`decode_masked` returns the mask alongside.
- **Scan semantics** (SQL): predicates never match null rows
  (query.filter_bitmap ANDs the validity words in), aggregates skip them
  (aggregate.py masks per-slot validity bits inside the fused fold), and
  group_reduce excludes rows whose key OR measure is null (the documented
  COUNT(col)-style contract).
"""

from __future__ import annotations

import numpy as np

from .format import EncodedColumn
from .util import GROUP, LANES, num_groups


def pack_valid(mask: np.ndarray) -> np.ndarray:
    """bool[n] -> (ng, LANES) uint32 LMP(1) words (pad bits 0)."""
    from .ref.lmp import lmp_pack

    mask = np.asarray(mask)
    if mask.dtype != np.bool_:
        raise TypeError(f"valid mask must be boolean, got {mask.dtype}")
    return lmp_pack(mask.astype(np.uint32), 1)


def unpack_valid(words: np.ndarray, n: int) -> np.ndarray:
    """(ng, LANES) uint32 words -> bool[n]."""
    from .ref.lmp import lmp_unpack

    return lmp_unpack(np.asarray(words).reshape(num_groups(n), LANES), 1, n).astype(bool)


def fill_nulls(values: np.ndarray, mask: np.ndarray) -> np.ndarray:
    """The canonical null fill: forward-fill from the previous valid value,
    back-fill leading nulls from the first valid value, 0 if all-null."""
    values = np.asarray(values)
    mask = np.asarray(mask, bool)
    if values.shape != mask.shape:
        raise ValueError(f"values/mask shape mismatch: {values.shape} vs {mask.shape}")
    if mask.all():
        return values
    if not mask.any():
        return np.zeros_like(values)
    # classic vectorized ffill: index of the most recent valid row
    idx = np.where(mask, np.arange(values.shape[0]), 0)
    np.maximum.accumulate(idx, out=idx)
    first = int(np.flatnonzero(mask)[0])
    idx[: first] = first  # back-fill the leading-null prefix
    return values[idx]


def is_nullable(col: EncodedColumn) -> bool:
    return bool(col.params.get("nullable")) and "valid" in col.streams


def valid_mask(col: EncodedColumn) -> np.ndarray:
    """bool[n] validity of each row (all-True for non-nullable columns)."""
    if not is_nullable(col):
        return np.ones(col.n, bool)
    return unpack_valid(col.streams["valid"], col.n)


def valid_words_device(col: EncodedColumn):
    """The (ng, LANES) validity words on device, uploaded once per column
    (cached on the column instance; columns are the natural cache owner —
    their streams are immutable by contract)."""
    import jax.numpy as jnp

    dev = getattr(col, "_valid_dev", None)
    if dev is None:
        dev = jnp.asarray(col.streams["valid"])
        col._valid_dev = dev
    return dev


def null_count(col: EncodedColumn) -> int:
    if not is_nullable(col):
        return 0
    # pad bits are 0 in the valid stream, so popcount is exact
    return col.n - int(np.bitwise_count(col.streams["valid"]).sum())


def count_valid(col: EncodedColumn) -> int:
    """Number of non-null rows (SQL COUNT(col))."""
    return col.n - null_count(col)


def attach_valid(col: EncodedColumn, mask: np.ndarray) -> EncodedColumn:
    """Mark an encoded column nullable (mask: bool[n], True = non-null).
    Mutates and returns ``col``. The caller is responsible for having
    encoded canonically filled values (api.encode does both)."""
    mask = np.asarray(mask, bool)
    if mask.shape != (col.n,):
        raise ValueError(f"valid mask must have shape ({col.n},), got {mask.shape}")
    col.streams = dict(col.streams)
    col.streams["valid"] = pack_valid(mask)
    col.params = {**col.params, "nullable": True}
    # invalidate per-instance device caches: a re-attached mask must not be
    # silently shadowed by the previously-uploaded validity words (or by a
    # sharded placement keyed on this object's identity)
    if hasattr(col, "_valid_dev"):
        del col._valid_dev
    import sys

    dq = sys.modules.get(__package__ + ".dist_query")
    if dq is not None:  # only if the sharded layer is in use at all
        for k in [k for k in dq._ARGS_CACHE if k[0] == id(col)]:
            del dq._ARGS_CACHE[k]
    return col


def decode_masked(col: EncodedColumn):
    """Device decode -> (values[n], valid[n]). Values at null rows hold the
    canonical fill (the previous valid value)."""
    from .api import decode

    return np.asarray(decode(col)), valid_mask(col)


def notnull_bitmap(col: EncodedColumn):
    """(ng, LANES) LMP(1) bitmap of non-null rows (composable with the
    query.py bitmap algebra; pad bits are already 0)."""
    import jax.numpy as jnp

    if not is_nullable(col):
        from .query import _mask_pad

        return _mask_pad(
            jnp.full((num_groups(col.n), LANES), jnp.uint32(0xFFFFFFFF)), col.n
        )
    return valid_words_device(col)


def isnull_bitmap(col: EncodedColumn):
    """(ng, LANES) LMP(1) bitmap of null rows."""
    from .query import bitmap_not

    return bitmap_not(notnull_bitmap(col), col.n)


def null_positions(col: EncodedColumn) -> np.ndarray:
    """Row indices of the null rows (host, int64)."""
    if not is_nullable(col):
        return np.empty(0, np.int64)
    return np.flatnonzero(~valid_mask(col)).astype(np.int64)
