"""Regressions for code-review findings (see commit history): edge cases
in layout compaction, grouped reductions, empty/explicit-dict encodes,
wide pad semantics."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.util import GROUP


def test_bitmap_to_indices_trailing_zero_bits():
    import jax.numpy as jnp

    from giddy_tpu.layout import bitmap_to_indices

    idx, count = bitmap_to_indices(jnp.asarray(np.array([1, 0], np.uint32)), max_count=1)
    assert int(count) == 1 and int(idx[0]) == 0
    idx, count = bitmap_to_indices(
        jnp.asarray(np.array([1, 1, 0, 1, 0], np.uint32)), max_count=3
    )
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 3])


def test_group_reduce_unsigned_fill():
    from giddy_tpu.scan import group_reduce

    x = np.full(GROUP + 1, 5, np.uint32)
    np.testing.assert_array_equal(np.asarray(group_reduce(x, "max")), [5, 5])
    y = np.full(GROUP + 1, 2**31 + 7, np.uint64).astype(np.uint32)
    assert int(np.asarray(group_reduce(y, "min"))[1]) == 2**31 + 7


def test_bitmap_empty_column():
    col = gt.encode(np.array([], np.int32), "bitmap")
    assert col.params["d"] == 0
    assert gt.decode_ref(col).shape == (0,)
    assert np.asarray(gt.decode(col)).shape == (0,)


def test_dict_explicit_dictionary_missing_value():
    with pytest.raises(ValueError, match="missing"):
        gt.encode(np.array([1, 99], np.int32), "dict", dictionary=np.array([1, 2, 3], np.int32))


def test_wide_pad_flag():
    v = (np.arange(100, dtype=np.int64) + 10**15)
    col = gt.encode(v, "wide", base_scheme="nbit")
    assert gt.decode(col, pad=True).shape[0] == GROUP
    assert gt.decode(col).shape[0] == 100


def test_decode_columns_cached():
    from giddy_tpu.api import _COLUMNS_CACHE

    rng = np.random.default_rng(0)
    v = rng.integers(0, 100, GROUP).astype(np.int32)
    cols = [gt.encode(v, "nbit", name="a"), gt.encode(v + 1, "nbit", name="b")]
    before = len(_COLUMNS_CACHE)
    gt.decode_columns(cols)
    gt.decode_columns(cols)
    assert len(_COLUMNS_CACHE) == before + 1
