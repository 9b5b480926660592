"""Cascade (dictionary + sub-encoded codes, FORMAT.md §1.14): round-trip,
device-vs-oracle, partial decode, compression vs plain dict."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.partial import decode_groups, decode_ref_groups
from giddy_tpu.ref.cascade import INNER_SCHEMES
from giddy_tpu.util import GROUP

from helpers import EDGE_SIZES, gen_column


@pytest.mark.parametrize("inner", INNER_SCHEMES)
def test_roundtrip_all_inner_schemes(inner):
    rng = np.random.default_rng(42)
    v = gen_column("cascade", 2 * GROUP + 123, rng)
    col = gt.encode(v, "cascade", codes_scheme=inner)
    assert col.params["codes_scheme"] == inner
    out = gt.decode_ref(col)
    assert out.dtype == v.dtype
    np.testing.assert_array_equal(out, v)


@pytest.mark.parametrize("inner", INNER_SCHEMES)
def test_device_matches_oracle(inner):
    rng = np.random.default_rng(1234)
    v = gen_column("cascade", 2 * GROUP + 999, rng)
    col = gt.encode(v, "cascade", codes_scheme=inner)
    dev = np.asarray(gt.decode(col))
    np.testing.assert_array_equal(dev, gt.decode_ref(col))
    np.testing.assert_array_equal(dev, v)


@pytest.mark.parametrize("n", EDGE_SIZES)
def test_edge_sizes(n):
    rng = np.random.default_rng(n)
    v = gen_column("cascade", n, rng)
    col = gt.encode(v, "cascade")
    np.testing.assert_array_equal(gt.decode_ref(col), v)
    np.testing.assert_array_equal(np.asarray(gt.decode(col)), v)


def test_hard_high_cardinality():
    rng = np.random.default_rng(7)
    v = gen_column("cascade", GROUP + 17, rng, hard=True)
    col = gt.encode(v, "cascade", codes_scheme="nbit")
    np.testing.assert_array_equal(np.asarray(gt.decode(col)), v)


def test_float_values():
    rng = np.random.default_rng(9)
    vocab = rng.normal(size=12).astype(np.float32)
    v = vocab[rng.integers(0, 12, GROUP + 5)]
    col = gt.encode(v, "cascade", codes_scheme="rle")
    out = gt.decode_ref(col)
    assert out.dtype == np.float32
    np.testing.assert_array_equal(out.view(np.int32), v.view(np.int32))
    np.testing.assert_array_equal(np.asarray(gt.decode(col)).view(np.int32), v.view(np.int32))


def test_explicit_dictionary_and_missing_value():
    rng = np.random.default_rng(11)
    vocab = np.array([5, -3, 100, 7], np.int32)
    v = vocab[rng.integers(0, 4, GROUP)]
    col = gt.encode(v, "cascade", dictionary=vocab, codes_scheme="rle")
    assert col.params["dict_size"] == 4
    np.testing.assert_array_equal(gt.decode_ref(col), v)
    with pytest.raises(ValueError, match="missing from dictionary"):
        gt.encode(np.array([5, 42], np.int32), "cascade", dictionary=vocab)


def test_bad_inner_scheme_rejected():
    with pytest.raises(ValueError, match="inner scheme"):
        gt.encode(np.zeros(8, np.int32), "cascade", codes_scheme="bitmap")


@pytest.mark.parametrize("inner", ["rle", "delta", "nbit"])
def test_group_range_matches_full_decode(inner):
    rng = np.random.default_rng(21)
    v = gen_column("cascade", 5 * GROUP + 77, rng)
    col = gt.encode(v, "cascade", codes_scheme=inner)
    for g0, g1 in [(0, 1), (2, 4), (5, 6), (0, 6)]:
        out = decode_groups(col, g0, g1)
        np.testing.assert_array_equal(
            out, decode_ref_groups(col, g0, g1), err_msg=f"{inner} [{g0},{g1})"
        )


def test_cascade_beats_plain_dict_on_runs():
    """RLE_DICTIONARY: runs of few distinct wide values must compress
    better than one-level dict (the scheme's reason to exist)."""
    rng = np.random.default_rng(3)
    v = gen_column("cascade", 8 * GROUP, rng)
    casc = gt.encode(v, "cascade", codes_scheme="rle")
    plain = gt.encode(v, "dict")
    assert casc.nbytes_compressed < plain.nbytes_compressed, (
        casc.nbytes_compressed,
        plain.nbytes_compressed,
    )
    assert casc.nbytes_compressed < casc.nbytes_decoded
