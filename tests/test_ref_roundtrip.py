"""Oracle round-trip: encode -> decode == identity, every scheme, edges
(SURVEY.md §5.2.1) + compression sanity."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.util import GROUP

from helpers import EDGE_SIZES, gen_column

SCHEMES = ["nbit", "for", "delta", "delta2", "dict", "rle", "rpe", "model", "bitmap", "dzbf", "dzbv", "patched", "raw", "xordelta", "alp"]


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("n", [GROUP, 2 * GROUP + 123])
def test_roundtrip(scheme, n):
    rng = np.random.default_rng(42)
    v = gen_column(scheme, n, rng)
    col = gt.encode(v, scheme, name=f"{scheme}-{n}")
    out = gt.decode_ref(col)
    assert out.dtype == v.dtype
    np.testing.assert_array_equal(out, v)


@pytest.mark.parametrize("scheme", SCHEMES)
def test_roundtrip_hard(scheme):
    rng = np.random.default_rng(7)
    v = gen_column(scheme, GROUP + 17, rng, hard=True)
    col = gt.encode(v, scheme)
    np.testing.assert_array_equal(gt.decode_ref(col), v)


@pytest.mark.parametrize("scheme", SCHEMES)
@pytest.mark.parametrize("n", EDGE_SIZES)
def test_edge_sizes(scheme, n):
    rng = np.random.default_rng(n)
    v = gen_column(scheme, n, rng)
    col = gt.encode(v, scheme)
    np.testing.assert_array_equal(gt.decode_ref(col), v)


@pytest.mark.parametrize(
    "scheme", ["nbit", "for", "delta", "delta2", "dict", "rle", "model", "bitmap", "dzbf", "dzbv", "patched", "alp"]
)
def test_compresses(scheme):
    """Compressible inputs must actually compress (SURVEY.md §5.2.1)."""
    rng = np.random.default_rng(3)
    v = gen_column(scheme, 8 * GROUP, rng)
    col = gt.encode(v, scheme)
    assert col.nbytes_compressed < col.nbytes_decoded, (
        scheme,
        col.nbytes_compressed,
        col.nbytes_decoded,
    )


def test_patched_compressed_indices():
    rng = np.random.default_rng(11)
    v = gen_column("patched", 2 * GROUP + 5, rng)
    col = gt.encode(v, "patched", kind="compressed")
    assert col.params["kind"] == "compressed"
    assert col.params["count"] > 0
    np.testing.assert_array_equal(gt.decode_ref(col), v)


def test_dict_explicit_dictionary():
    vocab = np.array([5, -3, 100, 7], dtype=np.int32)
    rng = np.random.default_rng(0)
    v = vocab[rng.integers(0, 4, GROUP + 3)]
    col = gt.encode(v, "dict", dictionary=vocab)
    np.testing.assert_array_equal(gt.decode_ref(col), v)
