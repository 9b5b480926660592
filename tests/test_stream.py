"""Streaming decode: chunked upload+decode pipeline (the PCIe-overlap
story's TPU analog, SURVEY.md §3.11 pipeline row)."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.stream import decode_streamed, stream_decode
from giddy_tpu.util import GROUP

SCHEMES = ["nbit", "delta", "rle", "dict", "patched", "dzbv"]


@pytest.mark.parametrize("scheme", SCHEMES)
def test_streamed_matches_full(scheme):
    rng = np.random.default_rng(33)
    v = gen_column(scheme, 7 * GROUP + 123, rng)
    col = gt.encode(v, scheme)
    out = decode_streamed(col, chunk_groups=2)
    np.testing.assert_array_equal(out, gt.decode_ref(col))


def test_streamed_wide_column():
    """64-bit columns stream plane-wise and recombine per chunk."""
    rng = np.random.default_rng(35)
    v = (rng.integers(0, 2**40, 5 * GROUP + 9, dtype=np.int64) - 2**39)
    col = gt.encode(v, "wide", base_scheme="dzbv")
    out = decode_streamed(col, chunk_groups=2)
    np.testing.assert_array_equal(out, v)
    chunks = list(stream_decode(col, chunk_groups=2))
    assert all(isinstance(c, np.ndarray) for c in chunks)
    assert chunks[0].dtype == np.int64


def test_chunk_iterator_shapes():
    rng = np.random.default_rng(34)
    v = gen_column("nbit", 5 * GROUP, rng)
    col = gt.encode(v, "nbit")
    chunks = list(stream_decode(col, chunk_groups=2, to_host=True))
    assert [c.shape[0] for c in chunks] == [2 * GROUP, 2 * GROUP, GROUP]
    np.testing.assert_array_equal(np.concatenate(chunks), v)
