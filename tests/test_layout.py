"""Gather/scatter + set-representation ops (SURVEY.md §3.3–3.4)."""

import jax.numpy as jnp
import numpy as np

from giddy_tpu import layout


def test_gather_scatter_inverse():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.integers(0, 1000, 256, dtype=np.int64).astype(np.int32))
    perm = rng.permutation(256).astype(np.int32)
    g = layout.gather(data, jnp.asarray(perm))
    s = layout.scatter(jnp.zeros_like(data), jnp.asarray(perm), g)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(data))


def test_bitmap_index_roundtrip_np():
    rng = np.random.default_rng(1)
    bits = (rng.random(5000) < 0.03).astype(np.uint32)
    idx = layout.bitmap_to_indices_np(bits)
    back = layout.indices_to_bitmap_np(idx, 5000)
    np.testing.assert_array_equal(back, bits)


def test_bitmap_to_indices_device():
    bits = jnp.asarray(np.array([0, 1, 0, 0, 1, 1, 0, 1], dtype=np.uint32))
    idx, count = layout.bitmap_to_indices(bits, max_count=8)
    assert int(count) == 4
    np.testing.assert_array_equal(np.asarray(idx[:4]), [1, 4, 5, 7])
    assert all(int(i) == 8 for i in np.asarray(idx[4:]))


def test_pack_bitmap_roundtrip():
    rng = np.random.default_rng(2)
    bits = (rng.random(40000) < 0.5).astype(np.uint32)
    np.testing.assert_array_equal(
        layout.unpack_bitmap_np(layout.pack_bitmap_np(bits), 40000), bits
    )
