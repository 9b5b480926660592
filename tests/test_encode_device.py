"""Device (Pallas) encode vs host oracle: bit-identical streams."""

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.kernels import encode as kenc
from giddy_tpu.ref import delta as ref_delta
from giddy_tpu.ref.lmp import lmp_pack
from giddy_tpu.util import GROUP, pad_to_groups


@pytest.mark.parametrize("bits", [1, 9, 17, 32])
def test_device_pack_matches_host(bits):
    rng = np.random.default_rng(bits)
    hi = (1 << bits) - 1 if bits < 32 else 2**32 - 1
    v = rng.integers(0, hi + 1, 2 * GROUP + 5, dtype=np.uint64).astype(np.uint32)
    host = lmp_pack(v, bits)
    col = kenc.encode_nbit_device(v.view(np.int32), bits=bits)
    np.testing.assert_array_equal(col.streams["packed"], host)
    # and the standard decode path accepts the device-encoded column
    np.testing.assert_array_equal(
        np.asarray(gt.decode(col)).view(np.uint32), v
    )


def test_device_for_streams_match_host():
    import jax.numpy as jnp

    from giddy_tpu.ref import for_ as ref_for

    rng = np.random.default_rng(2)
    v = (np.int32(1_700_000_000) + rng.integers(0, 4096, 2 * GROUP)).astype(np.int32)
    host_col = ref_for.encode(v)
    bits, fl = host_col.params["bits"], host_col.params["frame_len"]
    packed, refs = kenc.for_streams_device(jnp.asarray(v.view(np.uint32)), bits, fl)
    np.testing.assert_array_equal(np.asarray(packed), host_col.streams["packed"].view(np.uint32))
    np.testing.assert_array_equal(np.asarray(refs).view(np.int32), host_col.streams["refs"])


def test_device_delta_streams_match_host():
    rng = np.random.default_rng(0)
    v = (np.cumsum(rng.integers(0, 16, 3 * GROUP + 11)) + 1_600_000_000).astype(np.int32)
    host_col = ref_delta.encode(v)
    bits = host_col.params["bits"]
    import jax.numpy as jnp

    u = pad_to_groups(v.view(np.uint32))
    packed, anchors = kenc.delta_streams_device(jnp.asarray(u), bits, n=v.shape[0])
    np.testing.assert_array_equal(np.asarray(packed), host_col.streams["packed"].view(np.uint32))
    np.testing.assert_array_equal(
        np.asarray(anchors).view(np.int32), host_col.streams["anchors"]
    )
