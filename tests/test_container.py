"""Container serialization round-trip + golden-file format freeze
(SURVEY.md §5.2.4: the on-disk format must never silently drift)."""

import hashlib
import pathlib

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.util import GROUP

from helpers import gen_column

GOLDEN = pathlib.Path(__file__).parent / "golden"


def test_container_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    cols = [
        gt.encode(gen_column(s, GROUP + 5, rng), s, name=f"c_{s}")
        for s in ["nbit", "delta", "dict", "rle"]
    ]
    blob = gt.container_bytes(cols)
    back = gt.read_container(blob)
    assert [c.name for c in back] == [c.name for c in cols]
    for a, b in zip(cols, back):
        assert a.scheme == b.scheme and a.n == b.n and a.params == b.params
        np.testing.assert_array_equal(gt.decode_ref(a), gt.decode_ref(b))


def test_stream_alignment():
    rng = np.random.default_rng(2)
    col = gt.encode(gen_column("nbit", GROUP, rng), "nbit")
    blob = gt.container_bytes([col])
    back = gt.read_container(blob)
    # offsets must be 64-byte aligned for zero-copy device feeding
    import json

    hlen = int.from_bytes(blob[8:16], "little")
    header = json.loads(blob[16 : 16 + hlen])
    for c in header["columns"]:
        for m in c["streams"].values():
            assert m["offset"] % 64 == 0


@pytest.mark.parametrize(
    "scheme,digest_name,gen",
    [
        ("nbit", "nbit_9bit", None),
        ("delta", "delta_ts", None),
        ("delta2", "delta2_sampled", None),
        ("for", "for_ts", None),
        ("dict", "dict_lowcard", None),
        ("rle", "rle_flags", None),
        ("rpe", "rpe_flags", None),
        # model_linear's canonical input predates the datagen model column
        # becoming curved (round 4): gen_column("delta") draws the identical
        # sorted-timestamp bytes the original shared generator produced, so
        # the round-1 linear digest stays frozen; model_poly2 freezes the
        # round-4 quadratic-selection format on the curved column.
        ("model", "model_linear", "delta"),
        ("model", "model_poly2", "model"),
        ("bitmap", "bitmap_4", None),
        ("dzbf", "dzbf_2b", None),
        ("dzbv", "dzbv_mixed", None),
        ("patched", "patched_for", None),
        ("raw", "raw_rand", None),
        ("cascade", "cascade_rledict", None),
        ("xordelta", "xordelta_sensor", None),
        ("alp", "alp_prices", None),
    ],
)
def test_golden_format_frozen(scheme, digest_name, gen):
    """Canonical encodes must byte-match the checked-in golden digests."""
    rng = np.random.default_rng(20260817)
    v = gen_column(gen or scheme, GROUP + 100, rng)
    col = gt.encode(v, scheme, name=digest_name)
    digest = hashlib.sha256(gt.container_bytes([col])).hexdigest()
    gfile = GOLDEN / f"{digest_name}.sha256"
    if not gfile.exists():
        GOLDEN.mkdir(exist_ok=True)
        gfile.write_text(digest + "\n")
    assert gfile.read_text().strip() == digest, (
        f"on-disk format drifted for {digest_name}; if intentional, update "
        f"tests/golden/ and bump FORMAT.md version"
    )


def test_corrupt_containers_rejected_cleanly():
    """Malformed inputs must raise ValueError with a reason, never a raw
    struct/json/numpy traceback."""
    rng = np.random.default_rng(3)
    col = gt.encode(gen_column("nbit", GROUP, rng), "nbit")
    blob = gt.container_bytes([col])

    with pytest.raises(ValueError, match="truncated"):
        gt.read_container(blob[:10])
    with pytest.raises(ValueError, match="magic"):
        gt.read_container(b"NOTGIDDY" + blob[8:])
    # header length pointing past EOF
    bad = bytearray(blob)
    bad[8:16] = (len(blob) * 2).to_bytes(8, "little")
    with pytest.raises(ValueError, match="truncated"):
        gt.read_container(bytes(bad))
    # garbage header bytes
    bad = bytearray(blob)
    bad[16:24] = b"\xff" * 8
    with pytest.raises(ValueError, match="corrupt"):
        gt.read_container(bytes(bad))
    # stream extent beyond EOF
    with pytest.raises(ValueError, match="exceeds"):
        gt.read_container(blob[:-64])
    # unknown scheme surfaces a clear registry error at decode time
    cols = gt.read_container(blob)
    cols[0].scheme = "no_such_scheme"
    with pytest.raises(KeyError, match="not registered"):
        gt.decode_ref(cols[0])


def test_corrupt_header_fields_rejected():
    import json as _json

    rng = np.random.default_rng(4)
    col = gt.encode(gen_column("nbit", GROUP, rng), "nbit")
    blob = gt.container_bytes([col])
    hlen = int.from_bytes(blob[8:16], "little")
    header = _json.loads(blob[16 : 16 + hlen])

    def rebuild(h):
        hj = _json.dumps(h).encode()
        pad = hlen - len(hj)
        assert pad >= 0
        return blob[:16] + hj + b" " * pad + blob[16 + hlen:]

    h = _json.loads(_json.dumps(header))
    next(iter(h["columns"][0]["streams"].values()))["shape"] = [-1]
    with pytest.raises(ValueError, match="negative shape"):
        gt.read_container(rebuild(h))
    h = _json.loads(_json.dumps(header))
    next(iter(h["columns"][0]["streams"].values()))["dtype"] = None
    with pytest.raises(ValueError, match="invalid dtype"):
        gt.read_container(rebuild(h))
    h = {"cols": []}
    with pytest.raises(ValueError, match="columns"):
        gt.read_container(rebuild(h))
