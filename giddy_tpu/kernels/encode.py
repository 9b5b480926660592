"""Device-side (Pallas) encoders — the optional on-TPU encode path.

The reference keeps encoding host-side (SURVEY.md §1 'decode-only');
BASELINE's north star allows "encode ... optionally in Pallas". The LMP
pack kernel is the exact inverse of the unpack loop: for each output word,
OR together the constant-shifted slot vectors that overlap it — again all
full-vector ops with compile-time shift distances.

Supported device encodes: nbit (pack), delta (lane-shift difference +
zigzag + pack), for (broadcast subtract + pack, given host-computed refs).
Bit widths/refs/anchors are host-supplied statics: width *selection* needs
a global max, which belongs on the host planning side anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..format import EncodedColumn
from ..registry import plan
from ..util import GROUP, LANES, SLOTS, num_groups
from .common import block_spec, use_interpret


def pack_lanes_to(out_ref, v: jax.Array, bits: int) -> None:
    """Inverse of unpack: (R, GROUP) uint32 values -> (R, bits*LANES) words
    written into out_ref. Values must already fit in `bits`."""
    terms: dict[int, list[jax.Array]] = {w: [] for w in range(bits)}
    for i in range(SLOTS):
        w0, s = divmod(i * bits, 32)
        vi = v[:, i * LANES : (i + 1) * LANES]
        terms[w0].append(vi << jnp.uint32(s) if s else vi)
        if s + bits > 32:
            terms[w0 + 1].append(vi >> jnp.uint32(32 - s))
    for w in range(bits):
        acc = terms[w][0]
        for t in terms[w][1:]:
            acc = acc | t
        out_ref[:, w * LANES : (w + 1) * LANES] = acc


def _pack_call(ng: int, bits: int):
    pl_plan = plan(ng * GROUP, 2 * 4 * (GROUP + bits * LANES))
    r = pl_plan.groups_per_block

    def kernel(in_ref, out_ref):
        pack_lanes_to(out_ref, in_ref[:], bits)

    return pl.pallas_call(
        kernel,
        grid=(pl_plan.grid,),
        in_specs=[block_spec((r, GROUP), lambda i: (i, 0))],
        out_specs=block_spec((r, bits * LANES), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((ng, bits * LANES), jnp.uint32),
        interpret=use_interpret(),
    )


def nbit_pack_device(values: jax.Array, bits: int) -> jax.Array:
    """values: flat uint32 device array (padded to GROUP multiple) ->
    (ng, bits*LANES) packed words, computed on-device."""
    ng = num_groups(values.shape[0])
    return jax.jit(_pack_call(ng, bits))(values.reshape(ng, GROUP))


def delta_streams_device(values: jax.Array, bits: int, n: int | None = None):
    """Compute the delta scheme's streams on-device: zigzag deltas packed
    LMP(bits) + per-group anchors (FORMAT.md §1.3). ``n`` is the logical
    length — tail-pad deltas are forced to 0 like the host encoder."""
    ng = num_groups(values.shape[0])
    n = values.shape[0] if n is None else n
    v = values.reshape(ng, GROUP)

    @jax.jit
    def run(v):
        prev = jnp.roll(v.reshape(-1), 1).reshape(ng, GROUP)
        j = (
            jax.lax.broadcasted_iota(jnp.int32, (ng, GROUP), 1)
            + jnp.arange(ng, dtype=jnp.int32).reshape(ng, 1) * GROUP
        )
        d = jnp.where((j == 0) | (j >= n), jnp.uint32(0), v - prev)
        z = (d << jnp.uint32(1)) ^ (-(d >> jnp.uint32(31)))
        anchors = jnp.where(
            jnp.arange(ng) == 0, jnp.roll(v[:, -1], 1) * 0 + v[0, 0], jnp.roll(v[:, -1], 1)
        )
        return z, anchors

    z, anchors = run(v)
    packed = jax.jit(_pack_call(ng, bits))(z.reshape(ng, GROUP))
    return packed, anchors


def for_streams_device(values: jax.Array, bits: int, frame_len: int):
    """Compute the FOR scheme's streams on-device: per-frame min references
    + packed offsets (FORMAT.md §1.2). ``values`` must be padded to whole
    frames (multiples of GROUP) with last-value fill like the host encoder."""
    n_pad = values.shape[0]
    ng = num_groups(n_pad)
    nf = n_pad // frame_len

    @jax.jit
    def run(v):
        frames = v.reshape(nf, frame_len)
        refs = jnp.min(frames, axis=1)
        offs = (frames - refs[:, None]).reshape(-1)
        return offs, refs

    offs, refs = run(values)
    packed = jax.jit(_pack_call(ng, bits))(offs.reshape(ng, GROUP))
    return packed, refs


def encode_nbit_device(values: np.ndarray | jax.Array, *, bits: int, name: str = "col") -> EncodedColumn:
    """End-to-end device nbit encode returning a standard EncodedColumn
    (bit-identical to the host encoder; enforced by tests)."""
    from ..util import dtype_to_u32, pad_to_groups

    v = np.asarray(values)
    dtype = str(v.dtype)
    u = pad_to_groups(dtype_to_u32(v))
    packed = np.asarray(nbit_pack_device(jnp.asarray(u), bits))
    return EncodedColumn(
        name=name, scheme="nbit", dtype=dtype, n=v.shape[0],
        params={"bits": int(bits)}, streams={"packed": packed},
    )
