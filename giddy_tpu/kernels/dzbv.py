"""Discard zero bytes, variable — device decoder (FORMAT.md §1.10).

Single-pass design (round 2): host prep re-anchors each byte plane per
GROUP (the anchor idea of SURVEY.md §8.1 applied to plane offsets), so the
kernel aligns plane bytes to their element positions entirely in VMEM:

- per-plane ranks come from per-group log-scans — one packed cumsum serves
  planes 1 and 3 (16-bit fields; counts <= GROUP = 2**15 never carry), and
  rank2 falls out of the identity ``cumsum(w) = rank1 + rank2 + rank3``;
- plane bytes, stored front-compacted per group row, move to their
  destinations with the conditional-roll expand network
  (:func:`..kernels.lanes.expand_monotone`) — no dense HBM intermediate,
  no XLA gather, ``temp == 0`` in the compiled program's memory analysis.

Group rows quantize plane storage to 4*LANES-byte steps (one packed word
row), so prep falls back to the original two-pass XLA path (global rank
cumsum + ``jnp.take``) when per-group skew would inflate HBM traffic by
more than ~15% of the decoded bytes — for i.i.d. width mixes the rounding
overhead is a few percent.

Upstream analog: libgiddy
``src/kernels/decompression/discard_zero_bytes_variable.cuh`` (SURVEY.md
§3.1) decodes varint via per-segment offset anchors + per-thread byte
loads; byte planes + the roll network are the vreg-native equivalent (no
per-element addressing at all).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..ref.lmp import lmp_pack, lmp_unpack
from ..util import GROUP, LANES, cdiv, num_groups
from .common import row_blocked_call
from .lanes import expand_monotone, group_cumsum, unpack_lanes, unpack_to

# Prep falls back to the XLA path when group-row quantization would add
# more than this fraction of the decoded bytes in extra HBM traffic.
PAD_CAP = 0.15


def group_prep(col: EncodedColumn, force_w4: dict | None = None) -> dict | None:
    """Re-anchor planes 1..3 per GROUP: front-compacted byte rows
    ``prow{k}: (ng, W4_k*LANES) uint32`` (packed 4 bytes/word in LMP slot
    order, so linear byte m of group g sits at slot m//LANES, lane
    m%LANES). Returns None when padding would exceed PAD_CAP.

    ``force_w4``: {plane: w4} pins the row widths AND the plane presence
    set (skipping the cap) — partial.GroupSlicer derives them once from
    the whole column so every equal-size slice shares one jit
    specialization and the cap decision is made globally."""
    plane_lens = col.params["plane_lens"]
    ng = num_groups(col.n)
    n_pad = ng * GROUP
    if force_w4 is not None:
        present = sorted(force_w4)
    else:
        present = [k for k in (1, 2, 3) if plane_lens[k] > 0]
    streams = {"widths": col.streams["widths"], "plane0": col.streams["plane0"]}
    if not present:
        return streams
    w = lmp_unpack(col.streams["widths"], 2, n_pad).astype(np.int32)
    prows = {}
    total_pad = 0
    ragged = 1 if col.n < n_pad else 0  # the tail group's row is mostly
    # padding whatever we do (its output write is padded too) — exempt it
    # from the skew accounting so small columns keep the single-pass path
    for k in present:
        cnt = (w >= k).reshape(ng, GROUP).sum(axis=1)
        # the real byte count; sliced columns (partial.py) quantize
        # plane_lens upward with zero padding, so trust the widths
        total = int(cnt.sum())
        max_cnt = int(cnt.max())
        w4 = force_w4[k] if force_w4 else max(1, cdiv(cdiv(max_cnt, LANES), 4))
        assert max_cnt <= w4 * 4 * LANES, (k, max_cnt, w4)
        full = ng - ragged
        total_pad += full * w4 * 4 * LANES - (total - int(cnt[-1]) * ragged)
        off = np.zeros(ng, np.int64)
        np.cumsum(cnt[:-1], out=off[1:])
        plane = lmp_unpack(col.streams[f"plane{k}"], 8, total)
        mat = np.zeros(ng * GROUP, np.uint32)
        dst = (
            np.repeat(np.arange(ng, dtype=np.int64) * GROUP, cnt)
            + np.arange(total, dtype=np.int64)
            - np.repeat(off, cnt)
        )
        mat[dst] = plane
        prows[f"prow{k}"] = np.ascontiguousarray(
            lmp_pack(mat, 8)[:, : w4 * LANES]
        )
    if force_w4 is None and total_pad > PAD_CAP * (ng * GROUP * 4):
        # cap vs the padded output write (what the kernel actually emits),
        # so ragged tails don't force tiny columns onto the fallback
        return None
    streams.update(prows)
    return streams


def global_w4(counts: dict) -> dict | None:
    """The slice-stable row widths for :func:`group_prep(force_w4=...)`:
    {plane: w4} from whole-column per-group counts {plane: (ng,) array},
    or None when the whole-column pad would exceed PAD_CAP (the slicer
    then keeps the two-pass plane form for every slice)."""
    w4s = {}
    total_pad = 0
    ng = 0
    for k, cnt in counts.items():
        if int(cnt.sum()) == 0:
            continue
        ng = cnt.shape[0]
        w4s[k] = max(1, cdiv(cdiv(int(cnt.max()), LANES), 4))
        total_pad += ng * w4s[k] * 4 * LANES - int(cnt.sum())
    if ng and total_pad > PAD_CAP * (ng * GROUP * 4):
        return None
    return w4s


def _prep(col: EncodedColumn) -> dict:
    if "prow1" in col.streams or "prow2" in col.streams or "prow3" in col.streams:
        return col.streams  # already in group-row (dist) form
    pre = group_prep(col)
    return pre if pre is not None else col.streams


def _prow_bytes(x, w4: int):
    """(r, w4*LANES) packed words -> (r, GROUP) uint32 byte values, linear
    column order, zero beyond the row's 4*w4*LANES real slots."""
    cols = []
    for i in range(4 * w4):
        w0, sh = divmod(i, 4)
        v = x[:, w0 * LANES : (w0 + 1) * LANES]
        if sh:
            v = v >> jnp.uint32(8 * sh)
        cols.append(v & jnp.uint32(0xFF))
    if 4 * w4 * LANES < GROUP:
        cols.append(jnp.zeros((x.shape[0], GROUP - 4 * w4 * LANES), jnp.uint32))
    return jnp.concatenate(cols, axis=1)


def _single_pass_call(ng: int, w4s: dict[int, int], out_store=None):
    present = sorted(w4s)
    in_widths = [2 * LANES, 8 * LANES] + [w4s[k] * LANES for k in present]
    # scratch: w, masks, packed cumsum(s), per-plane bytes/z — ~8 full
    # (r, GROUP) uint32 intermediates beyond the in/out blocks, plus the
    # in-kernel cumsum's own transients (lanes.scan_scratch_bytes)
    from .lanes import scan_scratch_bytes

    scratch = (8 * 4 * GROUP + scan_scratch_bytes()) if present else 0

    def kernel(widths_ref, p0_ref, *refs):
        out_ref = refs[-1]
        prow_refs = dict(zip(present, refs[:-1]))
        if not present:
            del widths_ref  # widths carry no information when every
            unpack_to(out_ref, p0_ref[:], 8)  # element is 1 byte wide
            return
        w = unpack_lanes(widths_ref[:], 2)  # (r, GROUP), values 0..3
        out = unpack_lanes(p0_ref[:], 8)
        masks = {k: (w >= jnp.uint32(k)).astype(jnp.uint32) for k in present}
        # inclusive per-plane counts via at most two log-scans
        # the masks are 0/1 and w <= 3, so the cumsums qualify for the MXU
        # scan's cheapest form: a single unbiased int8 plane per 16-bit
        # field (lanes._mxu_cumsum byte_planes/small contract)
        if len(present) == 1:
            k0 = present[0]
            cs = {k0: group_cumsum(masks[k0], byte_planes=(0,), small=True)}
        else:
            a, b = present[0], present[-1]
            packed = masks[a] | (masks[b] << jnp.uint32(16))
            cp = group_cumsum(packed, byte_planes=(0, 2), small=True)
            cs = {a: cp & jnp.uint32(0xFFFF), b: cp >> jnp.uint32(16)}
            if len(present) == 3:
                # w = mask1 + mask2 + mask3 elementwise, so one more scan
                # of w itself yields rank2 without a third cumsum
                cs[2] = group_cumsum(w, byte_planes=(0,), small=True) - cs[1] - cs[3]
        for k in present:
            rank = cs[k] - masks[k]  # exclusive rank among selected
            x = _prow_bytes(prow_refs[k][:], w4s[k])
            x = expand_monotone(x, rank)
            out = out | (jnp.where(masks[k].astype(bool), x, jnp.uint32(0)) << jnp.uint32(8 * k))
        from .common import store

        store(out_ref, out)

    return row_blocked_call(
        kernel, ng=ng, in_widths=in_widths, extra_bytes_per_group=scratch,
        out_dtype=out_store or jnp.uint32,
    )


def _unpack_call(ng: int, bits: int):
    def kernel(in_ref, out_ref):
        unpack_to(out_ref, in_ref[:], bits)

    return row_blocked_call(kernel, ng=ng, in_widths=[bits * LANES])


def _decode_xla(streams, ng: int, plane_lens):
    """Fallback two-pass path (global rank cumsum + XLA gather) for
    pathologically group-skewed planes — see PAD_CAP."""
    n_pad = ng * GROUP
    w = _unpack_call(ng, 2)(streams["widths"]).reshape(n_pad) + jnp.uint32(1)
    out = _unpack_call(num_groups(plane_lens[0]), 8)(streams["plane0"]).reshape(-1)[:n_pad]
    for k in (1, 2, 3):
        if plane_lens[k] == 0:
            continue
        plane = _unpack_call(num_groups(plane_lens[k]), 8)(streams[f"plane{k}"]).reshape(-1)
        mask = w > k
        rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
        vals = jnp.take(plane, jnp.clip(rank, 0), axis=0)
        out = out | (jnp.where(mask, vals, 0) << jnp.uint32(8 * k))
    return out


def build(col: EncodedColumn, out_store=None):
    plane_lens = col.params["plane_lens"]
    ng = num_groups(col.n)

    def decode(streams):
        if any(f"plane{k}" in streams for k in (1, 2, 3)):
            # two-pass XLA skew fallback stays u32; api._to_logical narrows
            return _decode_xla(streams, ng, plane_lens)
        w4s = {
            k: streams[f"prow{k}"].shape[1] // LANES
            for k in (1, 2, 3)
            if f"prow{k}" in streams
        }
        return _single_pass_call(ng, w4s, out_store)(
            streams["widths"],
            streams["plane0"],
            *(streams[f"prow{k}"] for k in sorted(w4s)),
        ).reshape(ng * GROUP)

    return decode


registry.register_device("dzbv", build, _prep, narrow_store=True)
