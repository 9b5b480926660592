"""Partial / random-access decode: any group range, independently.

SURVEY.md §6: the reference has no checkpoint/resume; the container format
plays that role — every GROUP tile decodes independently, so "resume" or
"retry after a failed rank" is re-decoding a group range (decode is
stateless and idempotent per block). This module is that capability as an
API: ``decode_groups(col, g0, g1)`` decodes elements [g0*GROUP, g1*GROUP)
only, touching only those groups' bytes. It reuses the per-group stream
rewrite that the mesh driver uses (dist.dist_form), so every scheme the
mesh supports gets random access for free.
"""

from __future__ import annotations

import numpy as np

from . import registry
from .dist import dist_form
from .format import EncodedColumn
from .util import GROUP, num_groups


def slice_groups(col: EncodedColumn, g0: int, g1: int) -> EncodedColumn:
    """A self-contained column decoding exactly groups [g0, g1)."""
    ng = num_groups(col.n)
    if not (0 <= g0 < g1 <= ng):
        raise ValueError(f"group range [{g0},{g1}) out of [0,{ng})")
    df = dist_form(col, 1)
    streams: dict[str, np.ndarray] = {}
    for k, v in df.sharded.items():
        streams[k] = v[:, g0:g1] if df.bitmap_axis1 and k == "bitmaps" else v[g0:g1]
    if "pos" in streams:  # rle/rpe scatter positions are group-local flats
        streams["pos"] = streams["pos"] - np.int32(g0 * GROUP)
    streams.update(df.replicated)
    sub = EncodedColumn(
        name=f"{col.name}[{g0}:{g1}]",
        scheme=df.local_col.scheme,
        dtype=col.dtype,
        n=(g1 - g0) * GROUP if g1 < ng else col.n - g0 * GROUP,
        params=df.local_col.params,
        streams=streams,
    )
    if df.patch_params and df.patch_params["count"]:
        _attach_patches(sub, df, col, g0, g1)
    return sub


def _attach_patches(sub: EncodedColumn, df, col: EncodedColumn, g0: int, g1: int) -> None:
    """Filter the (global) exception streams down to the range and rebase
    positions; stored naive (positions are already decoded host-side)."""
    ps = df.patch_streams
    if df.patch_params["kind"] == "naive":
        pos = ps["patch_pos"].astype(np.int64)
    else:
        from .ref import delta as ref_delta

        pcol = EncodedColumn(
            name="_ppos", scheme="delta", dtype="int32", n=df.patch_params["count"],
            params={"bits": df.patch_params["ppos_bits"]},
            streams={"packed": ps["ppos_packed"], "anchors": ps["ppos_anchors"]},
        )
        pos = ref_delta.decode(pcol).astype(np.int64)
    lo, hi = g0 * GROUP, g1 * GROUP
    m = (pos >= lo) & (pos < hi)
    sub.scheme = "_patched_slice"
    sub.params = {
        "base_scheme": df.local_col.scheme,
        "base_params": df.local_col.params,
        "kind": "naive",
        "count": int(m.sum()),
    }
    sub.streams = {f"base_{k}": v for k, v in sub.streams.items()}
    sub.streams["patch_pos"] = (pos[m] - lo).astype(np.int32)
    sub.streams["patch_val"] = ps["patch_val"][m]


def decode_groups(col: EncodedColumn, g0: int, g1: int) -> np.ndarray:
    """Device-decode groups [g0, g1); returns the logical values for
    elements [g0*GROUP, min(g1*GROUP, n))."""
    import jax

    from .api import _to_logical
    from .kernels.common import to_device_streams as device_streams  # streams
    # are already in dist-form (prep hooks must NOT re-run on them)

    sub = slice_groups(col, g0, g1)
    if sub.scheme == "_patched_slice":
        # base decode + host-filtered naive patches
        base = EncodedColumn(
            name=sub.name, scheme=sub.params["base_scheme"], dtype=sub.dtype,
            n=sub.n, params=sub.params["base_params"],
            streams={k[len("base_"):]: v for k, v in sub.streams.items() if k.startswith("base_")},
        )
        builder = registry.get(base.scheme).decode_device
        u = jax.jit(builder(base))(device_streams(base.streams))
        if sub.params["count"]:
            import jax.numpy as jnp

            u = u.at[jnp.asarray(sub.streams["patch_pos"])].set(
                jnp.asarray(sub.streams["patch_val"].view(np.uint32))
            )
        return np.asarray(_to_logical(u, col.dtype)[: sub.n])
    builder = registry.get(sub.scheme).decode_device
    u = jax.jit(builder(sub))(device_streams(sub.streams))
    return np.asarray(_to_logical(u, col.dtype)[: sub.n])


def decode_ref_groups(col: EncodedColumn, g0: int, g1: int) -> np.ndarray:
    """Oracle twin of decode_groups (full decode then slice)."""
    full = registry.get(col.scheme).decode_ref(col)
    return full[g0 * GROUP : min(g1 * GROUP, col.n)]
