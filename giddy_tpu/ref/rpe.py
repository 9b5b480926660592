"""Run-position encoding — CPU reference codec (FORMAT.md §1.6).

Upstream analog: libgiddy ``src/kernels/decompression/run_position_encoding.cuh``
(SURVEY.md §3.1): stores run *start positions* instead of lengths, trading a
cumsum for better random access. Shares the group-split machinery with rle.
"""

from __future__ import annotations

import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, dtype_to_u32, next_power_of_2, num_groups, u32_to_dtype
from .rle import _runs_per_group


def encode(values: np.ndarray, *, name: str = "col") -> EncodedColumn:
    values = np.asarray(values)
    n = values.shape[0]
    u = dtype_to_u32(values)
    if n and n % GROUP:
        pad = np.full(num_groups(n) * GROUP - n, u[-1], dtype=u.dtype)
        u = np.concatenate([u, pad])
    elif not n:
        u = np.zeros(GROUP, dtype=np.uint32)
    ng, vals, starts_wg, grp, rank, counts = _runs_per_group(u)
    r_pad = max(8, next_power_of_2(int(counts.max())))
    run_values = np.zeros((ng, r_pad), dtype=np.int32)
    run_starts = np.full((ng, r_pad), GROUP, dtype=np.int32)  # sentinel > any j
    run_values[grp, rank] = vals.view(np.int32)
    run_starts[grp, rank] = starts_wg.astype(np.int32)
    last_val = run_values[np.arange(ng), counts - 1]
    pad_mask = np.arange(r_pad)[None, :] >= counts[:, None]
    run_values = np.where(pad_mask, last_val[:, None], run_values)
    return EncodedColumn(
        name=name,
        scheme="rpe",
        dtype=str(values.dtype),
        n=n,
        params={"r_pad": int(r_pad)},
        streams={
            "run_values": run_values.reshape(-1),
            "run_starts": run_starts.reshape(-1),
            "run_counts": counts.astype(np.int32),
        },
    )


def decode(col: EncodedColumn) -> np.ndarray:
    r_pad = col.params["r_pad"]
    ng = num_groups(col.n)
    vals = col.streams["run_values"].reshape(ng, r_pad)
    starts = col.streams["run_starts"].reshape(ng, r_pad)
    out = np.empty((ng, GROUP), dtype=np.uint32)
    j = np.arange(GROUP)
    for g in range(ng):
        r = np.searchsorted(starts[g], j, side="right") - 1
        out[g] = vals[g, r].view(np.uint32)
    return u32_to_dtype(out.reshape(-1)[: col.n], col.dtype)


registry.register("rpe", encode, decode)
