"""Dictionary — CPU reference codec (FORMAT.md §1.4).

Upstream analog: libgiddy ``src/kernels/decompression/dictionary.cuh``
(SURVEY.md §3.1): narrow codes gather from a small side-stream dictionary.
On the mesh the dictionary is replicated (broadcast once per column,
SURVEY.md §3.11 comm-backend row).
"""

from __future__ import annotations

import numpy as np

from .. import registry
from ..format import EncodedColumn
from ..util import bits_needed, dtype_to_u32, u32_to_dtype
from .lmp import lmp_pack, lmp_unpack


def encode(
    values: np.ndarray,
    *,
    bits: int | None = None,
    dictionary: np.ndarray | None = None,
    name: str = "col",
) -> EncodedColumn:
    values = np.asarray(values)
    if dictionary is None:
        dictionary, codes = np.unique(values, return_inverse=True)
    else:
        dictionary = np.asarray(dictionary, dtype=values.dtype)
        sorter = np.argsort(dictionary, kind="stable")
        pos = np.searchsorted(dictionary, values, sorter=sorter)
        codes = sorter[np.minimum(pos, dictionary.shape[0] - 1)]
        if not np.array_equal(dictionary[codes], values):
            raise ValueError("values contain entries missing from dictionary")
    d = int(dictionary.shape[0])
    if bits is None:
        bits = bits_needed(max(d - 1, 0))
    return EncodedColumn(
        name=name,
        scheme="dict",
        dtype=str(values.dtype),
        n=values.shape[0],
        params={"bits": int(bits), "dict_size": d},
        streams={
            "codes": lmp_pack(codes.astype(np.uint32), bits),
            "values": dtype_to_u32(dictionary).astype(np.int32),
        },
    )


def decode(col: EncodedColumn) -> np.ndarray:
    codes = lmp_unpack(col.streams["codes"], col.params["bits"], col.n)
    u = col.streams["values"].view(np.uint32)[codes]
    return u32_to_dtype(u, col.dtype)


registry.register("dict", encode, decode)
