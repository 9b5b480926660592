"""CPU reference codecs (NumPy) — the bit-exactness oracle.

One module per scheme, mirroring libgiddy's ``src/kernels/decompression/``
tree (SURVEY.md §3.1; upstream mount was empty — file list reconstructed).
Each module provides ``encode(values, ...) -> EncodedColumn`` and
``decode(col) -> np.ndarray``; both are registered with
:mod:`giddy_tpu.registry`. These codecs define FORMAT.md behaviorally and
double as the judge target per BASELINE.json configs[0].
"""

from . import (  # noqa: F401  (import = registration)
    alp,
    bitmap,
    cascade,
    delta,
    delta2,
    dict_,
    dzbf,
    dzbv,
    for_,
    model,
    nbit,
    patch,
    raw,
    rle,
    rpe,
    xordelta,
)
