#!/usr/bin/env python
"""Compression tour: every scheme against the data shape it is built for.

Prints a ratio/validity table (encode host-side, decode on the local
device, bit-exact check vs the CPU oracle) plus what the advisor would
have picked. A quick smell test that codecs behave on their home turf:

    python examples/compression_tour.py [log2_n]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import giddy_tpu as gt
from giddy_tpu.advisor import suggest
from giddy_tpu.datagen import gen_column

SCHEMES = [
    "nbit", "for", "delta", "delta2", "xordelta", "alp", "dict", "rle",
    "rpe", "model", "bitmap", "dzbf", "dzbv", "patched", "cascade", "raw",
]


def main(log2_n: int = 20) -> None:
    n = 1 << log2_n
    rng = np.random.default_rng(7)
    print(f"{'scheme':9s} {'home-turf data':28s} {'ratio':>7s}  {'advisor top pick'}")
    for scheme in SCHEMES:
        v = gen_column(scheme, n, rng)
        col = gt.encode(v, scheme)
        out = np.asarray(gt.decode(col))
        ref = gt.decode_ref(col)
        np.testing.assert_array_equal(
            out.view(np.uint32), ref.view(np.uint32), err_msg=scheme
        )
        top = suggest(v)[0]
        desc = {
            "nbit": "9-bit ints", "for": "narrow-range timestamps",
            "delta": "sorted timestamps",
            "delta2": "regularly-sampled timestamps",
            "xordelta": "slow-varying float32",
            "alp": "decimal float32 prices",
            "dict": "40-value vocabulary", "rle": "long status runs",
            "rpe": "long status runs", "model": "linear-trend ints",
            "bitmap": "4 distinct values", "dzbf": "low-byte ints",
            "dzbv": "mixed-width ints", "patched": "ints + rare outliers",
            "cascade": "runs of dictionary codes", "raw": "uniform random",
        }[scheme]
        print(f"{scheme:9s} {desc:28s} {col.ratio:6.1f}x  {top[0]} ({top[1]:.1f}x)")
    print("all schemes decoded bit-exact vs the oracle")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
