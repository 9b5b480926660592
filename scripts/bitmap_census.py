"""Bitmap plane-count census (round 5, VERDICT r4 next #8): pin the
d > 64 XLA-fallback decision with measured structure instead of prose.

For d in a sweep spanning the Pallas/XLA crossover, record:
- the scheme's own compression ratio (bitmap storage is d bits/element —
  it INFLATES beyond d = 32, so high-d bitmap is a losing scheme per se);
- the compiled decode's traffic audit (temp bytes, sol_ratio) — on TPU
  this shows whether the XLA accumulation loop fuses into a single pass;
- the ops census (VPU ops scale ~2/plane on either path).

    python scripts/bitmap_census.py [--out results/bitmap_census.json]

Traffic numbers are backend-dependent (run on the TPU for the record);
the ops census is backend-independent.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import giddy_tpu as gt  # noqa: E402
from giddy_tpu.roofline import ops_audit, traffic_audit  # noqa: E402
from giddy_tpu.util import GROUP  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/bitmap_census.json")
    ap.add_argument("--n", type=int, default=8 * GROUP)
    args = ap.parse_args()
    rows = []
    rng = np.random.default_rng(3)
    for d in (4, 16, 32, 64, 128, 256):
        vocab = np.unique(rng.integers(-(2**30), 2**30, 2 * d, dtype=np.int64))[:d].astype(np.int32)
        v = vocab[rng.integers(0, d, args.n)]
        col = gt.encode(v, "bitmap", name=f"bm_{d}")
        assert col.params["d"] == d, (d, col.params["d"])
        exact = bool((np.asarray(gt.decode(col)) == v).all())
        a = ops_audit(col)
        t = traffic_audit(col)
        rows.append({
            "d": d,
            "path": "pallas" if d <= 64 else "xla",
            "exact": exact,
            "ratio": round(col.nbytes_decoded / col.nbytes_compressed, 3),
            "vpu_issue_per_elem": round(a["vpu_issue_per_elem"], 2),
            "budget_vpu": round(a["budget"]["vpu_ops_per_elem"], 2),
            "memory_bound": a["memory_bound"],
            "temp_bytes": t["temp_bytes"],
            "sol_ratio": round(t["sol_ratio"], 4),
            "interpreted": t["interpreted"],
        })
        print(rows[-1])
    out = {
        "note": (
            "bitmap stores d bits/element: ratio < 1 (INFLATION) beyond "
            "d=32, so d > 64 is a losing regime for the scheme itself — "
            "the advisor picks dict there. The XLA fallback's structure "
            "is recorded to pin that no in-kernel work is being left on "
            "the table (sol_ratio ~1 means the accumulation loop fuses "
            "into a single pass over the planes)."
        ),
        "rows": rows,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
