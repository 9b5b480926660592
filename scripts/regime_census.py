"""Regime-parameterized ops census (round 5, VERDICT r4 next #4).

Runs roofline.ops_audit across each irregular scheme's operating regimes —
run-length sweeps for rle/rpe/cascade, ratio sweeps for delta2, width-mix
sweeps for dzbv — and writes one JSON table. Pure tracing: identical on
any backend (the compiled-path census never executes), so this runs on CPU.

    python scripts/regime_census.py [--out results/regime_census.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import giddy_tpu as gt  # noqa: E402
from giddy_tpu.roofline import ops_audit  # noqa: E402
from giddy_tpu.util import GROUP  # noqa: E402

N = 8 * GROUP


def runs_col(n, avg, seed=1):
    rng = np.random.default_rng(seed)
    out = np.zeros(n, np.int32)
    pos = 0
    while pos < n:
        ln = max(1, int(rng.integers(avg // 2, avg * 3 // 2 + 1)))
        out[pos : pos + ln] = int(rng.integers(0, 100))
        pos += ln
    return out


def row(scheme, regime, col):
    a = ops_audit(col)
    from giddy_tpu.kernels.rle import _prep as rle_prep

    extra = {}
    if scheme in ("rle", "rpe"):
        st = rle_prep(col, positions=scheme == "rpe")
        if "vals_w" in st:
            extra = {"W": GROUP // st["vals_w"].shape[1], "w_pad": int(st["vals_w"].shape[2])}
        else:
            extra = {"path": "scatter"}
    return {
        "scheme": scheme,
        "regime": regime,
        "ratio": round(col.nbytes_decoded / max(col.nbytes_compressed, 1), 2),
        "vpu": round(a["vpu_ops_per_elem"], 2),
        "gather": round(a["gather_per_elem"], 2),
        "roll": round(a["roll_per_elem"], 2),
        "issue": round(a["vpu_issue_per_elem"], 2),
        "mxu": round(a["mxu_macs_per_elem"], 1),
        "budget_vpu": round(a["budget"]["vpu_ops_per_elem"], 2),
        "memory_bound": a["memory_bound"],
        **extra,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/regime_census.json")
    args = ap.parse_args()
    rows = []
    for avg in (4, 8, 64, 256, 1024, 4096):
        rows.append(row("rle", f"avg_run={avg}", gt.encode(runs_col(N, avg), "rle")))
    rows.append(row("rpe", "avg_run=64", gt.encode(runs_col(N, 64), "rpe")))
    rows.append(row("rpe", "avg_run=1024", gt.encode(runs_col(N, 1024), "rpe")))
    # cascade: dictionary over RLE codes at two densities
    rng = np.random.default_rng(5)
    vocab = rng.integers(-(2**31), 2**31 - 1, 8, dtype=np.int64).astype(np.int32)
    for avg in (8, 256, 2048):
        v = vocab[np.minimum(runs_col(N, avg, seed=2), 7)]
        rows.append(row("cascade", f"avg_run={avg}", gt.encode(v, "cascade")))
    # delta2: second-difference width regimes (jitter around a fixed step)
    for jit, name in ((3, "tight"), (200, "mid"), (50000, "wide")):
        rng = np.random.default_rng(2)
        v = np.cumsum(np.full(N, 1000) + rng.integers(-jit, jit + 1, N))
        rows.append(row("delta2", f"jitter={jit}", gt.encode((v & 0x7FFFFFFF).astype(np.int32), "delta2")))
    # delta on the same columns: the alternative delta2 must beat on ratio
    for jit in (3, 200):
        rng = np.random.default_rng(2)
        v = np.cumsum(np.full(N, 1000) + rng.integers(-jit, jit + 1, N))
        rows.append(row("delta", f"jitter={jit}", gt.encode((v & 0x7FFFFFFF).astype(np.int32), "delta")))
    # dzbv: width-mix regimes
    rng = np.random.default_rng(0)
    mixes = {
        "uniform_1_4B": rng.integers(0, 4, N),
        "mostly_2B": np.where(rng.random(N) < 0.9, 1, 3),
        "mostly_1B": np.where(rng.random(N) < 0.95, 0, 2),
    }
    for name, mag in mixes.items():
        v = (rng.integers(0, 2**31, N).astype(np.uint32) >> (8 * (3 - mag)).astype(np.uint32)).astype(np.uint32)
        rows.append(row("dzbv", name, gt.encode(v.view(np.int32), "dzbv")))
    out = {"n": N, "note": "compiled-path trace census; backend-independent", "rows": rows}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    for r in rows:
        print(r)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
