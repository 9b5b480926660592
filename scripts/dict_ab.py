#!/usr/bin/env python
"""A/B the dictionary decode paths (VERDICT r1 item #2): fused in-kernel
VMEM LUT (gather_lut) vs XLA take, across dictionary sizes.

Runs each variant in a fresh subprocess (GIDDY_TPU_DICT_PALLAS_MAX is read
at import). Wall-clock on the axon tunnel is dispatch-bound, so the
decisive column is the structural one: the fused path must show
temp_bytes == 0 (single pass) while the take path pays an extra decoded-
bytes round-trip. Writes results/dict_ab.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _one(d: int, pallas_max: int) -> dict:
    code = f"""
import json, sys, time
sys.path.insert(0, {str(REPO)!r})
import numpy as np, jax
import giddy_tpu as gt
from giddy_tpu.roofline import traffic_audit

rng = np.random.default_rng(0)
n = 1 << 24
vocab = rng.integers(-(2**31), 2**31 - 1, {d}, dtype=np.int64).astype(np.int32)
v = vocab[rng.integers(0, {d}, n)]
col = gt.encode(v, "dict")
assert col.params["dict_size"] <= {d}
fn = gt.get_decoder(col)
streams = gt.api.device_streams(col)
jax.block_until_ready(streams)
jax.block_until_ready(fn(streams))
ts = []
for _ in range(8):
    t0 = time.perf_counter()
    for _ in range(4):
        out = fn(streams)
    jax.block_until_ready(out)
    ts.append((time.perf_counter() - t0) / 4)
ts.sort()
a = traffic_audit(col)
from giddy_tpu.roofline import ops_audit
o = ops_audit(col)
ref = gt.decode_ref(col)
exact = bool((np.asarray(gt.decode(col)) == ref).all())
print(json.dumps({{"exact": exact, "time_us": ts[len(ts)//2] * 1e6,
                   "temp_bytes": a["temp_bytes"], "sol_ratio": a["sol_ratio"],
                   "ops_vpu_per_elem": round(o["vpu_ops_per_elem"], 2),
                   "ops_move_per_elem": round(o["move_per_elem"], 2),
                   "ops_budget_vpu": round(o["budget"]["vpu_ops_per_elem"], 2)}}))
"""
    env = dict(os.environ, GIDDY_TPU_DICT_PALLAS_MAX=str(pallas_max))
    # big fused dictionaries compile slowly (the unrolled gather chain):
    # give each point ample room rather than recording a spurious timeout
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600, env=env)
    if out.returncode != 0:
        return {"error": out.stderr[-500:]}
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    results = {}
    for d in (64, 512, 1024, 2048, 4096):
        results[str(d)] = {
            "fused_lut": _one(d, 1 << 20),
            "xla_take": _one(d, 0),
        }
        print(d, json.dumps(results[str(d)]), file=sys.stderr)
    # big-dictionary regime (strdict's 16k-64k): the fused chain's compile
    # time and O(d/128) cost rule it out — record the take path's
    # structural numbers (round 5: uint16 intermediate codes)
    for d in (16384, 65536):
        results[str(d)] = {"xla_take": _one(d, 0)}
        print(d, json.dumps(results[str(d)]), file=sys.stderr)
    results["note"] = (
        "wall-clock is dispatch-bound on the axon tunnel (treat time_us as "
        "noisy); the decisive columns are structural. Bytes: the fused LUT "
        "is single-pass (temp 0, sol_ratio ~1) while the XLA take pays an "
        "extra codes round-trip — cut in round 5 by storing the "
        "intermediate codes uint16 AND indexing the take with them "
        "directly (an astype(int32) materialized a 4 B/elem index temp "
        "on chip that paid back the uint16 saving; measured sol_ratio "
        "~2.5 -> ~1.33-1.39, SoL cap ~40% -> ~72-75%). Compute (ops "
        "census): the chain costs ~2 VPU ops + 1 "
        "gather per 128-entry block per element, so its SoL cap is "
        "budget/ops — above the take's through d=2048 (~49%) and below it "
        "by d=4096 (~26%). Default GIDDY_TPU_DICT_PALLAS_MAX=2048 sits on "
        "the winning side of that crossover. Design-space note (VERDICT r4 "
        "next #6): a true two-level gather does not exist on this hardware "
        "— Mosaic dynamic_gather is lane-local, a 2-gather composition "
        "needs a collision-prone scatter, and the one-hot matmul "
        "alternative costs 2*(d/128) VPU ops/elem to build the one-hot "
        "plus 4*(d/128)*128 int8 MACs/elem (1.3x the MXU budget at d=4096, "
        "5x at 16384) — structurally worse than the u16-take at every "
        "d > 2048; see docs/DESIGN.md 3d."
    )
    out = REPO / "results" / "dict_ab.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
