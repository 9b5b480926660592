#!/usr/bin/env python
"""Decode throughput benchmark — BASELINE.json configs on the local device.

Prints ONE JSON line: the geometric-mean decode GB/s across the five
headline schemes (RLE/FOR/delta/dict/NBit — BASELINE.json "metric"),
`vs_baseline` = ratio to the DaMoN'17 reference recollections in
BASELINE.md (order-of-magnitude anchors: NBit/FOR/dict ≈ 65 GB/s,
delta/RLE ≈ 35 GB/s on a Pascal GPU). Per-scheme detail goes to stderr and
results/bench_detail.json.

Usage: python bench.py [--n LOG2_VALUES] [--schemes a,b,c] [--iters K]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

import giddy_tpu as gt
from giddy_tpu.util import GROUP

# Reference throughput recollections (GB/s decoded, DaMoN'17 — BASELINE.md).
REF_GBPS = {"nbit": 65.0, "for": 65.0, "delta": 35.0, "dict": 65.0, "rle": 35.0}


def gen(scheme: str, n: int, rng: np.random.Generator) -> np.ndarray:
    if scheme == "nbit":  # configs[0]: 9-bit packed int32
        return rng.integers(0, 512, n, dtype=np.int64).astype(np.int32)
    if scheme == "for":
        return (np.int32(1_700_000_000) + rng.integers(0, 4096, n)).astype(np.int32)
    if scheme == "delta":  # configs[1]: sorted timestamps
        return (np.cumsum(rng.integers(0, 16, n)) + 1_600_000_000).astype(np.int32)
    if scheme == "dict":  # configs[2]: low-cardinality codes
        vocab = rng.integers(0, 2**31 - 1, 64, dtype=np.int64).astype(np.int32)
        return vocab[rng.integers(0, 64, n)]
    if scheme == "rle":  # configs[3]: repetitive status flags
        nruns = max(1, n // 1000)
        lens = rng.integers(500, 1500, nruns)
        vals = rng.integers(0, 5, nruns).astype(np.int32)
        out = np.repeat(vals, lens)
        return out[:n] if out.shape[0] >= n else np.concatenate([out, np.full(n - out.shape[0], vals[-1], np.int32)])
    raise ValueError(scheme)


def time_decode(col, iters: int) -> float:
    """Median of per-batch timings (batches of 4 dispatches, synced), after
    3 warmup runs — the axon tunnel shows large run-to-run variance, so a
    single mean is not trustworthy."""
    fn = gt.get_decoder(col)
    streams = gt.api.device_streams(col)
    jax.block_until_ready(streams)
    for _ in range(3):
        jax.block_until_ready(fn(streams))  # compile + warmup
    batch = 4
    times = []
    for _ in range(max(iters, 5)):
        t0 = time.perf_counter()
        for _ in range(batch):
            out = fn(streams)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / batch)
    times.sort()
    return times[len(times) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=26, help="log2 of element count per column")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--schemes", type=str, default="nbit,for,delta,dict,rle")
    args = ap.parse_args()
    n = 1 << args.n
    rng = np.random.default_rng(0)
    detail = {"device": str(jax.devices()[0]), "n": n, "schemes": {}}
    ratios = []
    gbps_all = []
    for scheme in args.schemes.split(","):
        v = gen(scheme, n, rng)
        col = gt.encode(v, scheme, name=f"bench_{scheme}")
        t = time_decode(col, args.iters)
        decoded_gb = col.nbytes_decoded / 1e9
        gbps = decoded_gb / t
        touched = (col.nbytes_compressed + col.nbytes_decoded) / 1e9
        detail["schemes"][scheme] = {
            "decode_GBps": gbps,
            "ratio": col.ratio,
            "hbm_touched_GBps": touched / t,
            "time_s": t,
            "vs_ref": gbps / REF_GBPS.get(scheme, 50.0),
        }
        gbps_all.append(gbps)
        ratios.append(gbps / REF_GBPS.get(scheme, 50.0))
        print(f"[bench] {scheme:6s} {gbps:9.2f} GB/s decoded  (ratio {col.ratio:5.2f}x, "
              f"HBM {touched / t:8.2f} GB/s, {t * 1e3:.3f} ms)", file=sys.stderr)
    geo = math.exp(sum(math.log(g) for g in gbps_all) / len(gbps_all))
    geo_ratio = math.exp(sum(math.log(r) for r in ratios) / len(ratios))
    outdir = pathlib.Path(__file__).parent / "results"
    outdir.mkdir(exist_ok=True)
    (outdir / "bench_detail.json").write_text(json.dumps(detail, indent=2))
    print(json.dumps({
        "metric": "decode_GBps_geomean_headline5",
        "value": round(geo, 2),
        "unit": "GB/s",
        "vs_baseline": round(geo_ratio, 3),
    }))


if __name__ == "__main__":
    main()
