#!/usr/bin/env python
"""Multi-host decode benchmark driver — run ONE process per host.

The v5p-day command for BASELINE's ">=90% linear GB/s scaling at 1 chip ->
1 host -> N>=2 hosts" target (SURVEY.md call stack CS-5). The local box has
a single chip, so this script cannot be exercised end-to-end here; its
single-process path (no --coordinator) runs the identical code on all local
devices and is covered by the test suite / bench --dist. On a slice:

    # on every host i of N (e.g. via gcloud compute tpus tpu-vm ssh --worker=all)
    python scripts/multihost_bench.py \
        --coordinator ${HOST0_IP}:8476 --num-hosts N --host-id i \
        --n 28 --schemes nbit,for,delta,dict,rle

Every host runs the same program: ``jax.distributed.initialize`` wires the
DCN; the mesh spans all chips of all hosts (2D host x chip so replicated
side streams broadcast host-locally over ICI first); columns are encoded
identically from the shared seed on every host, sharded on the group
dimension via ``jax.device_put`` with a global NamedSharding (each process
feeds its addressable shards), and decoded with the same shard_map program
single-chip decode uses. Steady-state decode is collective-free
(machine-checked in tests/dist_checks.py), so DCN carries only the initial
replicated-stream broadcast — the structural basis for the >=90% target.

Output: one JSON line per host 0 with per-scheme decoded GB/s across the
slice; compare against a --num-hosts 1 run for the efficiency ratio.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0 address:port; omit for single-process local run")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--n", type=int, default=26, help="log2 elements per column")
    ap.add_argument("--schemes", default="nbit,for,delta,dict,rle")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax

    if args.coordinator:
        jax.distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_hosts,
            process_id=args.host_id,
        )

    import giddy_tpu as gt
    from giddy_tpu.datagen import gen_column
    from giddy_tpu.dist import build_sharded_decoder, default_mesh, host_chip_mesh

    devices = jax.devices()
    chips_per_host = len(devices) // max(args.num_hosts, 1)
    if args.num_hosts > 1:
        mesh, axis = host_chip_mesh(args.num_hosts, chips_per_host, devices)
    else:
        mesh, axis = default_mesh(devices=devices), "d"
    n = 1 << args.n

    # identical columns on every host (shared seed): device_put against the
    # global sharding slices out each process's addressable shards
    rng = np.random.default_rng(args.seed)
    results: dict[str, dict] = {}
    for scheme in args.schemes.split(","):
        col = gt.encode(gen_column(scheme, n, rng), scheme, name=f"mh_{scheme}")
        fn, fargs = build_sharded_decoder(col, mesh, axis)
        out = fn(*fargs)
        jax.block_until_ready(out)  # compile + broadcast warmup
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*fargs))
            times.append(time.perf_counter() - t0)
        times.sort()
        t = times[len(times) // 2]
        results[scheme] = {
            "decode_GBps_slice": col.nbytes_decoded / 1e9 / t,
            "decode_GBps_per_chip": col.nbytes_decoded / 1e9 / t / len(devices),
            "time_s": t,
        }
        if args.host_id == 0:
            print(f"[mh] {scheme:8s} {results[scheme]['decode_GBps_slice']:9.2f} GB/s "
                  f"({len(devices)} chips, {args.num_hosts} hosts)", file=sys.stderr)

    if args.host_id == 0:
        line = json.dumps({
            "num_hosts": args.num_hosts,
            "devices": len(devices),
            "n": n,
            "schemes": results,
        })
        print(line)
        if args.out:
            with open(args.out, "w") as f:
                f.write(line)


if __name__ == "__main__":
    main()
