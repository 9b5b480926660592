"""TWO-PROCESS jax.distributed decode drill (VERDICT r3 next #6).

The single-process 8-device virtual mesh (dist_checks.py) exercises the
shard_map program but never the multi-controller runtime: a
process-spanning mesh, per-process addressable shards, and the
cross-process replicated-stream broadcast — the pieces the real v5p
multi-host day (scripts/multihost_bench.py, SURVEY.md CS-5) depends on.
This script is the closest local approximation: it spawns TWO OS processes
of 4 virtual CPU devices each, wires them with jax.distributed.initialize,
builds the 2D (host x chip) mesh, and runs the standard sharded decoders —
each process verifying its addressable shards bit-exactly against the CPU
oracle.

Run directly (`python tests/dist2proc_check.py`) — it re-launches itself
as coordinator + worker with clean CPU envs; exit 0 and the final
"ALL 2-PROCESS DIST CHECKS PASSED" line mean success.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys

HERE = os.path.abspath(__file__)
SCHEMES = ["nbit", "delta", "dict", "rle", "model", "patched", "alp"]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def launcher() -> int:
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
        ).strip()
        env["_GIDDY_DIST2_CHILD"] = str(pid)
        env["_GIDDY_DIST2_PORT"] = str(port)
        procs.append(
            subprocess.Popen(
                [sys.executable, HERE],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    ok = True
    for pid, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            ok = False
        outs.append(out)
        if p.returncode != 0:
            ok = False
    sys.stdout.write(outs[0])
    if not ok or "ALL 2-PROCESS DIST CHECKS PASSED" not in outs[0]:
        sys.stderr.write("---- process 1 output ----\n" + outs[1])
        return 1
    return 0


def worker() -> None:
    pid = int(os.environ["_GIDDY_DIST2_CHILD"])
    port = os.environ["_GIDDY_DIST2_PORT"]
    sys.path.insert(0, os.path.dirname(os.path.dirname(HERE)))
    sys.path.insert(0, os.path.dirname(HERE))

    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.local_device_count() == 4, jax.local_devices()
    assert len(jax.devices()) == 8, jax.devices()

    import numpy as np

    import giddy_tpu as gt
    from giddy_tpu.dist import build_sharded_decoder, host_chip_mesh
    from giddy_tpu.util import GROUP, num_groups

    from helpers import gen_column

    # 2D (host x chip) mesh with the process boundary on the host axis —
    # the CS-5 shape where replicated side streams broadcast across the
    # process (DCN-analog) boundary once per column
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    mesh, axis = host_chip_mesh(2, 4, devices)

    rng = np.random.default_rng(4242)  # identical columns on both processes
    for scheme in SCHEMES:
        v = gen_column(scheme, 16 * GROUP + 421, rng)
        col = gt.encode(v, scheme, name=f"d2_{scheme}")
        fn, args = build_sharded_decoder(col, mesh, axis)
        out = fn(*args)
        jax.block_until_ready(out)
        ref = gt.decode_ref(col).view(np.uint32)
        ref_pad = np.zeros(num_groups(col.n) * GROUP, np.uint32)
        ref_pad[: col.n] = ref
        n_local = 0
        for shard in out.addressable_shards:
            got = np.asarray(shard.data).reshape(-1)
            want_full = ref_pad[shard.index[0]]
            # only positions < n carry contract values (pad groups decode
            # to don't-care); compare the real prefix of this shard
            lo = shard.index[0].start or 0
            real = max(0, min(col.n - lo, got.shape[0]))
            np.testing.assert_array_equal(got[:real], want_full[:real], err_msg=scheme)
            n_local += got.shape[0]
        assert n_local > 0, "process owns no shards"
        if pid == 0:
            print(f"[dist2] {scheme}: ok ({n_local} elems/process)", flush=True)

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("giddy_dist2_done")
    if pid == 0:
        print("ALL 2-PROCESS DIST CHECKS PASSED", flush=True)


if __name__ == "__main__":
    if "_GIDDY_DIST2_CHILD" in os.environ:
        worker()
        sys.exit(0)
    sys.exit(launcher())
