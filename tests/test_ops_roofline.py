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
    "patched", "raw", "alp", "rle", "rpe", "cascade",
]

# Irregular kernels: documented absolute VPU-ops/element caps (census
# value at freeze + ~20% headroom). Rationale per scheme:
# - delta2: the closed-form double scan (one bf16 ramp matmul, round 4)
#   runs ~27 issue ops/elem — over its own budget only because the
#   scheme's 8-10x ratio makes bytes/elem (hence the budget) tiny; the
#   per-regime census (test_regime_census below) records the shape.
# - dzbv: per-element byte realignment — round 5's tile layout (one packed
#   exclusive rank scan + one in-tile gather per plane, kernels/dzbv.py)
#   took the census 187.6 -> ~56 + 4.75 gathers; the residue is the
#   3-plane unpack/fold chain itself (~7 ops/plane) against a budget
#   squeezed by the scheme's own compression ratio.
# - xordelta: the two-level tiled roll network's log2(128) full-width
#   rolls are issue slots too (round-5 split) — 33 issue ops vs a ~29
#   budget at this column's ratio; narrow streams (bits <= 4) ride the
#   roll-free MXU parity scan instead.
# rle/rpe/cascade moved to MEMORY_BOUND in round 5: the censused-cost W
# selection (kernels/rle.py tile_prep) picks small tiles + short chains
# for long-run columns (41 -> 14-18 issue ops at the census density).
# Caps are on ISSUE slots (vpu + gather + roll) since round 5; same-width
# int<->int converts reclassified as free retypes late in round 5
# (delta2 26.8 -> 26.0, dzbv 53.8 -> 50.8), caps re-tightened to match.
OPS_CAPS = {"delta2": 31.0, "dzbv": 57.0, "xordelta": 39.0}


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


# ---------------------------------------------------------------------------
# Regime-parameterized census (round 5, VERDICT r4 next #4): the irregular
# kernels' costs are data-shape-bound, so one census density proves little.
# These tests pin each scheme's behavior across its operating regimes and
# machine-check the crossover constants the kernels ship with.
# ---------------------------------------------------------------------------


def _runs_col(n, avg, seed=1):
    rng = np.random.default_rng(seed)
    out = np.zeros(n, np.int32)
    pos = 0
    while pos < n:
        ln = max(1, int(rng.integers(avg // 2, avg * 3 // 2 + 1)))
        out[pos : pos + ln] = int(rng.integers(0, 100))
        pos += ln
    return out


def test_rle_winning_regime_is_memory_bound():
    """Long-run columns (avg ~1024; BASELINE configs[3] is ~2550) are RLE's
    winning regime — the censused-cost W selection must land them on a
    small-tile short chain that is memory-bound outright."""
    col = gt.encode(_runs_col(8 * GROUP, 1024), "rle")
    a = ops_audit(col)
    assert a["memory_bound"], a["vpu_issue_per_elem"]
    assert a["vpu_issue_per_elem"] <= 20.0, a["vpu_issue_per_elem"]


@pytest.mark.parametrize("avg,bound", [(8, 45.0), (64, 36.0)])
def test_rle_dense_regimes_bounded(avg, bound):
    """Shorter-run regimes cost more (denser run tables) but stay flat:
    the binary search caps the dense end at ~37 issue ops/elem regardless
    of density — never the chain's O(w_pad)."""
    col = gt.encode(_runs_col(8 * GROUP, avg), "rle")
    a = ops_audit(col)
    assert a["vpu_issue_per_elem"] <= bound, a["vpu_issue_per_elem"]


def test_rle_rank_chain_crossover_pinned(monkeypatch):
    """RANK_MIN (=16) is where the select chain meets the flat binary
    search: census BOTH expansions on the same prepped column and check
    the shipped crossover sits between the measured win regions."""
    from giddy_tpu.format import EncodedColumn
    from giddy_tpu.kernels import rle as krle

    col = gt.encode(_runs_col(8 * GROUP, 8), "rle")  # dense: w_pad = 128
    st = krle._prep(col, positions=False)
    assert "vals_w" in st, "dense column must still take the tile form"
    w_pad = st["vals_w"].shape[-1]
    assert w_pad > krle.RANK_MIN, w_pad
    pre = EncodedColumn(
        name=col.name, scheme="rle", dtype=col.dtype, n=col.n,
        params=col.params, streams=st,
    )
    shipped = krle.RANK_MIN
    monkeypatch.setattr(krle, "RANK_MIN", 0)  # force the binary search
    rank_cost = ops_audit(pre)["vpu_issue_per_elem"]
    monkeypatch.setattr(krle, "RANK_MIN", 128)  # force the chain
    chain_cost = ops_audit(pre)["vpu_issue_per_elem"]
    # at this density the search must win outright, and the chain's
    # measured per-run slope must cross the flat search cost near the
    # shipped RANK_MIN — the machine check that the constant is census-
    # derived, not folklore
    assert rank_cost < chain_cost, (rank_cost, chain_cost, w_pad)
    chain_per_run = chain_cost / w_pad
    crossover = rank_cost / chain_per_run
    assert crossover / 2 <= shipped <= crossover * 2, (
        crossover, rank_cost, chain_per_run,
    )


def test_cascade_short_run_regime_bounded():
    """cascade's standard census column (long runs) is memory-bound; the
    short-run regime pays the search + dictionary gather but stays flat."""
    rng = np.random.default_rng(5)
    vocab = rng.integers(-(2**31), 2**31 - 1, 8, dtype=np.int64).astype(np.int32)
    v = vocab[np.minimum(_runs_col(8 * GROUP, 8), 7)]
    col = gt.encode(v, "cascade")
    a = ops_audit(col)
    assert a["vpu_issue_per_elem"] <= 50.0, a["vpu_issue_per_elem"]
    assert not a["has_unbounded_loop"]


def test_delta2_ratio_regimes():
    """delta2's issue cost scales with the packed width (byte planes of
    the double scan); its winning regime — tightly-jittered regular
    timestamps, where its ratio beats delta's — must stay within 1.5x of
    the memory-bound budget, and the wide regime must stay under the flat
    4-plane ceiling."""
    rng = np.random.default_rng(2)
    tight = np.cumsum(np.full(8 * GROUP, 1000) + rng.integers(-3, 4, 8 * GROUP))
    col_t = gt.encode((tight & 0x7FFFFFFF).astype(np.int32), "delta2")
    a_t = ops_audit(col_t)
    assert a_t["vpu_issue_per_elem"] <= 1.5 * a_t["budget"]["vpu_ops_per_elem"], a_t
    mid = np.cumsum(np.full(8 * GROUP, 1000) + rng.integers(-200, 201, 8 * GROUP))
    a_m = ops_audit(gt.encode((mid & 0x7FFFFFFF).astype(np.int32), "delta2"))
    assert a_m["vpu_issue_per_elem"] <= 55.0, a_m["vpu_issue_per_elem"]
