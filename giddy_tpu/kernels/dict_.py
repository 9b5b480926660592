"""Dictionary — device decoder (FORMAT.md §1.4; BASELINE configs[2]).

Two paths, chosen by dictionary size (the analog of libgiddy staging the
dictionary in shared memory — ``dictionary.cuh``, SURVEY.md §3.1):

- d <= GIDDY_TPU_DICT_PALLAS_MAX (default 1024): **fused single pass** — the
  LMP code unpack and the dictionary gather run in one Pallas kernel; the
  dictionary is staged in VMEM and gathered via :func:`lanes.gather_lut`
  (blocked 128-lane dynamic_gather + select chain). A/B on the v5e
  (scripts/dict_ab.py -> results/dict_ab.json): the fused path shows
  ``temp_bytes == 0`` and traffic ratio 1.0 at every dictionary size
  tested (64..4096, bit-exact), while the XLA ``take`` pays the codes
  round-trip (measured ratio ~1.33-1.39 with u16 codes indexed directly
  — round 5; ballooning to ~26x at tiny d where XLA's gather lowering
  goes pathological). Wall-clock on the local tunnel is dispatch-bound,
  so the structural columns are the evidence.
- larger d: codes unpack in Pallas, then an XLA ``take``. The fused chain
  also works (and stays single-pass) at d = 4096, but its Mosaic compile
  time grows with d_pad/128 unrolled gather blocks — the threshold trades
  first-call latency against the take's extra pass for rare big
  dictionaries; tune via GIDDY_TPU_DICT_PALLAS_MAX.

Cascade reuses the same staging by passing ``_lut_d_pad`` to the inner
scheme's builder (see kernels/cascade.py), so RLE_DICTIONARY-style decode
is also one pass.
"""

from __future__ import annotations

import os

import jax.numpy as jnp

from .. import registry
from ..format import EncodedColumn
from ..util import GROUP, LANES, num_groups, round_up
from .common import row_blocked_call
from .lanes import LUT_LANE, unpack_to

# Largest dictionary the fused in-kernel gather accepts; above this the
# select chain across 128-entry blocks loses to the XLA take's extra HBM
# pass. Round-4 crossover, from the MEASURED ops census (roofline.ops_audit;
# round 3's hand accounting was ~3x optimistic until the census caught the
# take_along_axis clamp triple + unhoisted shift, both now removed): the
# chain costs ~2 VPU ops + 1 gather per 128-entry block per element — with
# gathers charged as VPU-equivalents, d=2048 runs ~51 ops/elem = ~49% SoL
# vs the take fallback's structural ~38% cap (traffic ratio ~2.6 from the
# codes round-trip), while d=4096 (~99 ops/elem, ~26%) would lose. The
# crossover sits between 2048 and 4096; 2048 keeps Mosaic compile time of
# the unrolled chain moderate. Census table: results/dict_census.json.
DICT_PALLAS_MAX = int(os.environ.get("GIDDY_TPU_DICT_PALLAS_MAX", 2048))


def _pad_table(values, d: int):
    """(d,) dictionary -> (1, d_pad) uint32 VMEM table, d_pad % 128 == 0."""
    d_pad = round_up(max(d, 1), LUT_LANE)
    table = jnp.zeros((d_pad,), jnp.uint32).at[:d].set(values.astype(jnp.uint32))
    return table.reshape(1, d_pad), d_pad


def use_lut(d: int) -> bool:
    return 0 < d <= DICT_PALLAS_MAX


def build(col: EncodedColumn, out_store=None):
    bits = col.params["bits"]
    d = col.params["dict_size"]
    ng = num_groups(col.n)

    def kernel(in_ref, out_ref):
        unpack_to(out_ref, in_ref[:], bits)

    if use_lut(d):
        d_pad = round_up(d, LUT_LANE)
        # narrow out_store: codes stage through a u32 VMEM scratch (full
        # width for the gather), only the gathered values store narrow
        call = row_blocked_call(
            kernel, ng=ng, in_widths=[bits * LANES], lut_d_pad=d_pad,
            out_dtype=out_store or jnp.uint32,
        )

        def decode(streams):
            table, _ = _pad_table(streams["values"], d)
            return call(table, streams["codes"]).reshape(ng * GROUP)

        return decode

    # Fallback: codes unpack in Pallas, then an XLA take. The extra HBM
    # round-trip is the path's structural cost — so store the intermediate
    # codes at their NATURAL width (uint16 for d <= 65536, the realistic
    # ceiling for dictionary columns): with the direct u16-indexed take
    # below, the measured round-trip drops to sol_ratio ~1.33-1.39 — a
    # ~72-75% structural SoL cap, vs ~40% in round 4 (dict_ab.json).
    # The 3D narrow geometry (common.narrow_geom) always accepts GROUP-wide
    # stores; the take's int32 cast absorbs either width regardless.
    code_store = jnp.uint16 if 0 < d <= 65536 else jnp.uint32
    call = row_blocked_call(
        kernel, ng=ng, in_widths=[bits * LANES], out_dtype=code_store
    )

    if d == 0:  # empty column: no dictionary to gather from; the unpacked
        # (all-pad) codes are the padded output, sliced to n == 0 upstream
        return lambda streams: call(streams["codes"]).reshape(ng * GROUP)

    def decode(streams):
        codes = call(streams["codes"]).reshape(ng * GROUP)
        values = streams["values"]
        if out_store is not None:  # narrow the table so the take WRITES narrow
            values = values.astype(out_store)
        # unsigned codes index the take DIRECTLY: an astype(int32) here
        # forces XLA to materialize a full-width index temp (4 B/elem —
        # measured on chip: it silently paid back the whole uint16 code
        # saving), while u16/u32 gather indices cost nothing extra
        return jnp.take(values, codes, axis=0)

    return decode


registry.register_device("dict", build, narrow_store=True)
