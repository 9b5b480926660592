"""Structural SoL evidence (VERDICT r1 next-step #3; SURVEY.md §8.3.5).

Wall-clock on the axon tunnel is non-physical, so the single-pass property
is asserted on the *compiled* program instead: jax's memory analysis of
every registered decoder must show bytes-touched ~= compressed + decoded.
On a real TPU backend the assertion is exact (``temp == 0`` and
``sol_ratio <= 1.15``); under the CPU interpreter, Pallas itself allocates
roughly one output-sized temp per kernel, so the bound loosens to one
interpreter artifact — still tight enough that reintroducing a dense HBM
intermediate (e.g. the round-1 RLE scatter+cumsum, ~3x decoded bytes)
fails the test on either backend.
"""

from __future__ import annotations

import numpy as np
import pytest

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.kernels.common import use_interpret
from giddy_tpu.roofline import traffic_audit
from giddy_tpu.util import GROUP

# Every registered single-column scheme with a device decoder.
from giddy_tpu.datagen import CORE_SCHEMES as SCHEMES  # single source of truth

# Compiled-TPU ceiling: traffic / (compressed + padded-out). See
# roofline.traffic_audit — a ratio r caps physical SoL at 1/r.
SOL_CAP = 1.15
# Interpreter temp allowance, in multiples of out_bytes: the CPU Pallas
# interpreter allocates artifact temps per kernel invocation (measured at
# this n: most schemes ~1x, delta/xordelta 2.0x, bitmap 5.0x, dzbv 7.1x,
# cascade 3.6x — the round-4 binary-search expansion's per-slice gathers
# materialize under the interpreter; the chip shows temp == 0).
# A genuine dense-HBM-intermediate regression adds >= 2x out on top of the
# scheme's baseline, so caps sit ~0.5-1x above the measured values.
INTERP_TEMP_CAP = {"delta": 2.6, "xordelta": 2.6, "bitmap": 6.0, "dzbv": 8.0,
                   "cascade": 4.5, "rle": 4.5, "rpe": 4.5}
INTERP_TEMP_CAP_DEFAULT = 2.0


@pytest.mark.parametrize("scheme", SCHEMES)
def test_traffic_single_pass(scheme):
    rng = np.random.default_rng(11)
    n = 8 * GROUP  # multi-group plan, no ragged tail
    col = gt.encode(gen_column(scheme, n, rng), scheme, name=f"audit_{scheme}")
    a = traffic_audit(col)
    if use_interpret():
        cap = INTERP_TEMP_CAP.get(scheme, INTERP_TEMP_CAP_DEFAULT)
        assert a["temp_bytes"] <= cap * a["out_bytes"], (
            f"{scheme}: interpreter temp {a['temp_bytes']} exceeds the "
            f"{cap}x-out allowance ({a['out_bytes']} out bytes) — an extra "
            f"decode pass over HBM crept in"
        )
    else:
        assert a["temp_bytes"] == 0, (
            f"{scheme}: compiled decoder allocates {a['temp_bytes']} temp "
            f"bytes — not single-pass"
        )
        assert a["sol_ratio"] <= SOL_CAP, (
            f"{scheme}: traffic is {a['sol_ratio']:.3f}x of compressed+decoded "
            f"(cap {SOL_CAP}) — prep inflation or dead stream uploads"
        )


def test_traffic_audit_reports_known_multipass():
    """The audit must actually *see* extra traffic: the dzbv XLA fallback
    (forced via a pathologically group-skewed column) is multi-pass by
    design, and its ratio must reflect that — guarding against the audit
    silently measuring the wrong program."""
    rng = np.random.default_rng(3)
    v = np.sort(gen_column("dzbv", 6 * GROUP, rng).view(np.uint32)).view(np.int32)
    col = gt.encode(v, "dzbv", name="audit_skew")
    streams = gt.api.device_streams(col)
    if "plane1" not in streams and "plane2" not in streams and "plane3" not in streams:
        pytest.skip("column not skewed enough to force the fallback")
    a = traffic_audit(col)
    assert a["temp_bytes"] > 0
    assert a["sol_ratio"] > SOL_CAP
