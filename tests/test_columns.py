"""Container-level decode: many columns in one jitted program
(BASELINE configs[4] mixed-column shape)."""

import numpy as np

import giddy_tpu as gt
from giddy_tpu.datagen import gen_column
from giddy_tpu.util import GROUP


def test_decode_columns_matches_oracle():
    rng = np.random.default_rng(10)
    cols = [
        gt.encode(gen_column(s, GROUP + 31 * i, rng), s, name=f"c{i}_{s}")
        for i, s in enumerate(["nbit", "delta", "dict", "rle", "patched"])
    ]
    outs = gt.decode_columns(cols)
    assert set(outs) == {c.name for c in cols}
    for c in cols:
        np.testing.assert_array_equal(np.asarray(outs[c.name]), gt.decode_ref(c), err_msg=c.name)
