"""Test data generators — re-exported from the package (SURVEY.md §5.2)."""

from __future__ import annotations

from giddy_tpu.datagen import gen_column  # noqa: F401
from giddy_tpu.util import GROUP

EDGE_SIZES = [0, 1, 7, GROUP - 1, GROUP, GROUP + 1, 3 * GROUP + 17]
