"""Identity scheme — device decoder (FORMAT.md §1.12)."""

from __future__ import annotations

from .. import registry
from ..format import EncodedColumn


def build(col: EncodedColumn):
    def decode(streams):
        return streams["data"].reshape(-1)

    return decode


registry.register_device("raw", build)
