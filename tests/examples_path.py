"""Import helper: load a script from examples/ as a module."""

from __future__ import annotations

import importlib.util
import pathlib


def load_example(name: str):
    path = pathlib.Path(__file__).parent.parent / "examples" / f"{name}.py"
    spec = importlib.util.spec_from_file_location(f"examples.{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod
