"""API.md freshness: the committed index must equal what
scripts/gen_api.py generates from the current source (VERDICT r7 #8 —
a generated API doc that can't drift)."""

from __future__ import annotations

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_api_md_is_fresh():
    spec = importlib.util.spec_from_file_location(
        "gen_api", os.path.join(ROOT, "scripts", "gen_api.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    want = mod.build()
    with open(os.path.join(ROOT, "API.md")) as f:
        got = f.read()
    assert got == want, (
        "API.md is stale — regenerate: python scripts/gen_api.py"
    )
