"""Run every example program end-to-end (the successor of dumbo's
tests/testexamples.py, which ran examples/*.py on the unix backend)."""

from __future__ import annotations

import glob
import importlib.util
import os

import pytest

EXAMPLES = sorted(
    glob.glob(os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples", "*.py"))
)


def _load(path: str):
    spec = importlib.util.spec_from_file_location(
        f"example_{os.path.basename(path)[:-3]}", path
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p) for p in EXAMPLES])
def test_example_runs(spark, path):
    mod = _load(path)
    df = mod.main(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) >= 2
