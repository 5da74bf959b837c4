"""Differential oracle: every registered query with an oracle must match
DuckDB bit-exactly (SURVEY.md §5.2 item 1 — the driver's t2 gate,
reproduced locally and stricter)."""

from __future__ import annotations

import pytest

from dumbo_spark import registry
from dumbo_spark.testing import run_differential


def _names() -> list[str]:
    return sorted(registry.QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    res = run_differential(spark, sf_dir, name)
    assert res.ok, res.report()
    if registry.QUERIES[name].oracle is not None:
        assert res.spark_rows == res.oracle_rows
    assert res.spark_rows >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    # driver contract: every oracle key corresponds to a query
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
