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


def test_comparator_is_dtype_faithful():
    """Integral floats must NOT compare equal to ints (round-3 lesson:
    DuckDB SUM(BIGINT)->HUGEINT lands in pandas as float64; Spark emits
    int64; Python's 500.0 == 500 hid the divergence locally while the
    driver's type-sensitive value-hash failed it)."""
    import pandas as pd

    from dumbo_spark.testing import compare_frames

    spark_pdf = pd.DataFrame({"k": [1, 2], "n": pd.array([500, 7], dtype="int64")})
    # what an uncast HUGEINT oracle column looks like after fetch_df
    duck_pdf = pd.DataFrame({"k": [1, 2], "n": pd.array([500.0, 7.0], dtype="float64")})
    assert not compare_frames("hugeint", spark_pdf, duck_pdf).ok
    # identical dtypes still pass
    assert compare_frames("same", spark_pdf, spark_pdf.copy()).ok
    # float-vs-float with -0.0 normalization still passes
    a = pd.DataFrame({"x": [0.0, 1.5]})
    b = pd.DataFrame({"x": [-0.0, 1.5]})
    assert compare_frames("negzero", a, b).ok
