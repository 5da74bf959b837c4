"""Skew-path tests (SURVEY §7.3#2, FIXTURES.md §C 'one heavily skewed
group'): correctness of the salted top-k and AQE-planned join on data
where one key carries ~99% of rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumbo_spark.operators import topk


def _skewed(spark, hot_rows=50_000, cold_keys=20):
    hot = spark.range(hot_rows).select(
        F.lit("HOT").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    cold = spark.range(cold_keys).select(
        F.concat(F.lit("c"), F.col("id")).alias("grp"),
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_topk_correct_under_skew(spark):
    df = _skewed(spark)
    got = topk.salted_topk_per_group(df, "grp", "v", k=3)
    hot_top = sorted(
        (r.v for r in got.where(F.col("grp") == "HOT").collect()), reverse=True
    )
    assert hot_top == [996.0, 996.0, 996.0]  # max v repeats every 997
    assert got.where(F.col("grp") == "c5").count() == 1  # single-row groups survive


def test_skewed_join_correct(spark):
    """Fact⋈dim where 99% of fact rows hit one key — AQE skew handling
    is posture; the assertion is exact row preservation."""
    fact = _skewed(spark).select("grp", "v")
    dim = fact.select("grp").distinct().withColumn("tag", F.length("grp"))
    joined = fact.join(dim, "grp")
    assert joined.count() == fact.count()
    assert joined.where(F.col("tag").isNull()).count() == 0