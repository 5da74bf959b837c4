"""Round-9 regression gate for the range-partitioned rank machinery
(VERDICT r8 "What's wrong" #1).

``topk.global_rank`` (and the sibling sweeps ``agg._weighted_cum_sweep``,
``agg.grouped_exact_percentiles``) consume one
``repartitionByRange + spark_partition_id`` subtree from TWO plan
branches (per-partition offsets + ranked data). ``repartitionByRange``
samples its boundaries per RDD instantiation, so whenever downstream
column pruning makes the two branches' exchanges differ, Catalyst's
ReuseExchange does NOT dedupe them, each branch samples boundaries
independently, and the offsets silently describe the wrong partitions
— the driver's sf0.01 `auc_roc_exact` / `calibration_bins` failures
(11 "deciles", non-permutation ranks).

These tests exercise exactly that plan shape — a rank/ntile whose
consumer keeps MORE columns than the offsets branch — at a row count
large enough (15k) for independent boundary samplings to diverge.
Every test here fails on the pre-fix code (verified: 5/5 corrupt
trials before the ``localCheckpoint(eager=False)`` pin, 0/5 after)
and must stay green forever after.

The sf0.01 differential block re-runs the full 19-query hazard class
against DuckDB at the driver's verification scale, because the default
sf0.001 suite is too small for the samplers to diverge (the r8 lesson:
four fully-green local runs coexisted with broken machinery).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dumbo_spark.operators.topk import global_ntile, global_rank

N_ROWS = 15000
TRIALS = 3  # pre-fix code failed 5/5 trials; 3 keeps runtime sane


def _scored(spark, n=N_ROWS):
    """Deterministic frame with enough rows for boundary divergence."""
    return (
        spark.range(n)
        .withColumn("score", (F.xxhash64("id") % 1000000) / F.lit(7.0))
        .withColumn("y", (F.xxhash64("id", F.lit(1)) % 2 == 0).cast("int"))
    )


def test_global_ntile_exact_buckets_under_pruning_divergence(spark):
    """NTILE(10) followed by an aggregate that keeps EXTRA columns
    (avg(score), sum(y)) — the calibration_bins shape that defeats
    ReuseExchange. Every bucket must hold exactly n/k rows, k buckets
    total, every trial."""
    df = _scored(spark)
    for trial in range(TRIALS):
        binned = global_ntile(df, [F.col("score").asc(), F.col("id").asc()], 10)
        rows = (
            binned.groupBy("ntile")
            .agg(
                F.count("*").alias("c"),
                F.avg("score").alias("a"),
                F.sum("y").alias("s"),
            )
            .collect()
        )
        sizes = sorted((r["ntile"], r["c"]) for r in rows)
        assert len(sizes) == 10, f"trial {trial}: {len(sizes)} buckets: {sizes}"
        assert all(c == N_ROWS // 10 for _, c in sizes), f"trial {trial}: {sizes}"


def test_global_rank_is_permutation_under_pruning_divergence(spark):
    """Rank consumed together with extra columns (the auc_roc_exact
    shape: a per-score aggregate over rank AND score AND label) must be
    an exact permutation of 1..n."""
    df = _scored(spark)
    for trial in range(TRIALS):
        ranked = global_rank(df, [F.col("score").asc(), F.col("id").asc()])
        agg = ranked.agg(
            F.count("*").alias("n"),
            F.countDistinct("_rank").alias("nd"),
            F.min("_rank").alias("lo"),
            F.max("_rank").alias("hi"),
            F.sum(F.col("_rank") * F.col("y")).alias("rank_dot_y"),
        ).collect()[0]
        assert (agg["n"], agg["nd"], agg["lo"], agg["hi"]) == (
            N_ROWS,
            N_ROWS,
            1,
            N_ROWS,
        ), f"trial {trial}: {agg}"


# --- sf0.01 differential over the full hazard class ------------------
# The 19 queries that ride the three spark_partition_id two-branch
# sites (VERDICT r8 hazard list + daily_value_percentiles, the
# grouped_exact_percentiles kin). sf0.001 cannot reproduce the bug
# class; the driver verifies at sf0.01, so this gate runs there too.

HAZARD_CLASS = [
    "auc_roc_exact",
    "calibration_bins",
    "theil_sen_trend",
    "decile_lift_table",
    "gini_revenue",
    "top_percent_customers",
    "source_quality_matrix",
    "quantile_transform",
    "vocab_coverage",
    "zipf_fit",
    "vocab_indexer",
    "ntile_quartiles",
    "bucketed_quartiles",
    "percent_rank_balance",
    "diversified_topk",
    "weighted_median_price",
    "weighted_price_quartiles",
    "bucketed_group_percentiles",
    "daily_value_percentiles",
]

SF001_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", HAZARD_CLASS)
def test_rank_family_differential_at_sf001(spark, name):
    if not os.path.isdir(SF001_DIR):
        pytest.skip("sf0.01 fixtures not present")
    from dumbo_spark.testing import run_differential

    res = run_differential(spark, SF001_DIR, name)
    assert res.ok, res.report()
