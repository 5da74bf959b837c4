"""Storage-layout lifecycle for a fact table: bucketed write for
shuffle-free joins, range-sorted export for pruned range scans, and
small-file compaction — the three layout contracts that amortize the
big shuffles a 100 TB warehouse would otherwise pay per query.

Run with the engine CLI:

    python -m dumbo_spark.cli run examples/warehouse_layout.py \
        --output /tmp/layout_report.parquet

Returns a one-row-per-layout report (files, co-location verdict) so
the effect of each layout is visible, not just asserted in tests.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.sources.bucketed import (
        colocated_join,
        write_bucketed,
        write_range_sorted,
    )
    from dumbo_spark.sources.catalog import load_table

    base = tempfile.mkdtemp(prefix="dumbo_spark_layout_")
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )

    # 1. hash co-location: pay the shuffle once at write time. Disable
    # auto-broadcast for the plan check: at fixture scale the planner
    # would (correctly) broadcast the small side, hiding the contract
    # this example demonstrates — at 100 TB neither side broadcasts.
    write_bucketed(orders, "wl_orders", "o_orderkey", 8, f"{base}/orders")
    write_bucketed(lineitem, "wl_lineitem", "o_orderkey", 8, f"{base}/lineitem")
    bcast_keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.autoBroadcastJoinThreshold",
    )
    old = {k: spark.conf.get(k, None) for k in bcast_keys}
    for k in bcast_keys:
        spark.conf.set(k, "-1")
    try:
        joined = colocated_join(spark, "wl_orders", "wl_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)

    # 2. range co-location: globally ordered files → footer-stats pruning
    write_range_sorted(orders, "o_totalprice", 8, f"{base}/orders_sorted")
    n_sorted_files = len(
        [f for f in spark.read.parquet(f"{base}/orders_sorted").inputFiles()]
    )

    report = [
        ("bucketed_join", len(joined.inputFiles()), "Exchange" not in plan),
        ("range_sorted", n_sorted_files, True),
    ]
    return spark.createDataFrame(
        report, "layout string, n_files int, colocated boolean"
    )
