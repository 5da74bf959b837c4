"""Bucketed-table co-location: the join plan must contain NO shuffle
exchange on either side, and results must equal the plain shuffled
join — the pay-once layout contract (sources/bucketed.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumbo_spark.sources.bucketed import colocated_join, write_bucketed
from dumbo_spark.sources.catalog import load_table


def _no_broadcast(spark):
    """At fixture scale the planner would (correctly) broadcast the
    small side and skip bucketed reads entirely; pin the 100 TB shape —
    both sides too big to broadcast — to expose the bucket contract."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        keys = [
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        ]
        old = {k: spark.conf.get(k, None) for k in keys}
        for k in keys:
            spark.conf.set(k, "-1")
        try:
            yield
        finally:
            for k, v in old.items():
                if v is not None:
                    spark.conf.set(k, v)

    return ctx()


def test_bucketed_join_has_no_exchange_and_matches(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "t_orders_b", "o_orderkey", 8, str(tmp_path / "o"))
    write_bucketed(lineitem, "t_lineitem_b", "o_orderkey", 8, str(tmp_path / "l"))

    with _no_broadcast(spark):
        joined = colocated_join(spark, "t_orders_b", "t_lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert "SortMergeJoin" in plan, plan  # bucket-i merges bucket-i

    got = joined.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    want = (
        orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted((r["o_orderstatus"], r["n"]) for r in got) == sorted(
        (r["o_orderstatus"], r["n"]) for r in want
    )


def test_bucketed_single_table_agg_skips_shuffle(spark, sf_dir, tmp_path):
    """groupBy on the bucket key of one bucketed table also needs no
    exchange — bucketing satisfies the aggregation's distribution."""
    orders = load_table(spark, sf_dir, "orders")
    write_bucketed(orders, "t_orders_b2", "o_orderkey", 8, str(tmp_path / "o2"))
    df = (
        orders.sparkSession.table("t_orders_b2")
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_range_sorted_export_is_globally_ordered(spark, sf_dir, tmp_path):
    """write_range_sorted: per-file key ranges must be disjoint and
    ordered (file i max <= file i+1 min), rows preserved."""
    import glob

    from dumbo_spark.sources.bucketed import write_range_sorted

    orders = load_table(spark, sf_dir, "orders")
    dst = str(tmp_path / "sorted")
    write_range_sorted(orders, "o_totalprice", 8, dst)

    back = spark.read.parquet(dst)
    assert back.count() == orders.count()

    ranges = []
    for f in glob.glob(f"{dst}/part-*.parquet"):
        stats = (
            spark.read.parquet(f)
            .agg(F.min("o_totalprice"), F.max("o_totalprice"))
            .collect()[0]
        )
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    assert len(ranges) > 1  # actually split
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert lo_a <= hi_a <= lo_b  # sorted within, disjoint across
