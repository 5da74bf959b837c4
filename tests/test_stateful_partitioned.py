"""Stateful streaming operator + partitioned/bucketed writer tests."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from dumbo_spark.sources import textio
from dumbo_spark.sources.catalog import load_table
from dumbo_spark.streaming.stateful import running_user_totals
from dumbo_spark.streaming.windows import read_events_stream


def test_running_user_totals_matches_batch(spark, sf_dir):
    stream = running_user_totals(read_events_stream(spark, sf_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("t_user_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # update mode may emit several rows per user; the last one wins
    got_df = spark.table("t_user_totals")
    got = {
        r.user_id: (r.total_events, r.total_value) for r in got_df.collect()
    }  # single batch => one row per user
    ev = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, r.total)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert set(got) == set(want)
    for uid, (n, total) in want.items():
        assert got[uid][0] == n
        assert abs(got[uid][1] - total) < 1e-6, uid


def test_write_partitioned_prunes(spark, sf_dir):
    d = tempfile.mkdtemp()
    out = os.path.join(d, "li")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_returnflag"
    )
    textio.write_partitioned(li, out, ["l_returnflag"])
    dirs = {n for n in os.listdir(out) if n.startswith("l_returnflag=")}
    assert dirs == {"l_returnflag=A", "l_returnflag=N", "l_returnflag=R"}
    back = spark.read.parquet(out).where(F.col("l_returnflag") == "A")
    assert back.count() == li.where("l_returnflag = 'A'").count()
    # partition pruning visible in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(l_returnflag" in plan


def test_write_bucketed_join_is_exchange_free(spark, sf_dir):
    import uuid

    tbl = f"li_bucketed_{uuid.uuid4().hex[:8]}"
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    textio.write_bucketed(li, tbl, ["l_orderkey"], n_buckets=8)
    try:
        a = spark.table(tbl)
        joined = a.alias("x").join(spark.table(tbl).alias("y"), "l_orderkey")
        from dumbo_spark.plans.explain import physical_summary

        s = physical_summary(joined)
        assert s["exchanges"] == 0, "bucketed self-join must not shuffle"
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
