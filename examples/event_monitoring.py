"""Event-stream monitoring rollup on the events fixture: z-score
anomaly screen → cohort retention matrix → inter-event cadence
profile, joined into one health report per event type.

Run with the engine CLI (writes parquet):

    python -m dumbo_spark.cli run examples/event_monitoring.py \
        --output /tmp/event_health.parquet

Every stage is a registered operator with a DuckDB oracle; this script
composes them the way an on-call analytics job would.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators import events
    from dumbo_spark.sources.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")

    # 1. outliers per event type (value_anomalies is per user+type;
    #    roll up to a per-type anomaly count)
    anomalies = (
        events.value_anomalies(ev)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_anomalies"))
    )

    # 2. cadence profile per event type (gap mean / p95)
    cadence = events.event_gap_stats(ev)

    # 3. day-0 cohort sizes as the activity denominator
    day0 = (
        events.user_retention(ev)
        .where(F.col("day_offset") == 0)
        .agg(F.sum("n_users").alias("n_users_day0"))
    )

    return (
        cadence.join(anomalies, "event_type", "left")
        .withColumn("n_anomalies", F.coalesce("n_anomalies", F.lit(0)))
        .crossJoin(F.broadcast(day0))
    )
