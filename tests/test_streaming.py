"""Structured Streaming twins must agree with their batch forms over
the same fixture data (availableNow → memory sink → compare)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumbo_spark.operators import events as batch_events
from dumbo_spark.sources.catalog import load_table
from dumbo_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    sessionized_stream,
    tumbling_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = tumbling_stream(read_events_stream(spark, sf_dir))
    got = run_to_memory(spark, stream, "t_tumbling")
    want = batch_events.events_tumbling_1h(load_table(spark, sf_dir, "events"))
    cols = ["window_start", "event_type", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_checkpoint_resume_exactly_once(spark, sf_dir):
    """File-source offsets live in the checkpoint: a resumed query
    processes ONLY newly-arrived files — no reprocessing, no
    duplicates. This is the property that makes an incremental 100 TB
    ingest pipeline idempotent across restarts."""
    import os
    import tempfile

    base = tempfile.mkdtemp(prefix="ckpt_resume_")
    src, ckpt, out = (os.path.join(base, d) for d in ("src", "ckpt", "out"))
    os.makedirs(src)

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    n_total = ev.count()
    half = ev.where(F.col("event_id") % 2 == 0)
    rest = ev.where(F.col("event_id") % 2 == 1)
    half.write.mode("overwrite").parquet(os.path.join(src, "f1.parquet"))

    def run_once():
        stream = spark.readStream.schema(half.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(f"{src}/*")
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out).count()
    assert n1 == half.count()

    rest.write.mode("overwrite").parquet(os.path.join(src, "f2.parquet"))
    run_once()  # resume from checkpoint: must add ONLY f2's rows
    final = spark.read.parquet(out)
    assert final.count() == n_total
    # no duplicates: every event_id exactly once
    assert final.select("event_id").distinct().count() == n_total


def test_stream_dedup_drops_replayed_events(spark, sf_dir):
    """A source delivering every event twice → output has each
    event_id exactly once (bounded-state streaming dedup)."""
    import os
    import tempfile

    from dumbo_spark.streaming.dedup import dedup_stream

    base = tempfile.mkdtemp(prefix="stream_dedup_")
    src = os.path.join(base, "src")
    os.makedirs(src)
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    # simulate an at-least-once source: every event delivered twice
    ev.unionByName(ev).write.mode("overwrite").parquet(os.path.join(src, "f1.parquet"))

    schema = ev.schema
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    out = dedup_stream(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_dedup_stream")
    assert got.count() == n
    assert got.select("event_id").distinct().count() == n


def test_stream_static_enrichment(spark, sf_dir):
    from dumbo_spark.streaming.dedup import enrich_stream

    stream = read_events_stream(spark, sf_dir)
    enriched = enrich_stream(stream, load_table(spark, sf_dir, "customer"))
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("t_enriched")
    ev = load_table(spark, sf_dir, "events")
    assert got.count() == ev.count()
    # users that exist in the dim got names; user_id 0 has no c_custkey 0 match
    matched = got.where(F.col("c_name").isNotNull()).count()
    assert matched > 0


def test_sessionized_stream_matches_batch(spark, sf_dir):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    got = run_to_memory(spark, stream, "t_sessions")
    want = batch_events.events_sessionized(load_table(spark, sf_dir, "events"))
    cols = ["user_id", "session_start_us", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir):
    """Dual-watermark stream-stream join over the fixture replay must
    equal the identical interval join on the static frames."""
    from dumbo_spark.streaming.windows import click_purchase_stream_join

    ev_stream = read_events_stream(spark, sf_dir)
    clicks_s = ev_stream.where(F.col("event_type") == "click")
    purch_s = ev_stream.where(F.col("event_type") == "purchase")
    got = run_to_memory(
        spark, click_purchase_stream_join(clicks_s, purch_s), "t_ssjoin", mode="append"
    )

    ev = load_table(spark, sf_dir, "events")
    want = click_purchase_stream_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )
    cols = ["user_id", "click_id", "purchase_id", "lag_us"]
    assert len(got.collect()) > 0, "fixture must produce at least one attribution"
    assert _rows(got, cols) == _rows(want, cols)


def test_attribution_dedup_matches_outer_despite_redelivery(spark, sf_dir):
    """The at-least-once replay (every purchase half delivered twice)
    through dropDuplicatesWithinWatermark + outer interval join must
    settle to the same rows as the exactly-once outer runner."""
    from dumbo_spark.streaming.runners import streaming_attribution_dedup

    out = streaming_attribution_dedup(spark, sf_dir)
    # no duplicate attribution rows despite double delivery
    assert out.count() == out.dropDuplicates(["click_id", "purchase_id"]).count()
    # every click surfaces exactly as in the batch left join
    from dumbo_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").count()
    assert out.select("click_id").distinct().count() == clicks
