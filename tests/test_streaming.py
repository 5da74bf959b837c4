"""Structured Streaming twins must agree with their batch forms over
the same fixture data (availableNow → memory sink → compare)."""

from __future__ import annotations

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


def test_sessionized_stream_matches_batch(spark, sf_dir):
    stream = sessionized_stream(read_events_stream(spark, sf_dir))
    got = run_to_memory(spark, stream, "t_sessions")
    want = batch_events.events_sessionized(load_table(spark, sf_dir, "events"))
    cols = ["user_id", "session_start_us", "n_events", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)
