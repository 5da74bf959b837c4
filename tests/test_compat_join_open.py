"""Open-mapper (P2) and JoinReducer (L11) compat tests, plus
hypothesis property tests (the upgrade over dumbo's example-only test
strategy — SURVEY §5.1 'what's absent')."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dumbo_spark.compat.mapred import join_reduce, map_open, map_reduce


def test_map_open_partition_state(spark):
    """The open mapper sees the whole iterator: running index per
    partition (dumbo's setup/teardown + cross-record state use case)."""
    df = spark.createDataFrame(
        [("a", "1"), ("b", "2"), ("c", "3")], "key string, value string"
    ).coalesce(1)

    def numbered(records):
        for i, (k, v) in enumerate(records):
            yield (f"{k}#{i}", float(v))

    got = sorted(
        (r.key, r.value)
        for r in map_open(df, numbered, "key string, value double").collect()
    )
    assert got == [("a#0", 1.0), ("b#1", 2.0), ("c#2", 3.0)]


def test_join_reduce_inner_semantics(spark):
    """examples/join.py: hostnames (primary) ⋈ log counts (secondary);
    primary values arrive first (stash), secondary streamed."""
    hostnames = spark.createDataFrame(
        [("10.0.0.1", "alpha"), ("10.0.0.2", "beta")], "key string, value string"
    )
    counts = spark.createDataFrame(
        [("10.0.0.1", "3"), ("10.0.0.1", "2"), ("10.0.0.3", "9")],
        "key string, value string",
    )

    def join_counts(key, prim, sec):
        if prim:  # inner: skip keys with no primary (dumbo's JoinReducer default)
            host = prim[0]
            for c in sec:
                yield (host, float(c))

    got = sorted(
        (r.key, r.value)
        for r in join_reduce(hostnames, counts, join_counts).collect()
    )
    assert got == [("alpha", 2.0), ("alpha", 3.0)]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    lines=st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "dd", "eee"]), max_size=6),
        min_size=0,
        max_size=8,
    )
)
def test_property_veneer_equals_dataframe_wordcount(spark, lines):
    """Property: the compat veneer and the native DataFrame pipeline
    compute identical wordcounts on arbitrary inputs."""
    rows = [(str(i), " ".join(ws)) for i, ws in enumerate(lines)]
    if not rows:
        return
    df = spark.createDataFrame(rows, "key string, value string")

    def mapper(k, v):
        for w in v.split():
            yield (w, 1.0)

    def reducer(k, vals):
        yield (k, float(sum(vals)))

    veneer = {
        (r.key, int(r.value))
        for r in map_reduce(df, mapper, reducer, combiner=reducer).collect()
    }
    from pyspark.sql import functions as F

    native = {
        (r.word, r.cnt)
        for r in df.select(F.explode(F.split("value", " ")).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert veneer == native


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=7200), min_size=1, max_size=20)
)
def test_property_sessionization_island_count(spark, gaps):
    """Property: number of sessions == 1 + (# gaps > threshold), for
    any event spacing (exact-boundary gaps excluded by generation —
    the islands form uses strict >)."""
    from dumbo_spark.operators.events import events_sessionized

    ts0 = 1_700_000_000_000_000  # epoch µs
    cur = ts0
    rows, expected_sessions = [], 1
    for i, g in enumerate(gaps):
        if g == 1800:
            g = 1801
        cur += g * 1_000_000
        if g > 1800:
            expected_sessions += 1
        rows.append((i + 1, cur, 7, "click", 1.0, "{}"))
    rows.insert(0, (0, ts0, 7, "click", 1.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts_us long, user_id long, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "timestamp_micros(ts_us) as ts", "user_id", "event_type", "value", "props"
    )
    got = events_sessionized(df).count()
    assert got == expected_sessions
