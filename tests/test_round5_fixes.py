"""Semantics pins for the round-5 ADVICE fixes on handcrafted inputs
(peak_concurrency interior days, exact_global_rank's range-partitioned
form) — differential tests prove oracle equivalence on the fixtures;
these prove the fixed edge cases mean what the docstrings now say."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def test_peak_concurrency_emits_interior_days(spark):
    """ADVICE r4 (events.py peak_concurrency): a day lying strictly
    inside a multi-day session has no session endpoints, so the old
    endpoint-derived day axis dropped it even though its concurrency
    equals the carry. Reachable only with a gap larger than a day."""
    d = datetime
    ev = _events(
        spark,
        [
            # user 1: one session spanning Jan 1 .. Jan 4 (gap_min huge)
            (1, d(2024, 1, 1, 10, 0), 1, "a", 0.0, None),
            (2, d(2024, 1, 4, 10, 0), 1, "a", 0.0, None),
            # user 2: a plain session on Jan 1 only
            (3, d(2024, 1, 1, 10, 5), 2, "a", 0.0, None),
        ],
    )
    from dumbo_spark.operators.events import peak_concurrency

    got = {
        r["day"]: r["peak_concurrent"]
        for r in peak_concurrency(ev, gap_min=5 * 24 * 60).collect()
    }
    # Jan 2 / Jan 3 are interior days of user 1's session: no endpoints,
    # concurrency == carry == 1. Before the fix they were absent.
    assert got == {
        "2024-01-01": 2,
        "2024-01-02": 1,
        "2024-01-03": 1,
        "2024-01-04": 1,
    }


def test_peak_concurrency_default_gap_unchanged(spark):
    """The 30-min default-gap behavior (endpoint days == covered days)
    is unchanged by the day-axis fix."""
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 10, 0), 1, "a", 0.0, None),
            (2, d(2024, 1, 1, 10, 20), 1, "a", 0.0, None),
            (3, d(2024, 1, 1, 10, 10), 2, "a", 0.0, None),
        ],
    )
    from dumbo_spark.operators.events import peak_concurrency

    got = {r["day"]: r["peak_concurrent"] for r in peak_concurrency(ev).collect()}
    assert got == {"2024-01-01": 2}


def test_exact_global_rank_continuous_domain(spark):
    """ADVICE r4 (sampling.py exact_global_rank): the rank must be the
    exact dense total-order row number even when every value is
    distinct (continuous domain — the case where the old
    distinct-value-offsets broadcast was input-sized)."""
    from dumbo_spark.operators.sampling import exact_global_rank

    rows = [(i, float(1000 - i) + 0.5) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "k long, v double")
    ranked = exact_global_rank(df, "v", "k", ascending=True).collect()
    by_k = {r["k"]: r["_rank"] for r in ranked}
    # v descends as k ascends -> ascending v rank is reversed k order
    assert by_k[500] == 1 and by_k[1] == 500
    assert sorted(r["_rank"] for r in ranked) == list(range(1, 501))


def test_exact_global_rank_ties_and_desc(spark):
    from dumbo_spark.operators.sampling import exact_global_rank

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, 7.0), (4, 1.0)], "k long, v double"
    )
    got = {
        r["k"]: r["_rank"]
        for r in exact_global_rank(df, "v", "k", ascending=False).collect()
    }
    # desc: 7.0 first, then the 5.0 tie broken by k asc, then 1.0
    assert got == {3: 1, 1: 2, 2: 3, 4: 4}
