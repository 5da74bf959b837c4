"""Semantics pins for the round-4 batch-2 operators on handcrafted
inputs (gapfill / regression / winsorize / canonical / incremental /
vocab growth) — differential tests prove oracle equivalence on the
fixtures; these prove the operators mean what their docstrings say."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_gapfill_fills_missing_days_locf(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 5), 1, "a", 10.0),
            (2, d(2024, 1, 1, 9), 1, "a", 11.0),  # later same day wins
            (3, d(2024, 1, 4, 5), 1, "a", 40.0),  # 2-day gap before this
        ],
    )
    from dumbo_spark.operators.events import timeseries_gapfill

    rows = {r["day"]: r for r in timeseries_gapfill(ev).collect()}
    assert sorted(rows) == ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"]
    assert rows["2024-01-01"]["value_filled"] == 11.0  # last-of-day
    assert rows["2024-01-02"]["value_filled"] == 11.0  # forward-filled
    assert rows["2024-01-02"]["is_observed"] is False
    assert rows["2024-01-03"]["value_filled"] == 11.0
    assert rows["2024-01-04"]["value_filled"] == 40.0
    assert rows["2024-01-04"]["is_observed"] is True


def test_gapfill_grid_is_per_user(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1), 1, "a", 1.0),
            (2, d(2024, 1, 3), 1, "a", 3.0),
            (3, d(2024, 2, 10), 2, "a", 9.0),  # user 2: single day, no fill
        ],
    )
    from dumbo_spark.operators.events import timeseries_gapfill

    out = timeseries_gapfill(ev).collect()
    u1 = sorted(r["day"] for r in out if r["user_id"] == 1)
    u2 = sorted(r["day"] for r in out if r["user_id"] == 2)
    assert u1 == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert u2 == ["2024-02-10"]


def test_group_regression_recovers_exact_line(spark):
    # y = 2x + 5 on days 0..4 from epoch day of 2024-01-01
    d0 = datetime(2024, 1, 1)
    base = (d0 - datetime(1970, 1, 1)).days
    rows = [
        (i, datetime(2024, 1, 1 + i, 12), 1, "lin", float(2 * (base + i) + 5))
        for i in range(5)
    ]
    from dumbo_spark.operators.events import group_regression

    got = group_regression(_events(spark, rows)).collect()[0]
    assert got["n_points"] == 5
    assert got["slope"] == 2.0
    assert got["intercept"] == 5.0
    assert got["r2"] == 1.0


def test_winsorized_stats_clips_outliers(spark):
    # 20 rows of 100.00 and one 1e6 outlier: winsor mean must sit near
    # 100, the plain mean would be ~47719
    rows = [(1, 1, 1, 1, 1.0, 100.0, 0.0, 0.0, "A", "O", datetime(1995, 1, 1))
            for _ in range(20)]
    rows.append((1, 1, 1, 1, 1.0, 1_000_000.0, 0.0, 0.0, "A", "O", datetime(1995, 1, 1)))
    li = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    from dumbo_spark.operators.agg import winsorized_stats

    got = winsorized_stats(li).collect()[0]
    assert got["n_rows"] == 21
    assert got["n_clipped_hi"] == 1
    assert got["clip_lo"] == 100.0
    # p95 interpolates between 100 and 1e6; the clipped mean stays far
    # below the raw mean and at/above 100
    assert 100.0 <= got["winsor_mean"] < 47719.0


def test_canonical_keeps_longest_doc(spark):
    text = "alpha beta gamma delta epsilon zeta eta theta"
    docs = _docs(
        spark,
        [
            (1, text, "en", "s", 40),
            (2, text + " iota", "en", "s", 45),  # same prefix, longer
            (3, "totally different words entirely here now", "en", "s", 41),
        ],
    )
    from dumbo_spark.operators.dedup import canonical_per_cluster

    out = canonical_per_cluster(docs).collect()
    assert len(out) == 1  # docs 1+2 cluster; doc 3 is a singleton (dropped)
    row = out[0]
    assert row["n_members"] == 2
    assert row["canonical_doc"] == 2  # longer doc wins
    assert row["n_dropped"] == 1


def test_incremental_dedup_admits_only_novel(spark):
    corpus = _docs(spark, [(1, "old news here", "en", "src1", 13)])
    batch = _docs(
        spark,
        [
            (10, "Old   NEWS here", "en", "src0", 15),  # normalizes to corpus dup
            (11, "fresh content", "en", "src0", 13),
            (12, "fresh  content!", "en", "src0", 15),  # in-batch dup of 11
        ],
    )
    from dumbo_spark.operators.dedup import incremental_dedup

    out = incremental_dedup(corpus, batch).collect()
    assert len(out) == 1
    assert out[0]["admit_id"] == 11  # first doc_id wins
    assert out[0]["n_in_batch"] == 2


def test_vocab_growth_cumulative(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c", "en", "s", 5),
            (1, "a b d", "en", "s", 5),  # one new token
            (2, "a b", "en", "s", 3),    # nothing new
            (3, "e", "en", "s", 1),
        ],
    )
    from dumbo_spark.operators.textstats import vocab_growth

    rows = {r["bucket"]: r for r in vocab_growth(docs, bucket_size=1).collect()}
    assert rows[0]["new_tokens"] == 3 and rows[0]["cum_vocab"] == 3
    assert rows[1]["new_tokens"] == 1 and rows[1]["cum_vocab"] == 4
    assert 2 not in rows  # empty buckets don't emit
    assert rows[3]["new_tokens"] == 1 and rows[3]["cum_vocab"] == 5


def test_scd2_collapses_consecutive_states(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 0), 1, "view", 0.0),
            (2, d(2024, 1, 1, 1), 1, "view", 0.0),   # same state, collapses
            (3, d(2024, 1, 1, 2), 1, "click", 0.0),
            (4, d(2024, 1, 1, 3), 1, "view", 0.0),   # state returns: NEW interval
        ],
    )
    from dumbo_spark.operators.events import scd2_state_intervals

    rows = sorted(
        scd2_state_intervals(ev).collect(), key=lambda r: r["valid_from_us"]
    )
    assert [r["state"] for r in rows] == ["view", "click", "view"]
    assert rows[0]["n_events"] == 2
    assert rows[0]["valid_to_us"] == rows[1]["valid_from_us"]  # contiguous
    assert rows[1]["valid_to_us"] == rows[2]["valid_from_us"]
    assert rows[2]["valid_to_us"] is None and rows[2]["is_current"] is True
    assert rows[0]["is_current"] is False


def test_dau_wau_stickiness_semantics(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1), 1, "a", 0.0),
            (2, d(2024, 1, 1), 2, "a", 0.0),
            (3, d(2024, 1, 5), 1, "a", 0.0),   # user 1 returns within 7d
            (4, d(2024, 1, 20), 3, "a", 0.0),  # isolated day
        ],
    )
    from dumbo_spark.operators.events import dau_wau_stickiness

    rows = {r["day"]: r for r in dau_wau_stickiness(ev).collect()}
    assert set(rows) == {"2024-01-01", "2024-01-05", "2024-01-20"}
    assert rows["2024-01-01"]["dau"] == 2 and rows["2024-01-01"]["wau"] == 2
    # Jan 5 window [Dec 30, Jan 5] holds users 1 and 2 (both active Jan 1)
    assert rows["2024-01-05"]["dau"] == 1 and rows["2024-01-05"]["wau"] == 2
    assert rows["2024-01-05"]["stickiness"] == 0.5
    assert rows["2024-01-20"]["dau"] == 1 and rows["2024-01-20"]["wau"] == 1


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0)], "k long, v double"
    )
    new = spark.createDataFrame(
        [(1, 10.0), (1, 20.0), (2, 5.0), (2, 7.0), (3, 1.0)], "k long, v double"
    )
    from dumbo_spark.operators.setops import snapshot_diff

    got = {r["status"]: r for r in snapshot_diff(old, new, "k", "v").collect()}
    assert got["unchanged"]["n_keys"] == 1          # key 1
    assert got["changed"]["n_keys"] == 1            # key 2 gained a row
    assert got["added"]["n_keys"] == 1              # key 3
    assert got["added"]["row_delta"] == 1
    assert got["changed"]["row_delta"] == 1
    assert "removed" not in got


def test_pareto_concentration_topheavy(spark):
    # nation 0: one whale (80 of 100 revenue) -> top80 needs 1 of 3
    cust = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "c_custkey long, c_nationkey long"
    )
    orders = spark.createDataFrame(
        [(1, 80.0), (2, 10.0), (3, 10.0)], "o_custkey long, o_totalprice double"
    )
    nation = spark.createDataFrame([(0, "A")], "n_nationkey long, n_name string")
    from dumbo_spark.operators.analytics import pareto_concentration

    row = pareto_concentration(cust, orders, nation).collect()[0]
    assert row["n_customers"] == 3
    assert row["n_top80"] == 1
    assert abs(row["top80_share"] - 0.3333) < 1e-9


def test_bounce_rate_counts_single_event_sessions(spark):
    d = datetime
    ev = _events(
        spark,
        [
            (1, d(2024, 1, 1, 0, 0), 1, "a", 0.0),   # session A: 2 events
            (2, d(2024, 1, 1, 0, 10), 1, "a", 0.0),
            (3, d(2024, 1, 1, 9, 0), 1, "a", 0.0),   # session B: bounce
            (4, d(2024, 1, 2, 0, 0), 2, "a", 0.0),   # session C: bounce
        ],
    )
    from dumbo_spark.operators.events import bounce_rate

    rows = {r["day"]: r for r in bounce_rate(ev).collect()}
    assert rows["2024-01-01"]["n_sessions"] == 2
    assert rows["2024-01-01"]["n_bounces"] == 1
    assert rows["2024-01-01"]["bounce_rate"] == 0.5
    assert rows["2024-01-02"]["bounce_rate"] == 1.0
