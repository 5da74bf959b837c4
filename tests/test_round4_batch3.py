"""Semantics pins for the round-4 batch-3 operators on handcrafted
inputs (packing, heavy hitters, Q11/Q15 shapes) — the differential
suite proves oracle equivalence on the fixtures; these prove the
operators mean what their docstrings say."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from dumbo_spark.operators import analytics, packing, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_sequence_packing_equal_docs(spark):
    # 6 docs of exactly 4 tokens each, one source, one bucket, budget 8:
    # the concatenated stream is 24 tokens -> packs of exactly 2 docs,
    # regardless of the (hash-determined) permutation order.
    d = _docs(spark, [(i, "s", "w x y z") for i in range(6)])
    out = packing.sequence_packing(d, budget=8, buckets=1).collect()
    assert len(out) == 3
    assert {r["pack_id"] for r in out} == {0, 1, 2}
    assert all(r["n_docs"] == 2 and r["pack_tokens"] == 8 for r in out)


def test_token_budget_sample_crosses_budget_once(spark):
    # equal 4-token docs, budget 10: keep docs starting at offsets
    # 0, 4, 8 (the third CROSSES the budget) and stop -> exactly 3 per
    # source whatever the permutation order.
    rows = [(i, "s1", "a b c d") for i in range(6)] + [
        (100 + i, "s2", "a b c d") for i in range(6)
    ]
    d = _docs(spark, rows)
    for buckets in (1, 3):
        out = packing.token_budget_sample(d, budget=10, buckets=buckets).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        assert {s: len(v) for s, v in by_src.items()} == {"s1": 3, "s2": 3}
        assert max(r["cum_tokens"] for r in out) == 12


def test_token_budget_sample_two_phase_matches_naive_window(spark, sf_dir):
    # the two-phase prefix sum must equal the naive single global
    # window over (bucket, md5, doc_id) — the oracle's spec — on real
    # fixture data.
    from pyspark.sql import Window

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["doc_id"], r["cum_tokens"])
        for r in packing.token_budget_sample(docs, budget=600, buckets=8).collect()
    }
    perm = packing._doc_perm(docs, 8)
    w = Window.partitionBy("source").orderBy("bucket", "_k", "doc_id")
    naive = (
        perm.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") - F.col("n_tokens") < 600)
        .select("doc_id", "cum_tokens")
    )
    assert got == {(r["doc_id"], r["cum_tokens"]) for r in naive.collect()}


def test_heavy_hitters_integer_cut(spark):
    d = _docs(spark, [(1, "s", "a a a a b b c")])
    out = textstats.heavy_hitter_tokens(d, k=2).collect()  # cnt*2 >= 7
    assert [(r["word"], r["cnt"]) for r in out] == [("a", 4)]
    assert out[0]["ppm"] == round(1_000_000.0 * 4 / 7, 2)


def _lineitem(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp",
    )


def test_revenue_share_parts_threshold(spark):
    li = _lineitem(
        spark,
        [
            (1, 1, 100.0, 0.0, datetime(1996, 2, 1)),
            (2, 1, 10.0, 0.0, datetime(1996, 2, 1)),
            (3, 1, 1.0, 0.0, datetime(1996, 2, 1)),
        ],
    )
    # threshold 5% of 111: parts 1 (90%) and 2 (9%) pass, 3 (0.9%) not
    out = analytics.revenue_share_parts(li, threshold_bp=500).collect()
    assert {r["l_partkey"] for r in out} == {1, 2}
    shares = {r["l_partkey"]: r["share_bp"] for r in out}
    assert shares[1] == round(100.0 / 111.0 * 10000.0, 4)


def test_top_supplier_revenue_window_and_ties(spark):
    sup = spark.createDataFrame(
        [(1, "alpha", 0, 0.0), (2, "beta", 0, 0.0), (3, "gamma", 0, 0.0)],
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double",
    )
    li = _lineitem(
        spark,
        [
            # in-window: suppliers 1 and 2 tie at 50.0; supplier 3 below
            (1, 1, 50.0, 0.0, datetime(1996, 2, 1)),
            (2, 2, 50.0, 0.0, datetime(1996, 3, 1)),
            (3, 3, 10.0, 0.0, datetime(1996, 2, 1)),
            # out-of-window revenue must not count
            (4, 3, 999.0, 0.0, datetime(1995, 1, 1)),
        ],
    )
    out = analytics.top_supplier_revenue(li, sup).collect()
    assert {(r["s_suppkey"], r["total_revenue"]) for r in out} == {
        (1, 50.0),
        (2, 50.0),
    }


def test_resize_integer_scaling(spark):
    from dumbo_spark.operators import multimodal

    d = _docs(spark, [(1, "s", "hello world")])
    out = multimodal.resize_images(multimodal.attach_binary(d), max_dim=128).collect()
    (r,) = out
    longer = max(r["orig_width"], r["orig_height"])
    if longer <= 128:
        assert (r["width"], r["height"]) == (r["orig_width"], r["orig_height"])
    else:
        assert r["width"] == r["orig_width"] * 128 // longer
        assert r["height"] == r["orig_height"] * 128 // longer
        assert max(r["width"], r["height"]) == 128


def test_frame_sample_offsets_even_and_bounded(spark):
    from dumbo_spark.operators import multimodal

    d = _docs(spark, [(1, "s", "a"), (2, "s", "b c d")])
    out = multimodal.frame_sample(d, k=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["frame_idx"])
        assert [r["frame_idx"] for r in rows] == [0, 1, 2, 3]
        dur = rows[0]["duration_ms"]
        assert 1000 <= dur < 60000
        assert [r["offset_ms"] for r in rows] == [dur * i // 4 for i in range(4)]


def test_position_attribution_credit_shapes(spark):
    ev = spark.createDataFrame(
        [
            # user 1: three clicks then purchase -> 0.4 / 0.2 / 0.4
            (1, datetime(2024, 1, 1, 10, 0), 1, "click", 0.0, None),
            (2, datetime(2024, 1, 1, 10, 5), 1, "click", 0.0, None),
            (3, datetime(2024, 1, 1, 10, 10), 1, "click", 0.0, None),
            (4, datetime(2024, 1, 1, 10, 20), 1, "purchase", 9.0, None),
            # user 2: single click -> 1.0
            (5, datetime(2024, 1, 1, 11, 0), 2, "click", 0.0, None),
            (6, datetime(2024, 1, 1, 11, 10), 2, "purchase", 9.0, None),
            # user 3: two clicks -> 0.5 each; one click outside 30min window
            (7, datetime(2024, 1, 1, 8, 0), 3, "click", 0.0, None),
            (8, datetime(2024, 1, 1, 12, 0), 3, "click", 0.0, None),
            (9, datetime(2024, 1, 1, 12, 10), 3, "click", 0.0, None),
            (10, datetime(2024, 1, 1, 12, 20), 3, "purchase", 9.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.temporal import position_attribution

    out = position_attribution(ev, window_minutes=30).collect()
    by_p = {}
    for r in out:
        by_p.setdefault(r["purchase_id"], {})[r["click_id"]] = r["credit"]
    assert by_p[4] == {1: 0.4, 2: 0.2, 3: 0.4}
    assert by_p[6] == {5: 1.0}
    assert by_p[10] == {8: 0.5, 9: 0.5}  # click 7 is outside the window


def test_dq_expectations_planted_violations(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, datetime(2024, 1, 1), "1-URGENT"),
            (1, 10, "O", 50.0, datetime(2024, 1, 2), "1-URGENT"),  # dup key
            (2, 999, "O", -5.0, None, "1-URGENT"),  # orphan, negative, null date
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    customer = spark.createDataFrame([(10,)], "c_custkey long")
    lineitem = spark.createDataFrame(
        [(1, 99.0, 0.9), (7, 10.0, 0.1)],  # orderkey 7 orphan; qty 99; disc 0.9
        "l_orderkey long, l_quantity double, l_discount double",
    )
    from dumbo_spark.operators.dq import dq_expectations

    got = {
        r["rule"]: r["n_violations"]
        for r in dq_expectations(orders, customer, lineitem).collect()
    }
    assert got == {
        "o_totalprice_nonpositive": 1,
        "o_orderdate_null": 1,
        "o_orderkey_duplicate": 1,
        "l_quantity_out_of_range": 1,
        "l_discount_out_of_range": 1,
        "orders_orphan_custkey": 1,
        "lineitem_orphan_orderkey": 1,
    }


def test_discount_band_revenue_predicates(spark):
    rows = [
        # in band: counted
        (1, 1, 100.0, 0.03, datetime(1996, 6, 1)),
        # each predicate violated once
        (2, 1, 100.0, 0.03, datetime(1995, 6, 1)),   # year
        (3, 1, 100.0, 0.05, datetime(1996, 6, 1)),   # discount high
        (4, 1, 100.0, 0.01, datetime(1996, 6, 1)),   # discount low
    ]
    li = spark.createDataFrame(
        [(k, s, p, d, t, 10.0) for (k, s, p, d, t) in rows],
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp, l_quantity double",
    )
    out = analytics.discount_band_revenue(li).collect()[0]
    assert out["n_items"] == 1
    assert out["potential_revenue"] == 3.0  # 100 * 0.03


def test_centroid_affinity_orthogonal_and_identical(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.0], 0),
            (3, [0.0, 1.0], 1),
            (4, [1.0, 0.0], 2),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    from dumbo_spark.operators.similarity import centroid_affinity

    got = {
        (r["label_a"], r["label_b"]): r["cos_sim"]
        for r in centroid_affinity(emb).collect()
    }
    assert got[(0, 1)] == 0.0
    assert got[(0, 2)] == 1.0
    assert got[(1, 2)] == 0.0


def test_session_path_order_exact(spark):
    ev = spark.createDataFrame(
        [
            # one session, 4 events: path = first 3 by (ts, event_id)
            (1, datetime(2024, 1, 1, 10, 0), 1, "view", 0.0, None),
            (2, datetime(2024, 1, 1, 10, 1), 1, "click", 0.0, None),
            (3, datetime(2024, 1, 1, 10, 2), 1, "purchase", 0.0, None),
            (4, datetime(2024, 1, 1, 10, 3), 1, "view", 0.0, None),
            # second session for the same user (gap > 30min)
            (5, datetime(2024, 1, 1, 12, 0), 1, "view", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import session_path_topk

    got = {(r["path"], r["cnt"]) for r in session_path_topk(ev).collect()}
    assert got == {("view>click>purchase", 1), ("view", 1)}


def test_error_bursts_gap_and_threshold(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # user 1: two errors 5min apart -> one burst of 2
            (1, d(2024, 1, 1, 10, 0), 1, "error", 0.0, None),
            (2, d(2024, 1, 1, 10, 5), 1, "error", 0.0, None),
            # 40min quiet -> next error alone, no burst
            (3, d(2024, 1, 1, 10, 45), 1, "error", 0.0, None),
            # user 2: non-errors never count
            (4, d(2024, 1, 1, 10, 0), 2, "click", 0.0, None),
            (5, d(2024, 1, 1, 10, 1), 2, "click", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import error_bursts

    out = error_bursts(ev, gap_min=30, min_events=2).collect()
    assert len(out) == 1
    (b,) = out
    assert b["user_id"] == 1 and b["n_errors"] == 2


def test_topk_movers_delta_ordering(spark):
    rows = []
    # part 1: 1 -> 5 (delta +4); part 2: 3 -> 3 (0); part 3: 4 -> 0 (-4)
    for i, (p, y96, y97) in enumerate([(1, 1, 5), (2, 3, 3), (3, 4, 0)]):
        for _ in range(y96):
            rows.append((p, 1, 10.0, 0.0, datetime(1996, 6, 1), 1.0))
        for _ in range(y97):
            rows.append((p, 1, 10.0, 0.0, datetime(1997, 6, 1), 1.0))
    li = spark.createDataFrame(
        rows,
        "l_partkey long, l_suppkey long, l_extendedprice double, "
        "l_discount double, l_shipdate timestamp, l_quantity double",
    )
    out = analytics.topk_movers(li, k=2).collect()
    assert [(r["l_partkey"], r["delta"]) for r in out] == [(1, 4), (2, 0)]


def test_asof_nearest_direction_and_tie(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # purchase at 10:00; clicks at 9:50 (back 10m) and 10:05 (fwd 5m)
            # -> forward wins (5m < 10m)
            (1, d(2024, 1, 1, 9, 50), 1, "click", 0.0, None),
            (2, d(2024, 1, 1, 10, 0), 1, "purchase", 0.0, None),
            (3, d(2024, 1, 1, 10, 5), 1, "click", 0.0, None),
            # user 2: equidistant clicks (+-10m) -> tie goes BACKWARD
            (4, d(2024, 1, 1, 9, 50), 2, "click", 0.0, None),
            (5, d(2024, 1, 1, 10, 0), 2, "purchase", 0.0, None),
            (6, d(2024, 1, 1, 10, 10), 2, "click", 0.0, None),
            # user 3: only a click 2h away -> outside tolerance, dropped
            (7, d(2024, 1, 1, 8, 0), 3, "click", 0.0, None),
            (8, d(2024, 1, 1, 10, 0), 3, "purchase", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.temporal import asof_nearest_event

    got = {
        r["user_id"]: (r["source_id"], r["gap_us"])
        for r in asof_nearest_event(ev, tolerance_sec=3600).collect()
    }
    assert got == {
        1: (3, -5 * 60 * 1_000_000),   # forward match, negative gap
        2: (4, 10 * 60 * 1_000_000),   # tie -> backward, positive gap
    }


def test_share_of_parent_sums_to_100(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    out = analytics.share_of_parent(
        *[load_table(spark, sf_dir, t)
          for t in ("lineitem", "orders", "customer", "nation", "region")]
    ).collect()
    by_region = {}
    for r in out:
        by_region.setdefault(r["region"], []).append(r["pct_of_region"])
    for pcts in by_region.values():
        assert abs(sum(pcts) - 100.0) < 0.01


def test_source_quality_matrix_matches_naive_rank(spark, sf_dir):
    from pyspark.sql import Window
    from dumbo_spark.operators.sampling import source_quality_matrix

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {
        (r["source"], r["quartile"]): (r["n_docs"], r["share"])
        for r in source_quality_matrix(docs).collect()
    }
    n = docs.count()
    naive = (
        docs.select(
            "source",
            F.row_number().over(Window.orderBy("n_chars", "doc_id")).alias("rnk"),
        )
        .withColumn("quartile", F.floor((F.col("rnk") - 1) * 4 / F.lit(n)).cast("int"))
        .groupBy("source", "quartile")
        .agg(F.count("*").alias("n_docs"))
        .collect()
    )
    assert {(r["source"], r["quartile"]): r["n_docs"] for r in naive} == {
        k: v[0] for k, v in got.items()
    }


def test_token_source_mi_indicative_token(spark):
    # source A says "alpha" a lot; source B says "beta"; both share "x"
    rows = [(i, "A", "alpha x") for i in range(10)] + [
        (100 + i, "B", "beta x") for i in range(10)
    ]
    d = _docs(spark, rows)
    from dumbo_spark.operators.textstats import token_source_mi

    out = token_source_mi(d, k=1, min_count=5).collect()
    top = {r["source"]: r["token"] for r in out}
    assert top == {"A": "alpha", "B": "beta"}
    assert all(r["mi_score"] > 0 for r in out)


def test_benford_screen_exact_digit_extraction(spark):
    orders = spark.createDataFrame(
        [(1, 1000.00), (2, 999.99), (3, 10.00), (4, 0.00), (5, 250.50)],
        "o_orderkey long, o_totalprice double",
    )
    from dumbo_spark.operators.dq import benford_screen

    got = {r["digit"]: r["n"] for r in benford_screen(orders).collect()}
    # 1000.00 -> 1, 999.99 -> 9, 10.00 -> 1, 0.00 excluded, 250.50 -> 2
    assert got == {1: 2, 9: 1, 2: 1}


def test_dow_hour_heatmap_iso_weekday(spark):
    ev = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 9, 0), 1, "a", 0.0, None),   # Monday
            (2, datetime(2024, 1, 7, 23, 0), 1, "a", 0.0, None),  # Sunday
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import dow_hour_heatmap

    got = {(r["dow"], r["hr"]): r["share"] for r in dow_hour_heatmap(ev).collect()}
    assert got == {(1, 9): 0.5, (7, 23): 0.5}


def test_basket_rules_metrics(spark):
    # orders: {1,2} together 3x; order with only 1; n_orders = 4
    rows = []
    for ok in (10, 11, 12):
        rows += [(ok, 1), (ok, 2)]
    rows += [(13, 1)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from dumbo_spark.operators.graph import basket_rules

    out = basket_rules(li, min_cooccur=3).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["part_a"], r["part_b"], r["n_ab"]) == (1, 2, 3)
    assert r["support"] == 0.75          # 3/4 orders
    assert r["conf_a_b"] == 0.75         # 3/4 orders with part 1
    assert r["conf_b_a"] == 1.0          # 3/3 orders with part 2
    assert r["lift"] == 1.0              # 3*4/(4*3)


def test_contingency_independence_residuals(spark):
    # perfectly independent 2x2 -> residuals all 0
    rows = []
    i = 0
    for lang, source, n in [("en", "a", 20), ("en", "b", 20), ("de", "a", 10), ("de", "b", 10)]:
        for _ in range(n):
            rows.append((i, source, "t", lang))
            i += 1
    d = spark.createDataFrame(rows, "doc_id long, source string, text string, lang string")
    from dumbo_spark.operators.textstats import lang_source_contingency

    out = lang_source_contingency(d).collect()
    assert len(out) == 4
    assert all(r["residual"] == 0.0 for r in out)
    exp = {(r["lang"], r["source"]): r["expected"] for r in out}
    assert exp[("en", "a")] == 20.0 and exp[("de", "b")] == 10.0


def test_cohort_ltv_offsets_and_cumsum(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # user 1 first buys in week of Jan 1, buys again 2 weeks later
            (1, d(2024, 1, 1, 10), 1, "purchase", 10.0, None),
            (2, d(2024, 1, 15, 10), 1, "purchase", 5.0, None),
            # user 2 first buys two weeks in
            (3, d(2024, 1, 15, 10), 2, "purchase", 7.0, None),
            # non-purchase events don't count and don't set the cohort
            (4, d(2023, 12, 1, 10), 2, "view", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import cohort_ltv

    out = {(r["cohort_week"], r["week_offset"]): (r["revenue"], r["cum_revenue"])
           for r in cohort_ltv(ev).collect()}
    # epoch weeks start on Thursdays (1970-01-01 was a Thursday):
    # Jan 1 2024 falls in the week starting 2023-12-28
    assert out == {
        ("2023-12-28", 0): (10.0, 10.0),
        ("2023-12-28", 2): (5.0, 15.0),
        ("2024-01-11", 0): (7.0, 7.0),
    }


def test_item_similarity_jaccard_and_symmetry(spark):
    rows = []
    # items 1,2 co-occur in 3 orders; item 1 also alone in 1 order
    for ok in (10, 11, 12):
        rows += [(ok, 1), (ok, 2)]
    rows += [(13, 1)]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    from dumbo_spark.operators.graph import item_similarity

    out = {(r["item"], r["other"]): r for r in item_similarity(li, min_common=3).collect()}
    # jaccard(1,2) = 3 / (4 + 3 - 3) = 0.75, present in BOTH directions
    assert out[(1, 2)]["jaccard"] == 0.75
    assert out[(2, 1)]["jaccard"] == 0.75
    assert out[(1, 2)]["rank"] == 1 and out[(2, 1)]["rank"] == 1


def test_consistent_entity_sample_closure(spark, sf_dir):
    from dumbo_spark.operators.sampling import consistent_entity_sample
    from dumbo_spark.sources.catalog import load_table

    out = {
        r["table_name"]: r
        for r in consistent_entity_sample(
            load_table(spark, sf_dir, "customer"),
            load_table(spark, sf_dir, "orders"),
            load_table(spark, sf_dir, "lineitem"),
            pct=10,
        ).collect()
    }
    assert out["closure_violations"]["n_kept"] == 0
    # ~10% of customers kept (hash bucket), orders/lineitem follow
    assert 0.05 < out["customer"]["share"] < 0.15
    assert 0.05 < out["orders"]["share"] < 0.15
    assert 0.05 < out["lineitem"]["share"] < 0.15


def test_funnel_time_bound_enforced(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # user 1: full funnel within bounds
            (1, d(2024, 1, 1, 10, 0), 1, "view", 0.0, None),
            (2, d(2024, 1, 1, 10, 30), 1, "click", 0.0, None),
            (3, d(2024, 1, 1, 11, 0), 1, "purchase", 0.0, None),
            # user 2: click 2h after view -> funnel stops at view
            (4, d(2024, 1, 1, 10, 0), 2, "view", 0.0, None),
            (5, d(2024, 1, 1, 12, 30), 2, "click", 0.0, None),
            (6, d(2024, 1, 1, 12, 40), 2, "purchase", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.temporal import funnel_time_bounded

    got = {r["stage"]: r["n_users"] for r in funnel_time_bounded(ev).collect()}
    assert got == {"1_view": 2, "2_click": 1, "3_purchase": 1}


def test_segment_mode_tie_break(spark):
    customer = spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING")], "c_custkey long, c_mktsegment string"
    )
    orders = spark.createDataFrame(
        # tie: one 1-URGENT, one 2-HIGH -> lexicographically smaller wins
        [(10, 1, "1-URGENT"), (11, 2, "2-HIGH")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    from dumbo_spark.operators.analytics import segment_priority_mode

    out = segment_priority_mode(customer, orders).collect()
    assert [(r["c_mktsegment"], r["modal_priority"], r["n_orders"]) for r in out] == [
        ("BUILDING", "1-URGENT", 1)
    ]


def test_jl_projection_matches_manual_fold(spark):
    from dumbo_spark.operators.similarity import _hyperplane, jl_projection

    vec = [float(i % 3 - 1) for i in range(64)]
    emb = spark.createDataFrame(
        [(1, vec, 0)], "vec_id long, embedding array<float>, label int"
    )
    (r,) = jl_projection(emb).collect()
    import numpy as np

    v32 = np.array(vec, dtype=np.float32).astype(float)
    for j in range(4):
        expect = round(float((v32 * np.array(_hyperplane(64, j))).sum()), 4)
        assert r[f"proj_{j}"] == expect


def test_fulfillment_latency_exact_days(spark):
    orders = spark.createDataFrame(
        [(1, datetime(1996, 1, 1), "1-URGENT"), (2, datetime(1996, 1, 1), "1-URGENT")],
        "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [(1, datetime(1996, 1, 3)), (2, datetime(1996, 1, 11))],
        "l_orderkey long, l_shipdate timestamp",
    )
    from dumbo_spark.operators.analytics import fulfillment_latency

    (r,) = fulfillment_latency(orders, lineitem).collect()
    assert r["n_lines"] == 2
    assert r["p50_days"] == 6.0   # interpolated between 2 and 10
    assert r["max_days"] == 10


def test_label_outliers_planted_noise(spark):
    # label 0 clusters near [1, 0]; one planted point at [0, 1] must be
    # the furthest-from-centroid candidate
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, [1.0, 0.1], 0),
            (4, [0.0, 1.0], 0),  # mislabeled
        ],
        "vec_id long, embedding array<float>, label int",
    )
    from dumbo_spark.operators.similarity import label_outlier_screen

    out = label_outlier_screen(emb, k=1).collect()
    assert len(out) == 1 and out[0]["vec_id"] == 4 and out[0]["rank"] == 1


def test_ab_test_z_symmetry_and_assignment(spark, sf_dir):
    from dumbo_spark.operators.events import ab_test_readout
    from dumbo_spark.sources.catalog import load_table

    out = {r["variant"]: r for r in ab_test_readout(
        load_table(spark, sf_dir, "events")).collect()}
    assert set(out) == {"A", "B"}
    # two-proportion z is antisymmetric between the arms
    assert abs(out["A"]["z_vs_other"] + out["B"]["z_vs_other"]) < 1e-9
    # both arms non-degenerate on the fixture metric
    for r in out.values():
        assert 0.0 < r["conversion_rate"] < 1.0


def test_hashed_features_reproducible_and_complete(spark):
    d = _docs(spark, [(1, "s", "a b a"), (2, "s", "a")])
    from dumbo_spark.operators.textstats import hashed_features
    from dumbo_spark.operators.sampling import _md5_bucket

    out = hashed_features(d, n_buckets=8).collect()
    # total counts preserved (3 tokens doc1, 1 token doc2)
    by_doc = {}
    for r in out:
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["cnt"]
    assert by_doc == {1: 3, 2: 1}
    # same token -> same bucket in both docs
    bucket_a = {r["bucket"] for r in out if r["doc_id"] == 2}
    assert len(bucket_a) == 1


def test_knn_classifier_eval_votes_clear_clusters(spark):
    # two tight clusters -> every query's neighbors share its label
    rows = []
    for i in range(6):
        rows.append((i, [1.0, 0.0 + i * 1e-3], 0))
    for i in range(6, 12):
        rows.append((i, [0.0, 1.0 + (i - 6) * 1e-3], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    from dumbo_spark.operators.similarity import knn_classifier_eval

    out = knn_classifier_eval(emb, n_queries=12, k=3).collect()
    assert len(out) == 12
    assert all(r["correct"] == 1 for r in out)


def test_autocorrelation_perfect_alternation(spark):
    # alternating 10,20,10,20 daily counts: r(lag1) = -1, r(lag2) = +1
    rows = []
    eid = 0
    for day in range(8):
        n = 10 if day % 2 == 0 else 20
        for _ in range(n):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1 + day, 12), 1, "view", 0.0, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import daily_autocorrelation

    got = {r["lag"]: r["autocorr"] for r in daily_autocorrelation(ev, max_lag=2).collect()}
    assert got[1] == -1.0
    assert got[2] == 1.0


def test_recency_weights_halve_per_week(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # anchor = Jan 29; purchases 0, 1, 2 weeks old
            (1, d(2024, 1, 29, 12), 1, "purchase", 100.0, None),
            (2, d(2024, 1, 20, 12), 1, "purchase", 100.0, None),  # 9d -> w=1
            (3, d(2024, 1, 10, 12), 1, "purchase", 100.0, None),  # 19d -> w=2
            (4, d(2024, 1, 29, 23), 2, "view", 0.0, None),        # sets anchor day
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import recency_weighted_value

    (r,) = [x for x in recency_weighted_value(ev).collect() if x["user_id"] == 1]
    assert r["n_purchases"] == 3
    assert r["recency_score"] == 100.0 + 50.0 + 25.0


def test_skyline_dominance(spark):
    part = spark.createDataFrame(
        [
            (1, 10.0, 5),   # frontier (cheapest)
            (2, 20.0, 3),   # frontier (smaller than all cheaper)
            (3, 30.0, 4),   # dominated by 2 (pricier AND bigger)
            (4, 30.0, 1),   # frontier
            (5, 10.0, 5),   # duplicate of 1 -> dominated (tie collapse)
        ],
        "p_partkey long, p_retailprice double, p_size int",
    )
    from dumbo_spark.operators.analytics import skyline_parts

    got = {r["p_partkey"] for r in skyline_parts(part).collect()}
    assert got == {1, 2, 4}


def test_decile_lift_monotone_population(spark, sf_dir):
    from dumbo_spark.operators.analytics import decile_lift_table
    from dumbo_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    out = decile_lift_table(ev).collect()
    assert sum(r["n_users"] for r in out) == ev.select("user_id").distinct().count()
    # weighted mean of decile rates equals the base rate -> mean lift 1
    tot_conv = sum(r["n_converted"] for r in out)
    tot_u = sum(r["n_users"] for r in out)
    base = tot_conv / tot_u
    for r in out:
        assert abs(r["lift"] - round((r["n_converted"] / r["n_users"]) / base, 4)) < 1e-9


def test_cluster_size_histogram(spark):
    comps = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)],
        "doc_id long, cluster_id long",
    )
    from dumbo_spark.operators.dedup import cluster_size_histogram

    got = {r["cluster_size"]: r["n_clusters"]
           for r in cluster_size_histogram(comps).collect()}
    assert got == {3: 1, 2: 1, 1: 1}


def test_contrastive_pairs_structure(spark):
    rows = [(i, [1.0, float(i) * 1e-3], i % 2) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    from dumbo_spark.operators.similarity import contrastive_pairs

    out = contrastive_pairs(emb, n_queries=4, k_neg=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    labels = {i: i % 2 for i in range(10)}
    for qid, rows_ in by_q.items():
        roles = sorted(r["role"] for r in rows_)
        assert roles == ["neg", "neg", "pos"]
        for r in rows_:
            if r["role"] == "neg":
                assert labels[r["other_id"]] != labels[qid]
            else:
                assert r["other_id"] != qid


def test_exact_global_rank_matches_naive_window(spark):
    # property: the offsets-trick rank equals a naive global
    # ROW_NUMBER over (value, tiebreak) for data with heavy value ties
    from pyspark.sql import Window
    from dumbo_spark.operators.sampling import exact_global_rank

    rows = [(i, (i * 7) % 5) for i in range(200)]  # 5 distinct values, 40 ties each
    df = spark.createDataFrame(rows, "id long, v int")
    for ascending in (True, False):
        got = {
            r["id"]: r["_rank"]
            for r in exact_global_rank(df, "v", "id", ascending=ascending).collect()
        }
        order = F.col("v").asc() if ascending else F.col("v").desc()
        naive = {
            r["id"]: r["rn"]
            for r in df.withColumn(
                "rn", F.row_number().over(Window.orderBy(order, F.col("id").asc()))
            ).collect()
        }
        assert got == naive


def test_bigram_pmi_collocation_beats_chance(spark):
    import math

    # "x y" always adjacent; "a b" co-occur by chance among many tokens
    docs = [(i, "s", "x y a c b d a e b f") for i in range(5)]
    d = _docs(spark, docs)
    from dumbo_spark.operators.textstats import bigram_pmi

    out = {r["ngram"]: r["pmi"] for r in bigram_pmi(d, k=50, min_count=5).collect()}
    # x y: n_xy=5, n_x=5, n_y=5, N=50 -> pmi = ln(5*50/25) = ln(10)
    assert out["x y"] == round(math.log(10.0), 6)


def test_vocab_coverage_monotone_and_exact(spark):
    d = _docs(spark, [(1, "s", "a a a a b b c d")])
    from dumbo_spark.operators.textstats import vocab_coverage

    got = {r["k"]: (r["tokens_covered"], r["coverage"])
           for r in vocab_coverage(d, ks=(1, 2, 4)).collect()}
    assert got[1] == (4, 0.5)      # 'a' covers 4/8
    assert got[2] == (6, 0.75)     # + 'b'
    assert got[4] == (8, 1.0)


def test_gini_extremes(spark):
    from dumbo_spark.operators.analytics import gini_revenue

    # perfectly equal revenues -> gini 0
    eq = spark.createDataFrame(
        [(i, 100.0) for i in range(1, 5)], "o_custkey long, o_totalprice double"
    )
    (r,) = gini_revenue(eq).collect()
    assert r["gini"] == 0.0 and r["n_customers"] == 4
    # one customer holds everything -> gini -> (n-1)/n
    uneq = spark.createDataFrame(
        [(1, 0.0), (2, 0.0), (3, 0.0), (4, 400.0)],
        "o_custkey long, o_totalprice double",
    )
    (r,) = gini_revenue(uneq).collect()
    assert r["gini"] == 0.75


def test_elasticity_recovers_planted_slope(spark):
    # quantity = 30 - 2*pct exactly -> slope must be -2.0
    rows = []
    for pct in (0, 1, 2, 3, 4):
        for i in range(3):
            rows.append((1, float(pct) / 100.0, float(30 - 2 * pct)))
    li = spark.createDataFrame(
        rows, "l_partkey long, l_discount double, l_quantity double"
    )
    part = spark.createDataFrame([(1, "B1")], "p_partkey long, p_brand string")
    from dumbo_spark.operators.analytics import discount_elasticity

    (r,) = discount_elasticity(li, part).collect()
    assert r["qty_per_pct"] == -2.0


def test_entity_clusters_transitive(spark):
    # a~b and b~c within distance 3, a and c farther apart: all three
    # must still share one canonical name (transitive closure)
    part = spark.createDataFrame(
        [(1, "navy thing"), (2, "wavy thing"), (3, "waxy thing"), (4, "other stuff")],
        "p_partkey long, p_name string",
    )
    from dumbo_spark.operators import dedup

    edges = dedup.near_match_values(part, "p_name").select(
        F.col("val_a").alias("doc_a"), F.col("val_b").alias("doc_b")
    )
    comps = {r["doc_id"]: r["cluster_id"]
             for r in dedup.connected_components(edges).collect()}
    assert comps["navy thing"] == comps["wavy thing"] == comps["waxy thing"]
    assert "other stuff" not in comps  # isolated values carry no edges


def test_hhi_monopoly_and_uniform(spark, sf_dir):
    from dumbo_spark.operators.analytics import market_concentration
    from dumbo_spark.sources.catalog import load_table

    out = market_concentration(
        *[load_table(spark, sf_dir, t)
          for t in ("lineitem", "orders", "customer", "nation", "region")]
    ).collect()
    for r in out:
        # HHI bounded by [1/n, 1]
        assert 1.0 / r["n_nations"] - 1e-9 <= r["hhi"] <= 1.0


def test_cart_abandonment_counts(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # user 1 clicks and buys within the hour -> converted
            (1, d(2024, 1, 1, 10, 0), 1, "click", 0.0, None),
            (2, d(2024, 1, 1, 10, 30), 1, "purchase", 5.0, None),
            # user 2 clicks, never buys -> abandoned
            (3, d(2024, 1, 1, 11, 0), 2, "click", 0.0, None),
            # user 3 clicks, buys 3h later -> abandoned (outside window)
            (4, d(2024, 1, 1, 9, 0), 3, "click", 0.0, None),
            (5, d(2024, 1, 1, 12, 30), 3, "purchase", 5.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.temporal import cart_abandonment

    (r,) = cart_abandonment(ev).collect()
    assert (r["n_clickers"], r["n_converted"]) == (3, 1)
    assert r["abandonment_rate"] == round(2 / 3, 6)


def test_duplicate_payment_screen_flags_only_dups(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, 99.99, datetime(2024, 1, 1)),
            (2, 10, 99.99, datetime(2024, 1, 1)),   # double charge
            (3, 10, 99.99, datetime(2024, 1, 2)),   # same amount, other day
            (4, 11, 50.00, datetime(2024, 1, 1)),
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    from dumbo_spark.operators.dq import duplicate_payment_screen

    out = duplicate_payment_screen(orders).collect()
    assert len(out) == 1
    (r,) = out
    assert (r["o_custkey"], r["amount"], r["n_orders"]) == (10, 99.99, 2)


def test_new_vs_returning_split(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            (1, d(2024, 1, 1, 9), 1, "a", 0.0, None),
            (2, d(2024, 1, 2, 9), 1, "a", 0.0, None),   # returning
            (3, d(2024, 1, 2, 9), 2, "a", 0.0, None),   # new on day 2
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import daily_new_vs_returning

    got = {r["day"]: (r["n_active"], r["n_new"], r["n_returning"])
           for r in daily_new_vs_returning(ev).collect()}
    assert got == {"2024-01-01": (1, 1, 0), "2024-01-02": (2, 1, 1)}


def test_peak_concurrency_overlap_and_midnight_carry(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # two overlapping sessions on Jan 1 -> peak 2
            (1, d(2024, 1, 1, 10, 0), 1, "a", 0.0, None),
            (2, d(2024, 1, 1, 10, 20), 1, "a", 0.0, None),
            (3, d(2024, 1, 1, 10, 10), 2, "a", 0.0, None),
            # user 3's session spans midnight (23:50 -> 00:10 via 30min gap)
            (4, d(2024, 1, 1, 23, 50), 3, "a", 0.0, None),
            (5, d(2024, 1, 2, 0, 10), 3, "a", 0.0, None),
            # user 4 session on Jan 2 overlapping the carried session
            (6, d(2024, 1, 2, 0, 5), 4, "a", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import peak_concurrency

    got = {r["day"]: r["peak_concurrent"] for r in peak_concurrency(ev).collect()}
    assert got["2024-01-01"] == 2   # the two overlapping sessions
    assert got["2024-01-02"] == 2   # carried session + user 4


def test_return_rate_conditional_count(spark):
    li = spark.createDataFrame(
        [(1, "R"), (1, "N"), (1, "R"), (2, "N")],
        "l_partkey long, l_returnflag string",
    )
    part = spark.createDataFrame(
        [(1, "B1"), (2, "B2")], "p_partkey long, p_brand string"
    )
    from dumbo_spark.operators.analytics import return_rate_by_brand

    got = {r["p_brand"]: (r["n_lines"], r["n_returned"], r["return_rate"])
           for r in return_rate_by_brand(li, part).collect()}
    assert got == {"B1": (3, 2, round(2 / 3, 6)), "B2": (1, 0, 0.0)}


def test_session_depth_histogram_shares(spark):
    d = datetime
    ev = spark.createDataFrame(
        [
            # user 1: one 3-event session, then (90min later) a 1-event session
            (1, d(2024, 1, 1, 10, 0), 1, "a", 0.0, None),
            (2, d(2024, 1, 1, 10, 5), 1, "a", 0.0, None),
            (3, d(2024, 1, 1, 10, 10), 1, "a", 0.0, None),
            (4, d(2024, 1, 1, 12, 0), 1, "a", 0.0, None),
            # user 2: one 1-event session
            (5, d(2024, 1, 1, 10, 0), 2, "a", 0.0, None),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import session_depth_histogram

    got = {r["depth"]: (r["n_sessions"], r["share"])
           for r in session_depth_histogram(ev).collect()}
    assert got == {3: (1, round(1 / 3, 6)), 1: (2, round(2 / 3, 6))}


def test_psi_zero_when_identical_and_positive_under_shift(spark):
    d = datetime
    rows = []
    eid = 0
    # identical value mix before and after the split -> PSI ~ 0
    for day, base in ((10, 0), (20, 0)):
        for v in (5.0, 15.0, 25.0, 5.0):
            eid += 1
            rows.append((eid, d(2024, 1, day, 12), 1, "same", v, None))
    # shifted mix after the split -> PSI > 0
    for day, vals in ((10, (5.0, 5.0, 5.0)), (20, (95.0, 95.0, 95.0))):
        for v in vals:
            eid += 1
            rows.append((eid, d(2024, 1, day, 12), 1, "shift", v, None))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from dumbo_spark.operators.events import value_drift_psi

    got = {r["event_type"]: r["psi"] for r in value_drift_psi(ev).collect()}
    assert got["same"] == 0.0
    assert got["shift"] > 0.5
