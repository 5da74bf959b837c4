"""Round-10 operators: corpus-distribution analytics + DSIR selection.
Invariant tests beyond the DuckDB oracles (which test_differential.py
covers for every registered query)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dumbo_spark.operators import packing, sampling, textstats


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, text, src) for i, (text, src) in enumerate(rows)],
        "doc_id long, text string, source string",
    )


# ── source_divergence_matrix ────────────────────────────────────────────


def test_js_divergence_zero_for_identical_distributions(spark):
    d = _docs(spark, [("a a b c", "s1"), ("a a b c", "s2")])
    rows = textstats.source_divergence_matrix(d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src_a"], r["src_b"]) == ("s1", "s2")
    assert r["shared_tokens"] == 3
    assert r["js_divergence"] == 0.0


def test_js_divergence_ln2_for_disjoint_vocabularies(spark):
    # the pair must still APPEAR (universe from totals, not the shared
    # join) with JS exactly ln 2 — the r10 inner-join edge fix
    d = _docs(spark, [("a a b", "s1"), ("x y y z", "s2")])
    rows = textstats.source_divergence_matrix(d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["shared_tokens"] == 0
    assert abs(r["js_divergence"] - math.log(2.0)) < 1e-6


def test_js_divergence_bounds_and_pair_count(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    n_src = docs.select("source").distinct().count()
    rows = textstats.source_divergence_matrix(docs).collect()
    assert len(rows) == n_src * (n_src - 1) // 2
    for r in rows:
        assert -1e-9 <= r["js_divergence"] <= math.log(2.0) + 1e-9
        assert r["src_a"] < r["src_b"]


# ── ngram_coverage_curve ────────────────────────────────────────────────


def test_coverage_curve_saturates_and_is_monotone(spark):
    # 4 distinct trigrams total: "a b c" x3 -> 1 type x3, "d e f" -> 1
    d = _docs(spark, [("a b c", "s")] * 3 + [("d e f g", "s")])
    rows = {
        r["k"]: r
        for r in textstats.ngram_coverage_curve(d, ks=(1, 10, 1000)).collect()
    }
    # k=1: the top type is "a b c" with 3 occurrences of 5 total
    assert rows[1]["head_types"] == 1
    assert rows[1]["covered_occurrences"] == 3
    assert rows[1]["total_occurrences"] == 5
    # k >= distinct types: full coverage, head_types < k
    assert rows[10]["head_types"] == 3
    assert rows[10]["coverage"] == 1.0
    assert rows[1000]["head_types"] == 3
    assert rows[1000]["coverage"] == 1.0
    ks = sorted(rows)
    covs = [rows[k]["coverage"] for k in ks]
    assert covs == sorted(covs)


def test_coverage_curve_fixture_shape(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    rows = textstats.ngram_coverage_curve(
        load_table(spark, sf_dir, "documents")
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert 0.0 < r["coverage"] <= 1.0
        assert r["covered_occurrences"] <= r["total_occurrences"]
        assert r["head_types"] <= r["k"]


# ── token_position_stats ────────────────────────────────────────────────


def test_token_positions_integer_permille_and_edges(spark):
    d = _docs(spark, [("a b c", "s"), ("solo", "s")])
    rows = {
        r["token"]: r
        for r in textstats.token_position_stats(d, top=10).collect()
    }
    assert rows["a"]["mean_pos_mil"] == 0.0
    assert rows["b"]["mean_pos_mil"] == 500.0
    assert rows["c"]["mean_pos_mil"] == 1000.0
    assert rows["solo"]["mean_pos_mil"] == 500.0  # 1-token convention
    for r in rows.values():
        assert r["stddev_pos_mil"] == 0.0  # every token occurs once


def test_token_positions_boilerplate_detection(spark):
    # "hdr" always first, "ftr" always last, "x" uniform filler
    d = _docs(
        spark,
        [("hdr x x x x ftr", "s"), ("hdr x x ftr", "s"), ("hdr x ftr", "s")],
    )
    rows = {
        r["token"]: r
        for r in textstats.token_position_stats(d, top=10).collect()
    }
    assert rows["hdr"]["mean_pos_mil"] == 0.0
    assert rows["hdr"]["stddev_pos_mil"] == 0.0
    assert rows["ftr"]["mean_pos_mil"] == 1000.0
    assert rows["ftr"]["stddev_pos_mil"] == 0.0
    assert 0.0 < rows["x"]["mean_pos_mil"] < 1000.0
    assert rows["x"]["stddev_pos_mil"] > 0.0


# ── stratified_kfold_assign ─────────────────────────────────────────────


def test_kfold_balance_within_every_stratum(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    out = sampling.stratified_kfold_assign(
        load_table(spark, sf_dir, "documents"), k=5, buckets=8
    )
    per = (
        out.groupBy("stratum", "fold").count().groupBy("stratum").agg(
            F.max("count").alias("mx"),
            F.min("count").alias("mn"),
            F.countDistinct("fold").alias("nf"),
        )
    ).collect()
    for r in per:
        assert r["mx"] - r["mn"] <= 1, r  # round-robin balance
    folds = {f["fold"] for f in out.select("fold").distinct().collect()}
    assert folds <= set(range(5))


def test_kfold_assignment_is_deterministic_and_total(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, sampling.stratified_kfold_assign(docs).collect()))
    b = sorted(
        map(
            tuple,
            sampling.stratified_kfold_assign(docs.repartition(13)).collect(),
        )
    )
    assert a == b
    assert len(a) == docs.count()


# ── dsir_topk_selection ─────────────────────────────────────────────────


def test_dsir_selection_is_the_exact_weight_head(spark, sf_dir):
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    sel = packing.dsir_topk_selection(docs, k=20).collect()
    assert [r["sel_rank"] for r in sel] == list(range(1, 21))
    ws = [(r["log_weight_micro"], -r["doc_id"]) for r in sel]
    assert ws == sorted(ws, reverse=True)
    # agrees with the full weight frame's top-20
    full = sorted(
        ((r["log_weight_micro"], -r["doc_id"]), r["doc_id"])
        for r in packing.dsir_importance_weights(docs).collect()
    )
    want = [doc for _key, doc in sorted(full, reverse=True)[:20]]
    assert [r["doc_id"] for r in sel] == want


# ── ks_drift_exact + mannwhitney_value_shift ────────────────────────────


def _split_events(spark, before_vals, after_vals, event_type="t"):
    import datetime

    rows = []
    eid = 0
    for v in before_vals:
        rows.append((eid, datetime.datetime(2024, 1, 10), 1, event_type, float(v), "{}"))
        eid += 1
    for v in after_vals:
        rows.append((eid, datetime.datetime(2024, 1, 20), 1, event_type, float(v), "{}"))
        eid += 1
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_ks_exact_matches_brute_force_reference(spark):
    from dumbo_spark.operators import events as E

    a = [1, 1, 2, 3, 5, 8, 8, 9]
    b = [2, 2, 3, 4, 4, 7, 9, 9, 10]
    row = E.ks_drift_exact(_split_events(spark, a, b)).collect()[0]
    # brute force: max |F_A(x) - F_B(x)| over all observed values
    xs = sorted(set(a) | set(b))
    ks = max(
        abs(
            sum(1 for v in a if v <= x) / len(a)
            - sum(1 for v in b if v <= x) / len(b)
        )
        for x in xs
    )
    assert (row["n_before"], row["n_after"]) == (len(a), len(b))
    assert abs(row["ks_stat"] - ks) < 1e-9


def test_ks_exact_detects_inside_bucket_shift(spark):
    from dumbo_spark.operators import events as E

    # identical 10.0-wide histogram buckets, different within-bucket
    # values: the bucketed screen (value_drift_screen) reports 0 here;
    # the exact statistic must not
    a, b = [1.0, 2.0, 3.0], [7.0, 8.0, 9.0]
    exact = E.ks_drift_exact(_split_events(spark, a, b)).collect()[0]
    assert exact["ks_stat"] == 1.0
    bucketed = E.value_drift_screen(_split_events(spark, a, b)).collect()[0]
    assert bucketed["ks_stat"] == 0.0


def test_mannwhitney_matches_brute_force_pair_count(spark):
    from dumbo_spark.operators import events as E

    a = [3, 3, 5, 1, 9, 9, 2]
    b = [4, 3, 8, 8, 1, 6]
    row = E.mannwhitney_value_shift(_split_events(spark, a, b)).collect()[0]
    u = sum(
        1.0 if x > y else (0.5 if x == y else 0.0) for x in a for y in b
    )
    assert (row["n_before"], row["n_after"]) == (len(a), len(b))
    assert row["u_stat"] == u
    assert abs(row["cles"] - u / (len(a) * len(b))) < 1e-6


def test_drift_tests_on_fixture_have_sane_ranges(spark, sf_dir):
    from dumbo_spark.operators import events as E
    from dumbo_spark.sources.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    for r in E.ks_drift_exact(ev).collect():
        assert 0.0 <= r["ks_stat"] <= 1.0
        assert r["n_before"] > 0 and r["n_after"] > 0
    for r in E.mannwhitney_value_shift(ev).collect():
        assert 0.0 <= r["cles"] <= 1.0
        assert 0.0 <= r["u_stat"] <= r["n_before"] * r["n_after"]
