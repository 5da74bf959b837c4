"""Skew-path tests (SURVEY §7.3#2, FIXTURES.md §C 'one heavily skewed
group'): correctness of the salted top-k and AQE-planned join on data
where one key carries ~99% of rows."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from dumbo_spark.operators import dedup, topk


def _skewed(spark, hot_rows=50_000, cold_keys=20):
    hot = spark.range(hot_rows).select(
        F.lit("HOT").alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    cold = spark.range(cold_keys).select(
        F.concat(F.lit("c"), F.col("id")).alias("grp"),
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_topk_correct_under_skew(spark):
    df = _skewed(spark)
    got = topk.salted_topk_per_group(df, "grp", "v", k=3)
    hot_top = sorted(
        (r.v for r in got.where(F.col("grp") == "HOT").collect()), reverse=True
    )
    assert hot_top == [996.0, 996.0, 996.0]  # max v repeats every 997
    assert got.where(F.col("grp") == "c5").count() == 1  # single-row groups survive


def test_salted_topk_deterministic_under_repartitioning(spark):
    """The salt is a content hash, so the full output (including rn) is
    identical whatever the physical partitioning — and identical to the
    plain window top-k."""
    df = _skewed(spark, hot_rows=20_000)
    kwargs = dict(group_col="grp", order_col="v", k=3, tiebreak_cols=["k"])
    runs = [
        topk.salted_topk_per_group(df, **kwargs),
        topk.salted_topk_per_group(df.repartition(3), **kwargs),
        topk.salted_topk_per_group(df.repartition(64, "k"), **kwargs),
    ]
    results = [sorted(map(tuple, r.collect())) for r in runs]
    assert results[0] == results[1] == results[2]

    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.col("v").desc(), F.col("k").asc())
    plain = sorted(
        map(
            tuple,
            df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .collect(),
        )
    )
    assert results[0] == plain


def test_global_ntile_matches_window_ntile(spark):
    from pyspark.sql import Window

    from dumbo_spark.operators.topk import global_ntile

    df = spark.range(10_007).select(
        F.col("id").alias("k"), (F.col("id") % 331).cast("double").alias("v")
    )
    sort = [F.col("v").desc(), F.col("k").asc()]
    got = {
        (r.k, r.ntile)
        for r in global_ntile(df, sort, k=4, num_partitions=13).collect()
    }
    want = {
        (r.k, r.ntile)
        for r in df.select(
            "k", F.ntile(4).over(Window.orderBy(*sort)).alias("ntile")
        ).collect()
    }
    assert got == want


def test_jaccard_stop_gram_no_single_task_window(spark):
    """A stop-gram present in >10% of documents must not route document
    frequency through a Window.partitionBy('gram') — that's one giant
    single-task partition at scale. DF comes from groupBy+join-back;
    the only window left partitions by doc_id. Output stays bit-exact
    vs brute force."""
    common = "the quick brown fox jumps"  # shared 3-grams in every doc
    rows = [(i, f"{common} unique{i} tail{i} word{i} extra{i}") for i in range(40)]
    rows += [(100, f"{common} unique7 tail7 word7 extra7")]  # near-dup of doc 7
    df = spark.createDataFrame(rows, "doc_id long, text string")

    out = dedup.jaccard_ngram_pairs(df, n=3, threshold_pct=60)
    plan = out._jdf.queryExecution().executedPlan().toString().lower()
    assert "windowspecdefinition(gram" not in plan
    assert "window" in plan  # the per-doc rank window remains

    # brute-force oracle on the same tokenization
    def grams(text):
        toks = [t for t in __import__("re").split(r"\W+", text.lower()) if t]
        return {tuple(toks[i : i + 3]) for i in range(len(toks) - 2)}

    gs = {i: grams(t) for i, t in rows}
    expect = set()
    for a, b in itertools.combinations(sorted(gs), 2):
        inter = len(gs[a] & gs[b])
        union = len(gs[a] | gs[b])
        if 100 * inter >= 60 * union:
            expect.add((a, b))
    got = {(r.doc_a, r.doc_b) for r in out.collect()}
    assert got == expect
    assert (7, 100) in got


def test_skewed_join_correct(spark):
    """Fact⋈dim where 99% of fact rows hit one key — AQE skew handling
    is posture; the assertion is exact row preservation."""
    fact = _skewed(spark).select("grp", "v")
    dim = fact.select("grp").distinct().withColumn("tag", F.length("grp"))
    joined = fact.join(dim, "grp")
    assert joined.count() == fact.count()
    assert joined.where(F.col("tag").isNull()).count() == 0