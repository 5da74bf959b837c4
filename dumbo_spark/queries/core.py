"""Core queries: wordcount flagship, aggregation family, text analysis, shape/set ops, joins, rank, event-time windows — mechanically split out of registry.py in round 13
(VERDICT r12 Next #7: no source file over 3k lines). Pure move, no
behavior change: registration order is preserved by the import
sequence in dumbo_spark/registry.py, and each query/oracle pair stays
adjacent exactly as it was."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from dumbo_spark.operators import (  # noqa: F401
    agg,
    analytics,
    dedup,
    dq,
    events,
    graph,
    joins,
    packing,
    sampling,
    setops,
    shape,
    similarity,
    temporal,
    textstats,
    topk,
)
from dumbo_spark.queries._base import (  # noqa: F401
    DUCK_TOKENS,
    QUERIES,
    Query,
    QueryFn,
    _in_list,
    register,
)
from dumbo_spark.sources.catalog import load_table  # noqa: F401


# ═══ E1: wordcount — flagship (examples/wordcount.py) ═══════════════════


@register(
    "wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
    GROUP BY word
    """,
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.wordcount(load_table(spark, sf_dir, "documents"))


@register(
    "ngram_count",
    oracle=f"""
    WITH toks AS (SELECT {DUCK_TOKENS} AS t FROM documents)
    SELECT ngram, COUNT(*) AS cnt
    FROM (
      SELECT unnest(
        CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE [] END) AS ngram
      FROM toks)
    GROUP BY ngram
    """,
)
def q_ngram_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.ngram_count(load_table(spark, sf_dir, "documents"), n=2)


# ═══ M1: aggregation family (dumbo/lib reducers) ════════════════════════


@register(
    "group_sum",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.group_sum(load_table(spark, sf_dir, "lineitem"))


@register(
    "group_multi_sum",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_revenue,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
)
def q_group_multi_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.group_multi_sum(load_table(spark, sf_dir, "lineitem"))


@register(
    "group_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * CAST(l_extendedprice AS DECIMAL(18,2))) AS s2,
             MIN(l_extendedprice) AS min_price,
             MAX(l_extendedprice) AS max_price
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           n AS n_items,
           ROUND(CAST(s AS DOUBLE) / n, 4) AS mean_price,
           ROUND(sqrt(CAST(s2 AS DOUBLE) / n
                      - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n)), 4)
             AS std_price,
           min_price, max_price
    FROM m
    """,
)
def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.group_stats(load_table(spark, sf_dir, "lineitem"))


@register(
    "count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def q_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.count_distinct(load_table(spark, sf_dir, "orders"))


@register("approx_count_distinct", oracle=None)  # estimator differs by engine
def q_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.approx_distinct(load_table(spark, sf_dir, "events"))


@register(
    "rollup_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q_rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.rollup_counts(load_table(spark, sf_dir, "orders"))


@register(
    "cube_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.cube_counts(load_table(spark, sf_dir, "orders"))


@register(
    "tagged_multicount",
    oracle="""
    SELECT tag, COUNT(*) AS n_docs
    FROM (SELECT unnest(['lang:' || lang, 'source:' || source]) AS tag
          FROM documents)
    GROUP BY tag
    """,
)
def q_tagged_multicount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.tagged_multicount(load_table(spark, sf_dir, "documents"))


@register(
    "two_phase_agg",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey)
    GROUP BY n_orders
    """,
)
def q_two_phase_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.two_phase_agg(load_table(spark, sf_dir, "orders"))


# ═══ text-analysis extensions (north star) ══════════════════════════════


@register(
    "doc_token_stats",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len({DUCK_TOKENS}) AS n_tokens,
             len(list_distinct({DUCK_TOKENS})) AS n_uniq,
             length(text) AS n_chars
      FROM documents)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 4) AS avg_tokens,
           ROUND(CAST(SUM(n_uniq) AS DOUBLE) / COUNT(*), 4) AS avg_uniq_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS avg_chars
    FROM per_doc GROUP BY lang
    """,
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_token_stats(load_table(spark, sf_dir, "documents"))


def _lang_id_oracle() -> str:
    scores = ",\n             ".join(
        f"len(list_filter(toks, t -> t IN ({_in_list(textstats.STOPWORDS[lg])})))"
        f" AS score_{lg}"
        for lg in textstats.LANGS
    )
    cases = "\n           ".join(
        "WHEN "
        + " AND ".join(f"score_{lg} >= score_{o}" for o in textstats.LANGS if o != lg)
        + f" THEN '{lg}'"
        for lg in textstats.LANGS
    )
    return f"""
    WITH scored AS (
      SELECT lang,
             {scores}
      FROM (SELECT lang, {DUCK_TOKENS} AS toks FROM documents))
    SELECT lang,
           CASE {cases} END AS predicted_lang,
           COUNT(*) AS n_docs
    FROM scored GROUP BY lang, predicted_lang
    """


@register("lang_id", oracle=_lang_id_oracle())
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id(load_table(spark, sf_dir, "documents"))


@register(
    "quality_score",
    oracle=f"""
    WITH per_doc AS (
      SELECT lang,
             len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_uniq,
             len(list_filter(toks,
                 t -> t IN ({_in_list(textstats.STOPWORDS["en"])}))) AS n_stop
      FROM (SELECT lang, {DUCK_TOKENS} AS toks FROM documents)
      WHERE len(toks) > 0)
    SELECT lang,
           CAST(floor((least(n_tokens / 200.0, 1.0) * 0.4
                  + (n_stop / CAST(n_tokens AS DOUBLE)) * 0.3
                  + (n_uniq / CAST(n_tokens AS DOUBLE)) * 0.3) * 10) AS BIGINT)
             AS q_bucket,
           COUNT(*) AS n_docs
    FROM per_doc GROUP BY lang, q_bucket
    """,
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(load_table(spark, sf_dir, "documents"))


@register(
    "doc_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, {DUCK_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, toks, unnest(range(0, len(toks), 48)) AS st
          FROM t WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(st / 48 AS INTEGER) AS chunk_idx,
           array_to_string(list_slice(toks, st + 1, st + 64), ' ') AS chunk_text,
           CAST(least(len(toks) - st, 64) AS INTEGER) AS n_tokens
    FROM s
    """,
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.chunk_documents(load_table(spark, sf_dir, "documents"))


@register(
    "doc_fingerprint",
    oracle=f"""
    SELECT doc_id, md5(array_to_string({DUCK_TOKENS}, ' ')) AS fp
    FROM documents
    """,
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.doc_fingerprint(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_growth",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(list_filter(
               string_split_regex(lower(text), '\\W+'), t -> t <> '')) AS tok
      FROM documents),
    first_seen AS (SELECT tok, MIN(doc_id) AS first_doc FROM toks GROUP BY tok),
    per_bucket AS (
      SELECT CAST(floor(first_doc / 1) AS BIGINT) AS bucket,
             COUNT(*) AS new_tokens
      FROM first_seen GROUP BY 1)
    SELECT bucket, new_tokens,
           CAST(SUM(new_tokens) OVER (ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_vocab
    FROM per_bucket
    """,
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth per doc-bucket
    (textstats.vocab_growth): first-occurrence partial agg keyed on
    token; the cumulative window runs over buckets only."""
    return textstats.vocab_growth(load_table(spark, sf_dir, "documents"))


# ═══ M2: shape ops (mapper idioms P1/P5/P14/P9) ═════════════════════════


@register(
    "map_project",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) AS revenue,
           l_quantity > 25 AS bulk
    FROM lineitem
    """,
)
def q_map_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape.map_project(load_table(spark, sf_dir, "lineitem"))


@register(
    "map_explode",
    oracle=f"""
    SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents
    """,
)
def q_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape.map_explode(load_table(spark, sf_dir, "documents"))


@register(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem WHERE l_quantity >= 45 AND l_discount >= 0.05
    """,
)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape.filter_predicate(load_table(spark, sf_dir, "lineitem"))


@register(
    "parse_props_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY k
    """,
)
def q_parse_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape.parse_props(load_table(spark, sf_dir, "events"))


@register(
    "input_file_tag",
    oracle="SELECT 'orders' AS src, COUNT(*) AS n_rows FROM orders",
)
def q_input_file_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shape.input_file_tag(load_table(spark, sf_dir, "orders"))


# ═══ M2: set ops (P7/P8 + gap rows) ═════════════════════════════════════


@register(
    "union_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setops.union_all(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "supplier")
    )


@register(
    "multi_source_union",
    oracle="""
    SELECT 'customer' AS src, c_custkey AS id, c_name AS name, c_acctbal AS acctbal
    FROM customer
    UNION ALL
    SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name, s_acctbal AS acctbal
    FROM supplier
    """,
)
def q_multi_source_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setops.multi_source_union(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "supplier")
    )


@register(
    "intersect_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setops.intersect_keys(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "supplier")
    )


@register(
    "except_keys",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q_except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return setops.except_keys(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "supplier")
    )


# ═══ M3: joins (L10/L11 + gap rows) ═════════════════════════════════════


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_inner(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "customer")
    )


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_left(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_semi(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_anti(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "join_broadcast_dim",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_broadcast_dim(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "bucketed_colocated_join",
    oracle="""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_lines,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def q_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free fact⋈fact join via bucketed storage
    (sources/bucketed.py): orders and lineitem are written once,
    bucketed 8 ways on orderkey, then joined WITHOUT any exchange on
    either side (plan asserted in tests/test_bucketed.py) — the
    pay-the-shuffle-once-at-write pattern that converts a nightly
    100 TB fact join into a co-located bucket merge."""
    from dumbo_spark.functions.numeric import dsum
    from dumbo_spark.sources.bucketed import colocated_join, write_bucketed
    from dumbo_spark.streaming.runners import _scratch_dir

    base = _scratch_dir(prefix="dumbo_spark_buckets_")
    write_bucketed(
        load_table(spark, sf_dir, "orders"),
        "dsb_orders", "o_orderkey", 8, f"{base}/orders",
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "dsb_lineitem", "o_orderkey", 8, f"{base}/lineitem",
    )
    return (
        colocated_join(spark, "dsb_orders", "dsb_lineitem", "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.countDistinct("o_orderkey").alias("n_orders"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


@register(
    "dpp_partitioned_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price
    FROM orders o
    JOIN (SELECT DISTINCT o_orderpriority FROM orders
          WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) d
      ON d.o_orderpriority = o.o_orderpriority
    GROUP BY o.o_orderpriority
    """,
)
def q_dpp_partitioned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a Hive-partitioned layout
    (sources/bucketed.py::write_partitioned): orders written
    partitioned by o_orderpriority, then joined to a selective dim the
    optimizer only resolves at runtime — DPP injects the dim's
    surviving keys into the fact scan's PartitionFilters
    (``dynamicpruning#`` subquery, asserted in tests/test_plans.py),
    so 3 of 5 partition directories are never opened. The
    directory-skipping twin of bucketed_colocated_join's
    shuffle-elimination."""
    from dumbo_spark.functions.numeric import dsum
    from dumbo_spark.sources.bucketed import write_partitioned
    from dumbo_spark.streaming.runners import _scratch_dir

    base = _scratch_dir(prefix="dumbo_spark_dpp_")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, "o_orderpriority", f"{base}/orders_part")
    fact = spark.read.parquet(f"{base}/orders_part")
    dim = (
        orders.where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        )
        .select("o_orderpriority")
        .distinct()
    )
    return (
        fact.join(dim, "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice", "sum_price"),
        )
    )


# ═══ M3: order / rank (L5-L7 + gap row) ═════════════════════════════════


@register(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.topk_per_group(load_table(spark, sf_dir, "orders"), k=3)


@register(
    "bottomk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice ASC, o_orderkey ASC) AS INTEGER) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_bottomk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.bottomk_per_group(load_table(spark, sf_dir, "orders"), k=3)


@register(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
    """,
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.topk_global(load_table(spark, sf_dir, "orders"), k=10)


@register(
    "window_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(RANK() OVER w AS INTEGER) AS rnk,
           CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_bal
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
    """,
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.window_rank(load_table(spark, sf_dir, "customer"))


# ═══ M3/M6: event-time windows (gap rows; batch forms) ══════════════════


@register(
    "ewma_event_volume",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    idx AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY day) AS t
      FROM daily),
    scaled AS (
      SELECT a.event_type, a.day AS day_t, a.t, a.n AS x_t,
             SUM(CAST(CASE WHEN b.t = GREATEST(1, a.t - 33)
                           THEN POWER(3, a.t - b.t)
                           ELSE POWER(3, a.t - b.t)
                                * POWER(4, b.t - GREATEST(1, a.t - 33) - 1)
                      END AS DECIMAL(38,0))
                 * CAST(b.n AS DECIMAL(38,0))) AS s
      FROM idx a JOIN idx b
        ON b.event_type = a.event_type
       AND b.t <= a.t AND b.t >= a.t - 33
      GROUP BY 1, 2, 3, 4)
    SELECT event_type, day_t AS day, x_t AS n_events,
           ROUND(CAST(s AS DOUBLE) / POWER(4, LEAST(t - 1, 33)), 6) AS ewma
    FROM scaled
    """,
)
def q_ewma_event_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-arithmetic EWMA of daily event volume per type
    (events.ewma_event_volume): the float recurrence replaced by
    integer-scaled 3^k·4^m weights summed in DECIMAL — order-
    independent and engine-exact; one nearest-double divide at the
    end. Round-10 sliding restart (ADVICE r9): the window restarts at
    r = max(1, t-33) so every coefficient stays an exact double at ANY
    series length; identical to the r9 formula for T ≤ 34 (fixtures:
    30 days/type). Horizon-bounded self-join, never corpus-sized."""
    return events.ewma_event_volume(load_table(spark, sf_dir, "events"))


@register(
    "events_by_day",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY day, event_type
    """,
)
def q_events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.events_by_day(load_table(spark, sf_dir, "events"))


@register(
    "events_tumbling_1h",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY window_start, event_type
    """,
)
def q_events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.events_tumbling_1h(load_table(spark, sf_dir, "events"))


@register(
    "event_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY CAST(ts AS TIMESTAMP), event_id))
    SELECT event_type, COUNT(*) AS n_gaps,
           ROUND(AVG(gap_us), 4) AS avg_gap_us,
           ROUND(quantile_cont(gap_us, 0.5), 4) AS p50_gap_us,
           ROUND(quantile_cont(gap_us, 0.95), 4) AS p95_gap_us
    FROM gaps WHERE gap_us IS NOT NULL GROUP BY event_type
    """,
)
def q_event_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event cadence profile (events.event_gap_stats)."""
    return events.event_gap_stats(load_table(spark, sf_dir, "events"))


@register(
    "value_anomalies",
    oracle="""
    WITH stats AS (
      SELECT user_id, event_type,
             COUNT(*) AS n, AVG(value) AS mean, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY user_id, event_type
      HAVING COUNT(*) >= 2 AND STDDEV_SAMP(value) > 0)
    SELECT e.event_id, e.user_id, e.event_type, e.value,
           ROUND((e.value - s.mean) / s.sd, 4) AS z
    FROM events e
    JOIN stats s ON e.user_id = s.user_id AND e.event_type = s.event_type
    WHERE ABS(ROUND((e.value - s.mean) / s.sd, 4)) > 3.0
    """,
)
def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outliers per (user, event type) — events.value_anomalies:
    partial-agg moments + equi-join back (no per-group window), so a
    skewed user never creates a single-task partition."""
    return events.value_anomalies(load_table(spark, sf_dir, "events"))


@register(
    "user_retention",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'))
               AS cohort_day
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id,
             strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS active_day
      FROM events)
    SELECT f.cohort_day,
           CAST(date_diff('day', CAST(f.cohort_day AS DATE),
                          CAST(a.active_day AS DATE)) AS INTEGER)
             AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM active a JOIN first f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    """,
)
def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix (events.user_retention): first-seen
    partial agg + distinct activity days + user-keyed equi-join +
    final partial agg — no window, skew-safe at any fan-in."""
    return events.user_retention(load_table(spark, sf_dir, "events"))


@register(
    "value_drift_screen",
    oracle="""
    WITH hist AS (
      SELECT event_type,
             CAST(floor(CAST(value AS DECIMAL(18,2)) / CAST(10.0 AS DECIMAL(18,2)))
                  AS BIGINT) AS bucket,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_new
      FROM events GROUP BY event_type, bucket),
    gaps AS (
      SELECT event_type,
             CAST(SUM(n_old) OVER t AS BIGINT) AS n_old_total,
             CAST(SUM(n_new) OVER t AS BIGINT) AS n_new_total,
             abs(CAST(SUM(n_old) OVER w AS DOUBLE) / SUM(n_old) OVER t
                 - CAST(SUM(n_new) OVER w AS DOUBLE) / SUM(n_new) OVER t) AS g
      FROM hist
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             t AS (PARTITION BY event_type))
    SELECT event_type, n_old_total, n_new_total,
           ROUND(MAX(g), 6) AS ks_stat
    FROM gaps GROUP BY event_type, n_old_total, n_new_total
    """,
)
def q_value_drift_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed two-sample KS drift monitor (events.value_drift_screen):
    windows run over the per-type histogram, never the event stream."""
    return events.value_drift_screen(load_table(spark, sf_dir, "events"))


@register(
    "value_anomalies_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, event_type, quantile_cont(value, 0.5) AS m
      FROM events GROUP BY user_id, event_type),
    dev AS (
      SELECT e.event_id, e.user_id, e.event_type, e.value,
             abs(e.value - med.m) AS d
      FROM events e JOIN med USING (user_id, event_type)),
    mad AS (
      SELECT user_id, event_type, quantile_cont(d, 0.5) AS md
      FROM dev GROUP BY user_id, event_type)
    SELECT dev.event_id, dev.user_id, dev.event_type, dev.value,
           ROUND(dev.d / (1.4826 * mad.md), 4) AS robust_z
    FROM dev JOIN mad USING (user_id, event_type)
    WHERE mad.md > 0 AND dev.d / (1.4826 * mad.md) > 3.5
    """,
)
def q_value_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier screen (events.value_anomalies_mad) —
    the heavy-contamination twin of value_anomalies; same join-back
    shape, no windows, skew-safe."""
    return events.value_anomalies_mad(load_table(spark, sf_dir, "events"))


@register(
    "user_streaks",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    isl AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM active),
    st AS (
      SELECT user_id, anchor, COUNT(*) AS streak_len
      FROM isl GROUP BY user_id, anchor)
    SELECT user_id,
           CAST(SUM(streak_len) AS BIGINT) AS n_active_days,
           MAX(streak_len) AS longest_streak,
           COUNT(*) AS n_streaks
    FROM st GROUP BY user_id
    """,
)
def q_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands, islands half (events.user_streaks): longest
    consecutive-day streak per user via the day − row_number anchor.
    Window input is distinct days (calendar-bounded per user), then
    partial aggs — no event-volume window."""
    return events.user_streaks(load_table(spark, sf_dir, "events"))


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS next_type
      FROM events),
    m AS (
      SELECT event_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type)
    SELECT event_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE),
                 6) AS p
    FROM m
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix (events.event_transitions):
    lead window on user_id + partial-agg counts; the probability
    normalizer windows over the |types|² aggregate, small by
    construction."""
    return events.event_transitions(load_table(spark, sf_dir, "events"))


@register(
    "time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(value AS DECIMAL(18,2)) AS v,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             lead(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id
                     ORDER BY CAST(ts AS TIMESTAMP), event_id) AS nxt
      FROM events)
    SELECT user_id,
           COUNT(*) AS n_segments,
           CAST(SUM(nxt - us) AS BIGINT) AS total_us,
           ROUND(CAST(SUM(v * (nxt - us)) AS DOUBLE)
                 / CAST(SUM(nxt - us) AS DOUBLE), 6) AS twa_value
    FROM seq WHERE nxt IS NOT NULL GROUP BY user_id
    """,
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF time-weighted mean of value per user
    (events.time_weighted_avg): exact integer-µs weights × exact
    decimal values, one window shuffle + one partial agg; only the
    final division is floating-point, identical in both engines."""
    return events.time_weighted_avg(load_table(spark, sf_dir, "events"))


@register(
    "trailing_window_totals",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
           COUNT(*) OVER w AS n_trailing,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_trailing
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def q_trailing_window_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-interval frame (variable-width trailing hour) — the frame
    class dumbo's sorted-reduce idiom could only approximate with
    per-key buffering in user code."""
    return events.trailing_window_totals(load_table(spark, sf_dir, "events"))


@register(
    "events_sessionized",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sessions AS (
      SELECT user_id, event_id, ts, value,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           COUNT(*) AS n_events,
           epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS session_start_us,
           epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS session_end_us,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_events_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.events_sessionized(load_table(spark, sf_dir, "events"))


@register(
    "copresence_sessions",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sessions AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged),
    spans AS (
      SELECT user_id, session_id,
             epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS s,
             epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS e
      FROM sessions GROUP BY user_id, session_id)
    SELECT a.user_id AS user_a, b.user_id AS user_b, COUNT(*) AS n_overlaps
    FROM spans a JOIN spans b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id, b.user_id
    """,
)
def q_copresence_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join over session spans
    (temporal.copresence_sessions): hour-grid bucketing turns the
    overlap predicate into an equi-join; the oracle states the naive
    inequality join the operator must equal."""
    return temporal.copresence_sessions(load_table(spark, sf_dir, "events"))


@register(
    "cumulative_new_users",
    oracle="""
    WITH first AS (
      SELECT user_id, MIN(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS day
      FROM events GROUP BY user_id),
    daily AS (SELECT day, COUNT(*) AS new_users FROM first GROUP BY day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily
    """,
)
def q_cumulative_new_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily acquisition curve (events.cumulative_new_users):
    first-seen partial agg + running sum over the calendar-bounded
    daily aggregate."""
    return events.cumulative_new_users(load_table(spark, sf_dir, "events"))


@register(
    "customer_rfm",
    oracle="""
    WITH per AS (
      SELECT o_custkey AS c_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM orders GROUP BY o_custkey),
    anchor AS (SELECT MAX(last_order) AS a FROM per),
    withr AS (
      SELECT c_custkey,
             CAST(date_diff('day', last_order, a) AS INTEGER) AS recency_days,
             frequency, monetary
      FROM per CROSS JOIN anchor),
    b AS (SELECT quantile_cont(recency_days, 0.5) AS r50,
                 quantile_cont(frequency, 0.5) AS f50,
                 quantile_cont(monetary, 0.5) AS m50 FROM withr)
    SELECT c_custkey, recency_days, frequency, monetary,
           CASE WHEN recency_days <= r50 AND frequency >= f50 AND monetary >= m50
                  THEN 'champion'
                WHEN recency_days <= r50 AND frequency >= f50 THEN 'loyal'
                WHEN recency_days <= r50 AND monetary >= m50 THEN 'big_spender'
                WHEN recency_days <= r50 THEN 'promising'
                WHEN frequency >= f50 OR monetary >= m50 THEN 'at_risk'
                ELSE 'hibernating' END AS segment
    FROM withr CROSS JOIN b
    """,
)
def q_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation (analytics.customer_rfm): per-customer partial
    agg + broadcast as-of/median boundaries — threshold compares, not
    global ranks, so the plan is scan-shaped at any customer count."""
    return analytics.customer_rfm(load_table(spark, sf_dir, "orders"))


@register(
    "conversion_lag_histogram",
    oracle="""
    WITH per AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p
      FROM events GROUP BY user_id)
    SELECT CAST(floor((p - v) / 86400000000.0) AS BIGINT) AS lag_days,
           COUNT(*) AS n_users
    FROM per WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
    GROUP BY lag_days
    """,
)
def q_conversion_lag_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution (events.conversion_lag_histogram):
    conditional-min partial agg per user + per-bucket count."""
    return events.conversion_lag_histogram(load_table(spark, sf_dir, "events"))


# (semantic_dedup is registered next to embedding_near_dup further
# down — its r13 full-value oracle reuses the _duck_lsh_sig/_duck_dot
# SQL helpers, which are defined just before the ANN family.)


@register("hll_partitioned_counts")  # rows-only: sketch estimate is engine-specific
def q_hll_partitioned_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch rollup (agg.hll_partitioned_counts):
    per-(day, type) Datasketches HLL, unioned per type — the
    incremental pre-aggregation pattern for 100 TB distinct counts;
    error vs exact pinned in tests/test_round4_ops.py."""
    return agg.hll_partitioned_counts(load_table(spark, sf_dir, "events"))


@register(
    "snapshot_diff",
    oracle="""
    WITH o AS (
      SELECT l_orderkey,
             COUNT(*) AS n_old,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m_old
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
      GROUP BY l_orderkey),
    n AS (
      SELECT l_orderkey,
             COUNT(*) AS n_new,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS m_new
      FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT CASE WHEN o.n_old IS NULL THEN 'added'
                  WHEN n.n_new IS NULL THEN 'removed'
                  WHEN o.n_old <> n.n_new OR o.m_old <> n.m_new THEN 'changed'
                  ELSE 'unchanged' END AS status,
             COALESCE(n.n_new, 0) - COALESCE(o.n_old, 0) AS d
      FROM o FULL OUTER JOIN n ON o.l_orderkey = n.l_orderkey)
    SELECT status,
           COUNT(*) AS n_keys,
           CAST(SUM(d) AS BIGINT) AS row_delta
    FROM j GROUP BY status
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot census (setops.snapshot_diff): per-order lineitem
    aggregates as-of 1999-01-01 vs today, full-outer compared on the
    shared key partitioning; exact decimal measures make the
    changed/unchanged split deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    return setops.snapshot_diff(
        old=li.where(F.col("l_shipdate") < F.lit("1999-01-01")),
        new=li,
        key="l_orderkey",
        measure="l_quantity",
    )


@register(
    "pareto_concentration",
    oracle="""
    WITH rev AS (
      SELECT c.c_nationkey, o.o_custkey,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS r
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_nationkey, o.o_custkey),
    ranked AS (
      SELECT n.n_name, rev.o_custkey, rev.r,
             row_number() OVER w AS rk,
             SUM(rev.r) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum,
             SUM(rev.r) OVER (PARTITION BY n.n_name) AS tot,
             COUNT(*) OVER (PARTITION BY n.n_name) AS n
      FROM rev JOIN nation n ON rev.c_nationkey = n.n_nationkey
      WINDOW w AS (PARTITION BY n.n_name ORDER BY rev.r DESC, rev.o_custkey))
    SELECT n_name,
           CAST(MIN(n) AS BIGINT) AS n_customers,
           CAST(MIN(rk) AS BIGINT) AS n_top80,
           ROUND(CAST(MIN(rk) AS DOUBLE) / CAST(MIN(n) AS DOUBLE), 4)
             AS top80_share
    FROM ranked WHERE 5 * cum >= 4 * tot
    GROUP BY n_name
    """,
)
def q_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 revenue concentration per nation
    (analytics.pareto_concentration): exact-decimal running shares, an
    integer-scaled 80% cut, windows over the per-customer AGGREGATE."""
    return analytics.pareto_concentration(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sessions AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id,
             ts
      FROM flagged),
    per_session AS (
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             MIN(CAST(ts AS TIMESTAMP)) AS start_ts
      FROM sessions GROUP BY user_id, session_id)
    SELECT strftime(date_trunc('day', start_ts), '%Y-%m-%d') AS day,
           COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
    FROM per_session GROUP BY day
    """,
)
def q_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily single-event-session share (events.bounce_rate), layered
    on the events_sessionized islands rollup."""
    return events.bounce_rate(load_table(spark, sf_dir, "events"))


@register(
    "dau_wau_stickiness",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS d
      FROM events),
    dau AS (SELECT d AS metric_day, COUNT(DISTINCT user_id) AS dau
            FROM active GROUP BY d),
    contrib AS (
      SELECT DISTINCT user_id,
             CAST(UNNEST(generate_series(d, d + 6, INTERVAL 1 DAY)) AS DATE)
               AS metric_day
      FROM active),
    wau AS (SELECT metric_day, COUNT(DISTINCT user_id) AS wau
            FROM contrib GROUP BY metric_day)
    SELECT strftime(dau.metric_day, '%Y-%m-%d') AS day,
           dau.dau AS dau,
           wau.wau AS wau,
           ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
             AS stickiness
    FROM dau JOIN wau ON dau.metric_day = wau.metric_day
    """,
)
def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU engagement ratio (events.dau_wau_stickiness): sliding
    COUNT(DISTINCT) via bounded ×7 contribution explode — partial-agg
    groupBys only, no window."""
    return events.dau_wau_stickiness(load_table(spark, sf_dir, "events"))


@register(
    "scd2_state_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id)
             - row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY CAST(ts AS TIMESTAMP), event_id)
               AS anchor
      FROM events),
    runs AS (
      SELECT user_id, event_type, anchor,
             MIN(us) AS valid_from_us,
             COUNT(*) AS n_events
      FROM seq GROUP BY user_id, event_type, anchor)
    SELECT user_id,
           event_type AS state,
           valid_from_us,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) AS valid_to_us,
           n_events,
           lead(valid_from_us) OVER (PARTITION BY user_id
                                     ORDER BY valid_from_us) IS NULL
             AS is_current
    FROM runs
    """,
)
def q_scd2_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 validity intervals from the event log
    (events.scd2_state_intervals): consecutive same-state runs collapse
    via the double-row_number islands anchor; open-ended current rows
    carry NULL valid_to."""
    return events.scd2_state_intervals(load_table(spark, sf_dir, "events"))


@register(
    "winsorized_stats",
    oracle="""
    WITH bounds AS (
      SELECT l_returnflag,
             CAST(ROUND(quantile_cont(l_extendedprice, 0.05), 2)
                  AS DECIMAL(18,2)) AS lo,
             CAST(ROUND(quantile_cont(l_extendedprice, 0.95), 2)
                  AS DECIMAL(18,2)) AS hi
      FROM lineitem GROUP BY l_returnflag)
    SELECT l.l_returnflag,
           COUNT(*) AS n_rows,
           CAST(MIN(b.lo) AS DOUBLE) AS clip_lo,
           CAST(MIN(b.hi) AS DOUBLE) AS clip_hi,
           CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DECIMAL(18,2)) < b.lo
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
           CAST(SUM(CASE WHEN CAST(l.l_extendedprice AS DECIMAL(18,2)) > b.hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi,
           ROUND(CAST(SUM(LEAST(GREATEST(
                   CAST(l.l_extendedprice AS DECIMAL(18,2)), b.lo), b.hi))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 4) AS winsor_mean
    FROM lineitem l JOIN bounds b USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-clipped robust mean per group (agg.winsorized_stats):
    2dp-decimal clip bounds make the clipped sum exact; percentile pass
    broadcasts back onto a scan-aggregate."""
    return agg.winsorized_stats(load_table(spark, sf_dir, "lineitem"))


@register(
    "timeseries_gapfill",
    oracle="""
    WITH daily AS (
      SELECT user_id, day, value FROM (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
               value,
               row_number() OVER (
                 PARTITION BY user_id, date_trunc('day', CAST(ts AS TIMESTAMP))
                 ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1),
    span AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1
             FROM daily GROUP BY user_id),
    grid AS (
      SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
               AS day
      FROM span)
    SELECT g.user_id,
           strftime(g.day, '%Y-%m-%d') AS day,
           last_value(d.value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled,
           d.value IS NOT NULL AS is_observed
    FROM grid g LEFT JOIN daily d ON g.user_id = d.user_id AND g.day = d.day
    """,
)
def q_timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily LOCF resample per user (events.timeseries_gapfill) —
    values pass through with no arithmetic, so the fill is hash-exact;
    grid + fill co-partition on user_id."""
    return events.timeseries_gapfill(load_table(spark, sf_dir, "events"))


@register(
    "group_regression",
    oracle="""
    WITH pre AS (
      SELECT event_type,
             date_diff('day', DATE '1970-01-01',
                       CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
               AS x,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events),
    sums AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(x) AS sx,
             SUM(CAST(x AS BIGINT) * x) AS sxx,
             SUM(v) AS sy,
             SUM(v * CAST(x AS DECIMAL(18,0))) AS sxy,
             SUM(v * v) AS syy
      FROM pre GROUP BY event_type)
    SELECT event_type,
           n AS n_points,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
           ROUND((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
           ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM sums
    """,
)
def q_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS value-vs-day trend (events.group_regression):
    exact integer/decimal co-moment sums, closed-form double finish —
    deterministic regr_slope/intercept/r2."""
    return events.group_regression(load_table(spark, sf_dir, "events"))


