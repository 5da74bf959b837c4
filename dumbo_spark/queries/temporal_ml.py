"""Temporal as-of/range operators + the LLM-data-pipeline ladder (quality screens, LM scores, mixing) — mechanically split out of registry.py in round 13
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


# ═══ temporal operators: as-of / range join / cascade rollup ════════════


@register(
    "asof_last_click",
    oracle="""
    WITH carried AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS last_src_id,
             last_value(CASE WHEN event_type = 'click'
                             THEN epoch_us(CAST(ts AS TIMESTAMP)) END
                        IGNORE NULLS) OVER w AS last_src_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           event_id AS target_id,
           last_src_id AS source_id,
           us - last_src_us AS gap_us
    FROM carried
    WHERE event_type = 'purchase' AND last_src_id IS NOT NULL
    """,
)
def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.asof_last_event(load_table(spark, sf_dir, "events"))


@register(
    "asof_last_click_bounded",
    oracle="""
    WITH carried AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER w AS last_src_id,
             last_value(CASE WHEN event_type = 'click'
                             THEN epoch_us(CAST(ts AS TIMESTAMP)) END
                        IGNORE NULLS) OVER w AS last_src_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT user_id,
           event_id AS target_id,
           last_src_id AS source_id,
           us - last_src_us AS gap_us
    FROM carried
    WHERE event_type = 'purchase' AND last_src_id IS NOT NULL
      AND us - last_src_us <= 600000000
    """,
)
def q_asof_last_click_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of with a 10-minute max-staleness bound
    (temporal.asof_last_event tolerance_sec) — the windowed-aj form
    event enrichment needs; same one-shuffle carried-forward plan."""
    return temporal.asof_last_event(
        load_table(spark, sf_dir, "events"), tolerance_sec=600
    )


@register(
    "events_range_join",
    oracle="""
    SELECT a.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us_a FROM events) a
    JOIN (SELECT user_id AS u2, epoch_us(CAST(ts AS TIMESTAMP)) AS us_b FROM events) b
      ON a.user_id = b.u2
     AND b.us_b > a.us_a
     AND b.us_b - a.us_a <= 60000000
    GROUP BY a.user_id
    """,
)
def q_events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return temporal.range_self_join(load_table(spark, sf_dir, "events"))


@register(
    "click_attribution",
    oracle="""
    SELECT p.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/windows.py::click_purchase_stream_join —
    the SAME function body (watermarks are no-ops on static frames), so
    this oracle transitively checks the stream-stream interval join the
    streaming test proves equal to it."""
    from dumbo_spark.streaming.windows import click_purchase_stream_join

    ev = load_table(spark, sf_dir, "events")
    return click_purchase_stream_join(
        ev.where(F.col("event_type") == "click"),
        ev.where(F.col("event_type") == "purchase"),
    )


@register(
    "doc_pagerank",
    # Promoted from rows-only in r11 (VERDICT r10 Next #3): the edge
    # set now comes from the md5-derived engine-neutral MinHash-LSH
    # pipeline (dedup.dedup_fuzzy_verified_md5), so DuckDB reproduces
    # signatures, banding, candidate screen, and exact verification
    # byte-for-byte, then re-runs the power iteration level by level
    # with pagerank_checked's iteration-counter recursive CTE.
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    dg AS (SELECT DISTINCT doc_id, gram FROM grams),
    hd AS (
      SELECT doc_id, d, md5(CAST(d AS VARCHAR) || ':' || gram) AS hx
      FROM dg, UNNEST(generate_series(0, 7)) AS u(d)),
    hs AS (
      SELECT doc_id, d * 4 + l AS i, MIN(substr(hx, l * 8 + 1, 8)) AS h
      FROM hd, UNNEST(generate_series(0, 3)) AS v(l)
      GROUP BY doc_id, d * 4 + l),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS s FROM hs GROUP BY doc_id),
    bands AS (
      SELECT doc_id, s,
             md5(CAST(t AS VARCHAR) || '|' ||
                 s[4*t+1] || s[4*t+2] || s[4*t+3] || s[4*t+4]) AS band_key
      FROM sig, UNNEST(generate_series(0, 7)) AS b(t)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
      WHERE len(list_filter(generate_series(1, 32),
                            i -> a.s[i] = b.s[i])) >= 12),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS c
      FROM cand c JOIN dg x ON x.doc_id = c.doc_a
                  JOIN dg y ON y.doc_id = c.doc_b AND y.gram = x.gram
      GROUP BY 1, 2),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE 10 * i.c >= 7 * (sa.n + sb.n - i.c)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr(it, node, rank) AS (
      SELECT 0, src, 1.0 / (SELECT n FROM nn) FROM deg
      UNION ALL
      SELECT it + 1, e.dst,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
               + 0.85 * SUM(pr.rank / deg.d)
      FROM pr JOIN edges e ON pr.node = e.src JOIN deg ON e.src = deg.src
      WHERE it < 10
      GROUP BY it + 1, e.dst)
    SELECT node AS doc_id, ROUND(rank, 6) AS rank
    FROM pr WHERE it = 10
    """,
)
def q_doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the LSH-verified near-dup graph (dedup.pagerank
    over dedup.dedup_fuzzy_verified_md5 edges) — centrality within
    duplicate clusters. r11 promotion: the md5 hash family makes the
    FULL pipeline (signatures → bands → candidates → exact-Jaccard
    verify → 10 power iterations) value-checked against DuckDB;
    sibling pagerank_checked keeps the deterministic PPJoin edge set,
    and dedup_fuzzy_verified keeps the xxhash64 throughput family."""
    docs = load_table(spark, sf_dir, "documents")
    edges = dedup.dedup_fuzzy_verified_md5(docs)
    return dedup.pagerank(edges, max_iter=10).select(
        "doc_id", F.round("rank", 6).alias("rank")
    )


@register(
    "sample_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey)
                  AS INTEGER) AS sample_rank
      FROM orders)
    WHERE sample_rank <= 5
    """,
)
def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-order k-per-group sample
    (sampling.sample_per_group) — reproducible across engines, hence
    the exact oracle."""
    return sampling.sample_per_group(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderkey", k=5
    )


@register(
    "sample_exact_n",
    oracle="""
    SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key
    FROM documents
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 300
    """,
)
def q_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic exact-n global sample (sampling.sample_exact_n):
    hash-order + limit compiles to TakeOrderedAndProject (per-task
    heap, no global sort) — the scale-safe reservoir equivalent."""
    return sampling.sample_exact_n(
        load_table(spark, sf_dir, "documents"), "doc_id", n=300
    )


@register(
    "weighted_sample",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, n_chars AS weight,
             ln(({sampling.sql_md5_u32('doc_id')} + 1) / 4294967296.0)
               / CAST(GREATEST(n_chars, 1) AS DOUBLE) AS s
      FROM documents)
    SELECT doc_id, weight, ROUND(s, 6) AS es_key
    FROM scored ORDER BY s DESC, doc_id LIMIT 200
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample without replacement, exact
    n, n_chars-weighted (sampling.weighted_sample): hash-derived
    uniform variate makes the draw engine-stable; orderBy+limit is
    TakeOrderedAndProject, no global sort."""
    return sampling.weighted_sample(
        load_table(spark, sf_dir, "documents"), "n_chars", n=200
    )


@register(
    "source_mix_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS cnt FROM documents GROUP BY source),
    tot AS (
      SELECT CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS k FROM counts)
    SELECT d.doc_id, d.source
    FROM documents d
    JOIN counts c ON d.source = c.source
    CROSS JOIN tot
    WHERE ({sampling.sql_md5_u32('d.doc_id')} % 1000000)
          < ((1000000 * tot.total) // (tot.k * c.cnt))
    """,
)
def q_source_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform domain-mix rebalance (sampling.source_mix_rebalance):
    per-source keep-probability min(1, total/(k·count)), decided by an
    integer hash-bucket compare — exact, no floats; counts partial-agg
    + broadcast join, keep decision is a scan predicate."""
    return sampling.source_mix_rebalance(load_table(spark, sf_dir, "documents"))


@register(
    "cross_source_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT
             md5(array_to_string(({DUCK_TOKENS})[1:8], ' ')) AS h,
             source
      FROM documents)
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(DISTINCT a.h) AS n_shared
    FROM h a JOIN h b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-pair contamination matrix (dedup.cross_source_overlap):
    distinct (prefix-fingerprint, source) pairs self-joined on the
    hash — shuffle carries 16-byte keys, fan-out bounded by source
    count."""
    return dedup.cross_source_overlap(load_table(spark, sf_dir, "documents"))


@register(
    "asof_next_purchase",
    oracle="""
    WITH carried AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             first_value(CASE WHEN event_type = 'purchase' THEN event_id END
                         IGNORE NULLS) OVER w AS next_src_id,
             first_value(CASE WHEN event_type = 'purchase'
                              THEN epoch_us(CAST(ts AS TIMESTAMP)) END
                         IGNORE NULLS) OVER w AS next_src_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING))
    SELECT user_id,
           event_id AS target_id,
           next_src_id AS source_id,
           next_src_us - us AS gap_us
    FROM carried
    WHERE event_type = 'click' AND next_src_id IS NOT NULL
    """,
)
def q_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join (temporal.asof_next_event): each click's next
    purchase by the same user."""
    return temporal.asof_next_event(
        load_table(spark, sf_dir, "events"),
        target_type="click",
        source_type="purchase",
    )


@register(
    "conversion_funnel",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
             list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (WHERE event_type = 'click')) AS clicks,
             list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (WHERE event_type = 'purchase')) AS purchases
      FROM events GROUP BY user_id),
    st AS (
      SELECT user_id, t_view, clicks, purchases,
             list_min(list_filter(clicks, x -> x > t_view)) AS t_click
      FROM pu),
    st2 AS (
      SELECT user_id, t_view, t_click,
             list_min(list_filter(purchases, x -> x > t_click)) AS t_purchase
      FROM st),
    c AS (SELECT COUNT(t_view) AS v, COUNT(t_click) AS k,
                 COUNT(t_purchase) AS p FROM st2)
    SELECT '1_view' AS stage, v AS n_users FROM c
    UNION ALL SELECT '2_click', k FROM c
    UNION ALL SELECT '3_purchase', p FROM c
    """,
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view→click→purchase funnel (temporal.conversion_funnel)."""
    return temporal.conversion_funnel(load_table(spark, sf_dir, "events"))


@register(
    "column_profile",
    oracle="""
    SELECT 'l_orderkey' AS "column", COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           COUNT(DISTINCT l_orderkey) AS n_distinct,
           CAST(MIN(l_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
    FROM lineitem
    UNION ALL
    SELECT 'l_quantity', COUNT(*),
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_quantity),
           CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*),
           CAST(SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           COUNT(DISTINCT l_returnflag),
           CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
    FROM lineitem
    """,
)
def q_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-gate data-quality profile (shape.column_profile)."""
    return shape.column_profile(
        load_table(spark, sf_dir, "lineitem"),
        ["l_orderkey", "l_quantity", "l_returnflag"],
    )


@register(
    "key_skew_profile",
    oracle="""
    WITH c AS (
      SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey)
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(cnt) AS BIGINT) AS n_rows,
           MAX(cnt) AS max_cnt,
           ROUND(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
           ROUND(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
           ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
             AS top1_share
    FROM c
    """,
)
def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnosis (shape.key_skew_profile): per-key count
    distribution summary — the pre-join measurement that picks
    broadcast vs salt vs AQE skew split at 100 TB."""
    return shape.key_skew_profile(load_table(spark, sf_dir, "lineitem"), "l_orderkey")


@register(
    "unpivot_long",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price,
             CAST(COUNT(*) AS DOUBLE) AS n_items
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_items', n_items FROM wide
    """,
)
def q_unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt via stack (shape.unpivot_long) — the inverse of
    pivot_status, completing the reshape family; the melt itself is a
    narrow generator over the aggregated frame."""
    return shape.unpivot_long(load_table(spark, sf_dir, "lineitem"))


@register(
    "copurchase_triangles",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM p2 a JOIN p2 b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
    n AS (SELECT COUNT(DISTINCT x) AS n_nodes
          FROM (SELECT src AS x FROM e UNION ALL SELECT dst FROM e)),
    ne AS (SELECT COUNT(*) AS n_edges FROM e),
    t AS (SELECT COUNT(*) AS n_triangles
          FROM e e1
          JOIN e e2 ON e1.dst = e2.src
          JOIN e e3 ON e1.src = e3.src AND e2.dst = e3.dst)
    SELECT n.n_nodes, ne.n_edges, t.n_triangles
    FROM n CROSS JOIN ne CROSS JOIN t
    """,
)
def q_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-purchase graph
    (graph.copurchase_triangles): basket-bounded pairing, support-
    thresholded edges, a<b<c enumeration — three equi-joins, no
    iteration, no cross join."""
    return graph.copurchase_triangles(load_table(spark, sf_dir, "lineitem"))


@register(
    "weekday_weekend_mix",
    oracle="""
    SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
           CAST(SUM(CASE WHEN dayofweek(CAST(CAST(o_orderdate AS TIMESTAMP)
                                             AS DATE)) IN (0, 6)
                         THEN 0 ELSE 1 END) AS BIGINT) AS weekday_orders,
           CAST(SUM(CASE WHEN dayofweek(CAST(CAST(o_orderdate AS TIMESTAMP)
                                             AS DATE)) IN (0, 6)
                         THEN 1 ELSE 0 END) AS BIGINT) AS weekend_orders,
           CAST(SUM(CASE WHEN dayofweek(CAST(CAST(o_orderdate AS TIMESTAMP)
                                             AS DATE)) IN (0, 6)
                         THEN CAST(0 AS DECIMAL(18,2))
                         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END)
                AS DOUBLE) AS weekday_revenue,
           CAST(SUM(CASE WHEN dayofweek(CAST(CAST(o_orderdate AS TIMESTAMP)
                                             AS DATE)) IN (0, 6)
                         THEN CAST(o_totalprice AS DECIMAL(18,2))
                         ELSE CAST(0 AS DECIMAL(18,2)) END)
                AS DOUBLE) AS weekend_revenue,
           ROUND(CAST(SUM(CASE WHEN dayofweek(CAST(CAST(o_orderdate
                                  AS TIMESTAMP) AS DATE)) IN (0, 6)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS weekend_share
    FROM orders GROUP BY month ORDER BY month
    """,
)
def q_weekday_weekend_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly weekday/weekend order and revenue mix
    (analytics.weekday_weekend_mix); DuckDB dayofweek 0=Sun..6=Sat vs
    Spark 1=Sun..7=Sat handled per engine."""
    return analytics.weekday_weekend_mix(load_table(spark, sf_dir, "orders"))


@register(
    "region_revenue_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_region_revenue_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region→nation revenue drill-down with subtotals
    (analytics.region_revenue_rollup): broadcast dims + ROLLUP."""
    return analytics.region_revenue_rollup(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "corpus_source_concentration",
    oracle=f"""
    WITH per AS (
      SELECT source,
             COUNT(*) AS n_docs,
             SUM(len({DUCK_TOKENS})) AS n_tokens
      FROM documents GROUP BY source),
    t AS (SELECT SUM(n_tokens) AS tt FROM per),
    shared AS (
      SELECT source, n_docs, n_tokens,
             ROUND(CAST(n_tokens AS DOUBLE) / (SELECT tt FROM t), 6)
               AS token_share
      FROM per),
    h AS (
      SELECT ROUND(SUM(POW(CAST(n_tokens AS DOUBLE)
                           / (SELECT tt FROM t), 2)) * 10000.0, 4)
               AS corpus_hhi
      FROM per)
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           token_share,
           (SELECT corpus_hhi FROM h) AS corpus_hhi
    FROM shared
    """,
)
def q_corpus_source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-weighted source concentration + corpus HHI
    (textstats.corpus_source_concentration)."""
    return textstats.corpus_source_concentration(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "event_mix_weekly_drift",
    oracle="""
    WITH cell AS (
      SELECT strftime(date_trunc('week', CAST(ts AS TIMESTAMP)),
                      '%Y-%m-%d') AS week,
             event_type, COUNT(*) AS c
      FROM events GROUP BY week, event_type),
    grid AS (
      SELECT w.week, t.event_type
      FROM (SELECT DISTINCT week FROM cell) w
      CROSS JOIN (SELECT DISTINCT event_type FROM cell) t),
    filled AS (
      SELECT g.week, g.event_type, COALESCE(c.c, 0) AS c
      FROM grid g LEFT JOIN cell c
        ON g.week = c.week AND g.event_type = c.event_type),
    shares AS (
      SELECT week, event_type,
             CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY week) AS share,
             SUM(c) OVER (PARTITION BY week) AS n
      FROM filled),
    d AS (
      SELECT week, n, share,
             lag(share) OVER (PARTITION BY event_type ORDER BY week) AS prev
      FROM shares)
    SELECT week,
           CAST(MAX(n) AS BIGINT) AS n_events,
           CASE WHEN COUNT(prev) > 0
                THEN ROUND(SUM(ABS(share - prev)), 6) END AS l1_drift
    FROM d GROUP BY week ORDER BY week
    """,
)
def q_event_mix_weekly_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week event-type mix drift (L1 distance of share
    vectors over a dense week×type grid;
    events.event_mix_weekly_drift)."""
    return events.event_mix_weekly_drift(load_table(spark, sf_dir, "events"))


@register(
    "user_active_days_histogram",
    oracle="""
    WITH per AS (
      SELECT user_id,
             COUNT(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'))
               AS n_active_days
      FROM events GROUP BY user_id),
    hist AS (
      SELECT n_active_days, COUNT(*) AS n_users
      FROM per GROUP BY n_active_days),
    t AS (SELECT SUM(n_users) AS tt FROM hist)
    SELECT CAST(n_active_days AS BIGINT) AS n_active_days,
           CAST(n_users AS BIGINT) AS n_users,
           ROUND(CAST(n_users AS DOUBLE) / (SELECT tt FROM t), 6) AS share
    FROM hist ORDER BY n_active_days
    """,
)
def q_user_active_days_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-frequency histogram
    (events.user_active_days_histogram): distinct active days per
    user, bucketed."""
    return events.user_active_days_histogram(load_table(spark, sf_dir, "events"))


@register(
    "error_rate_by_hour",
    oracle="""
    SELECT hour(CAST(ts AS TIMESTAMP)) AS hour_of_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
           ROUND(CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS error_rate
    FROM events GROUP BY hour_of_day ORDER BY hour_of_day
    """,
)
def q_error_rate_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal error-share profile (events.error_rate_by_hour)."""
    return events.error_rate_by_hour(load_table(spark, sf_dir, "events"))


@register(
    "distinctive_tokens_by_lang",
    oracle=f"""
    WITH lw AS (
      SELECT lang, word, COUNT(*) AS c_lw
      FROM (SELECT lang, unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY lang, word),
    wt AS (SELECT word, SUM(c_lw) AS c_w FROM lw GROUP BY word),
    lt AS (SELECT lang, SUM(c_lw) AS n_l FROM lw GROUP BY lang),
    nt AS (SELECT SUM(c_lw) AS n FROM lw),
    scored AS (
      SELECT lw.lang, lw.word, lw.c_lw AS n_lang_word,
             ROUND(ln((lw.c_lw + 1.0) / (lt.n_l - lw.c_lw + 1.0))
                   - ln((wt.c_w - lw.c_lw + 1.0)
                        / ((SELECT n FROM nt) - lt.n_l
                           - (wt.c_w - lw.c_lw) + 1.0)), 6) AS log_odds
      FROM lw JOIN wt ON lw.word = wt.word JOIN lt ON lw.lang = lt.lang),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY log_odds DESC, word ASC) AS rn
      FROM scored)
    SELECT lang, word, CAST(n_lang_word AS BIGINT) AS n_lang_word, log_odds
    FROM ranked WHERE rn <= 5
    """,
)
def q_distinctive_tokens_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed log-odds distinctive tokens per language
    (textstats.distinctive_tokens_by_lang, Monroe et al. 2008)."""
    return textstats.distinctive_tokens_by_lang(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "price_dispersion_parts",
    oracle="""
    WITH per AS (
      SELECT l_partkey,
             COUNT(*) AS n_lines,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*), 4) AS mean_price,
             ROUND(sqrt(GREATEST(
                     CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                              * CAST(l_extendedprice AS DECIMAL(18,2)))
                          AS DOUBLE) / COUNT(*)
                     - POW(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                                AS DOUBLE) / COUNT(*), 2), 0.0))
                   / (CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) / COUNT(*)), 6) AS cv
      FROM lineitem GROUP BY l_partkey)
    SELECT l_partkey, CAST(n_lines AS BIGINT) AS n_lines, mean_price, cv
    FROM per WHERE n_lines >= 5
    ORDER BY cv DESC, l_partkey ASC LIMIT 20
    """,
)
def q_price_dispersion_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most price-dispersed parts (analytics.price_dispersion_parts):
    exact decimal moments per part, rounded-cv top-k cut."""
    return analytics.price_dispersion_parts(load_table(spark, sf_dir, "lineitem"))


@register(
    "tenure_value_buckets",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             MIN(CAST(o_orderdate AS TIMESTAMP)) AS f,
             MAX(CAST(o_orderdate AS TIMESTAMP)) AS l,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT rev,
             (year(l) * 12 + month(l)) - (year(f) * 12 + month(f)) AS m
      FROM per)
    SELECT CASE WHEN m = 0 THEN '0'
                WHEN m <= 6 THEN '1-6'
                WHEN m <= 12 THEN '7-12'
                ELSE '13+' END AS tenure_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 4) AS avg_revenue
    FROM b GROUP BY tenure_bucket ORDER BY tenure_bucket
    """,
)
def q_tenure_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Average customer value by tenure bucket
    (analytics.tenure_value_buckets): integer calendar-month tenure,
    exact decimal revenue."""
    return analytics.tenure_value_buckets(load_table(spark, sf_dir, "orders"))


@register(
    "transition_dwell_times",
    oracle="""
    WITH t AS (
      SELECT lag(event_type) OVER w AS from_type,
             event_type AS to_type,
             epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY CAST(ts AS TIMESTAMP), event_id))
    SELECT from_type, to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND((CAST(SUM(gap_us) AS DOUBLE) / COUNT(*)) / 1e6, 4)
             AS avg_gap_sec
    FROM t WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def q_transition_dwell_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-transition dwell profile (events.transition_dwell_times):
    event_transitions' counts with the timing dimension."""
    return events.transition_dwell_times(load_table(spark, sf_dir, "events"))


@register(
    "brand_cross_shopping",
    oracle="""
    WITH j AS (
      SELECT o.o_custkey, p.p_brand
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey),
    per AS (
      SELECT o_custkey, COUNT(DISTINCT p_brand) AS n_brands
      FROM j GROUP BY o_custkey)
    SELECT CAST(n_brands AS BIGINT) AS n_brands,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM per GROUP BY n_brands ORDER BY n_brands
    """,
)
def q_brand_cross_shopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand cross-shopping histogram (analytics.brand_cross_shopping):
    distinct brands per customer, bucketed."""
    return analytics.brand_cross_shopping(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "orders"),
    )


@register(
    "return_rate_by_basket_size",
    oracle="""
    WITH per AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS n_ret
      FROM lineitem GROUP BY l_orderkey)
    SELECT CASE WHEN n_lines <= 2 THEN '1-2'
                WHEN n_lines <= 4 THEN '3-4'
                ELSE '5+' END AS size_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(n_ret) AS BIGINT) AS n_returned,
           ROUND(CAST(SUM(n_ret) AS DOUBLE) / CAST(SUM(n_lines) AS DOUBLE), 6)
             AS return_rate
    FROM per GROUP BY size_bucket
    """,
)
def q_return_rate_by_basket_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return rate vs basket size (analytics.return_rate_by_basket_size)."""
    return analytics.return_rate_by_basket_size(load_table(spark, sf_dir, "lineitem"))


@register(
    "doclen_percentiles_by_lang",
    oracle="""
    SELECT lang,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS p50_chars,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.9), 4) AS p90_chars
    FROM documents GROUP BY lang
    """,
)
def q_doclen_percentiles_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language document-length percentiles
    (textstats.doclen_percentiles_by_lang) via the shared
    range-partitioned percentile machinery."""
    return textstats.doclen_percentiles_by_lang(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "monthly_new_vs_returning_revenue",
    oracle="""
    WITH f AS (
      SELECT o_custkey,
             MIN(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m'))
               AS first_month
      FROM orders GROUP BY o_custkey),
    j AS (
      SELECT strftime(CAST(o.o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
             CAST(o.o_totalprice AS DECIMAL(18,2)) AS v,
             f.first_month
      FROM orders o JOIN f ON o.o_custkey = f.o_custkey)
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN month = first_month THEN v
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS new_revenue,
           CAST(SUM(CASE WHEN month <> first_month THEN v
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS returning_revenue,
           ROUND(CAST(SUM(CASE WHEN month = first_month THEN v
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE), 6) AS new_share
    FROM j GROUP BY month ORDER BY month
    """,
)
def q_monthly_new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue split by new vs returning customers
    (analytics.monthly_new_vs_returning_revenue): first-order-month
    flag + conditional decimal sums."""
    return analytics.monthly_new_vs_returning_revenue(
        load_table(spark, sf_dir, "orders")
    )


@register(
    "weighted_price_quartiles",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_quantity AS DECIMAL(18,2)) AS q,
             l_orderkey, l_linenumber
      FROM lineitem),
    c AS (
      SELECT l_returnflag, p,
             SUM(q) OVER (PARTITION BY l_returnflag
                          ORDER BY p, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(q) OVER (PARTITION BY l_returnflag) AS tot
      FROM t)
    SELECT l_returnflag,
           CAST(MIN(CASE WHEN 100 * cum >= 25 * tot THEN p END) AS DOUBLE)
             AS wq25_price,
           CAST(MIN(CASE WHEN 100 * cum >= 50 * tot THEN p END) AS DOUBLE)
             AS wq50_price,
           CAST(MIN(CASE WHEN 100 * cum >= 75 * tot THEN p END) AS DOUBLE)
             AS wq75_price
    FROM c GROUP BY l_returnflag
    """,
)
def q_weighted_price_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted price quartiles per return flag
    (agg.weighted_price_quartiles): three thresholds in one
    range-partitioned cumulative-weight sweep."""
    return agg.weighted_price_quartiles(load_table(spark, sf_dir, "lineitem"))


@register(
    "session_conversion_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sess AS (
      SELECT user_id, event_type, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    per AS (
      SELECT user_id, sid,
             MIN(CAST(ts AS TIMESTAMP)) AS s_start,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM sess GROUP BY user_id, sid)
    SELECT strftime(s_start, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           ROUND(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 6) AS conversion_rate
    FROM per GROUP BY day
    """,
)
def q_session_conversion_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily session conversion rate (events.session_conversion_rate):
    islands sessionizer + purchase flag, bounce_rate's revenue-side
    sibling."""
    return events.session_conversion_rate(load_table(spark, sf_dir, "events"))


@register(
    "order_size_value_correlation",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, COUNT(*) AS x FROM lineitem GROUP BY l_orderkey),
    j AS (
      SELECT s.x, CAST(o.o_totalprice AS DECIMAL(18,2)) AS y
      FROM orders o JOIN sizes s ON o.o_orderkey = s.l_orderkey),
    m AS (
      SELECT COUNT(*) AS n,
             SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(y) AS sy, SUM(y * y) AS syy,
             SUM(x * y) AS sxy
      FROM j)
    SELECT CAST(n AS BIGINT) AS n_orders,
           CASE WHEN (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) > 0
                 AND (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) > 0
                THEN ROUND(
                  (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n)
                  / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)
                         * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)),
                  6)
           END AS corr
    FROM m
    """,
)
def q_order_size_value_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-size × order-value Pearson correlation from exact
    moments (analytics.order_size_value_correlation)."""
    return analytics.order_size_value_correlation(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "top_percent_customers",
    oracle="""
    WITH per AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT o_custkey, rev,
             row_number() OVER (ORDER BY rev DESC, o_custkey ASC) AS rnk,
             COUNT(*) OVER () AS n,
             SUM(rev) OVER () AS tot
      FROM per)
    SELECT o_custkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rnk AS BIGINT) AS rank,
           ROUND(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE) * 100.0, 6)
             AS revenue_share_pct
    FROM r WHERE rnk <= ceil(n * 1.0 / 100.0)
    ORDER BY rnk
    """,
)
def q_top_percent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-1% customer roster by revenue
    (analytics.top_percent_customers): exact tie-stable cut via the
    range-partitioned global rank."""
    return analytics.top_percent_customers(load_table(spark, sf_dir, "orders"))


@register(
    "churn_risk_buckets",
    oracle="""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS TIMESTAMP)) AS m FROM orders),
    last AS (
      SELECT o_custkey, MAX(CAST(o_orderdate AS TIMESTAMP)) AS l
      FROM orders GROUP BY o_custkey),
    b AS (
      SELECT CAST(floor(date_diff('day', CAST(l AS DATE),
                                  CAST((SELECT m FROM mx) AS DATE)) / 30.0)
                  AS BIGINT) AS bucket
      FROM last),
    hist AS (SELECT bucket, COUNT(*) AS n_customers FROM b GROUP BY bucket),
    t AS (SELECT SUM(n_customers) AS n FROM hist)
    SELECT bucket,
           CAST(bucket * 30 AS INTEGER) AS days_from,
           CAST(n_customers AS BIGINT) AS n_customers,
           ROUND(CAST(n_customers AS DOUBLE) / (SELECT n FROM t), 6) AS share
    FROM hist ORDER BY bucket
    """,
)
def q_churn_risk_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer recency distribution (analytics.churn_risk_buckets):
    30-day buckets of days-since-last-order, anchored on the data's
    own max date for reproducibility."""
    return analytics.churn_risk_buckets(load_table(spark, sf_dir, "orders"))


@register(
    "embedding_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             ROUND(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS nrm
      FROM embeddings)
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(AVG(nrm), 4) AS mean_norm,
           MIN(nrm) AS min_norm,
           MAX(nrm) AS max_norm
    FROM n GROUP BY label
    """,
)
def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm profile (similarity.embedding_norm_stats):
    the first-look vector-quality diagnostic; JVM array fold, one
    partial-agg rollup."""
    return similarity.embedding_norm_stats(load_table(spark, sf_dir, "embeddings"))


@register(
    "order_cadence",
    oracle="""
    WITH g AS (
      SELECT o_custkey, o_orderkey,
             date_diff('day',
                       CAST(lag(CAST(o_orderdate AS TIMESTAMP)) OVER w AS DATE),
                       CAST(CAST(o_orderdate AS TIMESTAMP) AS DATE)) AS gap_days
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS TIMESTAMP), o_orderkey)),
    g2 AS (SELECT * FROM g WHERE gap_days IS NOT NULL)
    SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers_multi,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(quantile_cont(CAST(gap_days AS DOUBLE), 0.5), 4)
             AS p50_gap_days,
           ROUND(quantile_cont(CAST(gap_days AS DOUBLE), 0.9), 4)
             AS p90_gap_days
    FROM g2
    """,
)
def q_order_cadence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer purchase-cadence profile (analytics.order_cadence):
    lag-window day gaps, corpus-wide exact percentiles via the
    range-partitioned machinery."""
    return analytics.order_cadence(load_table(spark, sf_dir, "orders"))


@register(
    "dedup_report",
    oracle=r"""
    WITH total AS (SELECT COUNT(*) AS n FROM documents),
    ex AS (
      SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS d
      FROM (SELECT COUNT(*) AS c FROM documents GROUP BY text)),
    nm AS (
      SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS d
      FROM (SELECT COUNT(*) AS c FROM documents
            GROUP BY trim(regexp_replace(lower(text), '\W+', ' ', 'g')))),
    toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pmem AS (
      SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS d
      FROM (SELECT unnest([doc_a, doc_b]) AS m
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE 100 * c >= 60 * (sa.n + sb.n - c)))
    SELECT 'exact' AS method, t.n AS n_docs, ex.d AS n_duplicates,
           ROUND(CAST(ex.d AS DOUBLE) / t.n, 6) AS dup_rate
    FROM total t CROSS JOIN ex
    UNION ALL
    SELECT 'normalized', t.n, nm.d, ROUND(CAST(nm.d AS DOUBLE) / t.n, 6)
    FROM total t CROSS JOIN nm
    UNION ALL
    SELECT 'jaccard_pair_member', t.n, pmem.d,
           ROUND(CAST(pmem.d AS DOUBLE) / t.n, 6)
    FROM total t CROSS JOIN pmem
    """,
)
def q_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-glance duplication summary across the deterministic dedup
    tiers (dedup.dedup_report): exact, normalized, and PPJoin pair
    membership, each with count and rate."""
    return dedup.dedup_report(load_table(spark, sf_dir, "documents"))


@register(
    "near_dup_rate_by_source",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    members AS (
      SELECT DISTINCT m AS doc_id
      FROM (SELECT unnest([doc_a, doc_b]) AS m
            FROM inter
            JOIN sizes sa ON doc_a = sa.doc_id
            JOIN sizes sb ON doc_b = sb.doc_id
            WHERE 100 * c >= 60 * (sa.n + sb.n - c)))
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(m.doc_id) AS BIGINT) AS n_near_dup_docs,
           ROUND(CAST(COUNT(m.doc_id) AS DOUBLE) / COUNT(*), 6)
             AS near_dup_rate
    FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id
    GROUP BY d.source
    """,
)
def q_near_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source near-duplication exposure
    (dedup.near_dup_rate_by_source): PPJoin pair membership rolled up
    by feed — which source floods the corpus."""
    return dedup.near_dup_rate_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "order_total_consistency",
    oracle="""
    WITH lt AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (1 + CAST(l_tax AS DECIMAL(18,2)))
                 * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS calc
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_totalprice, lt.calc
      FROM orders o LEFT JOIN lt ON o.o_orderkey = lt.l_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(calc) AS BIGINT) AS n_with_lines,
           CAST(SUM(CASE WHEN ABS(CAST(o_totalprice AS DOUBLE)
                                  - CAST(calc AS DOUBLE))
                         <= 0.01 * CAST(o_totalprice AS DOUBLE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_consistent,
           ROUND(CAST(SUM(CASE WHEN ABS(CAST(o_totalprice AS DOUBLE)
                                        - CAST(calc AS DOUBLE))
                               <= 0.01 * CAST(o_totalprice AS DOUBLE)
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(calc) AS DOUBLE), 6) AS consistency_rate
    FROM j
    """,
)
def q_order_total_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-column invariant audit (dq.order_total_consistency):
    o_totalprice vs the lineitem-computed total within 1% — the
    fixtures FAIL it for ~99% of orders, which both engines agree on."""
    return dq.order_total_consistency(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "monthly_revenue_yoy",
    oracle="""
    WITH m AS (
      SELECT strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m') AS month,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY month)
    SELECT a.month,
           CAST(a.rev AS DOUBLE) AS revenue,
           CAST(b.rev AS DOUBLE) AS revenue_prev_year,
           ROUND(CAST(a.rev - b.rev AS DOUBLE) / CAST(b.rev AS DOUBLE)
                 * 100.0, 4) AS yoy_pct
    FROM m a LEFT JOIN m b
      ON a.month = strftime(CAST(b.month || '-01' AS DATE)
                            + INTERVAL 12 MONTH, '%Y-%m')
    ORDER BY a.month
    """,
)
def q_monthly_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue with year-over-year growth
    (analytics.monthly_revenue_yoy): calendar-joined previous-year
    month (gap-safe, unlike lag-12 over the month sequence)."""
    return analytics.monthly_revenue_yoy(load_table(spark, sf_dir, "orders"))


@register(
    "daily_value_percentiles",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 4) AS p50_value,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.95), 4) AS p95_value
    FROM events GROUP BY day ORDER BY day
    """,
)
def q_daily_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact daily p50/p95 of event value
    (events.daily_value_percentiles) via the shared range-partitioned
    percentile machinery — no day ever sorts inside one task."""
    return events.daily_value_percentiles(load_table(spark, sf_dir, "events"))


@register(
    "quantile_transform",
    oracle="""
    SELECT doc_id, n_chars,
           ROUND(CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS DOUBLE)
                 / CAST(COUNT(*) OVER () AS DOUBLE), 6) AS pctl
    FROM documents
    """,
)
def q_quantile_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization of document length
    (sampling.quantile_transform): rank/n over the (n_chars, doc_id)
    total order via the range-partitioned global rank."""
    return sampling.quantile_transform(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_indexer",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    r AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
      FROM wc)
    SELECT word, cnt, CAST(rnk AS INTEGER) AS token_id
    FROM r WHERE rnk <= 1000
    """,
)
def q_vocab_indexer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ordered token-to-id table (textstats.vocab_indexer):
    dense ids for the top-1000 vocabulary via the range-partitioned
    global rank."""
    return textstats.vocab_indexer(load_table(spark, sf_dir, "documents"))


@register(
    "seasonal_anomalies",
    oracle="""
    WITH daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS daily_value,
             dayofweek(CAST(CAST(ts AS TIMESTAMP) AS DATE)) + 1 AS dow
      FROM events GROUP BY day, event_type, dow),
    mu AS (
      SELECT event_type, dow, AVG(daily_value) AS mu
      FROM daily GROUP BY event_type, dow),
    resid AS (
      SELECT d.day, d.event_type, d.daily_value,
             d.daily_value - m.mu AS r
      FROM daily d JOIN mu m
        ON d.event_type = m.event_type AND d.dow = m.dow),
    sigma AS (
      SELECT event_type, sqrt(AVG(r * r)) AS sd
      FROM resid GROUP BY event_type)
    SELECT r.day, r.event_type, r.daily_value,
           ROUND(r.r / s.sd, 4) AS z_score
    FROM resid r JOIN sigma s ON r.event_type = s.event_type
    WHERE ABS(ROUND(r.r / s.sd, 4)) >= 2.5
    """,
)
def q_seasonal_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week-adjusted daily anomaly screen
    (events.seasonal_anomalies): residual z vs the weekday norm per
    event type — the screen that doesn't page on every weekend."""
    return events.seasonal_anomalies(load_table(spark, sf_dir, "events"))


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    pos AS (
      SELECT word, cnt, unnest(range(1, length(word))) AS i
      FROM wc WHERE length(word) >= 2),
    pairs AS (
      SELECT substr(word, i, 2) AS pair, SUM(cnt) AS pair_count
      FROM pos GROUP BY 1)
    SELECT pair, CAST(pair_count AS BIGINT) AS pair_count
    FROM pairs ORDER BY pair_count DESC, pair ASC LIMIT 20
    """,
)
def q_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training step (textstats.bpe_merge_candidates):
    frequency-weighted adjacent character pairs over the
    vocabulary-sized wordcount — the greedy-merge statistic."""
    return textstats.bpe_merge_candidates(load_table(spark, sf_dir, "documents"))


def _bpe_oracle_sql(n_merges: int = 6, select: str | None = None) -> str:
    """Unrolled SQL replica of textstats.bpe_learn_merges: per round, a
    pair-count CTE (unnest over symbol positions), a LIMIT-1 argmax
    with the (count DESC, a, b) tie-break, and a recursive CTE that
    folds the merge through every word position-by-position (depth =
    longest word; all words advance in parallel each step) — the same
    left-to-right non-overlapping scan as the engine's F.aggregate
    fold. Feeder CTEs are MATERIALIZED so the vocabulary isn't
    re-tokenized inside each recursion (the IVFPQ lesson)."""
    parts = [
        f"""
    WITH RECURSIVE
    wc AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest({DUCK_TOKENS}) AS word FROM documents) GROUP BY word),
    v0 AS MATERIALIZED (
      SELECT word, cnt, string_split(word, '') AS syms FROM wc)"""
    ]
    for r in range(n_merges):
        parts.append(
            f""",
    p{r} AS MATERIALIZED (
      SELECT syms[i] AS a, syms[i + 1] AS b, SUM(cnt) AS pair_count
      FROM (
        SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM v{r} WHERE len(syms) >= 2)
      GROUP BY 1, 2),
    m{r} AS MATERIALIZED (
      SELECT a, b, pair_count FROM p{r}
      ORDER BY pair_count DESC, a ASC, b ASC LIMIT 1),
    f{r}(word, cnt, pos, acc) AS (
      SELECT word, cnt, 0, CAST([] AS VARCHAR[]) FROM v{r}
      UNION ALL
      SELECT f.word, f.cnt, f.pos + 1,
             CASE WHEN len(f.acc) > 0 AND f.acc[-1] = m.a
                       AND v.syms[f.pos + 1] = m.b
                  THEN list_append(f.acc[1 : len(f.acc) - 1], m.a || m.b)
                  ELSE list_append(f.acc, v.syms[f.pos + 1]) END
      FROM f{r} f
      JOIN v{r} v USING (word)
      CROSS JOIN m{r} m
      WHERE f.pos < len(v.syms)),
    v{r + 1} AS MATERIALIZED (
      SELECT f.word, f.cnt, f.acc AS syms
      FROM f{r} f JOIN v{r} v USING (word)
      WHERE f.pos = len(v.syms))"""
        )
    sel = select or "\n    UNION ALL\n    ".join(
        f"SELECT {r + 1} AS merge_rank, a AS left_sym, b AS right_sym,"
        # SUM(BIGINT) is HUGEINT in DuckDB — cast back for hash parity
        f" CAST(pair_count AS BIGINT) AS pair_count FROM m{r}"
        for r in range(n_merges)
    )
    return "".join(parts) + "\n    " + sel


@register("bpe_learn_merges", oracle=_bpe_oracle_sql(6))
def q_bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE training loop (textstats.bpe_learn_merges): the
    first 6 greedy merges learned by iterating vocabulary-sized
    pair-count → argmax → Catalyst-fold merge application, with
    per-round lineage truncation — the full Sennrich et al. 2016
    trainer where bpe_merge_candidates is only round one."""
    return textstats.bpe_learn_merges(
        load_table(spark, sf_dir, "documents"), n_merges=6
    )


def _bpe_batched_oracle_sql(n_rounds: int = 3, batch_k: int = 4) -> str:
    """Unrolled SQL replica of textstats.bpe_learn_merges_batched: per
    round, the shared pair-count CTE, a top-``batch_k`` ranking with
    the (count DESC, a, b) tie-break, the conservative symbol-disjoint
    keep rule as a NOT EXISTS anti-join against ALL higher-ranked
    candidates, and the same position-by-position recursive fold as
    :func:`_bpe_oracle_sql` — with the single argmax CROSS JOIN
    replaced by a LEFT JOIN against the round's kept set (at most one
    pair can match a position, by disjointness)."""
    parts = [
        f"""
    WITH RECURSIVE
    wc AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
        SELECT unnest({DUCK_TOKENS}) AS word FROM documents) GROUP BY word),
    v0 AS MATERIALIZED (
      SELECT word, cnt, string_split(word, '') AS syms FROM wc)"""
    ]
    for r in range(n_rounds):
        parts.append(
            f""",
    p{r} AS MATERIALIZED (
      SELECT syms[i] AS a, syms[i + 1] AS b, SUM(cnt) AS pair_count
      FROM (
        SELECT cnt, syms, unnest(generate_series(1, len(syms) - 1)) AS i
        FROM v{r} WHERE len(syms) >= 2)
      GROUP BY 1, 2),
    r{r} AS MATERIALIZED (
      SELECT a, b, pair_count,
             ROW_NUMBER() OVER (ORDER BY pair_count DESC, a, b) AS rk
      FROM p{r} QUALIFY rk <= {batch_k}),
    m{r} AS MATERIALIZED (
      SELECT a, b, pair_count,
             ROW_NUMBER() OVER (ORDER BY rk) AS sel_rank
      FROM r{r} c
      WHERE NOT EXISTS (
        SELECT 1 FROM r{r} c2
        WHERE c2.rk < c.rk
          AND (c2.a = c.a OR c2.a = c.b OR c2.b = c.a OR c2.b = c.b))),
    f{r}(word, cnt, pos, acc) AS (
      SELECT word, cnt, 0, CAST([] AS VARCHAR[]) FROM v{r}
      UNION ALL
      SELECT f.word, f.cnt, f.pos + 1,
             CASE WHEN m.a IS NOT NULL
                  THEN list_append(f.acc[1 : len(f.acc) - 1], m.a || m.b)
                  ELSE list_append(f.acc, v.syms[f.pos + 1]) END
      FROM f{r} f
      JOIN v{r} v USING (word)
      LEFT JOIN m{r} m
        ON len(f.acc) > 0 AND f.acc[-1] = m.a
           AND v.syms[f.pos + 1] = m.b
      WHERE f.pos < len(v.syms)),
    v{r + 1} AS MATERIALIZED (
      SELECT f.word, f.cnt, f.acc AS syms
      FROM f{r} f JOIN v{r} v USING (word)
      WHERE f.pos = len(v.syms))"""
        )
    sel = "\n    UNION ALL\n    ".join(
        f"SELECT {r + 1} AS round, CAST(sel_rank AS INT) AS sel_rank,"
        f" a AS left_sym, b AS right_sym,"
        f" CAST(pair_count AS BIGINT) AS pair_count FROM m{r}"
        for r in range(n_rounds)
    )
    return "".join(parts) + "\n    " + sel


@register("bpe_learn_merges_batched", oracle=_bpe_batched_oracle_sql(3, 4))
def q_bpe_learn_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BPE training (textstats.bpe_learn_merges_batched): up to
    4 symbol-disjoint merges applied per round in a single fold pass —
    the production answer to greedy BPE's one-Spark-job-per-merge round
    count (VERDICT r12 "What's wrong" #2: a 30k-merge vocabulary is
    ~30k/k rounds here instead of 30k). 3 rounds × top-4 registered;
    selection, disjoint keep rule, and the multi-pair fold are all
    replayed exactly by the DuckDB oracle."""
    return textstats.bpe_learn_merges_batched(
        load_table(spark, sf_dir, "documents"), n_rounds=3, batch_k=4
    )


@register(
    "bpe_compression_stats",
    oracle=_bpe_oracle_sql(
        6,
        select="""SELECT 6 AS n_merges, i.total_words, i.init_symbols,
           f.final_symbols,
           ROUND((i.init_symbols - f.final_symbols)
                 / CAST(i.init_symbols AS DOUBLE), 4) AS compression_pct
    FROM (SELECT CAST(SUM(cnt) AS BIGINT) AS total_words,
                 CAST(SUM(len(syms) * cnt) AS BIGINT) AS init_symbols
          FROM v0) i,
         (SELECT CAST(SUM(len(syms) * cnt) AS BIGINT) AS final_symbols
          FROM v6) f""",
    ),
)
def q_bpe_compression_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus symbol counts before vs after the 6 trained BPE merges
    (textstats.bpe_compression_stats): the frequency-weighted
    tokens-saved readout of the training loop — vocabulary-sized
    aggregates on both ends, replayed by the same unrolled oracle."""
    return textstats.bpe_compression_stats(
        load_table(spark, sf_dir, "documents"), n_merges=6
    )


@register(
    "pca_top_component",
    oracle="""
    WITH RECURSIVE ex AS (
      SELECT vec_id, i - 1 AS pos, CAST(embedding[i] AS DOUBLE) AS v
      FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
    nn AS (SELECT COUNT(*) AS n FROM embeddings),
    mu AS (SELECT pos, AVG(v) AS mu FROM ex GROUP BY pos),
    g AS (SELECT a.pos AS j, b.pos AS k, SUM(a.v * b.v) AS g
          FROM ex a JOIN ex b ON a.vec_id = b.vec_id GROUP BY 1, 2),
    cov AS (
      SELECT j, k,
             (g - (SELECT n FROM nn) * mj.mu * mk.mu) / (SELECT n FROM nn)
               AS c
      FROM g JOIN mu mj ON g.j = mj.pos JOIN mu mk ON g.k = mk.pos),
    dd AS (SELECT COUNT(*) AS d FROM mu),
    pv(it, j, val) AS (
      SELECT 0, pos, 1.0 / sqrt((SELECT d FROM dd)) FROM mu
      UNION ALL
      SELECT it + 1, cov.j, SUM(cov.c * pv.val)
      FROM pv JOIN cov ON pv.j = cov.k
      WHERE it < 8 GROUP BY 1, 2),
    vfin AS (SELECT j, val FROM pv WHERE it = 8),
    nrm AS (SELECT sqrt(SUM(val * val)) AS nrm FROM vfin),
    vn AS (SELECT j, val / (SELECT nrm FROM nrm) AS val FROM vfin),
    cv AS (SELECT cov.j, SUM(cov.c * vn.val) AS cv
           FROM cov JOIN vn ON vn.j = cov.k GROUP BY 1),
    lam AS (SELECT SUM(vn.val * cv.cv) AS lam
            FROM vn JOIN cv ON vn.j = cv.j)
    SELECT vn.j AS pos,
           ROUND(vn.val * vn.val, 5) AS loading_sq,
           ROUND((SELECT lam FROM lam), 4) AS eigenvalue
    FROM vn ORDER BY pos
    """,
)
def q_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component by power iteration
    (similarity.pca_top_component): one Arrow-batched Gram pass +
    in-plan d×d iterations, checked against a recursive-CTE power
    iteration to 5dp — the linear-algebra member of the
    iterative-with-full-oracle family (pagerank_checked, kcore)."""
    return similarity.pca_top_component(load_table(spark, sf_dir, "embeddings"))


@register(
    "referential_integrity",
    oracle="""
    SELECT 'nation.regionkey' AS relationship,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(COUNT(*) FILTER (WHERE r.r_regionkey IS NULL) AS BIGINT)
             AS n_orphans
    FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    UNION ALL
    SELECT 'customer.nationkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'supplier.nationkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
    FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
    UNION ALL
    SELECT 'orders.custkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE c.c_custkey IS NULL) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.orderkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'lineitem.partkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
    UNION ALL
    SELECT 'lineitem.suppkey', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
    FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
    """,
)
def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-schema FK integrity audit (dq.referential_integrity):
    seven parent/child edges, each one left-join count pass; dims
    broadcast, fact→fact shuffles on the key."""
    return dq.referential_integrity(
        *[
            load_table(spark, sf_dir, t)
            for t in (
                "region", "nation", "customer", "supplier",
                "part", "orders", "lineitem",
            )
        ]
    )


@register(
    "pagerank_checked",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE 10 * c >= 7 * (sa.n + sb.n - c)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
    nn AS (SELECT COUNT(*) AS n FROM deg),
    pr(it, node, rank) AS (
      SELECT 0, src, 1.0 / (SELECT n FROM nn) FROM deg
      UNION ALL
      SELECT it + 1, e.dst,
             (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
               + 0.85 * SUM(pr.rank / deg.d)
      FROM pr JOIN edges e ON pr.node = e.src JOIN deg ON e.src = deg.src
      WHERE it < 10
      GROUP BY it + 1, e.dst)
    SELECT node AS doc_id, ROUND(rank, 6) AS rank
    FROM pr WHERE it = 10
    """,
)
def q_pagerank_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (10 iterations, d=0.85) over the EXACT near-dup graph
    — the numeric-iterative fixpoint with a FULL value oracle: DuckDB's
    recursive CTE re-runs the same power iteration level by level, so
    every rank must match to 6dp (dedup.pagerank; round-3 classified
    this family 'not SQL-expressible' — the iteration-counter CTE
    disproves that for fixed iteration counts). Edges are the PPJoin
    pair set at Jaccard ≥ 0.7 (deterministic, unlike the LSH graph)."""
    docs = load_table(spark, sf_dir, "documents")
    edges = (
        dedup.jaccard_ngram_pairs(docs)
        .where(F.col("jaccard") >= 0.7)
        .select("doc_a", "doc_b")
    )
    return dedup.pagerank(edges, max_iter=10).select(
        "doc_id", F.round("rank", 6).alias("rank")
    )


@register(
    "knn_recall_checked",
    # The counts are derived from the same brute-force pair definition
    # the Spark side uses (queries = vec_id < 8; candidates = every
    # other vec_id; top-k keeps min(5, |candidates|) rows per query —
    # exact for ANY input because row_number assigns a rank to every
    # candidate row regardless of its cosine value, NaN/NULL included),
    # not from a closed-form |table| product (ADVICE r5: the
    # combinatorial LEAST(8,c)*LEAST(5,c-1) silently assumed every
    # query sees a full candidate set).
    oracle="""
    WITH cand AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id
      FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
      WHERE q.vec_id < 8),
    cnt AS (SELECT query_id, COUNT(*) AS c FROM cand GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           CAST(COALESCE(SUM(LEAST(5, c)), 0) AS BIGINT) AS n_exact_pairs,
           TRUE AS lsh_recall_ok,
           TRUE AS ivf_recall_ok
    FROM cnt
    """,
)
def q_knn_recall_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH and IVF ANN recall vs exact brute-force top-k as
    oracle-checked booleans (similarity.knn_recall_checked): bounds
    0.5 / 0.3, matching the unit-test pins."""
    return similarity.knn_recall_checked(load_table(spark, sf_dir, "embeddings"))


@register(
    "dedup_recall_checked",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT CAST(COUNT(*) FILTER (
             WHERE 10 * c >= 7 * (sa.n + sb.n - c)) AS BIGINT)
             AS n_exact_pairs,
           TRUE AS recall_ok
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    """,
)
def q_dedup_recall_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH→verify recall vs the exact PPJoin pair set at
    Jaccard ≥ 0.7 as an oracle-checked boolean
    (dedup.dedup_recall_checked)."""
    return dedup.dedup_recall_checked(load_table(spark, sf_dir, "documents"))


@register(
    "simhash_recall_checked",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT CAST(COUNT(*) FILTER (
             WHERE 10 * c >= 9 * (sa.n + sb.n - c)) AS BIGINT)
             AS n_exact_pairs,
           TRUE AS recall_ok
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    """,
)
def q_simhash_recall_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash banded-candidate recall vs the exact PPJoin pair set at
    Jaccard ≥ 0.9 as an oracle-checked boolean
    (dedup.simhash_recall_checked) — completes the `_checked` tier:
    every probabilistic dedup/ANN/sketch op now has an externally
    verifiable claim."""
    return dedup.simhash_recall_checked(load_table(spark, sf_dir, "documents"))


@register(
    "knn_euclid",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 8),
    p AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_distance(CAST(q.q_emb AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])), 6) AS dist
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id)
    SELECT query_id, neighbor_id, dist, rn FROM (
      SELECT query_id, neighbor_id, dist,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY dist ASC, neighbor_id ASC) AS INTEGER) AS rn
      FROM p)
    WHERE rn <= 5
    """,
)
def q_knn_euclid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact euclidean top-k (similarity.knn_euclid): the second
    retrieval ranking for hybrid fusion; broadcast queries, streaming
    corpus, 6dp-rounded distances."""
    return similarity.knn_euclid(load_table(spark, sf_dir, "embeddings"))


@register(
    "rank_fusion_rrf",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
               FROM embeddings WHERE vec_id < 8),
    pc AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                    CAST(e.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.q_emb AS DOUBLE[]),
                                            CAST(q.q_emb AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                              CAST(e.embedding AS DOUBLE[])))),
                   6) AS cs
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
    rc AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY cs DESC, neighbor_id ASC) AS r_cos
           FROM pc QUALIFY r_cos <= 5),
    pe AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_distance(CAST(q.q_emb AS DOUBLE[]),
                                 CAST(e.embedding AS DOUBLE[])), 6) AS dist
      FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
    re AS (SELECT query_id, neighbor_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY dist ASC, neighbor_id ASC) AS r_euc
           FROM pe QUALIFY r_euc <= 5),
    fused AS (
      SELECT COALESCE(rc.query_id, re.query_id) AS query_id,
             COALESCE(rc.neighbor_id, re.neighbor_id) AS neighbor_id,
             COALESCE(1.0 / (60 + r_cos), 0) + COALESCE(1.0 / (60 + r_euc), 0)
               AS s
      FROM rc FULL JOIN re
        ON rc.query_id = re.query_id AND rc.neighbor_id = re.neighbor_id)
    SELECT query_id, neighbor_id, ROUND(s, 6) AS rrf_score,
           CAST(fused_rank AS INTEGER) AS fused_rank
    FROM (
      SELECT query_id, neighbor_id, s,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY s DESC, neighbor_id ASC) AS fused_rank
      FROM fused)
    WHERE fused_rank <= 5
    """,
)
def q_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of the cosine and euclidean top-k lists
    (similarity.rank_fusion_rrf): the hybrid-retrieval combiner, pure
    rank arithmetic over the two input searches."""
    return similarity.rank_fusion_rrf(load_table(spark, sf_dir, "embeddings"))


# Shared SQL replica of the deterministic PQ pipeline (VERDICT r7 #4).
# Replays _pq_codebooks' fixed-iteration Lloyd k-means (integer-stride
# init over the id-ordered vec_id < 2048 sample, 6dp centroid rounding
# after init and after every mean update, 9dp distance rounding before
# the lowest-index argmin), then codes the full corpus and ranks by the
# same 6dp-rounded norm-corrected ADC score. The engine applies the
# identical rounding discipline (similarity.py), so codes and top-k
# agree bit-for-bit; the remaining float paths differ only in
# summation order (ulps), which the rounding steps absorb. Geometry is
# the registered default: m=16 blocks x ksub=32 centroids x dsub=4
# dims (64-dim fixtures), 10 iterations, queries = vec_id < 8, k = 5.
_PQ_CORE_SQL = """
WITH RECURSIVE
emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
samp AS (SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ridx
         FROM emb WHERE vec_id < 2048),
sn AS (SELECT COUNT(*) AS ns FROM samp),
blocks AS (SELECT CAST(b AS INTEGER) AS b FROM generate_series(0, 15) t(b)),
sub AS (SELECT s.ridx, b.b, s.e[b.b*4+1 : b.b*4+4] AS sv FROM samp s, blocks b),
kmeans AS (
  SELECT 0 AS it, b.b, CAST(c.c AS INTEGER) AS c,
         list_transform(s.sv, x -> round(x, 6)) AS cent
  FROM blocks b
  CROSS JOIN generate_series(0, 31) c(c)
  CROSS JOIN sn
  JOIN sub s ON s.b = b.b AND s.ridx = (c.c * (ns - 1)) // 31
  UNION ALL
  SELECT it + 1, b, c,
         CASE WHEN COUNT(*) FILTER (WHERE rnk = 1) > 0
              THEN LIST_VALUE(
                ROUND(AVG(sv[1]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[2]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[3]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[4]) FILTER (WHERE rnk = 1), 6))
              ELSE ANY_VALUE(cent) END
  FROM (
    SELECT k.it, k.b, k.c, k.cent, s.ridx, s.sv,
           ROW_NUMBER() OVER (
             PARTITION BY s.ridx, k.b
             ORDER BY round(list_sum(list_transform(list_zip(s.sv, k.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), k.c) AS rnk
    FROM kmeans k JOIN sub s ON s.b = k.b
    WHERE k.it < 10)
  GROUP BY it, b, c),
books AS (SELECT b, c, cent FROM kmeans WHERE it = 10),
csub AS (SELECT m.vec_id, b.b, m.e[b.b*4+1 : b.b*4+4] AS sv FROM emb m, blocks b),
coded AS (
  SELECT vec_id, b, c FROM (
    SELECT cs.vec_id, cs.b, bk.c,
           ROW_NUMBER() OVER (
             PARTITION BY cs.vec_id, cs.b
             ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), bk.c) AS rnk
    FROM csub cs JOIN books bk ON bk.b = cs.b)
  WHERE rnk = 1),
nrms AS (SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM emb),
q AS (SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qn
      FROM emb WHERE vec_id < 8),
tabs AS (SELECT q.query_id, bk.b, bk.c,
                list_dot_product(q.qe[bk.b*4+1 : bk.b*4+4], bk.cent) AS tv
         FROM q, books bk),
adc AS (SELECT t.query_id, cd.vec_id AS neighbor_id, SUM(t.tv) AS s
        FROM coded cd JOIN tabs t ON t.b = cd.b AND t.c = cd.c
        WHERE cd.vec_id <> t.query_id
        GROUP BY 1, 2),
pqscored AS (
  SELECT a.query_id, a.neighbor_id,
         round(a.s / (q.qn * n.nrm), 6) AS adc_sim
  FROM adc a JOIN q ON q.query_id = a.query_id
  JOIN nrms n ON n.vec_id = a.neighbor_id),
pqtop AS (
  SELECT query_id, neighbor_id, adc_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_sim DESC, neighbor_id ASC) AS INTEGER) AS rn
  FROM pqscored QUALIFY rn <= 5)
"""


@register(
    "knn_cosine_pq",
    # Full-value oracle via the deterministic-PQ SQL replica: the whole
    # ADC ranking (ids, 6dp sims, ranks) is hash-compared, promoting
    # this from rows-only to oracle-backed (round 8).
    oracle=_PQ_CORE_SQL
    + """
    SELECT query_id, neighbor_id, adc_sim, rn FROM pqtop
    """,
)
def q_knn_cosine_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-ADC ANN top-k (similarity.knn_cosine_pq): corpus as 16x5-bit
    product-quantization codes, approximate dots as m table lookups
    per vector (zip_with over codes x the query's broadcast lookup
    table — JVM-side, zero corpus-side float math). Oracle-backed
    since round 8: the deterministic training discipline (integer
    stride + 6dp/9dp rounding) lets DuckDB replay codebooks, codes,
    and the full ADC ranking in SQL."""
    return similarity.knn_cosine_pq(load_table(spark, sf_dir, "embeddings"))


@register(
    "pq_recall_checked",
    # n_hits is recomputed EXACTLY (VERDICT r7 #4): the PQ top-k comes
    # from the deterministic SQL replica above, the exact top-k from
    # the same brute-force pair definition knn_recall_checked uses
    # (per query, min(k, |candidates|) via row_number over 6dp cosine
    # with id tie-break), and n_hits is their join count — a recall
    # regression now flips the hash, not just the 0.3-gate boolean.
    oracle=_PQ_CORE_SQL
    + """,
    cand AS (
      SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
             round(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e2.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(e2.embedding AS DOUBLE[]),
                                              CAST(e2.embedding AS DOUBLE[])))),
                   6) AS cs
      FROM embeddings q JOIN embeddings e2 ON e2.vec_id <> q.vec_id
      WHERE q.vec_id < 8),
    extop AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cs DESC, neighbor_id ASC) AS r
      FROM cand QUALIFY r <= 5),
    ecnt AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
                    CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM extop),
    hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM extop e JOIN pqtop p USING (query_id, neighbor_id))
    SELECT n_queries, n_exact_pairs, n_hits,
           n_hits >= 0.3 * n_exact_pairs AS pq_recall_ok
    FROM ecnt, hits
    """,
)
def q_pq_recall_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC recall vs exact top-k with the hit
    count oracle-recomputed exactly (similarity.pq_recall_checked):
    measured 22/40 = 0.55 at the 16×32 geometry on the near-isotropic
    fixtures, gated at 0.3 — completes the ANN `_checked` matrix
    (LSH, IVF, PQ), and since round 8 a recall drift flips the hash,
    not just the gate boolean."""
    return similarity.pq_recall_checked(load_table(spark, sf_dir, "embeddings"))


# SQL replica of the deterministic IVFADC pipeline (round 9): extends
# _PQ_CORE_SQL's replay with the coarse quantizer (ckm: 16 full-dim
# centroids, same strided-init/6dp/9dp Lloyd), RESIDUAL codebooks (rkm
# trains on e - coarse[cell]), cell assignment for corpus and queries,
# and the qc_dot + ADC-residual score. The feeder CTEs are declared
# MATERIALIZED: without the hint DuckDB re-inlines them into each
# recursive iteration of rkm, re-running the entire coarse k-means per
# Lloyd step (measured: >5 min vs ~16s at the registered geometry).
_IVFPQ_CORE_SQL = """
WITH RECURSIVE
emb AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
samp AS MATERIALIZED (
  SELECT vec_id, e, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS ridx
  FROM emb WHERE vec_id < 2048),
sn AS (SELECT COUNT(*) AS ns FROM samp),
blocks AS MATERIALIZED (
  SELECT CAST(b AS INTEGER) AS b FROM generate_series(0, 15) t(b)),
ckm AS (
  SELECT 0 AS it, CAST(c.c AS INTEGER) AS c,
         list_transform(s.e, x -> round(x, 6)) AS cent
  FROM generate_series(0, 15) c(c)
  CROSS JOIN sn
  JOIN samp s ON s.ridx = (c.c * (ns - 1)) // 15
  UNION ALL
  SELECT it + 1, c,
         CASE WHEN COUNT(*) FILTER (WHERE rnk = 1) > 0
              THEN LIST_VALUE(
                {cent64})
              ELSE ANY_VALUE(cent) END
  FROM (
    SELECT k.it, k.c, k.cent, s.ridx, s.e,
           ROW_NUMBER() OVER (
             PARTITION BY s.ridx
             ORDER BY round(list_sum(list_transform(list_zip(s.e, k.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), k.c) AS rnk
    FROM ckm k, samp s
    WHERE k.it < 10)
  GROUP BY it, c),
coarse AS MATERIALIZED (SELECT c, cent FROM ckm WHERE it = 10),
sassign AS MATERIALIZED (
  SELECT ridx, c AS cell FROM (
    SELECT s.ridx, co.c,
           ROW_NUMBER() OVER (
             PARTITION BY s.ridx
             ORDER BY round(list_sum(list_transform(list_zip(s.e, co.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), co.c) AS rnk
    FROM samp s, coarse co)
  WHERE rnk = 1),
rsamp AS MATERIALIZED (
  SELECT s.ridx,
         list_transform(list_zip(s.e, co.cent), p -> p[1] - p[2]) AS re
  FROM samp s JOIN sassign a ON a.ridx = s.ridx
  JOIN coarse co ON co.c = a.cell),
rsub AS MATERIALIZED (
  SELECT r.ridx, b.b, r.re[b.b*4+1 : b.b*4+4] AS sv FROM rsamp r, blocks b),
rkm AS (
  SELECT 0 AS it, b.b, CAST(c.c AS INTEGER) AS c,
         list_transform(s.sv, x -> round(x, 6)) AS cent
  FROM blocks b
  CROSS JOIN generate_series(0, 31) c(c)
  CROSS JOIN sn
  JOIN rsub s ON s.b = b.b AND s.ridx = (c.c * (ns - 1)) // 31
  UNION ALL
  SELECT it + 1, b, c,
         CASE WHEN COUNT(*) FILTER (WHERE rnk = 1) > 0
              THEN LIST_VALUE(
                ROUND(AVG(sv[1]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[2]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[3]) FILTER (WHERE rnk = 1), 6),
                ROUND(AVG(sv[4]) FILTER (WHERE rnk = 1), 6))
              ELSE ANY_VALUE(cent) END
  FROM (
    SELECT k.it, k.b, k.c, k.cent, s.ridx, s.sv,
           ROW_NUMBER() OVER (
             PARTITION BY s.ridx, k.b
             ORDER BY round(list_sum(list_transform(list_zip(s.sv, k.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), k.c) AS rnk
    FROM rkm k JOIN rsub s ON s.b = k.b
    WHERE k.it < 10)
  GROUP BY it, b, c),
rbooks AS MATERIALIZED (SELECT b, c, cent FROM rkm WHERE it = 10),
cellof AS MATERIALIZED (
  SELECT vec_id, c AS cell FROM (
    SELECT m.vec_id, co.c,
           ROW_NUMBER() OVER (
             PARTITION BY m.vec_id
             ORDER BY round(list_sum(list_transform(list_zip(m.e, co.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), co.c) AS rnk
    FROM emb m, coarse co)
  WHERE rnk = 1),
cres AS MATERIALIZED (
  SELECT m.vec_id, cl.cell,
         list_transform(list_zip(m.e, co.cent), p -> p[1] - p[2]) AS re
  FROM emb m JOIN cellof cl USING (vec_id)
  JOIN coarse co ON co.c = cl.cell),
crsub AS MATERIALIZED (
  SELECT c2.vec_id, b.b, c2.re[b.b*4+1 : b.b*4+4] AS sv FROM cres c2, blocks b),
coded AS MATERIALIZED (
  SELECT vec_id, b, c FROM (
    SELECT cs.vec_id, cs.b, bk.c,
           ROW_NUMBER() OVER (
             PARTITION BY cs.vec_id, cs.b
             ORDER BY round(list_sum(list_transform(list_zip(cs.sv, bk.cent),
                        p -> (p[1]-p[2])*(p[1]-p[2]))), 9), bk.c) AS rnk
    FROM crsub cs JOIN rbooks bk ON bk.b = cs.b)
  WHERE rnk = 1),
nrms AS MATERIALIZED (
  SELECT vec_id, sqrt(list_dot_product(e, e)) AS nrm FROM emb),
q AS MATERIALIZED (
  SELECT vec_id AS query_id, e AS qe, sqrt(list_dot_product(e, e)) AS qn
  FROM emb WHERE vec_id < 8),
probes AS (
  SELECT query_id, cell, qc_dot FROM (
    SELECT q.query_id, co.c AS cell,
           list_dot_product(q.qe, co.cent) AS qc_dot,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY round(list_dot_product(q.qe, co.cent)
                    / (q.qn * sqrt(list_dot_product(co.cent, co.cent))),
                    9) DESC, co.c) AS pr
    FROM q, coarse co)
  WHERE pr <= 4),
itabs AS (SELECT q.query_id, bk.b, bk.c,
                 list_dot_product(q.qe[bk.b*4+1 : bk.b*4+4], bk.cent) AS tv
          FROM q, rbooks bk),
adcsum AS (SELECT t.query_id, cd.vec_id AS neighbor_id, SUM(t.tv) AS s
           FROM coded cd JOIN itabs t ON t.b = cd.b AND t.c = cd.c
           GROUP BY 1, 2),
ivfscored AS (
  SELECT p.query_id, cl.vec_id AS neighbor_id,
         round((p.qc_dot + a.s) / (q.qn * n.nrm), 6) AS adc_sim
  FROM probes p
  JOIN cellof cl ON cl.cell = p.cell AND cl.vec_id <> p.query_id
  JOIN adcsum a ON a.query_id = p.query_id AND a.neighbor_id = cl.vec_id
  JOIN q ON q.query_id = p.query_id
  JOIN nrms n ON n.vec_id = cl.vec_id),
ivftop AS (
  SELECT query_id, neighbor_id, adc_sim,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY adc_sim DESC, neighbor_id ASC) AS INTEGER) AS rn
  FROM ivfscored QUALIFY rn <= 5)
""".format(
    # the coarse centroid mean-update, one ROUND(AVG(e[i]) ...) per
    # dimension — generated because DuckDB LIST_VALUE takes positional
    # args and the fixtures are 64-dim
    cent64=",\n                ".join(
        f"ROUND(AVG(e[{i}]) FILTER (WHERE rnk = 1), 6)" for i in range(1, 65)
    )
)


@register(
    "knn_cosine_ivfpq",
    oracle=_IVFPQ_CORE_SQL
    + """
    SELECT query_id, neighbor_id, adc_sim, rn FROM ivftop
    """,
)
def q_knn_cosine_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC ANN top-k (similarity.knn_cosine_ivfpq): coarse cell
    pruning composed with residual-PQ asymmetric distances — the
    FAISS-style billion-vector pairing; each query scans ~n_probe/
    n_cells of the corpus as 10-byte codes, scored as one
    query-centroid dot plus m JVM-side table lookups. The
    deterministic index makes the FULL ranking oracle-backed — the
    recursive-CTE replica replays coarse k-means, residual codebooks,
    cell assignment, coding, and the norm-corrected ADC score
    (`knn_cosine_ivf` gained its own full oracle in r11 via the
    distributed integer-exact det_kmeans_cells index)."""
    return similarity.knn_cosine_ivfpq(load_table(spark, sf_dir, "embeddings"))


@register(
    "matryoshka_fidelity",
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 8),
    dims AS (SELECT CAST(d AS INTEGER) AS dim
             FROM (VALUES (8), (16), (32)) t(d)),
    full_sc AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))), 6) AS cs
      FROM q JOIN e ON e.vec_id <> q.query_id),
    full_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cs DESC, neighbor_id ASC) AS rn
        FROM full_sc) WHERE rn <= 5),
    tr_sc AS (
      SELECT d.dim, q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_dot_product(q.qv[1 : d.dim], e.v[1 : d.dim])
                   / (sqrt(list_dot_product(q.qv[1 : d.dim],
                                            q.qv[1 : d.dim]))
                      * sqrt(list_dot_product(e.v[1 : d.dim],
                                              e.v[1 : d.dim]))), 6) AS cs
      FROM dims d, q JOIN e ON e.vec_id <> q.query_id),
    tr_top AS (
      SELECT dim, query_id, neighbor_id FROM (
        SELECT dim, query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY dim, query_id
                   ORDER BY cs DESC, neighbor_id ASC) AS rn
        FROM tr_sc) WHERE rn <= 5),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM full_top),
    h AS (SELECT t.dim, CAST(COUNT(*) AS BIGINT) AS n_hits
          FROM tr_top t JOIN full_top f
            ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
          GROUP BY t.dim)
    SELECT d.dim, n.n_exact_pairs, COALESCE(h.n_hits, 0) AS n_hits,
           ROUND(COALESCE(h.n_hits, 0)
                 / CAST(n.n_exact_pairs AS DOUBLE), 4) AS overlap_pct
    FROM dims d CROSS JOIN n LEFT JOIN h ON h.dim = d.dim
    """,
)
def q_matryoshka_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation retrieval fidelity (similarity.
    matryoshka_fidelity): top-5 overlap between full-width cosine and
    8/16/32-dim prefix cosine — the adaptive-retrieval serving-cost
    table, each search the broadcast-queries streaming-corpus plan."""
    return similarity.matryoshka_fidelity(
        load_table(spark, sf_dir, "embeddings")
    )


@register(
    "ivfpq_recall_checked",
    # n_hits recomputed EXACTLY: IVFADC top-k from the deterministic
    # SQL replica, exact top-k from the same brute-force pair
    # definition the other _checked siblings use, n_hits = join count.
    oracle=_IVFPQ_CORE_SQL
    + """,
    cand AS (
      SELECT q.vec_id AS query_id, e2.vec_id AS neighbor_id,
             round(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                    CAST(e2.embedding AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
                                            CAST(q.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(e2.embedding AS DOUBLE[]),
                                              CAST(e2.embedding AS DOUBLE[])))),
                   6) AS cs
      FROM embeddings q JOIN embeddings e2 ON e2.vec_id <> q.vec_id
      WHERE q.vec_id < 8),
    extop AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cs DESC, neighbor_id ASC) AS r
      FROM cand QUALIFY r <= 5),
    ecnt AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
                    CAST(COUNT(*) AS BIGINT) AS n_exact_pairs FROM extop),
    hits AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
             FROM extop e JOIN ivftop p USING (query_id, neighbor_id))
    SELECT n_queries, n_exact_pairs, n_hits,
           n_hits >= 0.2 * n_exact_pairs AS ivfpq_recall_ok
    FROM ecnt, hits
    """,
)
def q_ivfpq_recall_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC recall vs exact top-k with the hit count
    oracle-recomputed exactly (similarity.ivfpq_recall_checked):
    measured 14/40 = 0.35 at the 16-cell/4-probe geometry (cell
    pruning costs recall on clusterless random fixtures), gated at
    0.2 — completes the ANN `_checked` matrix (LSH, IVF, PQ, IVFPQ)."""
    return similarity.ivfpq_recall_checked(
        load_table(spark, sf_dir, "embeddings")
    )


@register(
    "semantic_dedup_checked",
    oracle="""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ROUND(
              list_dot_product(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
              / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                       CAST(a.embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])))),
              6) >= 0.4),
    edges AS (SELECT va AS src, vb AS dst FROM p
              UNION ALL SELECT vb, va FROM p),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    cc AS (SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
    SELECT cc.vec_id, cc.cluster_id,
           cc.vec_id = cc.cluster_id AS is_keeper, sz.cluster_size
    FROM cc JOIN sz USING (cluster_id)
    """,
)
def q_semantic_dedup_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup cluster semantics with a FULL value oracle
    (similarity.semantic_dedup_checked): exact brute-force cosine
    pairs at ≥ 0.4 closed by iterative connected components, re-run
    level-by-level in DuckDB's recursive CTE — cluster ids, keeper
    flags and sizes hash-checked. The LSH-bucketed semantic_dedup
    remains the registered 100 TB path (rows-only by design)."""
    return similarity.semantic_dedup_checked(
        load_table(spark, sf_dir, "embeddings")
    )


@register(
    "streaming_hourly_distinct_checked",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)),
                    '%Y-%m-%d %H:00:00') AS hour,
           event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS within_5pct
    FROM events GROUP BY hour, event_type
    """,
)
def q_streaming_hourly_distinct_checked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hourly distinct users as a TRUE stream with HLL++ in the window
    state, 5% bound oracle-checked against batch exact
    (streaming/runners.py::streaming_hourly_distinct_checked) — the
    streaming member of the *_checked sketch family."""
    from dumbo_spark.streaming.runners import streaming_hourly_distinct_checked

    return streaming_hourly_distinct_checked(spark, sf_dir)


@register(
    "copurchase_components",
    oracle="""
    WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM p2 a JOIN p2 b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
    edges AS (SELECT src, dst FROM e0
              UNION ALL SELECT dst, src FROM e0),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    comp AS (SELECT node, MIN(r) AS cid FROM reach GROUP BY node),
    sizes AS (SELECT cid, COUNT(*) AS n_members FROM comp GROUP BY cid)
    SELECT n_members, CAST(COUNT(*) AS BIGINT) AS n_components
    FROM sizes GROUP BY n_members ORDER BY n_members
    """,
)
def q_copurchase_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram of the co-purchase graph
    (graph.copurchase_components): iterative min-label CC checked
    bit-for-bit against a recursive-CTE transitive closure."""
    return graph.copurchase_components(load_table(spark, sf_dir, "lineitem"))


@register(
    "doc_perplexity",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    bi AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= 2
                    THEN list_transform(range(1, len(t)),
                                        i -> t[i] || ' ' || t[i+1])
                    ELSE [] END) AS bigram
      FROM toks),
    uni AS (SELECT unnest({DUCK_TOKENS}) AS tok FROM documents),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bi GROUP BY bigram),
    c1 AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
    v AS (SELECT COUNT(DISTINCT tok) AS v FROM uni),
    s AS (
      SELECT bi.doc_id,
             log2(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS lp
      FROM bi
      JOIN c2 USING (bigram)
      JOIN c1 ON c1.tok = string_split(bi.bigram, ' ')[1]
      CROSS JOIN v)
    SELECT doc_id, COUNT(*) AS n_bigrams,
           ROUND(-AVG(lp), 4) AS xent_bits,
           ROUND(pow(2.0, -AVG(lp)), 4) AS ppl
    FROM s GROUP BY doc_id
    """,
)
def q_doc_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc cross-entropy under the corpus's own add-one bigram LM
    (textstats.doc_perplexity) — the training-free perplexity quality
    filter; gram-keyed partial aggs + joins, broadcast |V|."""
    return textstats.doc_perplexity(load_table(spark, sf_dir, "documents"))


@register(
    "containment_join",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    g AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END) AS grams
      FROM toks),
    gg AS (SELECT doc_id, grams, len(grams) AS n FROM g WHERE len(grams) > 0)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / a.n, 6)
             AS containment
    FROM gg a JOIN gg b ON a.doc_id <> b.doc_id
    WHERE 100 * len(list_intersect(a.grams, b.grams)) >= 60 * a.n
    """,
)
def q_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment self-join (dedup.containment_join):
    excerpt/quotation detection — lossless containment-form prefix
    filter (rarest-first global gram order) joined against the full
    gram postings, exact intersect verify; the brute-force oracle
    states the semantics."""
    return dedup.containment_join(load_table(spark, sf_dir, "documents"))


@register(
    "degree_histogram",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM p2 a JOIN p2 b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
    deg AS (SELECT v, COUNT(*) AS degree
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
            GROUP BY v)
    SELECT degree, COUNT(*) AS n_nodes FROM deg GROUP BY degree
    """,
)
def q_degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-purchase degree distribution (graph.degree_histogram): the
    uniform-vs-power-law diagnostic that picks graph partitioning
    strategy; two partial aggs over the edge list."""
    return graph.degree_histogram(load_table(spark, sf_dir, "lineitem"))


@register(
    "clustering_coefficient",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM p2 a JOIN p2 b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
          GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
    deg AS (SELECT v, COUNT(*) AS degree
            FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
            GROUP BY v),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM e e1
      JOIN e e2 ON e1.dst = e2.src
      JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
    pn AS (SELECT v, COUNT(*) AS t
           FROM (SELECT a AS v FROM tri
                 UNION ALL SELECT b FROM tri
                 UNION ALL SELECT c FROM tri)
           GROUP BY v)
    SELECT deg.v AS part, deg.degree,
           CAST(COALESCE(pn.t, 0) AS BIGINT) AS n_triangles,
           ROUND(CASE WHEN deg.degree >= 2
                      THEN 2.0 * COALESCE(pn.t, 0)
                           / (deg.degree * (deg.degree - 1.0))
                 END, 6) AS clustering_coeff
    FROM deg LEFT JOIN pn ON deg.v = pn.v
    """,
)
def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient
    (graph.clustering_coefficient): degree-ordered triangle
    enumeration credits each triangle's three corners, one
    partial-agg shuffle over the wedge join."""
    return graph.clustering_coefficient(load_table(spark, sf_dir, "lineitem"))


@register(
    "copurchase_kcore",
    oracle="""
    WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM p2 a JOIN p2 b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY a.l_partkey, b.l_partkey HAVING COUNT(*) >= 2),
    sym AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    es(it, src, dst) AS (
      SELECT 0, src, dst FROM sym
      UNION ALL
      SELECT it + 1, src, dst FROM (
        SELECT it, src, dst,
               COUNT(*) OVER (PARTITION BY src) AS ds,
               COUNT(*) OVER (PARTITION BY dst) AS dd
        FROM es WHERE it < 30) x
      WHERE ds >= 3 AND dd >= 3)
    SELECT src AS l_partkey, CAST(COUNT(*) AS BIGINT) AS core_degree
    FROM es WHERE it = 30 GROUP BY src
    """,
)
def q_copurchase_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core extraction (graph.kcore_nodes, k=3): iterative
    degree-peel to a fixpoint with per-round lineage truncation — the
    third iterative-graph operator alongside connected components and
    PageRank. Round-5 upgrade from rows-only to a FULL value oracle:
    DuckDB peels the symmetric edge list level by level (30 rounds ≡
    the Spark fixpoint, extra rounds are no-ops once stable) — the
    same iteration-counter recursive-CTE trick as pagerank_checked.
    Fixpoint also pinned on hand graphs in tests/test_round4_ops.py."""
    return graph.kcore_nodes(load_table(spark, sf_dir, "lineitem"))


@register(
    "copurchase_ktruss",
    # Exactly max_iter = 8 peels on both sides: the Spark loop breaks
    # early at the fixpoint, the SQL runs all 8 (no-ops once stable),
    # so the final edge sets agree unconditionally — the kcore /
    # pagerank iteration-counter trick applied to EDGE peeling. The
    # recursive working table holds only the previous round's rows, so
    # the triangle joins inside the recursive term need no it-equality
    # predicates.
    oracle="""
    WITH RECURSIVE po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey
           HAVING COUNT(*) <= 20),
    p2 AS (SELECT po.l_orderkey, po.l_partkey
           FROM po JOIN ok USING (l_orderkey)),
    e0 AS (SELECT a.l_partkey AS src, b.l_partkey AS dst
           FROM p2 a JOIN p2 b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    tr(it, src, dst) AS (
      SELECT 0, src, dst FROM e0
      UNION ALL
      SELECT it + 1, src, dst FROM (
        SELECT e.it, e.src, e.dst, COALESCE(s.supp, 0) AS supp
        FROM tr e
        LEFT JOIN (
          SELECT u.es, u.ed, COUNT(*) AS supp
          FROM (SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
                FROM tr w1
                JOIN tr w2 ON w2.src = w1.src AND w1.dst < w2.dst
                JOIN tr cl ON cl.src = w1.dst AND cl.dst = w2.dst) t,
               LATERAL (VALUES (t.a, t.b), (t.a, t.c), (t.b, t.c)) u(es, ed)
          GROUP BY u.es, u.ed) s
          ON s.es = e.src AND s.ed = e.dst
        WHERE e.it < 8) z
      WHERE supp >= 1),
    fin AS (SELECT src, dst FROM tr WHERE it = 8),
    fsupp AS (
      SELECT u.es, u.ed, COUNT(*) AS supp
      FROM (SELECT w1.src AS a, w1.dst AS b, w2.dst AS c
            FROM fin w1
            JOIN fin w2 ON w2.src = w1.src AND w1.dst < w2.dst
            JOIN fin cl ON cl.src = w1.dst AND cl.dst = w2.dst) t,
           LATERAL (VALUES (t.a, t.b), (t.a, t.c), (t.b, t.c)) u(es, ed)
      GROUP BY u.es, u.ed)
    SELECT f.src AS part_a, f.dst AS part_b,
           CAST(COALESCE(s.supp, 0) AS INTEGER) AS support
    FROM fin f LEFT JOIN fsupp s ON s.es = f.src AND s.ed = f.dst
    """,
)
def q_copurchase_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-truss decomposition (graph.ktruss_edges, k=3): iterative
    edge peel by triangle support to a fixpoint — the edge-level
    cohesion member of the iterative-graph family (CC, PageRank,
    k-core, now truss), with a full recursive-CTE value oracle."""
    return graph.ktruss_edges(load_table(spark, sf_dir, "lineitem"))


@register(
    "posting_lists",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    g AS (
      SELECT DISTINCT doc_id,
             unnest(CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END) AS token
      FROM toks),
    df AS (
      SELECT token, COUNT(*) AS doc_freq FROM g GROUP BY token
      HAVING COUNT(*) BETWEEN 2 AND 50)
    SELECT g.token, df.doc_freq,
           string_agg(CAST(g.doc_id AS VARCHAR), ',' ORDER BY g.doc_id)
             AS postings
    FROM g JOIN df USING (token)
    GROUP BY g.token, df.doc_freq
    """,
)
def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index posting lists over 3-gram phrases
    (textstats.posting_lists): df-band filter BEFORE list assembly so
    stop-phrase grams never materialize a list; postings serialized
    for canonicalizer hashing."""
    return textstats.posting_lists(load_table(spark, sf_dir, "documents"))


@register(
    "near_match_names",
    oracle="""
    WITH v AS (SELECT DISTINCT p_name AS val FROM part),
    b AS (SELECT val, right(val, 4) AS blk FROM v)
    SELECT a.val AS val_a, c.val AS val_b,
           CAST(levenshtein(a.val, c.val) AS INTEGER) AS dist
    FROM b a JOIN b c ON a.blk = c.blk AND a.val < c.val
    WHERE levenshtein(a.val, c.val) <= 3
    """,
)
def q_near_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-match over the p_name value domain
    (dedup.near_match_values): distinct → suffix block (adjective-noun
    domain: edits concentrate in the head word) → in-block Levenshtein
    verify; the attribute-domain complement of the document-scale
    PPJoin family."""
    return dedup.near_match_values(load_table(spark, sf_dir, "part"), "p_name")


@register(
    "upsert_latest",
    oracle="""
    WITH snap AS (
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             0 AS version FROM orders),
    upd AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 2 AS DOUBLE) AS o_totalprice,
             1 AS version
      FROM orders WHERE o_orderkey % 7 = 0),
    u AS (SELECT * FROM snap UNION ALL SELECT * FROM upd),
    r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                       ORDER BY version DESC) AS rn FROM u)
    SELECT o_orderkey, o_totalprice, CAST(version AS INTEGER) AS version
    FROM r WHERE rn = 1
    """,
)
def q_upsert_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest CDC merge (shape.upsert_latest): a deterministic
    update batch (every 7th order repriced, version 1) merged over the
    version-0 snapshot."""
    from dumbo_spark.functions.numeric import dmoney

    orders = load_table(spark, sf_dir, "orders")
    snap = orders.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.lit(0).alias("version"),
    )
    upd = orders.where(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        (dmoney("o_totalprice") * 2).cast("double").alias("o_totalprice"),
        F.lit(1).alias("version"),
    )
    return shape.upsert_latest(snap, upd, key="o_orderkey", version="version")


@register(
    "market_share",
    oracle="""
    WITH vol AS (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
               * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS v,
             n2.n_name AS supp_nation
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey)
    SELECT order_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             AS nation_volume,
           CAST(SUM(v) AS DOUBLE) AS total_volume,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v
                               ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                 / CAST(SUM(v) AS DOUBLE), 6) AS mkt_share
    FROM vol GROUP BY order_year
    """,
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (analytics.market_share)."""
    return analytics.market_share(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "waiting_suppliers",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supps,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS n_ret_supps,
             MIN(CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
               AS sole_ret_supp
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                           WHERE o_orderstatus = 'F')
      GROUP BY l_orderkey)
    SELECT x.s_suppkey, s.s_name, x.numwait FROM (
      SELECT sole_ret_supp AS s_suppkey, COUNT(*) AS numwait
      FROM per_order
      WHERE n_supps >= 2 AND n_ret_supps = 1
      GROUP BY sole_ret_supp) x
    JOIN supplier s ON x.s_suppkey = s.s_suppkey
    """,
)
def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (analytics.waiting_suppliers)."""
    return analytics.waiting_suppliers(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
    )


@register(
    "streaming_dedup_keys",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
)
def q_streaming_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming run (file source → dropDuplicatesWithinWatermark
    → availableNow → memory sink) over an every-event-twice replay; the
    oracle is simply the distinct event set, which dedup must
    reconstruct exactly (streaming/runners.py)."""
    from dumbo_spark.streaming.runners import streaming_dedup_keys

    return streaming_dedup_keys(spark, sf_dir)


@register(
    "streaming_running_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS total_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_streaming_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming run of the applyInPandasWithState running-totals
    operator across three micro-batches; final settled per-user rows
    must equal the batch aggregate (integer-cents state keeps the sum
    exact across any batch split — streaming/runners.py)."""
    from dumbo_spark.streaming.runners import streaming_running_totals

    return streaming_running_totals(spark, sf_dir)


@register(
    "streaming_enriched_segments",
    oracle="""
    SELECT c_mktsegment, event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c_mktsegment, event_type
    """,
)
def q_streaming_enriched_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join + aggregate executed as a real
    stream over three micro-batches (streaming/runners.py): the static
    customer dim is broadcast per batch, no join state kept; settled
    complete-mode output equals the batch join+aggregate oracle."""
    from dumbo_spark.streaming.runners import streaming_enriched_segments

    return streaming_enriched_segments(spark, sf_dir)


@register(
    "streaming_transitions",
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
def q_streaming_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER-SENSITIVE stateful streaming (streaming/runners.py +
    stateful.transition_counts_stream): per-user last-event state
    across three time-ordered micro-batches; summed emissions must
    equal the batch ``event_transitions`` oracle bit-for-bit — the
    stateful class where arrival order matters, which the commutative
    running-totals operator cannot exercise."""
    from dumbo_spark.streaming.runners import streaming_transitions

    return streaming_transitions(spark, sf_dir)


@register(
    "streaming_attribution",
    oracle="""
    SELECT p.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(c.ts AS TIMESTAMP)) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join (streaming/runners.py::
    streaming_attribution): clicks and purchases as two watermarked
    file streams in chronological micro-batches through Spark's
    symmetric hash join; time-split replay makes eviction provably
    lossless, so it shares ``click_attribution``'s batch oracle."""
    from dumbo_spark.streaming.runners import streaming_attribution

    return streaming_attribution(spark, sf_dir)


@register(
    "streaming_attribution_outer",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(CAST(p.ts AS TIMESTAMP))
                - epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_attribution_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join (streaming/runners.py::
    streaming_attribution_outer, VERDICT r4 #7): unmatched clicks
    surface as null-purchase rows once the watermark closes their
    window — sentinel files drive the final watermark so the settled
    availableNow output equals the batch LEFT JOIN oracle."""
    from dumbo_spark.streaming.runners import streaming_attribution_outer

    return streaming_attribution_outer(spark, sf_dir)


@register(
    "streaming_attribution_full",
    oracle="""
    SELECT COALESCE(c.user_id, p.user_id) AS user_id,
           c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(CAST(p.ts AS TIMESTAMP))
                - epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_attribution_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join (streaming/runners.py::
    streaming_attribution_full): unmatched clicks and organic
    purchases both emitted after watermark expiry; settled availableNow
    output equals the batch FULL JOIN oracle bit-for-bit."""
    from dumbo_spark.streaming.runners import streaming_attribution_full

    return streaming_attribution_full(spark, sf_dir)


@register(
    "streaming_attribution_semi",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id,
           CAST(epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS click_us
    FROM events c
    WHERE c.event_type = 'click'
      AND EXISTS (
        SELECT 1 FROM events p
        WHERE p.event_type = 'purchase'
          AND p.user_id = c.user_id
          AND p.ts > c.ts
          AND p.ts <= c.ts + INTERVAL 30 MINUTE)
    """,
)
def q_streaming_attribution_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI stream-stream interval join (streaming/runners.py::
    streaming_attribution_semi): attributed clicks emitted once each —
    the existence-only member that completes the streaming join-type
    matrix (inner / left outer / full outer / left semi); settled
    availableNow output equals the batch EXISTS oracle bit-for-bit."""
    from dumbo_spark.streaming.runners import streaming_attribution_semi

    return streaming_attribution_semi(spark, sf_dir)


@register(
    "streaming_attribution_dedup",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           CAST(epoch_us(CAST(p.ts AS TIMESTAMP))
                - epoch_us(CAST(c.ts AS TIMESTAMP)) AS BIGINT) AS lag_us
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND p.ts <= c.ts + INTERVAL 30 MINUTE
    """,
)
def q_streaming_attribution_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once LEFT OUTER attribution (streaming/runners.py::
    streaming_attribution_dedup, VERDICT r5 #7): every purchase half
    delivered twice; dropDuplicatesWithinWatermark ahead of the
    symmetric-hash outer join restores exactly-once semantics, so the
    settled output hash-matches the duplicate-free batch LEFT JOIN
    oracle (streaming_attribution_outer's, verbatim)."""
    from dumbo_spark.streaming.runners import streaming_attribution_dedup

    return streaming_attribution_dedup(spark, sf_dir)


@register(
    "embedding_quantize",
    oracle="""
    WITH s AS (
      SELECT vec_id, len(embedding) AS n_dims,
             127.0 / list_max(list_transform(embedding,
                                             x -> abs(CAST(x AS DOUBLE))))
               AS scale,
             embedding
      FROM embeddings
      WHERE list_max(list_transform(embedding,
                                    x -> abs(CAST(x AS DOUBLE)))) > 0),
    q AS (
      SELECT vec_id, n_dims, scale,
             unnest(range(1, n_dims + 1)) AS pos,
             FLOOR(CAST(unnest(embedding) AS DOUBLE) * scale + 0.5) AS qi
      FROM s)
    SELECT vec_id,
           CAST(MAX(n_dims) AS INTEGER) AS n_dims,
           ROUND(MAX(scale), 4) AS scale,
           CAST(SUM(qi * pos) AS BIGINT) AS q_checksum,
           CAST(SUM(ABS(qi)) AS BIGINT) AS q_l1
    FROM q GROUP BY vec_id
    """,
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization digests
    (similarity.embedding_quantize): zero-shuffle scan projection;
    oracle pins every quantized element via the position-weighted
    checksum."""
    return similarity.embedding_quantize(load_table(spark, sf_dir, "embeddings"))


@register("streaming_tumbling_1h", oracle=QUERIES["events_tumbling_1h"].oracle)
def q_streaming_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming execution of the tumbling aggregate — same
    Catalyst window expression, same oracle as the batch twin
    (streaming/runners.py)."""
    from dumbo_spark.streaming.runners import streaming_tumbling_1h

    return streaming_tumbling_1h(spark, sf_dir)


@register("streaming_sessionized", oracle=QUERIES["events_session_window"].oracle)
def q_streaming_sessionized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming session_window execution — same oracle as the
    batch session_window stand-in, whose >= gap semantics and output
    columns match F.session_window exactly (streaming/runners.py)."""
    from dumbo_spark.streaming.runners import streaming_sessionized

    return streaming_sessionized(spark, sf_dir)


@register(
    "events_cascade_rollup",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY day, event_type
    """,
)
def q_events_cascade_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle is the DIRECT day aggregation — the cascade must be
    lossless (algebraic aggregates), which this hash-check proves."""
    return temporal.cascade_rollup(load_table(spark, sf_dir, "events"))


