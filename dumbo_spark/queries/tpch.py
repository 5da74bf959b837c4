"""Percentiles/pivot/tf-idf + composed TPC-H pipeline shapes, window variants, sampling/splitting — mechanically split out of registry.py in round 13
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


# ═══ percentiles / pivot / tf-idf ═══════════════════════════════════════


@register(
    "group_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.group_percentiles(load_table(spark, sf_dir, "lineitem"))


@register("approx_percentiles", oracle=None)  # sketch differs by engine
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.approx_percentiles(load_table(spark, sf_dir, "lineitem"))


@register(
    "bucketed_group_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           ROUND(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           ROUND(quantile_cont(l_extendedprice, 0.99), 4) AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_bucketed_group_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_percentiles' contract, scale-safe
    (agg.bucketed_group_percentiles): range-partitioned exact ranks +
    broadcast quantile-target join + interpolation — no per-group
    single-task sort; shares the exact quantile_cont oracle."""
    return agg.bucketed_group_percentiles(load_table(spark, sf_dir, "lineitem"))


@register(
    "hourly_active_users",
    oracle="""
    SELECT strftime(date_trunc('hour', CAST(ts AS TIMESTAMP)), '%Y-%m-%d %H:00:00')
             AS hour,
           event_type,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY hour, event_type
    """,
)
def q_hourly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.hourly_active_users(load_table(spark, sf_dir, "events"))


@register(
    "group_collect",
    oracle="""
    SELECT l_returnflag,
           array_to_string(list_sort(list(DISTINCT l_linestatus)), ',') AS statuses,
           COUNT(DISTINCT l_linestatus) AS n_statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The operator returns a real array<string>; the registered query
    # serializes it to a comma-joined string because the driver's
    # pandas-based canonicalizer cannot sort list-typed cells
    # (CORRECTNESS_r02: "unhashable type: 'list'"). Same information,
    # hashable representation.
    return agg.group_collect(load_table(spark, sf_dir, "lineitem")).withColumn(
        "statuses", F.array_join("statuses", ",")
    )


@register(
    "pivot_status",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
           CAST(SUM(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.pivot_status(load_table(spark, sf_dir, "lineitem"))


@register(
    "token_doc_freq",
    oracle=f"""
    WITH per_doc AS (
      SELECT unnest(list_distinct({DUCK_TOKENS})) AS token FROM documents),
    dfc AS (SELECT token, COUNT(*) AS doc_freq FROM per_doc GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token, doc_freq,
           ROUND(ln((n_docs + 1) / CAST(doc_freq + 1 AS DOUBLE)), 6) AS idf
    FROM dfc CROSS JOIN n
    """,
)
def q_token_doc_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_doc_freq(load_table(spark, sf_dir, "documents"))


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS ts FROM documents),
    tfc AS (
      SELECT doc_id, unnest(ts) AS token FROM toks),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tfc GROUP BY 1, 2),
    per_doc AS (SELECT unnest(list_distinct(ts)) AS token FROM toks),
    dfc AS (SELECT token, COUNT(*) AS doc_freq FROM per_doc GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    idf AS (
      SELECT token,
             ROUND(ln((n_docs + 1) / CAST(doc_freq + 1 AS DOUBLE)), 6) AS idf
      FROM dfc CROSS JOIN n),
    scored AS (
      SELECT t.doc_id, t.token, t.tf, ROUND(t.tf * i.idf, 6) AS tfidf
      FROM tf t JOIN idf i ON t.token = i.token)
    SELECT doc_id, token, tf, tfidf, CAST(rn AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, token) AS rn FROM scored)
    WHERE rn <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc tf-idf keyword extraction (textstats.tfidf_top_terms):
    rank on the 6dp-rounded score with token tie-break so the top-k
    cut is engine-stable; doc-partitioned window, token-keyed idf
    join."""
    return textstats.tfidf_top_terms(load_table(spark, sf_dir, "documents"))


# ═══ composed analytical pipelines (TPC-H shapes) ═══════════════════════


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS sum_disc_price,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
             AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4)
             AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.pricing_summary(load_table(spark, sf_dir, "lineitem"))


@register(
    "top_revenue_nations",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def q_top_revenue_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.top_revenue_nations(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "segment_top_customers",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
             COUNT(*) AS n_orders,
             CAST(ROW_NUMBER() OVER (
                  PARTITION BY c_mktsegment
                  ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) DESC,
                           c_custkey ASC) AS INTEGER) AS rn
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, c_custkey, c_name)
    WHERE rn <= 5
    """,
)
def q_segment_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.segment_top_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "order_priority_counts",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00')
    GROUP BY o_orderpriority
    """,
)
def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.order_priority_counts(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "shipping_priority",
    oracle="""
    SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE l_shipdate > TIMESTAMP '1995-06-30 00:00:00'
      AND o_orderdate < TIMESTAMP '1995-06-30 00:00:00'
      AND c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.shipping_priority(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.returned_items(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "orders_above_avg",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice
    FROM (
      SELECT o_orderkey, o_orderpriority, o_totalprice,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS grp_sum,
             COUNT(*) OVER w AS grp_n
      FROM orders
      WINDOW w AS (PARTITION BY o_orderpriority))
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * grp_n > grp_sum
    """,
)
def q_orders_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.orders_above_avg(load_table(spark, sf_dir, "orders"))


@register(
    "join_full_outer",
    oracle="""
    WITH o AS (
      SELECT o_custkey AS account_id, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS order_revenue
      FROM orders GROUP BY 1),
    e AS (
      SELECT user_id AS account_id, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS event_value
      FROM events GROUP BY 1)
    SELECT COALESCE(o.account_id, e.account_id) AS account_id,
           n_orders, order_revenue, n_events, event_value
    FROM o FULL OUTER JOIN e ON o.account_id = e.account_id
    """,
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return joins.join_full_outer(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "events")
    )


@register(
    "grouping_sets_counts",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderpriority), ())
    """,
)
def q_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.grouping_sets_counts(load_table(spark, sf_dir, "orders"))


@register(
    "lag_lead_delta",
    oracle="""
    SELECT user_id, event_id, event_type,
           epoch_us(CAST(ts AS TIMESTAMP))
             - LAG(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us,
           LEAD(event_type) OVER w AS next_event_type
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
    """,
)
def q_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.lag_lead_delta(load_table(spark, sf_dir, "events"))


@register(
    "moving_avg",
    oracle="""
    WITH daily AS (
      SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      FROM orders GROUP BY day)
    SELECT day, revenue,
           ROUND(AVG(revenue) OVER (
                 ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d
    FROM daily
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.moving_avg_daily(load_table(spark, sf_dir, "orders"))


@register(
    "ntile_quartiles",
    oracle="""
    WITH q AS (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
      FROM customer)
    SELECT CAST(quartile AS INTEGER) AS quartile, COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM q GROUP BY quartile
    """,
)
def q_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.ntile_quartiles(load_table(spark, sf_dir, "customer"))


@register(
    "bucketed_quartiles",
    oracle="""
    WITH q AS (
      SELECT c_acctbal,
             NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
      FROM customer)
    SELECT CAST(quartile AS INTEGER) AS quartile, COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM q GROUP BY quartile
    """,
)
def q_bucketed_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract/oracle as ntile_quartiles; since round 6 both
    names share the global_ntile (range-repartition + offset join)
    implementation — kept registered for oracle-history continuity."""
    return topk.bucketed_quartiles(load_table(spark, sf_dir, "customer"))


@register(
    "ntile_quartiles_by_segment",
    oracle="""
    WITH q AS (
      SELECT c_mktsegment, c_acctbal,
             NTILE(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile
      FROM customer)
    SELECT c_mktsegment, CAST(quartile AS INTEGER) AS quartile,
           COUNT(*) AS n_customers,
           MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
    FROM q GROUP BY c_mktsegment, quartile
    """,
)
def q_ntile_quartiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.ntile_quartiles_by_segment(load_table(spark, sf_dir, "customer"))


@register(
    "percent_rank_by_segment",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 8) AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_percent_rank_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.percent_rank_by_segment(load_table(spark, sf_dir, "customer"))


@register(
    "salted_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS INTEGER) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def q_salted_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Identical contract/oracle to topk_per_group, computed via the
    skew-safe two-phase salted path — proves the 100 TB variant is
    exact, not approximately right."""
    return topk.salted_topk_per_group(
        load_table(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        "o_orderpriority",
        "o_totalprice",
        k=3,
        tiebreak_cols=["o_orderkey"],
    )


# ═══ TPC-H composition shapes (round-1 batch 2) ═════════════════════════


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.local_supplier_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "promo_revenue",
    oracle="""
    SELECT ROUND(100.0
           * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
                      THEN CAST(l_extendedprice AS DECIMAL(18,2))
                           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                  AS DOUBLE), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.promo_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150)
    SELECT c_custkey, c_name, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_totalprice,
           CAST(sum_qty AS DOUBLE) AS total_qty
    FROM big
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY total_qty DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return analytics.large_orders(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "nation_trade_volume",
    oracle="""
    SELECT supp_nation, cust_nation, ship_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS ship_year,
             l_extendedprice, l_discount
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name)
    GROUP BY supp_nation, cust_nation, ship_year
    """,
)
def q_nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (SURVEY §2 composed pipelines)."""
    return analytics.nation_trade_volume(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "product_profit",
    oracle="""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    - CAST(p_retailprice AS DECIMAL(9,2))
                      * CAST(l_quantity AS DECIMAL(9,2))
                      * CAST(0.1 AS DECIMAL(3,1)))
                AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost modeled from p_retailprice)."""
    return analytics.product_profit(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "order_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (SELECT c_custkey, COUNT(o_orderkey) AS n_orders
          FROM customer LEFT JOIN orders ON c_custkey = o_custkey
          GROUP BY c_custkey)
    GROUP BY n_orders
    """,
)
def q_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape."""
    return analytics.order_count_distribution(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "supplier_part_variety",
    oracle="""
    SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
    GROUP BY p_brand, p_type
    """,
)
def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier↔part pairs observed via lineitem)."""
    return analytics.supplier_part_variety(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "small_quantity_revenue",
    oracle="""
    WITH flagged AS (
      SELECT l_partkey, l_extendedprice,
             CAST(l_quantity AS DECIMAL(18,2)) AS _qty,
             SUM(CAST(l_quantity AS DECIMAL(18,2)))
               OVER (PARTITION BY l_partkey) AS _sum_qty,
             COUNT(*) OVER (PARTITION BY l_partkey) AS _n
      FROM lineitem)
    SELECT p_brand,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS small_qty_revenue
    FROM flagged JOIN part ON l_partkey = p_partkey
    WHERE 5 * _qty * _n < _sum_qty
    GROUP BY p_brand
    """,
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (exact integer-decimal threshold cut)."""
    return analytics.small_quantity_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
                AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
           AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
           AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
           AND CAST(l_quantity AS DECIMAL(18,2)) BETWEEN 20 AND 30)
    """,
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (OR-of-ANDs predicate)."""
    return analytics.disjunctive_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "idle_rich_customers",
    oracle="""
    WITH stats AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS _bal_sum,
             COUNT(*) AS _bal_n
      FROM customer WHERE c_acctbal > 0)
    SELECT c_nationkey, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer, stats
    WHERE CAST(c_acctbal AS DECIMAL(18,2)) * _bal_n > _bal_sum
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (scalar subquery + left-anti join)."""
    return analytics.idle_rich_customers(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


@register(
    "price_histogram",
    oracle="""
    SELECT CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS BIGINT) AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           CAST(CAST(FLOOR(CAST(o_totalprice AS DECIMAL(18,2)) / 25000) AS BIGINT)
                * 25000 AS DOUBLE) AS bucket_lo
    FROM orders
    GROUP BY bucket
    """,
)
def q_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return agg.price_histogram(load_table(spark, sf_dir, "orders"))


@register(
    "cheapest_part_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             MIN(CAST(p_retailprice AS DECIMAL(18,2))) OVER (PARTITION BY p_brand) AS min_price
      FROM part)
    WHERE CAST(p_retailprice AS DECIMAL(18,2)) = min_price
    """,
)
def q_cheapest_part_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.cheapest_part_per_brand(load_table(spark, sf_dir, "part"))


@register(
    "percent_rank_balance",
    oracle="""
    SELECT c_custkey, c_acctbal,
           ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 8) AS cume
    FROM customer
    WINDOW w AS (ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q_percent_rank_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.percent_rank_balance(load_table(spark, sf_dir, "customer"))


# ═══ extra window variants ══════════════════════════════════════════════


@register(
    "events_sliding_1h_30m",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events),
    windows AS (
      SELECT event_type, value,
             unnest([us - us % 1800000000,
                     us - us % 1800000000 - 1800000000]) AS start_us
      FROM e)
    SELECT strftime(make_timestamp(CAST(start_us AS BIGINT)), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM windows GROUP BY window_start, event_type
    """,
)
def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.events_sliding_1h_30m(load_table(spark, sf_dir, "events"))


@register(
    "streaming_sliding_1h_30m",
    oracle="""
    WITH e AS (
      SELECT event_type, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
      FROM events),
    windows AS (
      SELECT event_type, value,
             unnest([us - us % 1800000000,
                     us - us % 1800000000 - 1800000000]) AS start_us
      FROM e)
    SELECT strftime(make_timestamp(CAST(start_us AS BIGINT)), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM windows GROUP BY window_start, event_type
    """,
)
def q_streaming_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window as a real stream (streaming/runners.py::
    streaming_sliding_1h_30m); settled output shares the batch twin's
    two-candidate-starts oracle."""
    from dumbo_spark.streaming.runners import streaming_sliding_1h_30m

    return streaming_sliding_1h_30m(spark, sf_dir)


@register(
    "events_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       >= 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sessions AS (
      SELECT user_id, value, us,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM flagged)
    SELECT user_id,
           MIN(us) AS session_start_us,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_id
    """,
)
def q_events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events.events_session_window(load_table(spark, sf_dir, "events"))


# ═══ sampling / splitting (corpus assembly) ═════════════════════════════


def _split_oracle() -> str:
    bucket = sampling.sql_md5_bucket("doc_id")
    return f"""
    SELECT doc_id,
           CASE WHEN {bucket} < 10 THEN 'test' ELSE 'train' END AS split,
           CAST({bucket} AS INTEGER) AS bucket
    FROM documents
    """


@register("split_train_test", oracle=_split_oracle())
def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.split_train_test(load_table(spark, sf_dir, "documents"))


@register("stratified_sample", oracle=None)  # seeded randomness
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.stratified_sample(load_table(spark, sf_dir, "documents"))


@register(
    "corpus_clean",
    oracle=r"""
    WITH c AS (
      SELECT doc_id, lang,
             trim(regexp_replace(lower(text), '\W+', ' ', 'g')) AS clean_text
      FROM documents)
    SELECT doc_id, lang, clean_text,
           CAST(len(string_split(clean_text, ' ')) AS INTEGER) AS n_tokens
    FROM c
    WHERE len(string_split(clean_text, ' ')) BETWEEN 5 AND 100000
    """,
)
def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sampling.corpus_clean(load_table(spark, sf_dir, "documents"))


