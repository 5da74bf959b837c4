"""Join operators — dumbo's JoinReducer family, Catalyst-native.

Reference surface:

- ``JoinReducer`` + ``PrimaryMapper``/``SecondaryMapper``
  (dumbo/lib/__init__.py:~85-120) with ``-joinkeys`` secondary sort
  (dumbo/backends/common.py:~120 ``JoinKey``): a hand-built reduce-side
  sort-merge equi-join — primary group arrives first per key, user code
  stashes it and streams the secondary side. That is literally what
  Spark's SortMergeJoinExec does → :func:`join_inner` /
  :func:`join_left` (left-outer is user code in dumbo's ``secondary()``;
  a ``how`` flag here).
- ``-cachefile`` map-side join (dumbo/backends/streaming.py:~155,
  manual dictionary shipped to every task) → :func:`join_broadcast_dim`
  with an explicit ``F.broadcast`` hint.
- semi/anti joins: absent in dumbo (SURVEY §2.4 gap rows) →
  :func:`join_semi` / :func:`join_anti`.

Scale notes (100 TB): fact⋈fact equi-joins shuffle both sides on the
key — AQE handles skewed keys (skewJoin.enabled splits oversized
partitions). Dimension joins must NOT shuffle the fact side: broadcast
the dim (dumbo's -cachefile made the user do this by hand; here it's a
hint, and Catalyst does it automatically under the
autoBroadcastJoinThreshold anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dumbo_spark.functions.numeric import dmoney, dsum


def join_inner(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """Reduce-side equi-join (JoinReducer inner semantics)."""
    return orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


def join_left(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Left-outer: JoinReducer with user-coded no-primary handling."""
    return customer.join(orders, customer.c_custkey == orders.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


def join_semi(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """EXISTS (gap row): customers with at least one order. Left side
    only crosses the shuffle — no value columns from the right."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


def join_anti(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """NOT EXISTS (gap row): customers with no orders."""
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


def join_full_outer(orders: DataFrame, events: DataFrame) -> DataFrame:
    """Full-outer join (gap row — dumbo's JoinReducer cannot express it:
    with no primary group the secondary side is unreachable, and vice
    versa; users ran two jobs and unioned).

    Shape: account-level 360 view — per-custkey order activity FULL
    OUTER per-user event activity on the shared key domain. Customers
    with no events and event users with no orders both survive with
    nulls on the missing side. Both inputs pre-aggregate to |keys| rows
    before the join, so the outer join itself is small even at 100 TB
    of raw input.
    """
    by_orders = orders.groupBy(F.col("o_custkey").alias("account_id")).agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice", "order_revenue")
    )
    by_events = events.groupBy(F.col("user_id").alias("account_id")).agg(
        F.count("*").alias("n_events"), dsum("value", "event_value")
    )
    return by_orders.join(by_events, "account_id", "full_outer")


def join_broadcast_dim(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Map-side dimension join (-cachefile pattern): broadcast the dim,
    keep the fact table un-shuffled, aggregate after."""
    revenue = dmoney("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dmoney("l_discount")
    )
    return (
        lineitem.join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(revenue).cast("double").alias("sum_revenue"),
        )
    )
