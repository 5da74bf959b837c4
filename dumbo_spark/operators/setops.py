"""Set operators — dumbo's multi-input surface plus the gap rows.

Reference surface:

- repeatable ``-input`` concatenating sources (dumbo/core.py:~300;
  one -input flag per path in backends/streaming.py) →
  :func:`union_all`
- ``MultiMapper`` per-source mapper dispatch (dumbo/lib/__init__.py:
  ~100, used with -addpath) → :func:`multi_source_union`: each source
  gets its own transform, then ``unionByName`` — the declarative
  version of path-suffix dispatch
- intersect/except: absent in dumbo (SURVEY §2.4 gap rows), shipped as
  Spark built-ins → :func:`intersect_keys`, :func:`except_keys`

Scale: unions are metadata-only (no shuffle); intersect/except shuffle
both sides on the compared columns — keep the projected column set
minimal before the set op, as done here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def union_all(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Concatenated inputs of one logical dataset (repeated -input)."""
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.unionByName(s)


def multi_source_union(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """MultiMapper: per-source mapper, one output stream. Each side is
    reshaped to the common schema with a source tag, then unioned."""
    c = customer.select(
        F.lit("customer").alias("src"),
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("acctbal"),
    )
    s = supplier.select(
        F.lit("supplier").alias("src"),
        F.col("s_suppkey").alias("id"),
        F.col("s_name").alias("name"),
        F.col("s_acctbal").alias("acctbal"),
    )
    return c.unionByName(s)


def intersect_keys(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Distinct keys present on both sides (gap row: INTERSECT)."""
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def except_keys(customer: DataFrame, supplier: DataFrame) -> DataFrame:
    """Distinct keys on the left only (gap row: EXCEPT)."""
    c = customer.select(F.col("c_nationkey").alias("nationkey"))
    s = supplier.select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, measure: str
) -> DataFrame:
    """CDC-style snapshot comparison: classify each key as added /
    changed / unchanged between two aggregate snapshots and roll up the
    census — the reconciliation step a warehouse runs after every load
    (the job dumbo users chained two sumreducer passes plus a manual
    diff script for).

    Both snapshots are aggregated per key first, then full-outer-joined
    ON that key: the two partial aggs and the join all hash-partition
    on the same key, so the whole comparison rides one shuffle
    partitioning end-to-end. Output is the 3-row census plus exact
    integer row/measure deltas.
    """
    from dumbo_spark.functions.numeric import dmoney

    # exact decimal measure sums: a raw double sum is shuffle-order
    # dependent in the last ulp, which would make the changed/unchanged
    # split itself nondeterministic
    o = old.groupBy(key).agg(
        F.count("*").alias("_n_old"), F.sum(dmoney(measure)).alias("_m_old")
    )
    n = new.groupBy(key).agg(
        F.count("*").alias("_n_new"), F.sum(dmoney(measure)).alias("_m_new")
    )
    status = (
        F.when(F.col("_n_old").isNull(), "added")
        .when(F.col("_n_new").isNull(), "removed")
        .when(
            (F.col("_n_old") != F.col("_n_new"))
            | (F.col("_m_old") != F.col("_m_new")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        o.join(n, key, "full_outer")
        .select(status.alias("status"), "_n_old", "_n_new")
        .groupBy("status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(F.coalesce(F.col("_n_new"), F.lit(0))
                  - F.coalesce(F.col("_n_old"), F.lit(0))).alias("row_delta"),
        )
    )
