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
