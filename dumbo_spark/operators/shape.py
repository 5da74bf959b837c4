"""Row-shape operators — dumbo's mapper idioms as narrow transforms.

Reference surface:

- per-record mapper, 1:1 reshape (dumbo/core.py:~140 ``itermap``;
  examples/altwordcount.py) → :func:`map_project`
- per-record mapper, 1:n flat-map (same contract) → :func:`map_explode`
- conditional yield / predicate mapper (examples/excludewords.py:~8)
  → :func:`filter_predicate`
- ``-parser`` / ``-record`` value parsing before the mapper
  (dumbo/core.py:~330) → :func:`parse_props` (schema-on-read via
  ``from_json`` instead of a parser class)
- ``-addpath`` path-tagged records (dumbo/core.py:~310) →
  :func:`input_file_tag` (``input_file_name()`` column)

All are narrow (no shuffle); Catalyst pushes the predicates and
prunes columns down to the parquet scan, which is the 100 TB win dumbo
could never have (its mappers always read whole records).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from dumbo_spark.functions.text import tokens


def map_project(lineitem: DataFrame) -> DataFrame:
    """1:1 mapper reshape: select + compute. Per-row IEEE arithmetic is
    engine-deterministic, so this carries a full oracle."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).alias("revenue"),
        (F.col("l_quantity") > 25).alias("bulk"),
    )


def map_explode(documents: DataFrame) -> DataFrame:
    """1:n mapper: one row per token, key preserved (itermap's 0..n
    contract; the map half of wordcount kept un-aggregated)."""
    return documents.select("doc_id", F.explode(tokens("text")).alias("token"))


def filter_predicate(lineitem: DataFrame) -> DataFrame:
    """Predicate mapper (examples/excludewords.py): emit only passing
    rows. The filter reaches the parquet scan as a pushed filter."""
    return lineitem.where(
        (F.col("l_quantity") >= 45) & (F.col("l_discount") >= 0.05)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag")


#: schema of events.props (dumbo's -parser equivalent is a class; here
#: it's a declared schema the scan applies)
PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])


def parse_props(events: DataFrame) -> DataFrame:
    """-parser/-record: parse the raw value before mapping. JSON string
    column → typed struct at scan time, then aggregate by the parsed
    field."""
    from dumbo_spark.functions.numeric import dsum

    k = F.from_json("props", PROPS_SCHEMA).getField("k")
    return (
        events.select(k.alias("k"), "value")
        .groupBy("k")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


def input_file_tag(orders: DataFrame) -> DataFrame:
    """-addpath: tag each record with its source file. The engine column
    is ``input_file_name()``; aggregated here so the result is
    path-invariant (basename only)."""
    src = F.regexp_extract(F.input_file_name(), r"([^/]+)\.parquet", 1)
    return orders.select(src.alias("src")).groupBy("src").agg(F.count("*").alias("n_rows"))
