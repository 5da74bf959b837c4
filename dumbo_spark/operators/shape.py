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

from pyspark.sql import DataFrame, Window, functions as F
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


def column_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Data-quality profile: one row per requested column with row
    count, null count, exact distinct count, and min/max rendered as
    strings (so heterogeneous column types share one schema).

    One aggregate pass per column UNIONed — each is a partial-agg
    shuffle of a handful of rows, and the scan prunes to exactly the
    profiled columns. The ingest-gate check every large pipeline runs
    before accepting a day's data.
    """
    profiles = []
    for c in columns:
        col = F.col(c)
        profiles.append(
            df.select(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(col.isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.countDistinct(col).alias("n_distinct"),
                F.min(col).cast("string").alias("min_value"),
                F.max(col).cast("string").alias("max_value"),
            )
        )
    out = profiles[0]
    for p in profiles[1:]:
        out = out.unionByName(p)
    return out


def upsert_latest(
    snapshot: DataFrame, updates: DataFrame, key: str, version: str
) -> DataFrame:
    """Keep-latest merge (the batch core of an SCD/CDC ingest): union
    snapshot and updates, keep the row with the highest ``version``
    per ``key`` (ties go to the update side, matching MERGE semantics).

    One window pass over the union — a single shuffle on the key; no
    join-back, no driver involvement. At 100 TB the snapshot side
    usually arrives hash-bucketed by key, which removes even that
    shuffle for the steady-state daily merge.
    """
    tagged = snapshot.withColumn("_src", F.lit(0)).unionByName(
        updates.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def key_skew_profile(df: DataFrame, key_col: str) -> DataFrame:
    """Join-key skew diagnosis: one row summarizing the per-key count
    distribution of ``key_col`` — the measurement you take BEFORE
    choosing a join strategy at 100 TB (broadcast? salt? AQE skew
    split?). max_cnt vs p50_cnt is the skew ratio; top1_share is the
    fraction of all rows behind the single heaviest key.

    Two partial-agg shuffles (per-key counts, then a 1-row rollup of
    the counts); exact percentiles over the count distribution are fine
    here because the rollup input is one row per KEY, not per row.
    """
    counts = df.groupBy(key_col).agg(F.count("*").alias("cnt"))
    return counts.agg(
        F.count("*").alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(F.percentile("cnt", F.lit(0.5)), 4).alias("p50_cnt"),
        F.round(F.percentile("cnt", F.lit(0.99)), 4).alias("p99_cnt"),
        F.round(F.max("cnt") / F.sum("cnt"), 6).alias("top1_share"),
    )


def unpivot_long(lineitem: DataFrame) -> DataFrame:
    """Wide→long reshape (melt / UNPIVOT): per-returnflag aggregate
    metrics emitted as (flag, metric, value) rows — the inverse of
    :func:`~dumbo_spark.operators.agg`'s pivot, completing the reshape
    family. ``stack`` is a narrow generator over the tiny aggregated
    frame: the only shuffle is the partial agg that built the wide
    table; the melt itself moves no data.
    """
    from dumbo_spark.functions.numeric import dsum

    wide = lineitem.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_price"),
        F.count("*").cast("double").alias("n_items"),
    )
    return wide.select(
        "l_returnflag",
        F.expr(
            "stack(3, 'sum_qty', sum_qty, 'sum_price', sum_price,"
            " 'n_items', n_items) AS (metric, value)"
        ),
    )
