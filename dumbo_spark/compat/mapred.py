"""Dumbo programming-model veneer: mapper/reducer callables on Spark.

The reference's entire execution surface is four callables
(dumbo/core.py):

- ``mapper(key, value) -> Iterable[(k2, v2)]``  (itermap, :~140)
- open mapper taking the whole record iterator (arity-1; setup/teardown
  + cross-record state, :~150)
- ``reducer(key, values) -> Iterable[(k3, v3)]`` (iterreduce, :~170)
- ``combiner`` — same contract, run map-side per spill (:~110)

This module preserves those contracts on Arrow-vectorized primitives:
``mapInPandas`` for the map phase (batched, columnar transfer — the
upgrade over dumbo's one-record-at-a-time typedbytes pipes, §1.5) and
``applyInPandas`` after ``groupBy(key)`` for the reduce phase. The
combiner is applied batch-locally after mapping — the same
idempotent-mergeable contract dumbo demands, same purpose (shrink the
shuffle), but optional: for algebraic aggregations you should not be
here at all; use the DataFrame operators and let Catalyst's partial
aggregation do it.

Two deliberate semantic upgrades, documented per SURVEY §7.3#1:

- output schemas are explicit (dumbo had none — tuple conventions)
- reducers see values in ARBITRARY order (dumbo's are shuffle-order
  too unless -joinkeys; code relying on JoinKey primary-first ordering
  should sort explicitly — see operators/joins.py for why you almost
  never need this on Spark)

This is the compatibility path, not the fast path. Every operator in
dumbo_spark.operators expresses the same capabilities as JVM-side
DataFrame plans; use this only for genuinely imperative per-record
logic.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, functions as F


class Params(dict):
    """-param k=v surface (dumbo/backends/common.py:~30 ``Params``).

    Dumbo propagated these through task environment variables; Spark
    closures serialize them for free — this is a dict with attribute
    sugar, shipped inside the mapper/reducer closure.
    """

    def __getattr__(self, k: str) -> Any:
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


MapFn = Callable[[Any, Any], Iterable[tuple[Any, Any]]]
RedFn = Callable[[Any, Iterator[Any]], Iterable[tuple[Any, Any]]]


def _ensure_workers(df: DataFrame) -> None:
    """Ship this package to executor workers (UDF closures reference
    it by module name; see session._ship_package)."""
    from dumbo_spark.session import ensure_runtime_confs

    ensure_runtime_confs(df.sparkSession)


def _schema_names(schema: str) -> tuple[str, str]:
    """First two field names of a '<k> <type>, <v> <type>' DDL string —
    applyInPandas/mapInPandas match returned pandas columns by label."""
    fields = [f.strip().split()[0] for f in schema.split(",")]
    return fields[0], fields[1]


def _map_batches(mapper: MapFn, key_col: str, value_col: str, out_k_name: str = "key", out_v_name: str = "value"):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_k, out_v = [], []
            for k, v in zip(pdf[key_col], pdf[value_col]):
                for k2, v2 in mapper(k, v):
                    out_k.append(k2)
                    out_v.append(v2)
            yield pd.DataFrame({out_k_name: out_k, out_v_name: out_v})

    return fn


def _combine_batch(combiner: RedFn, pdf: pd.DataFrame) -> pd.DataFrame:
    out_k, out_v = [], []
    for k, grp in pdf.groupby("key", sort=False):
        for k2, v2 in combiner(k, iter(grp["value"])):
            out_k.append(k2)
            out_v.append(v2)
    return pd.DataFrame({"key": out_k, "value": out_v})


def map_only(
    df: DataFrame,
    mapper: MapFn,
    output_schema: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Map-only job (-numreducetasks 0, dumbo/core.py:~320): no shuffle,
    no reduce — a narrow mapInPandas pass."""
    _ensure_workers(df)
    kn, vn = _schema_names(output_schema)
    return df.mapInPandas(_map_batches(mapper, key_col, value_col, kn, vn), output_schema)


def map_open(
    df: DataFrame,
    fn: Callable[[Iterator[tuple[Any, Any]]], Iterable[tuple[Any, Any]]],
    output_schema: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Open (arity-1) mapper: the callable receives the whole record
    iterator of its partition (dumbo/core.py:~150 — the hook for
    setup/teardown and cross-record state within one task). Same
    contract here per Spark partition, batched through Arrow.
    """
    _ensure_workers(df)
    kn, vn = _schema_names(output_schema)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def records() -> Iterator[tuple[Any, Any]]:
            for pdf in batches:
                yield from zip(pdf[key_col], pdf[value_col])

        out_k, out_v = [], []
        for k2, v2 in fn(records()):
            out_k.append(k2)
            out_v.append(v2)
        yield pd.DataFrame({kn: out_k, vn: out_v})

    return df.mapInPandas(run, output_schema)


def join_reduce(
    primary: DataFrame,
    secondary: DataFrame,
    reducer: Callable[[Any, list[Any], list[Any]], Iterable[tuple[Any, Any]]],
    output_schema: str = "key string, value double",
) -> DataFrame:
    """JoinReducer veneer (dumbo/lib/__init__.py:~90 + JoinKey secondary
    sort, backends/common.py:~120): per key, the reducer gets the
    primary side's values first, then the secondary side's — dumbo's
    ``primary(key, vals)`` stash + ``secondary(key, vals)`` stream
    collapsed into one call with both lists.

    Implementation is the reduce-side join dumbo hand-built: tag each
    side, union, group by key — one shuffle, sort-merge semantics.
    Prefer ``DataFrame.join`` (operators/joins.py) for anything
    relational; this exists for imperative join logic during migration.
    """
    _ensure_workers(primary)
    p = primary.select(
        F.col("key").cast("string").alias("key"),
        F.lit(0).alias("side"),
        F.col("value").cast("string").alias("value"),
    )
    s = secondary.select(
        F.col("key").cast("string").alias("key"),
        F.lit(1).alias("side"),
        F.col("value").cast("string").alias("value"),
    )
    kn, vn = _schema_names(output_schema)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        key = pdf["key"].iloc[0]
        prim = list(pdf.loc[pdf["side"] == 0, "value"])
        sec = list(pdf.loc[pdf["side"] == 1, "value"])
        out_k, out_v = [], []
        for k2, v2 in reducer(key, prim, sec):
            out_k.append(k2)
            out_v.append(v2)
        return pd.DataFrame({kn: out_k, vn: out_v})

    return p.unionByName(s).groupBy("key").applyInPandas(reduce_group, output_schema)


def map_reduce(
    df: DataFrame,
    mapper: MapFn,
    reducer: RedFn,
    combiner: RedFn | None = None,
    output_schema: str = "key string, value long",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """One dumbo iteration: map → [combine] → group-by-key → reduce.

    Chaining calls (dumbo's ``Job.additer``) is plain composition —
    Catalyst pipelines the iterations with no temp-path
    materialization (SURVEY §3.4).
    """
    _ensure_workers(df)
    # The intermediate wire pair is (key string, value double) — dumbo's
    # dynamically-typed typedbytes pairs narrowed to the common case.
    # Imperative jobs needing richer values belong on DataFrame
    # operators, not this veneer.
    mapped_schema = "key string, value double"
    mapper_fn = _map_batches(mapper, key_col, value_col)

    if combiner is not None:
        base_fn = mapper_fn

        def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in base_fn(batches):
                yield _combine_batch(combiner, pdf)

        mapper_fn = fn

    mapped = df.mapInPandas(mapper_fn, mapped_schema)
    kn, vn = _schema_names(output_schema)

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        out_k, out_v = [], []
        for k, grp in pdf.groupby("key", sort=False):
            for k2, v2 in reducer(k, iter(grp["value"])):
                out_k.append(k2)
                out_v.append(v2)
        return pd.DataFrame({kn: out_k, vn: out_v})

    return mapped.groupBy("key").applyInPandas(reduce_group, output_schema)
