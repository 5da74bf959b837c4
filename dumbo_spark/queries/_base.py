"""Named query registry — the driver contract surface.

Every operator from SURVEY.md §2 that ships has a named entry here:
a callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics are
SQL-expressible, a DuckDB oracle SQL string computing the same result
over the same parquet fixtures. ``__spark_entry__.py`` re-exports this
registry; keeping both halves of each pair in one module is what keeps
column names/aliases in sync (the driver hash-compares by sorted column
name).

Oracle-matching ground rules (see functions/numeric.py for the full
rationale):

- money aggregates go through DECIMAL(18,2) → exact, order-independent
- derived ratios (means, stddevs) are rounded to 4dp on both sides
- counts/ranks are exact integers
- every computed column is aliased identically on both sides
- DuckDB's ``events.ts`` is TIMESTAMP_NS; oracles CAST to µs TIMESTAMP
  to match Spark's truncation (sources/catalog.py)
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F

from dumbo_spark.operators import (
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
from dumbo_spark.sources.catalog import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only driver check


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(name, fn, oracle)
        return fn

    return deco


# ── shared DuckDB SQL fragments ─────────────────────────────────────────

# identical tokenization to functions/text.py::tokens (ASCII \W+ in both
# Java regex and RE2)
DUCK_TOKENS = r"list_filter(string_split_regex(lower(text), '\W+'), t -> t <> '')"


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)



# NOTE (r13): this module holds the registry PRIMITIVES only; the
# query registrations (len(QUERIES) of them) live in
# dumbo_spark/queries/*.py and are
# imported (in original registration order) by dumbo_spark/registry.py,
# which remains the public surface.
