"""dumbo_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of klbostee/dumbo.

Dumbo (reference: /root/reference, public repo klbostee/dumbo) is a thin
Python API over Hadoop Streaming MapReduce: mapper/reducer callables over
(key, value) streams, a small stdlib of reusable reducers/combiners
(sum, stats, top-k, join — dumbo/lib/__init__.py), multi-iteration job
chains (dumbo/core.py Job.additer) and a local unix-pipes test backend.

This package re-expresses those *capabilities* Spark-first:

- datasets are DataFrames with named, typed columns (not opaque k/v pairs)
- grouping/aggregation is Catalyst `groupBy().agg()` (map-side partial
  aggregation replaces dumbo's hand-written combiners automatically)
- joins are `DataFrame.join` (dumbo's JoinReducer secondary-sort merge
  join is what Spark's SortMergeJoinExec does natively)
- the mapper/reducer programming model survives as a compat veneer on
  Arrow-vectorized `mapInPandas` / `applyInPandas` (dumbo_spark.compat)
- beyond the reference: LLM-data-pipeline operators (dedup, similarity
  search, text analysis, multimodal column plumbing) designed for
  100 TB scale.

Layout:
    session.py    — SparkSession builder (AQE, Arrow, UTC)
    sources/      — fixture catalog, readers/writers
    functions/    — column-level helpers (tokenization, exact decimal agg)
    operators/    — relational + extension operators (the dumbo stdlib,
                    re-expressed)
    compat/       — dumbo API veneer: map/reduce, Params, counters,
                    mapredtest-style drivers
    plans/        — plan inspection helpers (explain, shuffle audit)
    streaming/    — Structured Streaming variants of the event-window ops
    registry.py   — named query registry + DuckDB oracle SQL (driver
                    contract)
"""

import os as _os

# Python-UDF closures (compat veneer, multimodal extractors) pickle by
# reference to this package; executor Python workers must be able to
# import it even when the driver process found it via sys.path
# manipulation only. Exporting the package parent on PYTHONPATH before
# the pyspark worker daemon forks covers local mode; cluster deploys
# ship a wheel / --py-files as usual.
_pkg_parent = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_parent not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _pkg_parent + (_os.pathsep + _pp if _pp else "")
    )

from dumbo_spark.session import get_session  # noqa: E402

__all__ = ["get_session"]
__version__ = "0.1.0"
