"""SparkSession construction tuned for this engine.

Dumbo's equivalent is backend selection (dumbo/backends/__init__.py
``get_backend``: -hadoop => StreamingBackend else UnixBackend). Here a
single builder covers local test mode and cluster mode; scale posture
comes from AQE + Arrow + sane shuffle-partition defaults rather than
hand-set reducer counts (dumbo's -numreducetasks).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime SQL confs every query assumes. Applied both at session build
# time and defensively per-catalog-load (the driver harness hands us a
# session we didn't build).
RUNTIME_CONFS = {
    # events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
    # parquet reader rejects; read as long and convert explicitly
    # (sources/catalog.py).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # deterministic calendar math, matches DuckDB's naive timestamps
    "spark.sql.session.timeZone": "UTC",
}


def get_session(app_name: str = "dumbo_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession.

    local[...] for tests/bench; on a real cluster the master comes from
    spark-submit and this builder only contributes confs. All confs here
    are scale-posture, not correctness: AQE re-plans skewed shuffles at
    runtime, Arrow makes the Python boundary columnar, shuffle
    partitions sized for the local core count instead of the 200
    default.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def ensure_runtime_confs(spark: SparkSession) -> None:
    """Apply runtime-settable confs to a session we didn't build."""
    for k, v in RUNTIME_CONFS.items():
        spark.conf.set(k, v)
