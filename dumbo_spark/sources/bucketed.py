"""Bucketed tables — co-located joins without a per-query shuffle.

Dumbo had no storage-level partitioning contract at all: every
reduce-side join re-shuffled both inputs through Hadoop streaming's
sort phase on every run (dumbo/lib/__init__.py JoinReducer; SURVEY
§2.4 "custom partitioner" P12 was the closest primitive, and it only
controlled a single job's shuffle, not the layout on disk).

Spark bucketing IS that contract made durable: ``bucketBy(n, key)``
hash-partitions the table into a fixed number of buckets at WRITE
time and records the layout in the catalog; any later equi-join or
aggregation on the bucket key reads co-located buckets and skips the
Exchange entirely. At 100 TB this converts the nightly fact⋈fact join
from "shuffle 100 TB twice, every night" into "pay one bucketed write
once, then every subsequent join is shuffle-free" — the single
largest recurring-cost lever in a warehouse, and the batch analogue
of Kafka's partition-by-key contract.

Local caveat encoded in the tests: both sides must agree on bucket
count (or be coalescible multiples) and the join key must equal the
bucket key; ``spark.sql.sources.bucketing.enabled`` is on by default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, bucket-sorted parquet table —
    managed when ``path`` is None, external otherwise.

    ``sortBy(key)`` additionally sorts within each bucket file, so
    bucket-key joins plan as a sort-merge with BOTH the exchange and
    (given one bucket file per bucket) the per-task sort already
    satisfied by the layout. (textio.write_bucketed delegates here —
    single implementation of the layout contract.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(buckets, *keys).sortBy(*keys)
    if path is not None:
        w = w.option("path", path).format("parquet")
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two equally-bucketed tables on their bucket key.

    With matching bucket specs the physical plan contains NO shuffle
    exchange on either side (asserted in tests/test_bucketed.py) —
    each task merges bucket i of the left with bucket i of the right.
    """
    return spark.table(left_table).join(spark.table(right_table), key)


def write_range_sorted(
    df: DataFrame, key: str, partitions: int, path: str
) -> None:
    """Terasort-style TOTAL-ORDER export: range-partition on ``key``
    (sampled range boundaries, one shuffle) and sort within each
    partition, so the output files are globally ordered — file i's
    maximum key ≤ file i+1's minimum (asserted in
    tests/test_bucketed.py).

    This is the layout that makes downstream merge-reads, binary-search
    point lookups, and min/max-pruned range scans work: each parquet
    footer's column stats cover a disjoint key range, so a predicate
    ``key BETWEEN a AND b`` prunes to the few files whose range
    intersects — at 100 TB the difference between touching 2 files and
    touching 20 000. Complements ``write_bucketed`` (hash co-location
    for equi-joins) with range co-location for ordered access; dumbo's
    only total-order tool was a single-reducer job (SURVEY §2.4).
    """
    (
        df.repartitionByRange(partitions, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def write_partitioned(df: DataFrame, key: str, path: str) -> None:
    """Hive-style directory partitioning: one subdirectory per value of
    ``key`` (``path/key=value/part-*.parquet``). The third layout
    contract next to hash bucketing (equi-join co-location) and range
    sorting (ordered access): partition-key predicates — INCLUDING ones
    Spark only learns at runtime from a joined dim's surviving keys,
    i.e. DYNAMIC PARTITION PRUNING — skip whole directories before any
    file is opened. At 100 TB, a fact partitioned by day joined to a
    dim filtered to one week reads 7 directories, not 3 650; the
    ``dynamicpruning#`` subquery in the scan's PartitionFilters is
    asserted in tests/test_plans.py."""
    df.write.mode("overwrite").partitionBy(key).parquet(path)
