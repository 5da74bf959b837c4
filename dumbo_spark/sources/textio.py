"""Text-family sources/sinks — dumbo's storage formats, re-expressed.

Reference surface (SURVEY §1.3):

- plain text in/out (dumbo/util.py:~230 ``loadtext``/``dumptext``;
  ``-inputformat text``): input key = byte offset (discarded by
  convention), value = line; output ``key\\tvalue`` lines →
  :func:`read_text` / :func:`write_tsv`
- "code" format (dumbo/util.py:~200 ``loadcode``/``dumpcode``):
  ``repr(key)\\trepr(value)`` lines decoded eval-style. Self-describing
  text with arbitrary nesting — re-expressed as JSON Lines
  (:func:`read_jsonl` / :func:`write_jsonl`): same role, safe instead
  of repr/eval, schema-inferable, splittable.
- typedbytes sequence files (streaming.py:~120): the binary native
  format → parquet (:func:`read_parquet` / :func:`write_parquet`),
  the columnar upgrade (predicate pushdown + column pruning + stats).
- ``-compressoutput`` (streaming.py:~160) → ``compression`` option,
  snappy default on parquet, gzip available on text formats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_text(spark: SparkSession, path: str, with_offsets: bool = False) -> DataFrame:
    """Lines of text. With ``with_offsets`` the dumbo mapper contract is
    reproduced exactly: (offset: long, line: string) — offset synthesis
    needs a per-partition scan, so the default skips it."""
    df = spark.read.text(path)
    if not with_offsets:
        return df.select(F.col("value").alias("line"))
    # per-file running byte offset (newline included), dumbo's key
    from pyspark.sql import Window

    w = Window.partitionBy(F.input_file_name()).orderBy(F.monotonically_increasing_id())
    byte_len = F.octet_length("value") + F.lit(1)
    offset = F.coalesce(
        F.sum(byte_len).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return df.select(offset.alias("offset"), F.col("value").alias("line"))


def write_tsv(df: DataFrame, path: str, compression: str | None = None) -> None:
    """dumptext: tab-separated ``key\\tvalue...`` lines."""
    writer = df.write.mode("overwrite").option("sep", "\t").option("header", "false")
    if compression:
        writer = writer.option("compression", compression)
    writer.csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    """JSON Lines — the safe successor of dumbo's repr/eval "code"
    format: self-describing, nested, splittable. Pass a schema in
    production (inference = an extra pass over the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, compression: str | None = None) -> None:
    writer = df.write.mode("overwrite")
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """The engine's native format (typedbytes-seqfile successor)."""
    return spark.read.parquet(path)


def write_parquet(df: DataFrame, path: str, compression: str = "snappy") -> None:
    df.write.mode("overwrite").option("compression", compression).parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC reader — the other mainstream columnar format (Hive-era
    warehouses are full of it; a migration FROM a Hadoop stack, this
    engine's whole premise, reads ORC before it writes parquet). Spark
    ships the codec natively; predicate pushdown and column pruning
    work exactly as for parquet."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, compression: str = "snappy") -> None:
    """ORC writer (overwrite), for pipelines whose downstream is a
    Hive/Trino warehouse standardized on ORC."""
    df.write.mode("overwrite").option("compression", compression).orc(path)


def read_parquet_evolving(spark: SparkSession, *paths: str) -> DataFrame:
    """Read parquet across SCHEMA-EVOLVED snapshots: columns added over
    time union into one schema, old files surface the new columns as
    NULL (``mergeSchema`` — off by default in Spark because footer
    merging costs a pass over file metadata, which is exactly the
    price a 100 TB ingest with drifting producers has to pay once at
    read-planning time rather than re-writing history).

    Only ADDITIVE evolution is supported (Spark raises on incompatible
    type changes for the same column name) — the contract a
    append-only data lake keeps anyway.
    """
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], compression: str = "snappy"
) -> None:
    """Hive-style partitioned parquet layout (dumbo had only flat
    output dirs). At scale this is what makes partition pruning work:
    a reader filtering on a partition column never opens the other
    directories."""
    (
        df.write.mode("overwrite")
        .option("compression", compression)
        .partitionBy(*partition_by)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame, table: str, bucket_by: list[str], n_buckets: int = 32
) -> None:
    """Bucketed managed table: pre-shuffled on the bucket columns so
    subsequent joins/aggregations on them are exchange-free — the
    declarative successor of dumbo's -partitioner
    KeyFieldBasedPartitioner (dumbo/backends/streaming.py:~145).
    Thin alias of sources/bucketed.py::write_bucketed (the canonical
    layout module, which adds external paths + colocated_join)."""
    from dumbo_spark.sources import bucketed

    bucketed.write_bucketed(df, table, bucket_by, n_buckets)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 128,
    sort_within_by: list[str] | None = None,
    zorder_by: tuple[str, str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    ~``target_file_mb`` each. Returns the output file count.

    The operational half of a 100 TB ingest no query operator covers:
    streaming sinks and fine-grained partitioned writes accumulate
    thousands of KB-sized files, and every subsequent scan then pays
    per-file open/footer/metadata cost that dwarfs the read itself.
    Compaction is the standard fix (Delta/Iceberg OPTIMIZE, Hive
    concatenate) — here as a plain-parquet rewrite.

    The partition count comes from the dataset's actual on-disk bytes
    (Hadoop FS ContentSummary — works for any filesystem Spark can
    reach, no driver-side listing of file contents), so output file
    size tracks the target regardless of input fragmentation.
    ``sort_within_by`` optionally sorts within output files to tighten
    parquet min/max column statistics (better row-group pruning for
    readers filtering on those columns); it's sortWithinPartitions, so
    no global shuffle is added.

    ``zorder_by=(c1, c2)`` instead clusters files along the Morton
    curve of TWO columns (functions/zorder.py — the OPTIMIZE ZORDER
    idea): rows are range-partitioned AND sorted by the interleaved
    z-value, so every output file carries a tight min/max range on
    BOTH columns and predicates on either one prune files. This adds
    one range shuffle — the price of re-clustering, paid once at
    write time.
    """
    # Guard: write.mode("overwrite") deletes dst before the lazily
    # planned read of src runs, so dst == src (or dst inside src) would
    # destroy the input dataset. Compare normalized absolute forms.
    def _norm(p: str) -> str:
        import os.path
        import posixpath

        if "://" in p:
            scheme, _, rest = p.partition("://")
            return f"{scheme}://{posixpath.normpath(rest)}"
        return os.path.abspath(p)

    nsrc, ndst = _norm(src), _norm(dst)
    if ndst == nsrc or ndst.startswith(nsrc + "/") or nsrc.startswith(ndst + "/"):
        raise ValueError(
            f"compact_parquet: dst ({dst!r}) must not equal or nest with "
            f"src ({src!r}) — overwrite would delete the input before it "
            "is read; stage through a separate directory and rename"
        )
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(jsc.hadoopConfiguration())
    total_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, -(-total_bytes // (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src)
    if zorder_by is not None:
        from pyspark.sql import functions as F

        from dumbo_spark.functions.zorder import with_zvalue

        c1, c2 = zorder_by
        df = (
            with_zvalue(df, c1, c2)
            .repartitionByRange(n_files, F.col("_z"))
            .sortWithinPartitions("_z")
            .drop("_z")
        )
    else:
        df = df.repartition(n_files)
        if sort_within_by:
            df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dst)
    return len([f for f in spark.read.parquet(dst).inputFiles()])


def read_csv(spark: SparkSession, path: str, schema: str | None = None, sep: str = ",") -> DataFrame:
    reader = spark.read.option("sep", sep).option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)
