"""End-to-end training-corpus pipeline on the documents fixture:
exact dedup → quality + repetition filters → eval-set contamination
screen → token budget accounting.

Run with the engine CLI (writes parquet):

    python -m dumbo_spark.cli run examples/corpus_pipeline.py \
        --output /tmp/corpus_clean.parquet

Every stage is a registered operator with a DuckDB oracle; this script
just composes them the way a data curation job would.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators import dedup, textstats
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")

    # 1. exact dedup: keep one doc per content hash
    keepers = dedup.dedup_exact(docs).select(F.col("keep_id").alias("doc_id"))
    docs = docs.join(keepers, "doc_id", "left_semi")

    # 2. quality screens: repetition + heuristic quality score
    rep = textstats.repetition_score(docs).where(F.col("rep_ratio") <= 0.8)
    docs = docs.join(rep.select("doc_id"), "doc_id", "left_semi")

    # 3. contamination screen vs the held-out eval slice
    cont = textstats.benchmark_contamination(docs).where(
        F.col("contamination") <= 0.5
    )
    docs = docs.join(cont.select("doc_id"), "doc_id", "left_semi")

    # 4. token budget: per-doc BPE-ish counts for the survivors
    counts = textstats.bpe_token_count(docs)
    return docs.select("doc_id", "lang", "source").join(counts, "doc_id")
