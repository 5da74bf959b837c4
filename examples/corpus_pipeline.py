"""End-to-end training-corpus pipeline on the documents fixture:
exact dedup → quality (repetition + entropy) filters → eval-set
contamination screen → token budget accounting; plus a deterministic
exact-n eval-subset carve.

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

    # 2. quality screens: repetition + vocabulary-diversity entropy
    rep = textstats.repetition_score(docs).where(F.col("rep_ratio") <= 0.8)
    docs = docs.join(rep.select("doc_id"), "doc_id", "left_semi")
    ent = textstats.token_entropy(docs).where(F.col("entropy_bits") >= 1.0)
    docs = docs.join(ent.select("doc_id"), "doc_id", "left_semi")

    # 3. contamination screen vs the held-out eval slice
    cont = textstats.benchmark_contamination(docs).where(
        F.col("contamination") <= 0.5
    )
    docs = docs.join(cont.select("doc_id"), "doc_id", "left_semi")

    # 4. token budget: per-doc BPE-ish counts for the survivors
    counts = textstats.bpe_token_count(docs)
    return docs.select("doc_id", "lang", "source").join(counts, "doc_id")


def eval_subset(spark: SparkSession, n: int = 300) -> DataFrame:
    """Companion job: carve a deterministic exact-n eval subset from
    the cleaned corpus (sampling.sample_exact_n — reproducible across
    runs/engines, no global sort)."""
    from dumbo_spark.operators import sampling

    return sampling.sample_exact_n(main(spark), "doc_id", n=n)
