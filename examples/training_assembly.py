"""Training-sequence assembly on the documents fixture: rebalance the
source mix → cut each source to a token budget → pack the survivors
into fixed-size training sequences — the final stage of a corpus
pipeline, after cleaning/dedup (examples/corpus_pipeline.py) has run.

Companion diagnostics: the heavy-hitter vocabulary (stopword
discovery) over the packed corpus, and the per-pack census that a
training-data loader would consume as its shard manifest.

Run with the engine CLI (writes parquet):

    python -m dumbo_spark.cli run examples/training_assembly.py \
        --output /tmp/packs.parquet

Every stage is a registered operator with a DuckDB oracle; this script
composes them the way a pre-training data job would.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators import packing, sampling
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")

    # 1. uniform source mix (deterministic hash downsampling)
    mix = sampling.source_mix_rebalance(docs)
    docs = docs.join(mix.select("doc_id"), "doc_id", "left_semi")

    # 2. exact per-source token budget (two-phase prefix sum —
    #    no task ever orders a whole source)
    kept = packing.token_budget_sample(docs, budget=600, buckets=8)
    docs = docs.join(kept.select("doc_id"), "doc_id", "left_semi")

    # 3. pack into 256-token training sequences; the result is the
    #    shard manifest: (source, bucket, pack) -> docs, tokens
    return packing.sequence_packing(docs, budget=256, buckets=8)


def stopword_candidates(spark: SparkSession) -> DataFrame:
    """Companion diagnostic: tokens above 1/500 of all corpus tokens
    (textstats.heavy_hitter_tokens) — the exact-count stopword list a
    tokenizer build would start from."""
    from dumbo_spark.operators import textstats
    from dumbo_spark.sources.catalog import load_table

    return textstats.heavy_hitter_tokens(load_table(spark, SF_DIR, "documents"))
