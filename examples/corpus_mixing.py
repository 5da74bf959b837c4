"""Training-corpus assembly on the documents fixture: uniform
source-mix rebalance → length-weighted exact-n sampling of the
rebalanced pool → quality/fingerprint annotation, one frame out — the
domain-mixing recipe a pretraining data pipeline runs per snapshot.

Run with the engine CLI (writes parquet):

    python -m dumbo_spark.cli run examples/corpus_mixing.py \
        --output /tmp/corpus_sample.parquet

Every stage is a registered operator (source_mix_rebalance,
weighted_sample, quality_score, doc_fingerprint families); this script
composes them the way a corpus-refresh job would, entirely
deterministic — re-running yields the identical sample.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators import sampling, textstats
    from dumbo_spark.sources.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")

    # 1. cap every source at a uniform share (deterministic integer
    #    hash threshold — no RNG, no floats)
    balanced_ids = sampling.source_mix_rebalance(docs)
    balanced = docs.join(balanced_ids.select("doc_id"), "doc_id")

    # 2. length-weighted exact-n sample of the balanced pool
    #    (Efraimidis–Spirakis; longer docs proportionally likelier)
    picked = sampling.weighted_sample(balanced, "n_chars", n=100).select("doc_id")

    # 3. annotate the picks with a vocabulary-diversity quality signal
    #    and the content fingerprint for downstream dedup bookkeeping
    entropy = textstats.token_entropy(docs)
    fp = textstats.doc_fingerprint(docs)
    return (
        picked.join(entropy, "doc_id")
        .join(fp, "doc_id")
        .join(docs.select("doc_id", "source", "lang", "n_chars"), "doc_id")
    )
