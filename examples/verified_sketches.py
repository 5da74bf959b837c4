"""Sketch-verification gate on the event/embedding fixtures: every
probabilistic structure the pipeline relies on — HLL distinct counts,
t-digest-style percentiles, stratified sampling, MinHash-LSH dedup
recall, LSH/IVF ANN recall — checked against exact ground truth in one
report frame, the pre-deploy gate a data platform runs before trusting
its sketches at 100 TB (where exact verification is affordable only on
a sampled slice like this one).

Run with the engine CLI:

    python -m dumbo_spark.cli run examples/verified_sketches.py \
        --output /tmp/sketch_report.parquet

Every row is a named check with an `ok` boolean (NULL-hostile: a
check whose boolean column is entirely NULL reads as failed, not
vacuously true). Run as a script, the program exits non-zero if any
check fails; under `cli run` the report frame is written and CI
should gate on the `ok` column (the same booleans the registry's
`_checked` queries hash against their DuckDB oracles each round).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.agg import (
        approx_distinct_checked,
        approx_percentiles_checked,
        hll_rollup_checked,
    )
    from dumbo_spark.operators.dedup import dedup_recall_checked
    from dumbo_spark.operators.sampling import stratified_sample_checked
    from dumbo_spark.operators.similarity import knn_recall_checked
    from dumbo_spark.sources.catalog import load_table

    events = load_table(spark, SF_DIR, "events")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    documents = load_table(spark, SF_DIR, "documents")
    embeddings = load_table(spark, SF_DIR, "embeddings")

    def rows(name: str, df: DataFrame, ok_cols: list[str]) -> DataFrame:
        ok = None
        for c in ok_cols:
            # NULL booleans count as failures, never as vacuous passes
            col = F.coalesce(F.col(c), F.lit(False))
            ok = col if ok is None else (ok & col)
        return df.agg(
            F.lit(name).alias("check"),
            F.count("*").alias("n_rows"),
            F.coalesce(F.min(ok.cast("int")).cast("boolean"), F.lit(False)).alias(
                "ok"
            ),
        )

    report = (
        rows("hll_distinct_within_5pct", approx_distinct_checked(events),
             ["within_5pct"])
        .unionByName(rows("hll_rollup_within_5pct", hll_rollup_checked(events),
                          ["within_5pct"]))
        .unionByName(rows("percentile_rank_bands",
                          approx_percentiles_checked(lineitem),
                          ["p50_in_band", "p90_in_band"]))
        .unionByName(rows("stratified_sample_6sigma",
                          stratified_sample_checked(documents),
                          ["within_bound"]))
        .unionByName(rows("minhash_dedup_recall",
                          dedup_recall_checked(documents), ["recall_ok"]))
        .unionByName(rows("ann_recall_lsh_ivf", knn_recall_checked(embeddings),
                          ["lsh_recall_ok", "ivf_recall_ok"]))
    )
    return report


if __name__ == "__main__":
    import sys

    from dumbo_spark.session import get_session

    spark = get_session("verified_sketches")
    report = main(spark)
    report.show(truncate=False)
    failed = [r["check"] for r in report.collect() if not r["ok"]]
    if failed:
        print(f"sketch verification FAILED: {failed}", file=sys.stderr)
        sys.exit(1)
