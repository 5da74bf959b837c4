"""Co-purchase graph study on the lineitem fixture: degree profile →
triangle census → k-core extraction, one summary frame out — the
exploratory sequence a recommender/market-basket analysis starts with.

Run with the engine CLI:

    python -m dumbo_spark.cli run examples/graph_analysis.py \
        --output /tmp/graph_summary.parquet

All three stages are registered operators; the degree histogram
decides whether degree-ordering matters (power-law vs uniform), the
triangle count measures clustering, and the k-core is the cohesive
subgraph worth mining for association rules.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators import graph
    from dumbo_spark.sources.catalog import load_table

    li = load_table(spark, SF_DIR, "lineitem")

    degrees = graph.degree_histogram(li)
    deg_summary = degrees.agg(
        F.sum(F.col("degree") * F.col("n_nodes")).alias("_deg_mass"),
        F.sum("n_nodes").alias("n_nodes_total"),
        F.max("degree").alias("max_degree"),
    ).select(
        "n_nodes_total",
        "max_degree",
        F.round(F.col("_deg_mass") / F.col("n_nodes_total"), 4).alias("avg_degree"),
    )

    census = graph.copurchase_triangles(li)
    core = graph.kcore_nodes(li, k=3).agg(
        F.count("*").alias("kcore_nodes"),
        F.max("core_degree").alias("kcore_max_degree"),
    )
    return (
        census.crossJoin(F.broadcast(deg_summary))
        .crossJoin(F.broadcast(core))
        .withColumn("k", F.lit(3))
    )
