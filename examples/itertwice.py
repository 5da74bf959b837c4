"""examples/itertwice.py — two chained MapReduce iterations
(dumbo Job.additer twice: count words, then count words-per-frequency).

Engine-native: the two "jobs" are one Catalyst plan; dumbo's temp
paths between iterations do not exist.

Run: python -m dumbo_spark.cli run examples/itertwice.py
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.textstats import wordcount
    from dumbo_spark.sources.catalog import load_table

    counts = wordcount(load_table(spark, "/root/testdata/sf0.001", "documents"))
    return counts.groupBy("cnt").agg(F.count("*").alias("n_words")).orderBy("cnt")
