"""examples/excludewords.py — predicate mapper (drop stop-words before
counting), the declarative way: the filter is a pushed-down column
predicate, not per-record Python.

Run: python -m dumbo_spark.cli run examples/excludewords.py
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.functions.text import tokens
    from dumbo_spark.sources.catalog import load_table

    stop = ["the", "and", "a", "of"]
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("word"))
        .where(~F.col("word").isin(stop))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"))
    )
