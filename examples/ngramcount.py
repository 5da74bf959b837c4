"""examples/ngramcount.py — sliding n-gram counting (dumbo's mapper
emitted joined n-grams per line; here a higher-order-function column
expression, fully JVM-side).

Run: python -m dumbo_spark.cli run examples/ngramcount.py
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.textstats import ngram_count
    from dumbo_spark.sources.catalog import load_table

    return ngram_count(
        load_table(spark, "/root/testdata/sf0.001", "documents"), n=2
    ).orderBy(F.desc("cnt")).limit(30)
