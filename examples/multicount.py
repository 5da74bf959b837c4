"""examples/multicount.py — several keyed metrics in one pass
(dumbo's mapper emitted ('tag:key', 1) pairs; here a generated
explode-tag feeds a single hash aggregate — still one shuffle).

Run: python -m dumbo_spark.cli run examples/multicount.py
"""

from pyspark.sql import DataFrame, SparkSession


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.agg import tagged_multicount
    from dumbo_spark.sources.catalog import load_table

    return tagged_multicount(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    ).orderBy("tag")
