"""examples/join.py — reduce-side join (dumbo's JoinReducer +
PrimaryMapper/SecondaryMapper + MultiMapper wiring), both ways.

dumbo original joins hostnames (primary) against log counts
(secondary). The engine-native form is one DataFrame.join line; the
veneer form shows the migrated imperative shape.

Run: python -m dumbo_spark.cli run examples/join.py
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.joins import join_inner
    from dumbo_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    return join_inner(
        load_table(spark, sf, "orders"), load_table(spark, sf, "customer")
    ).orderBy(F.desc("o_totalprice")).limit(20)
