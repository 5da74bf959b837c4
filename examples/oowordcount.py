"""examples/oowordcount.py — class-style wordcount with params and
counters, through the compat veneer.

dumbo original: a Mapper(MapRedBase) class using self.params['excludes']
and self.counters['excluded words'] (examples/oowordcount.py).
Here: Params travel in the closure, counters are accumulators.

Run: python -m dumbo_spark.cli run examples/oowordcount.py
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.compat import Counters, Params, map_reduce
    from dumbo_spark.sources.catalog import load_table

    params = Params(excludes={"the", "and", "a"})
    counters = Counters(spark)
    excluded = counters["excluded words"]

    def mapper(key, text):
        if text:
            for word in text.lower().split():
                if word in params.excludes:
                    excluded.add(1)
                else:
                    yield word, 1.0

    def sumreducer(key, values):
        yield key, float(sum(values))

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )
    return map_reduce(
        docs, mapper, sumreducer, combiner=sumreducer,
        output_schema="word string, cnt double",
    )
