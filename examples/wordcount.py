"""examples/wordcount.py — THE canonical dumbo program, engine-native.

dumbo original (examples/wordcount.py):

    def mapper(key, value):
        for word in value.split():
            yield word, 1
    if __name__ == "__main__":
        import dumbo
        dumbo.run(mapper, dumbo.lib.sumreducer, combiner=dumbo.lib.sumreducer)

Run: python -m dumbo_spark.cli run examples/wordcount.py --output /tmp/wc.parquet
"""

from pyspark.sql import DataFrame, SparkSession, functions as F


def main(spark: SparkSession) -> DataFrame:
    from dumbo_spark.operators.textstats import wordcount
    from dumbo_spark.sources.catalog import load_table

    return wordcount(load_table(spark, "/root/testdata/sf0.001", "documents")).orderBy(
        F.desc("cnt")
    )
