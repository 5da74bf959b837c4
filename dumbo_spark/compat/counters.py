"""Counters / status reporting (dumbo/backends/common.py:~60
``Counter``, ~80 ``MapRedBase``).

Dumbo counters emit ``reporter:counter:group,name,n`` lines on stderr
for Hadoop to collect; the Spark-native mechanism is accumulators.
Same contract: monotonic adds from tasks, readable on the driver after
an action.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


class Counters:
    """Lazy named accumulators: ``counters['parsed'].add(1)`` inside a
    mapInPandas/applyInPandas function; read ``counters.value('parsed')``
    on the driver after the action completes."""

    def __init__(self, spark: SparkSession, group: str = "dumbo"):
        self._sc = spark.sparkContext
        self._group = group
        self._accs: dict[str, object] = {}

    def __getitem__(self, name: str):
        if name not in self._accs:
            self._accs[name] = self._sc.accumulator(0)
        return self._accs[name]

    def value(self, name: str) -> int:
        return self._accs[name].value if name in self._accs else 0

    def as_dict(self) -> dict[str, int]:
        return {k: a.value for k, a in self._accs.items()}


def observed(df, name: str, *exprs):
    """Spark-native counters: attach aggregate metrics to a DataFrame
    with ``df.observe`` — computed DURING the next action on the same
    pass over the data (zero extra scans, no Python boundary, works
    under Structured Streaming), where accumulator counters need task
    code and dumbo's needed stderr parsing.

    Returns ``(df, observation)``; read ``observation.get`` (dict of
    alias → value) after any action on the returned frame.

        df, obs = observed(df, "quality",
                           F.count("*").alias("rows"),
                           F.sum(F.col("price").isNull().cast("long"))
                            .alias("null_prices"))
        df.write.parquet(...)   # metrics ride this action
        obs.get                 # {'rows': ..., 'null_prices': ...}

    This is the engine-recommended form of dumbo's per-job counters
    for data-quality totals: exact, once per action, and visible in
    the Spark UI / QueryExecutionListener stream for ops tooling.
    """
    from pyspark.sql import Observation

    observation = Observation(name)
    return df.observe(observation, *exprs), observation
