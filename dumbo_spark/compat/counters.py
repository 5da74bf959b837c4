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
