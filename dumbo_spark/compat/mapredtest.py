"""Golden-I/O unit-test drivers (dumbo/mapredtest.py ``MapDriver`` :~20,
``ReduceDriver`` :~50, ``MapReduceDriver`` :~80).

Same fluent surface as the reference —
``MapDriver(mapper).with_input(pairs).with_output(pairs).run()`` —
executed through the real compat veneer on a real SparkSession, so a
passing golden test exercises the same Arrow path production uses.
Comparison is order-insensitive across keys (shuffle order is
unspecified — here and in dumbo)."""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

from pyspark.sql import SparkSession

from dumbo_spark.compat.mapred import MapFn, RedFn, map_only, map_reduce


def _sorted_pairs(pairs: Iterable[tuple[Any, Any]]) -> list[tuple[Any, Any]]:
    return sorted((repr(k), repr(v)) for k, v in pairs)


class _DriverBase:
    def __init__(self, spark: SparkSession):
        self._spark = spark
        self._input: list[tuple[Any, Any]] = []
        self._expected: list[tuple[Any, Any]] | None = None

    def with_input(self, pairs: Iterable[tuple[Any, Any]]):
        self._input = list(pairs)
        return self

    def with_output(self, pairs: Iterable[tuple[Any, Any]]):
        self._expected = list(pairs)
        return self

    def _check(self, got: list[tuple[Any, Any]]) -> list[tuple[Any, Any]]:
        if self._expected is not None:
            assert _sorted_pairs(got) == _sorted_pairs(self._expected), (
                f"golden mismatch:\n got      {sorted(got)}\n expected {sorted(self._expected)}"
            )
        return got


class MapDriver(_DriverBase):
    def __init__(self, spark: SparkSession, mapper: MapFn, output_schema: str = "key string, value double"):
        super().__init__(spark)
        self._mapper = mapper
        self._schema = output_schema

    def run(self) -> list[tuple[Any, Any]]:
        df = self._spark.createDataFrame(self._input, "key string, value string")
        got = [(r.key, r.value) for r in map_only(df, self._mapper, self._schema).collect()]
        return self._check(got)


class ReduceDriver(_DriverBase):
    def __init__(self, spark: SparkSession, reducer: RedFn, output_schema: str = "key string, value double"):
        super().__init__(spark)
        self._reducer = reducer
        self._schema = output_schema

    def run(self) -> list[tuple[Any, Any]]:
        df = self._spark.createDataFrame(self._input, "key string, value double")
        got = [
            (r.key, r.value)
            for r in map_reduce(
                df, lambda k, v: [(k, v)], self._reducer, output_schema=self._schema
            ).collect()
        ]
        return self._check(got)


class MapReduceDriver(_DriverBase):
    def __init__(
        self,
        spark: SparkSession,
        mapper: MapFn,
        reducer: RedFn,
        combiner: RedFn | None = None,
        output_schema: str = "key string, value double",
    ):
        super().__init__(spark)
        self._mapper = mapper
        self._reducer = reducer
        self._combiner = combiner
        self._schema = output_schema

    def run(self) -> list[tuple[Any, Any]]:
        df = self._spark.createDataFrame(self._input, "key string, value string")
        got = [
            (r.key, r.value)
            for r in map_reduce(
                df,
                self._mapper,
                self._reducer,
                combiner=self._combiner,
                output_schema=self._schema,
            ).collect()
        ]
        return self._check(got)
