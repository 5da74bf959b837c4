from dumbo_spark.compat.counters import Counters
from dumbo_spark.compat.job import Job, Program
from dumbo_spark.compat.mapred import (
    Params,
    join_reduce,
    map_only,
    map_open,
    map_reduce,
)
from dumbo_spark.compat.mapredtest import MapDriver, MapReduceDriver, ReduceDriver
from dumbo_spark.compat.run import run

__all__ = [
    "Counters",
    "Job",
    "Program",
    "Params",
    "join_reduce",
    "map_only",
    "map_open",
    "map_reduce",
    "MapDriver",
    "ReduceDriver",
    "MapReduceDriver",
    "run",
]
