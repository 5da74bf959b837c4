from dumbo_spark.compat.counters import Counters
from dumbo_spark.compat.mapred import Params, map_only, map_reduce
from dumbo_spark.compat.mapredtest import MapDriver, MapReduceDriver, ReduceDriver

__all__ = [
    "Counters",
    "Params",
    "map_only",
    "map_reduce",
    "MapDriver",
    "ReduceDriver",
    "MapReduceDriver",
]
