"""Benchmark harness (driver contract, SURVEY §7 M7).

Runs every registered query at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Execution is measured with the noop sink (full plan runs, nothing
lands on the driver) after a warm-up action so JVM/codegen startup is
not billed to the first query. BENCH_RUNS>1 takes the median.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    # median-of-3 by default: the first execution of a plan pays 1-3s of
    # whole-stage-codegen compilation that steady-state runs never see
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from dumbo_spark.registry import QUERIES
    from dumbo_spark.session import get_session

    spark = get_session("dumbo_spark_bench", cpus=cpus)
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm up JVM

    timings: dict[str, float] = {}
    for name, q in sorted(QUERIES.items()):
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 4)
        # operators may persist() shared subplans (LSH bands, IVF cells);
        # drop them so queries are timed in isolation and executor memory
        # stays flat across the 60+ query sweep
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": f"total wall-clock, {len(timings)} queries, sf{sf}",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
