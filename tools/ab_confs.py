"""Session-conf A/B harness (optimization rounds): run a representative
query subset under conf overrides supplied as KEY=VALUE args, print the
per-query medians and total. Fresh JVM per invocation — run once per
variant and compare totals.

    python tools/ab_confs.py                              # baseline
    python tools/ab_confs.py spark.sql.join.preferSortMergeJoin=false
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUBSET = [
    "wordcount", "ngram_count", "group_sum", "group_stats", "join_inner",
    "pricing_summary", "top_revenue_nations", "product_profit",
    "events_sessionized", "moving_avg", "dedup_fuzzy", "knn_cosine",
    "weighted_median_price", "theil_sen_trend", "dedup_jaccard",
    "posting_lists", "basket_rules", "item_similarity",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    runs = int(os.environ.get("BENCH_RUNS", "3"))
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    overrides = dict(a.split("=", 1) for a in sys.argv[1:])

    from pyspark.sql import SparkSession

    from dumbo_spark import session as sess

    orig_get = sess.get_session

    def patched(app_name: str = "dumbo_spark", cpus_: int | None = None):
        spark = orig_get(app_name, cpus_ or cpus)
        return spark

    # apply overrides at builder time by monkey-adding to RUNTIME? simplest:
    # build the session ourselves with the overrides, then reuse.
    builder = SparkSession.builder
    spark = orig_get("ab_confs", cpus=cpus)
    can_set = True
    for k, v in overrides.items():
        try:
            spark.conf.set(k, v)
        except Exception as exc:
            print(f"static conf {k} needs restart: {exc}", file=sys.stderr)
            can_set = False
    if not can_set:
        sys.exit(2)

    from dumbo_spark.registry import QUERIES
    from dumbo_spark.session import release_persistent_rdds

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    timings = {}
    for name in SUBSET:
        q = QUERIES[name]
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        spark.catalog.clearCache()
        release_persistent_rdds(spark)
    for n, s in timings.items():
        print(f"{n:28s} {s:7.3f}")
    print(f"TOTAL {sum(timings.values()):.3f}  overrides={overrides}")
    spark.stop()


if __name__ == "__main__":
    main()
