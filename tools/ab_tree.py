"""Cross-tree interleaved A/B for single queries (VERDICT r15 Next #1).

Adjudicates a suspected per-query regression by timing the SAME query
against two source trees (e.g. this repo vs a worktree pinned at the
r14 commit) in strictly alternating fresh processes — interleaving is
what cancels machine-window drift, the dominant noise source on this
host (same-code driver runs differ per-query by up to 5.4x).

    python tools/ab_tree.py <old_tree> <query> [rounds=5]

Each round runs old then new, one fresh process each; a process builds
the standard session (SPARK_GRAFT_CPUS), warms the JVM, and times the
query median-of-3 with the noop sink, clearing caches and persistent
RDDs between runs (true per-run cold cost — the adjudication
discipline, not the sweep's). Prints a per-round table plus medians
and a verdict.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, statistics, sys, time
tree = sys.argv[1]; name = sys.argv[2]
sys.path.insert(0, tree)
from dumbo_spark.registry import QUERIES
from dumbo_spark.session import get_session, release_persistent_rdds
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_session("ab_tree", cpus=cpus)
spark.range(1_000_000).selectExpr("sum(id)").collect()
samples = []
for _ in range(3):
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    samples.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
    release_persistent_rdds(spark)
print(json.dumps({"median": statistics.median(samples), "runs": samples}))
"""


def run_one(tree: str, name: str) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    out = subprocess.run(
        [sys.executable, "-c", _CHILD, tree, name],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    old_tree = sys.argv[1]
    name = sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    new_tree = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    olds, news = [], []
    print(f"query={name} old={old_tree} new={new_tree} rounds={rounds}")
    print(f"loadavg at start: {os.getloadavg()}")
    for r in range(rounds):
        o = run_one(old_tree, name)
        n = run_one(new_tree, name)
        olds.append(o["median"])
        news.append(n["median"])
        print(
            f"round {r}: old={o['median']} {o['runs']}  "
            f"new={n['median']} {n['runs']}"
        )
    mo, mn = statistics.median(olds), statistics.median(news)
    print(f"medians: old={mo} new={mn} ratio_new/old={mn / mo:.3f}")
    print(
        "verdict: "
        + (
            "new SLOWER (revert candidate)"
            if mn > 1.15 * mo
            else "new not slower"
        )
    )


if __name__ == "__main__":
    main()
