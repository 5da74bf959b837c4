"""Generate PLANS.md: a physical-plan audit of every registered query.

For each query: exchange count, join strategies, whole-stage-codegen
spans, Python boundary crossings, scan pushdown — the properties that
decide 100 TB behavior (SURVEY §4). Run after operator changes:

    python tools/plan_report.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    from dumbo_spark.plans.explain import physical_summary
    from dumbo_spark.registry import QUERIES
    from dumbo_spark.session import get_session

    spark = get_session("plan_report", cpus=8)
    print("# PLANS — physical-plan audit of every registered query\n")
    print(f"Generated against `{SF_DIR}`. Columns: shuffle exchanges, "
          "broadcast/sort-merge joins, whole-stage-codegen spans, Python "
          "evals (Arrow UDF boundaries), parquet filter pushdown, "
          "TakeOrderedAndProject, CartesianProduct nodes, "
          "BroadcastNestedLoopJoin nodes. The last two are the scale-killer "
          "columns: every non-zero cell must correspond to a "
          "broadcast-scalar-attach pattern (crossJoin against a bounded "
          "1-row aggregate) or it is a bug.\n")
    print("| query | exch | bcast | smj | codegen | py | pushdown | topk | cart | bnlj |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    for name, q in sorted(QUERIES.items()):
        try:
            s = physical_summary(q.fn(spark, SF_DIR))
            print(
                f"| {name} | {s['exchanges']} | {s['broadcast_joins']} | "
                f"{s['sortmerge_joins']} | {s['wholestage_codegen_spans']} | "
                f"{s['python_evals']} | {'✓' if s['pushed_filters'] else '—'} | "
                f"{s['take_ordered']} | {s['cartesian_products']} | "
                f"{s['bnl_joins']} |"
            )
        except Exception as e:  # pragma: no cover
            print(f"| {name} | ERROR: {str(e)[:60]} | | | | | | | | |")
    spark.stop()


if __name__ == "__main__":
    main()
