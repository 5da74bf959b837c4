"""Physical-plan inspection — the engine's scale-posture instrument.

Dumbo had no plans to inspect (SURVEY §4: no optimizer, fixed physical
strategy, hand-set knobs). The new engine's plans come from Catalyst;
this module makes their load-bearing properties assertable so the
tests can pin them: a dimension join must say BroadcastHashJoin, a
predicate mapper must push its filter into the parquet scan, a narrow
transform chain must not shuffle. These are the properties that decide
whether a query that works at sf0.1 still works at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df: DataFrame) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def physical_summary(df: DataFrame) -> dict:
    """Counts of the plan features that matter at scale."""
    plan = _executed_plan(df)
    formatted = _formatted(df)
    return {
        "exchanges": len(re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "wholestage_codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_evals": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]+\]", formatted)),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        # Scale-killer joins: an O(n*m) plan node anywhere is the one
        # class this audit exists to rule out. CartesianProduct is the
        # non-broadcast cross join; BroadcastNestedLoopJoin is Spark's
        # fallback for non-equi joins (fine when the broadcast side is a
        # bounded aggregate, catastrophic when it is data-proportional),
        # so both are surfaced and every non-zero row must justify itself.
        "cartesian_products": plan.count("CartesianProduct"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
        "plan": plan,
    }
