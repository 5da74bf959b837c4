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

# ── BNLJ allowlist ──────────────────────────────────────────────────────
# CartesianProduct is NEVER allowed (cart column must be all-zero; the
# run exits non-zero otherwise). BroadcastNestedLoopJoin is allowed ONLY
# for the names below, each carrying its boundedness class — a BNLJ is
# O(n·m) and only survives 100 TB when one side is bounded by
# construction. A name appearing with bnlj>0 that is NOT listed here
# fails the run (and tests/test_plan_audit.py re-checks the committed
# PLANS.md without Spark).
_SCALAR = (
    "scalar-attach: crossJoin(broadcast(<=k-row aggregate)) rides a "
    "corpus pass; the broadcast side is a constant-size total/threshold "
    "frame"
)
_SAMPLE = (
    "bounded-sample audit: the broadcast side is a fixed-size query "
    "panel / codebook / recall sample (n_queries, 2048-row training "
    "sample), so the loop is k x n by construction"
)
_GRID = (
    "bounded-grid densify/theta: nested loop against a broadcast "
    "calendar/category/k-curve grid whose size is schema-bounded, not "
    "data-proportional"
)
_ROLLUP = (
    "bounded-rollup theta-join: the nested loop runs over a calendar- "
    "or group-bounded aggregate (daily/weekly rollup), never raw rows"
)
BNLJ_JUSTIFIED = {
    # bounded-sample audits (ANN probes, recall/fidelity panels)
    # (r15 optimization: dedup_recall_checked and simhash_recall_checked
    # left this list — folding their count-scalar ⨯ hit-join crossJoins
    # into one left-join aggregate removed their BNLJ nodes entirely)
    **{n: _SAMPLE for n in (
        "centroid_affinity", "cms_hitters_checked",
        "consistent_entity_sample", "contrastive_pairs",
        "ivfpq_recall_checked",
        "knn_classifier_eval", "knn_cosine", "knn_cosine_ivf",
        "knn_cosine_pq", "knn_euclid", "knn_recall_checked",
        "matryoshka_fidelity", "pca_top_component", "pq_recall_checked",
    )},
    # bounded grids (densification / coverage curves)
    **{n: _GRID for n in (
        "event_mix_weekly_drift", "ngram_coverage_curve",
    )},
    # calendar/group rollup theta-joins
    **{n: _ROLLUP for n in (
        "theil_sen_trend", "daily_autocorrelation", "order_cadence",
    )},
    # scalar attaches (broadcast 1-row totals/quantile thresholds)
    **{n: _SCALAR for n in (
        "basket_rules", "benford_screen", "bigram_pmi", "bm25_topk",
        "bpe_compression_stats", "chi2_lang_source",
        "churn_risk_buckets", "copurchase_triangles",
        "corpus_source_concentration", "customer_rfm", "cusum_drift",
        "decile_lift_table", "dedup_report",
        "distinctive_tokens_by_lang", "doc_perplexity",
        "dow_hour_heatmap", "dsir_importance_weights",
        "dsir_topk_selection", "heavy_hitter_tokens",
        "idle_rich_customers", "interleaved_mix_head",
        "kn_continuation_counts", "lang_source_contingency",
        "rank_fusion_rrf", "recency_weighted_value",
        "revenue_share_parts", "session_depth_histogram",
        "source_divergence_matrix", "source_mix_rebalance",
        "source_quality_matrix", "source_temperature_mix",
        "stupid_backoff_scores", "tfidf_top_terms", "token_doc_freq",
        "token_source_mi", "top_percent_customers",
        "training_mix_epochs", "user_active_days_histogram",
    )},
}


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
          "columns: cart must be all-zero, and every bnlj>0 name must "
          "appear in tools/plan_report.py's BNLJ_JUSTIFIED allowlist with "
          "its boundedness class (scalar-attach / bounded-sample audit / "
          "bounded grid / bounded rollup) — the generator exits non-zero "
          "otherwise, and tests/test_plan_audit.py re-checks this file "
          "against the allowlist without Spark.\n")
    print("| query | exch | bcast | smj | codegen | py | pushdown | topk | cart | bnlj |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    violations = []
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
            if s["cartesian_products"] > 0:
                violations.append(f"{name}: CartesianProduct in plan")
            if s["bnl_joins"] > 0 and name not in BNLJ_JUSTIFIED:
                violations.append(f"{name}: unjustified BroadcastNestedLoopJoin")
        except Exception as e:  # pragma: no cover
            print(f"| {name} | ERROR: {str(e)[:60]} | | | | | | | | |")
    spark.stop()
    if violations:  # the report is also a gate (stderr + exit code)
        for v in violations:
            print(f"VIOLATION {v}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
