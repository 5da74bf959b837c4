"""Registry-wide scale-killer audit over the committed PLANS.md
(VERDICT r14 Next #1, second half): the counters exist and are proven
to fire (tests/test_plans.py::test_physical_summary_detects_cartesian_
and_bnlj); this module pins the REGISTRY-WIDE invariant on the
artifact the judge reads — zero CartesianProduct anywhere, and every
BroadcastNestedLoopJoin justified by a boundedness class in
tools/plan_report.py's BNLJ_JUSTIFIED allowlist. No Spark needed: the
committed PLANS.md is regenerated every round by the same tool that
enforces the gate at generation time (exit 1 on violation)."""

import os
import re

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _plans_rows():
    rows = {}
    with open(os.path.join(_REPO, "PLANS.md")) as f:
        for line in f:
            if not line.startswith("|") or line.startswith("|---"):
                continue
            parts = [p.strip() for p in line.strip().strip("|").split("|")]
            if parts[0] == "query" or len(parts) < 10:
                continue
            rows[parts[0]] = parts
    return rows


def test_plans_md_has_the_scale_killer_columns_for_every_query():
    rows = _plans_rows()
    assert len(rows) >= 300, "PLANS.md must cover the whole registry"
    assert not any("ERROR" in r[1] for r in rows.values())
    # every row carries numeric cart/bnlj cells (the columns exist)
    for name, r in rows.items():
        assert re.fullmatch(r"\d+", r[8]), (name, r[8])
        assert re.fullmatch(r"\d+", r[9]), (name, r[9])


def test_no_cartesian_products_registry_wide():
    rows = _plans_rows()
    offenders = [n for n, r in rows.items() if r[8] != "0"]
    assert offenders == [], f"CartesianProduct in plans: {offenders}"


def test_every_bnlj_is_allowlisted_with_a_boundedness_class():
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from plan_report import BNLJ_JUSTIFIED

    rows = _plans_rows()
    positive = {n for n, r in rows.items() if r[9] != "0"}
    unjustified = sorted(positive - set(BNLJ_JUSTIFIED))
    assert unjustified == [], (
        f"BNLJ without a boundedness justification: {unjustified}"
    )
    # reverse check: the allowlist must not accumulate stale names that
    # no longer plan a BNLJ (same discipline as the collect allowlist
    # in test_invariants)
    stale = sorted(set(BNLJ_JUSTIFIED) - positive)
    assert stale == [], f"allowlist entries with no BNLJ in PLANS.md: {stale}"
    # every justification is a non-empty class string
    assert all(isinstance(v, str) and v for v in BNLJ_JUSTIFIED.values())


def test_every_unpartitioned_window_site_is_allowlisted_with_a_bound():
    # VERDICT r15 Next #8: a Window.orderBy without partitionBy is a
    # single-task window — allowed ONLY when its input is bounded by
    # construction, and the bound must be NAMED in the WINDOW_BOUNDED
    # allowlist keyed by source site. The AST scan runs here directly
    # (no Spark, no PLANS.md staleness window): an unlisted site fails
    # this test the moment it is committed.
    import sys

    sys.path.insert(0, os.path.join(_REPO, "tools"))
    from plan_report import WINDOW_BOUNDED, scan_window_sites, \
        window_site_violations

    sites = scan_window_sites()
    assert sites, "scanner found no sites — scan is broken"
    assert window_site_violations(sites) == []
    # reverse check: no stale allowlist entries for removed sites
    live = {key for key, _loc in sites}
    stale = sorted(set(WINDOW_BOUNDED) - live)
    assert stale == [], f"allowlist entries with no live site: {stale}"
    # every bound is a non-empty rationale string
    assert all(isinstance(v, str) and v for v in WINDOW_BOUNDED.values())


def test_plans_md_has_the_uwin_column():
    # the per-query unpartitioned-window count is part of the committed
    # audit surface: every row must carry a numeric uwin cell
    rows = _plans_rows()
    for name, r in rows.items():
        assert len(r) >= 11 and re.fullmatch(r"\d+", r[10]), (name, r)


def test_registry_and_plans_md_cover_the_same_names():
    # PLANS.md is only a trustworthy audit surface if it is not stale:
    # its row set must equal the live registry exactly
    from dumbo_spark.registry import QUERIES

    rows = _plans_rows()
    assert set(rows) == set(QUERIES), (
        f"PLANS.md drift: missing={sorted(set(QUERIES)-set(rows))[:5]} "
        f"extra={sorted(set(rows)-set(QUERIES))[:5]}"
    )
