"""Driver-rotation discipline, automated (the process that surfaced
the r8 rank-machinery failures): the driver hash-checks only the FIRST
50 names of ``queries()`` each round with no cross-round cursor, so
every query that has never been externally sampled MUST sit inside
that window, or it ships unverified indefinitely."""

from __future__ import annotations

import glob
import json
import os

from dumbo_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _externally_sampled() -> set[str]:
    seen: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        try:
            seen |= set(json.load(open(path)))
        except Exception:
            pass
    return seen


def _latest_vintage() -> dict[str, int]:
    """name -> latest round whose CORRECTNESS row did not FAIL, parsed
    independently of the registry (mirrors the r12 policy: full
    hash_match or a rows-only ``no_oracle`` sample refreshes the
    vintage; a hash/row mismatch or a real error does not)."""
    import re

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            for name, rec in json.load(open(path)).items():
                ok = not isinstance(rec, dict) or (
                    rec.get("hash_match") is True
                    or rec.get("err") == "no_oracle"
                )
                if ok:
                    latest[name] = max(latest.get(name, 0), rnd)
        except Exception:
            pass
    return latest


def _boosted() -> set[str]:
    """Names promoted to oracle-backed after their last external sample
    (no hash-confirmed row anywhere, oracle now registered): the r12
    rotation sorts these as never-sampled so they confirm next round."""
    _, confirmed = registry._correctness_history()
    return {
        n
        for n in registry.QUERIES
        if n not in confirmed and registry.QUERIES[n].oracle is not None
    }


def test_priority_names_unique_and_registered():
    pri = registry._DRIVER_PRIORITY
    assert len(pri) == len(set(pri)), "duplicate names in _DRIVER_PRIORITY"
    missing = [n for n in pri if n not in registry.QUERIES]
    assert not missing, f"priority names not registered: {missing}"


def test_never_sampled_queries_fit_in_the_driver_window():
    head = registry._ordered_names()[:50]
    never = set(registry.QUERIES) - _externally_sampled()
    outside = sorted(never - set(head))
    assert not outside, (
        "queries with no external correctness row are OUTSIDE the head-50 "
        f"driver window and will never be sampled: {outside}"
    )


def test_head_window_is_vintage_sorted_among_sampled_names():
    # VERDICT r9 Next #2: once every query has been sampled, the window
    # must refresh the OLDEST external rows first — so no sampled name
    # outside the head-50 may have a strictly older latest-vintage than
    # any sampled name inside it (ties across the boundary are fine;
    # never-sampled names are covered by the test above and are exempt
    # here because they outrank every vintage).
    latest = _latest_vintage()
    head = set(registry._ordered_names()[:50])
    boosted = _boosted()  # sort as never-sampled; exempt like them
    inside = [latest[n] for n in head if n in latest and n not in boosted]
    outside = [
        latest[n]
        for n in registry.QUERIES
        if n not in head and n in latest and n not in boosted
    ]
    if inside and outside:
        assert max(inside) <= min(outside), (
            "head-50 holds a sampled query with vintage "
            f"{max(inside)} while an older vintage {min(outside)} "
            "query sits outside the driver window"
        )


def test_window_is_exactly_the_first_fifty_priority_names():
    # _ordered_names() must put the explicit priority list first — if a
    # registration reorder ever broke that, the rotation bookkeeping
    # (and both tests above) would be reasoning about the wrong window
    head = registry._ordered_names()[:50]
    assert head == list(registry._DRIVER_PRIORITY[:50])


def test_invariant_survives_a_simulated_driver_sync():
    # VERDICT r10 Next #1: the r10 hand-frozen list self-invalidated the
    # moment the driver synced CORRECTNESS_r10.json (the head-50 names
    # jumped to vintage 10 while r3 names sat outside). The derived
    # ordering must hold by construction through that event: simulate a
    # new round's sync by stamping the CURRENT head-50 with vintage
    # max+1, re-derive, and re-check both rotation invariants.
    vintages, confirmed = registry._correctness_history()
    simulated = dict(vintages)
    sim_confirmed = dict(confirmed)
    next_round = max(vintages.values(), default=0) + 1
    for name in registry._ordered_names()[:50]:
        simulated[name] = next_round
        # the sync hash-confirms every oracle-backed name it samples
        if registry.QUERIES[name].oracle is not None:
            sim_confirmed[name] = next_round

    pri = registry._derive_driver_priority(simulated, sim_confirmed)
    assert len(pri) == len(registry.QUERIES)
    head = set(pri[:50])
    # invariant 1: never-sampled names (under the simulated map) all fit
    never = set(registry.QUERIES) - set(simulated)
    assert never <= head or len(never) > 50
    # invariant 2: no sampled name inside the window is strictly newer
    # than a sampled name outside it (promotion-boosted names sort as
    # never-sampled and are exempt, same as the live-tree test above)
    boosted = {
        n
        for n in registry.QUERIES
        if n in simulated
        and n not in sim_confirmed
        and registry.QUERIES[n].oracle is not None
    }
    inside = [simulated[n] for n in head if n in simulated and n not in boosted]
    outside = [
        simulated[n] for n in pri[50:] if n in simulated and n not in boosted
    ]
    if inside and outside:
        assert max(inside) <= min(outside)


def test_promoted_but_unconfirmed_outranks_vintage():
    # VERDICT r11 Next #1: a name whose oracle was registered AFTER its
    # last external sample must sort as never-sampled — otherwise a
    # promotion waits out the whole vintage queue (r11's three sat at
    # positions 187–198, ~3 rounds from external hash confirmation).
    # Pick any oracle-backed name and feed a synthetic history where it
    # was sampled recently but never hash-confirmed.
    some_oracle = next(
        n for n in sorted(registry.QUERIES) if registry.QUERIES[n].oracle
    )
    vintages = {n: 3 for n in registry.QUERIES}
    vintages[some_oracle] = 9  # newest vintage — would sort LAST...
    confirmed = {n: 3 for n in registry.QUERIES if n != some_oracle}
    pri = registry._derive_driver_priority(vintages, confirmed)
    # ...but the boost puts it first (vintage-0 class, before every
    # vintage-3 name)
    assert pri[0] == some_oracle


def test_r11_promotions_sit_inside_the_live_window():
    # the concrete r12 payoff: the three r11 promotions
    # (oracle-registered, internally hash-matched at three scales, but
    # whose external rows are all rows-only) must be in the head-50 so
    # CORRECTNESS_r12 hash-confirms them
    head = set(registry._ordered_names()[:50])
    promoted = {
        n for n in ("knn_cosine_lsh", "knn_cosine_ivf", "embedding_near_dup")
        if n in registry.QUERIES and registry.QUERIES[n].oracle is not None
    }
    confirmed = registry._correctness_history()[1]
    still_unconfirmed = {n for n in promoted if n not in confirmed}
    assert still_unconfirmed <= head, (
        f"promoted-but-unconfirmed names outside the driver window: "
        f"{sorted(still_unconfirmed - head)}"
    )


def test_failed_rows_do_not_refresh_vintage(tmp_path):
    # ADVICE r11: a FAILING latest row must not push a name to the back
    # of the rotation. Craft a history where q_fail passes in r1 then
    # fails in r5 — its vintage must stay 1 (the prior passing round),
    # while a real error row for a never-passing name yields no vintage
    # at all (sorts as never-sampled).
    ok = {"rows_match": True, "schema_match": True, "hash_match": True,
          "spark_rows": 1, "oracle_rows": 1, "err": None}
    bad = dict(ok, hash_match=False)
    rows_only = {"rows_match": None, "schema_match": None,
                 "hash_match": None, "spark_rows": 1, "oracle_rows": None,
                 "err": "no_oracle"}
    err = dict(rows_only, err="Traceback: boom")
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({"q_fail": ok, "q_sketch": rows_only, "q_err": err})
    )
    (tmp_path / "CORRECTNESS_r05.json").write_text(
        json.dumps({"q_fail": bad, "q_sketch": rows_only})
    )
    passed, confirmed = registry._correctness_history(str(tmp_path))
    assert passed == {"q_fail": 1, "q_sketch": 5}
    assert confirmed == {"q_fail": 1}
    assert "q_err" not in passed  # errored-only: never-sampled class


def test_derived_order_is_deterministic_and_total():
    # same vintage map -> same order; ties broken by name so the driver
    # window is stable within a round
    v = registry._correctness_vintages()
    a = registry._derive_driver_priority(v)
    b = registry._derive_driver_priority(dict(v))
    assert a == b
    assert sorted(a) == sorted(registry.QUERIES)
