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
    """name -> the latest round whose CORRECTNESS file sampled it."""
    import re

    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        try:
            for name in json.load(open(path)):
                latest[name] = max(latest.get(name, 0), rnd)
        except Exception:
            pass
    return latest


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
    inside = [latest[n] for n in head if n in latest]
    outside = [
        latest[n] for n in registry.QUERIES if n not in head and n in latest
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
    vintages = registry._correctness_vintages()
    simulated = dict(vintages)
    next_round = max(vintages.values(), default=0) + 1
    for name in registry._ordered_names()[:50]:
        simulated[name] = next_round

    pri = registry._derive_driver_priority(simulated)
    assert len(pri) == len(registry.QUERIES)
    head = set(pri[:50])
    # invariant 1: never-sampled names (under the simulated map) all fit
    never = set(registry.QUERIES) - set(simulated)
    assert never <= head or len(never) > 50
    # invariant 2: no sampled name inside the window is strictly newer
    # than a sampled name outside it
    inside = [simulated[n] for n in head if n in simulated]
    outside = [simulated[n] for n in pri[50:] if n in simulated]
    if inside and outside:
        assert max(inside) <= min(outside)


def test_derived_order_is_deterministic_and_total():
    # same vintage map -> same order; ties broken by name so the driver
    # window is stable within a round
    v = registry._correctness_vintages()
    a = registry._derive_driver_priority(v)
    b = registry._derive_driver_priority(dict(v))
    assert a == b
    assert sorted(a) == sorted(registry.QUERIES)
