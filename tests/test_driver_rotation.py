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


def test_window_is_exactly_the_first_fifty_priority_names():
    # _ordered_names() must put the explicit priority list first — if a
    # registration reorder ever broke that, the rotation bookkeeping
    # (and both tests above) would be reasoning about the wrong window
    head = registry._ordered_names()[:50]
    assert head == list(registry._DRIVER_PRIORITY[:50])
