"""Static data-quality invariants on the driver-generated fixtures.

The streaming attribution replays (dumbo_spark/streaming/runners.py)
inject watermark-driving sentinel rows with ``event_id = user_id = -1``
and filter them out of the settled output by sign (``event_id >= 0``).
That is only sound while every real fixture id is non-negative.
``_sentinel_safe_bounds`` pins the invariant at replay construction;
this module asserts the same invariant on the parquet directly (no
Spark session needed), so a fixture regeneration that introduces
negative ids fails in the plain test sweep too, not only when a
streaming query is built.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

_SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "events.parquet"))
]


@pytest.mark.parametrize("sf_dir", _SF_DIRS, ids=[os.path.basename(d) for d in _SF_DIRS])
def test_events_ids_nonnegative(sf_dir):
    """Sentinel invariant: no real event carries a negative id."""
    path = os.path.join(sf_dir, "events.parquet")
    mn_eid, mn_uid, n = duckdb.sql(
        f"SELECT min(event_id), min(user_id), count(*) FROM '{path}'"
    ).fetchone()
    assert n > 0, f"empty events fixture at {sf_dir}"
    assert mn_eid is not None and mn_eid >= 0, f"negative event_id in {path}: {mn_eid}"
    assert mn_uid is not None and mn_uid >= 0, f"negative user_id in {path}: {mn_uid}"


def test_sentinel_guard_raises_on_negative_ids(spark):
    """The runtime twin: _sentinel_safe_bounds refuses a frame whose id
    namespace collides with the -1 sentinels."""
    from dumbo_spark.streaming.runners import _sentinel_safe_bounds

    bad = spark.createDataFrame(
        [(-5, 7, "2024-01-01 00:00:00")],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    with pytest.raises(ValueError, match="negative ids"):
        _sentinel_safe_bounds(bad)


def test_sentinel_guard_passes_on_clean_ids(spark):
    from dumbo_spark.streaming.runners import _sentinel_safe_bounds

    ok = spark.createDataFrame(
        [(0, 0, "2024-01-01 00:00:00"), (3, 9, "2024-01-02 00:00:00")],
        "event_id long, user_id long, ts string",
    ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
    b = _sentinel_safe_bounds(ok)
    assert b["mn"] is not None and b["mx"] is not None
