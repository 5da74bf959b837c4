"""Round-12 ADVICE fixes: cross-engine numeric contracts that only
diverge outside fixture scale, pinned here so they can't regress.

1. det_kmeans centroid update must floor the IEEE double quotient the
   way DuckDB's FLOOR(CAST(s AS DOUBLE)/n) does — int→double FIRST,
   then divide — not Python's correctly-rounded true-rational int/int.
   The two differ once |s| >= 2^53 (reachable at the 100 TB target:
   ~5e7 rows/cell at quantized |x| ~ 1.8e8).
2. The pagerank oracles' teleport base must be the same double the
   engine computes: (1.0 - 0.85) = 0.15000000000000002, which is NOT
   the literal 0.15 (1 ulp apart — a rank landing on a 6th-decimal
   rounding boundary could flip the hash).
"""

from __future__ import annotations

import math

import duckdb


def _engine_centroid(s: int, n: int) -> int:
    # the exact expression similarity.det_kmeans_cells uses (r12)
    return math.floor(float(s) / n)


def test_centroid_floor_matches_duckdb_above_2_53():
    # s = 2^53 + 1 is the first integer a double cannot represent:
    # CAST rounds it down to 2^53, so the double-first floor is 2^53
    # while the true-rational floor (old int/int path) is 2^53 + 1.
    s, n = 2**53 + 1, 1
    duck = duckdb.sql(
        f"SELECT FLOOR(CAST({s} AS BIGINT) / CAST({n} AS DOUBLE))::BIGINT"
    ).fetchone()[0]
    assert _engine_centroid(s, n) == duck == 2**53
    # and the OLD formula provably diverges here — the reason for the fix
    assert math.floor(s / n) != duck or s / n == float(s) / n
    assert s // n == 2**53 + 1


def test_centroid_floor_matches_duckdb_at_many_magnitudes():
    cases = [
        (7, 3),
        (-7, 3),
        (2**53 - 1, 7),
        (2**53 + 1, 7),
        (2**60 + 12345, 997),
        (-(2**60) - 12345, 997),
        (2**62 + 1, 1),
        (3, 2**40),
    ]
    for s, n in cases:
        duck = duckdb.sql(
            f"SELECT FLOOR(CAST({s} AS BIGINT) / CAST({n} AS DOUBLE))::BIGINT"
        ).fetchone()[0]
        assert _engine_centroid(s, n) == duck, (s, n)


def test_pagerank_oracle_teleport_base_is_the_engine_double():
    # engine: dedup.pagerank computes base = (1.0 - damping) / n with
    # damping = 0.85 — the minuend double is 0.15000000000000002
    engine_base = 1.0 - 0.85
    assert engine_base != 0.15  # the 1-ulp gap ADVICE r11 flagged
    duck = duckdb.sql(
        "SELECT CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)"
    ).fetchone()[0]
    assert duck == engine_base


def test_pagerank_oracles_use_the_subtraction_form():
    # both recursive-CTE oracles must seed teleport from the identical
    # double, not the literal 0.15
    from dumbo_spark.registry import QUERIES

    for name in ("doc_pagerank", "pagerank_checked"):
        sql = QUERIES[name].oracle
        assert sql is not None
        assert "CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)" in sql, name
        assert "0.15 /" not in sql, name
