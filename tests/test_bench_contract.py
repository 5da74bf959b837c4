"""bench.py driver contract: the emitted line must fit the driver's
2000-char stdout tail buffer (BENCH_r01 was truncated mid-line and
recorded ``parsed: null``)."""

import json

import bench
from dumbo_spark.registry import QUERIES


def test_headline_names_registered():
    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert missing == []


def test_emitted_line_fits_driver_buffer():
    timings = {n: 123.4567 for n in bench.HEADLINE}  # worst-case widths
    line = bench.emit_line(timings, "0.1")
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert parsed["value"] == round(sum(timings.values()), 3)
    assert set(parsed["queries"]) <= set(bench.HEADLINE)
    assert parsed["sf"] == 0.1


def test_manifest_partitions_the_registry_with_reasons():
    # VERDICT r9 #6: the headline's composition must be auditable —
    # included + excluded must exactly partition the registry, every
    # exclusion must carry a reason, and the known deliberate
    # exclusions must keep their specific reasons
    m = bench.build_manifest(set(QUERIES))
    included, excluded = set(m["included"]), m["excluded"]
    assert included | set(excluded) == set(QUERIES)
    assert not included & set(excluded)
    assert all(isinstance(r, str) and r for r in excluded.values())
    assert "audit-twin" in excluded["semantic_dedup_checked"]
    assert all(
        "replay-runner" in excluded[n]
        for n in excluded
        if n.startswith("streaming_")
    )


def test_emit_line_truncates_to_slowest_when_oversized():
    # 400 long-named queries cannot fit; the slowest must survive
    timings = {f"extremely_long_query_name_{i:03d}": float(i) for i in range(400)}
    line = bench.emit_line(timings, "0.01")
    assert len(line) <= 1900
    parsed = json.loads(line)
    assert parsed["value"] == round(sum(timings.values()), 3)
    kept = parsed["queries"]
    assert kept  # never empties entirely
    assert "extremely_long_query_name_399" in kept  # slowest retained
