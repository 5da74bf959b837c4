"""Round-13 fixes: checkpoint-helper promotion (ADVICE r12), the
observable eager-release fallback (VERDICT r12 Next #6), pagerank's
claimed durable run dirs, and release_persistent_rdds living in the
runtime (session.py) instead of the oracle harness (testing.py)."""

import logging

import pytest

from dumbo_spark.operators import _checkpoint, dedup


def test_release_local_checkpoint_logs_on_fallback(caplog):
    """A failing py4j accessor chain must WARN once (so bench logs show
    when eager release degrades to GC-timed) and go quiet afterwards —
    a Spark upgrade that breaks the private accessors would otherwise
    silently reintroduce the shared-session memory inflation."""

    class _Boom:
        @property
        def _jdf(self):
            raise RuntimeError("accessor chain changed")

    _checkpoint._release_fallback_warned = False
    try:
        with caplog.at_level(logging.DEBUG, logger=_checkpoint.__name__):
            _checkpoint._release_local_checkpoint(_Boom())
            _checkpoint._release_local_checkpoint(_Boom())
        warnings = [r for r in caplog.records if r.levelno == logging.WARNING]
        assert len(warnings) == 1
        assert "GC-timed" in warnings[0].getMessage()
        debugs = [r for r in caplog.records if r.levelno == logging.DEBUG]
        assert len(debugs) == 1  # repeat failures demoted to debug
    finally:
        _checkpoint._release_fallback_warned = False


def test_release_local_checkpoint_silent_on_success(spark, caplog):
    df = spark.range(3).localCheckpoint()
    with caplog.at_level(logging.DEBUG, logger=_checkpoint.__name__):
        _checkpoint._release_local_checkpoint(df)
    assert not caplog.records


def test_checkpoint_helpers_shared_not_duplicated():
    """graph.py and dedup.py must use the SAME helper object (promoted
    to operators/_checkpoint.py) — not a cross-module private import or
    a copy that could drift."""
    from dumbo_spark.operators import graph

    assert graph._release_local_checkpoint is _checkpoint._release_local_checkpoint
    assert dedup._release_local_checkpoint is _checkpoint._release_local_checkpoint
    assert dedup._claim_run_dir is _checkpoint._claim_run_dir


def test_release_persistent_rdds_is_a_runtime_utility():
    """bench.py imports release_persistent_rdds from session.py so a
    bench-only environment without duckdb/pandas can run; testing.py
    re-exports the same object for existing callers."""
    from dumbo_spark import session, testing

    assert testing.release_persistent_rdds is session.release_persistent_rdds
    bench_src = open("bench.py").read()
    assert "from dumbo_spark.session import release_persistent_rdds" in bench_src
    assert "from dumbo_spark.testing import" not in bench_src


def test_pagerank_shared_durable_dir_no_collision(spark, tmp_path):
    """Two pagerank runs sharing a durable_dir get disjoint run-N
    subtrees (ADVICE r12: fixed pr_edges/pr_deg/pr_adj/ranks paths
    collided), so the first run's lazily-backed result is NOT mutated
    by the second run."""
    e1 = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    e2 = spark.createDataFrame([(7, 8)], "doc_a long, doc_b long")
    r1 = dedup.pagerank(e1, max_iter=3, durable_dir=str(tmp_path))
    r2 = dedup.pagerank(e2, max_iter=3, durable_dir=str(tmp_path))
    # collect r1 AFTER running r2: with colliding paths this would
    # read r2's files and lose r1's node set
    got2 = {r.doc_id: r.rank for r in r2.collect()}
    got1 = {r.doc_id: r.rank for r in r1.collect()}
    assert set(got2) == {7, 8}
    assert set(got1) == {1, 2, 3}
    assert (tmp_path / "run-0" / "pr_adj").exists()
    assert (tmp_path / "run-1" / "pr_adj").exists()
    # durable mode must agree with the localCheckpoint default
    local1 = {r.doc_id: r.rank for r in dedup.pagerank(e1, max_iter=3).collect()}
    assert got1 == pytest.approx(local1)
