"""Shared lineage-truncation helpers for the iterative operators.

connected_components, pagerank, and the k-core/k-truss family
(operators/dedup.py, operators/graph.py) all replace a per-round
label/rank table every iteration; these helpers release the previous
round's storage eagerly and keep concurrent durable runs from
overwriting each other's scratch files. Promoted out of dedup.py in
r13 (ADVICE r12: graph.py importing an underscore-private symbol from
dedup.py coupled the modules and would break silently on a rename).

LAZY CORPUS-WIDTH CHECKPOINT CONTRACT (ADVICE r15). Many multi-branch
operators pin a shared subtree with ``localCheckpoint(eager=False)``
so N consuming branches evaluate the tokenize/fingerprint pass once
instead of N times (guide §2.4). Two caveats apply to EVERY such site,
not just the iterative ones documented on connected_components:

- **Storage lifetime.** The checkpoint's blocks live in executor
  storage until the returned DataFrame is garbage-collected (or the
  caller runs ``session.release_persistent_rdds``, which the bench and
  the test harness both do between queries). A long-lived host
  application that holds many results should release explicitly;
  within one query's evaluation the pin is exactly the point.
- **Fault tolerance.** ``localCheckpoint`` has NO recompute path: an
  executor loss after materialization fails the query (it cannot be
  rebuilt from lineage). That is the right local-mode/bench trade —
  one evaluation instead of N full corpus passes — but a cluster run
  where executor loss must be survivable should use reliable
  checkpoints (``spark.checkpoint.dir``) or persist-to-storage
  instead; the operators take DataFrames, so callers can materialize
  upstream and pass the re-read frame if they need durability.
"""

from __future__ import annotations

import logging
import os

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

#: Set after the first failed eager-release attempt so the warning
#: fires once per process, not once per iteration round.
_release_fallback_warned = False


def _release_local_checkpoint(df: DataFrame) -> None:
    """Free a localCheckpoint'd DataFrame's storage blocks NOW.

    The iterative loops replace their label/rank table every round;
    the previous round's checkpoint becomes garbage the moment the new
    one is materialized, but its blocks stay pinned until the lazy
    py4j detach + JVM GC get around to them — in a long shared session
    (the driver's correctness harness, a user notebook) those stale
    rounds accumulate executor memory (measured: a 4× slowdown of an
    iterative query after two others ran in the same session).
    Best-effort by design: it reaches the plan's LogicalRDD through
    internal accessors, so any API drift just falls back to GC-timed
    release rather than failing the query — but that fallback is now
    OBSERVABLE (VERDICT r12 Next #6): the first failure logs a warning
    so a Spark upgrade that silently degrades every iterative operator
    back to GC-timed release shows up in bench logs instead of only as
    unexplained memory inflation.
    """
    global _release_fallback_warned
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # noqa: BLE001 — documented best-effort path
        if not _release_fallback_warned:
            _release_fallback_warned = True
            _log.warning(
                "eager localCheckpoint release failed (%s: %s); iterative "
                "operators fall back to GC-timed block release for this "
                "process — expect shared-session memory inflation",
                type(exc).__name__,
                exc,
            )
        else:
            _log.debug("eager localCheckpoint release failed again: %s", exc)


def _claim_run_dir(durable_dir: str) -> str:
    """Reserve a fresh ``run-N`` subdirectory under ``durable_dir``.

    Atomic via ``os.makedirs(exist_ok=False)`` for local/posix paths;
    two invocations sharing a durable_dir get disjoint scratch trees,
    so one run can never overwrite files backing another run's lazily
    evaluated result.

    Local filesystems only: for URI paths (hdfs://, s3a://, ...) a
    driver-local makedirs would create a stray ``./hdfs:/...`` dir and
    provide zero mutual exclusion on the real filesystem, so those are
    rejected — callers on shared storage must pass distinct
    durable_dirs per run (directory-create is not a lock on object
    stores, and multi-driver HDFS setups need a real coordinator).
    """
    if "://" in durable_dir:
        raise ValueError(
            f"_claim_run_dir requires a local path, got {durable_dir!r}; "
            "on shared filesystems pass a distinct durable_dir per run"
        )
    base = durable_dir.rstrip("/")
    n = 0
    while True:
        candidate = f"{base}/run-{n}"
        try:
            os.makedirs(candidate, exist_ok=False)
            return candidate
        except FileExistsError:
            n += 1
