"""Custom stateful streaming operator via ``applyInPandasWithState``.

The capability dumbo could never express: per-key state maintained
across a continuous stream (dumbo's closest notion is cross-record
state inside ONE map task via the open-mapper, dumbo/core.py:~150 —
state died with the task). Here state is engine-managed: checkpointed,
recovered on failure, evicted by timeout.

Example operator: running per-user totals (events seen, value summed),
emitting an updated row per user per micro-batch. The pandas function
receives Arrow batches per key — the same columnar boundary as the
batch compat veneer.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, total_events long, total_value double"
STATE_SCHEMA = "total_events long, total_cents long"


def _update_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # money accumulates in integer cents (the pandas mirror of the
    # DECIMAL(18,2) discipline in functions/numeric.py): totals are
    # exact and batch-order-independent, so the final emitted row
    # hash-matches a DECIMAL sum oracle bit-for-bit
    total_events, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total_events += len(pdf)
        total_cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((total_events, total_cents))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total_events],
            "total_value": [total_cents / 100.0],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Continuously-updated per-user totals. Output mode 'update': one
    row per changed user per micro-batch. State is two numbers per
    user — at 100 TB/day the state store stays tiny because state
    size is O(users), not O(events)."""
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TRANS_OUTPUT_SCHEMA = "event_type string, next_type string, n long"
TRANS_STATE_SCHEMA = "last_us long, last_eid long, last_type string"


def _update_transitions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # ORDER-SENSITIVE state (unlike the commutative totals): the pair
    # (A → B) exists only because B directly follows A, so the operator
    # keeps each user's LAST event and requires micro-batches in
    # event-time order per user (the runner feeds time-sliced files;
    # a production source is a per-key-ordered log like Kafka).
    pdf = pd.concat(list(pdfs)).sort_values(["us", "event_id"])
    if len(pdf) == 0:
        return
    types = pdf["event_type"].tolist()
    if state.exists:
        types = [state.get[2]] + types
    counts: dict[tuple[str, str], int] = {}
    for a, b in zip(types, types[1:]):
        counts[(a, b)] = counts.get((a, b), 0) + 1
    last = pdf.iloc[-1]
    state.update((int(last["us"]), int(last["event_id"]), str(last["event_type"])))
    if counts:
        yield pd.DataFrame(
            {
                "event_type": [k[0] for k in counts],
                "next_type": [k[1] for k in counts],
                "n": list(counts.values()),
            }
        )


def transition_counts_stream(events: DataFrame) -> DataFrame:
    """Per-user consecutive-event-type pair counts, emitted per
    micro-batch (append mode); summing emissions gives the exact
    batch transition matrix. State is one (ts, id, type) triple per
    user — O(users), independent of stream length."""
    return (
        events.select("user_id", "event_id", "us", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_transitions,
            outputStructType=TRANS_OUTPUT_SCHEMA,
            stateStructType=TRANS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


PACK_OUTPUT_SCHEMA = (
    "source string, bucket int, bin_id long, n_docs long, bin_tokens long"
)
PACK_STATE_SCHEMA = "bin_id long, fill long, in_bin long"


def _update_packing(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # ORDER-SENSITIVE like _update_transitions: the first-fit fold is a
    # sequential recurrence, so micro-batches must deliver each
    # (source, bucket) stream's documents in permutation order (the
    # runner feeds rank-range slices; a production source is a
    # per-key-ordered log). State = the OPEN bin only: (bin_id, fill,
    # docs in bin) — O(sources·buckets), independent of stream length.
    from dumbo_spark.operators.packing import PACK_BUDGET

    bin_id, fill, in_bin = state.get if state.exists else (0, 0, 0)
    pdf = pd.concat(list(pdfs)).sort_values(["_k", "doc_id"])
    if len(pdf) == 0:
        return
    rows: list[tuple[int, int, int]] = []
    for n in pdf["n_tokens"]:
        n = int(n)
        # same doc-count new-bin test as packing.greedy_pack_bins (a
        # bin of zero-token docs is non-empty); the budget is the
        # SHARED constant so batch twin, stream, and oracle can't
        # desynchronize (ADVICE r9)
        if in_bin > 0 and fill + n > PACK_BUDGET:
            rows.append((bin_id, in_bin, fill))  # closed: final stats
            bin_id += 1
            fill, in_bin = n, 1
        else:
            fill += n
            in_bin += 1
    state.update((bin_id, fill, in_bin))
    rows.append((bin_id, in_bin, fill))  # open bin: snapshot (grows)
    yield pd.DataFrame(
        {
            "source": [key[0]] * len(rows),
            "bucket": [key[1]] * len(rows),
            "bin_id": [r[0] for r in rows],
            "n_docs": [r[1] for r in rows],
            "bin_tokens": [r[2] for r in rows],
        }
    )


def greedy_packing_stream(docs: DataFrame) -> DataFrame:
    """Streaming first-fit whole-document packing — the continuous twin
    of packing.greedy_pack_bins: documents arrive per (source,
    md5-bucket) stream in permutation order and fold into 256-token
    bins across micro-batches. Emits every bin CLOSED in a batch with
    its final stats plus the trailing open bin's snapshot; since
    (n_docs, bin_tokens) grow monotonically within a bin, the settled
    value per bin is the max over its emissions — which is how the
    runner reduces the append-mode output to the batch answer.
    """
    return (
        docs.select("source", "bucket", "_k", "doc_id", "n_tokens")
        .groupBy("source", "bucket")
        .applyInPandasWithState(
            _update_packing,
            outputStructType=PACK_OUTPUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
