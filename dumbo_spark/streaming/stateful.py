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
    # hash-matches a DECIMAL sum oracle bit-for-bit. Cents rounding is
    # HALF-AWAY-FROM-ZERO on the scaled double — the oracle's
    # double→DECIMAL(18,2) cast semantics — NOT pandas .round()'s
    # half-even, which diverges by a cent on sub-cent inputs like
    # 0.125 (r11 review; 2dp-exact fixtures never exposed it)
    import numpy as np

    total_events, total_cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        total_events += len(pdf)
        v = pdf["value"].to_numpy(dtype="float64")
        total_cents += int(
            (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).sum()
        )
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
        last_us, last_eid, last_type = state.get
        first = pdf.iloc[0]
        # ENFORCE the order contract the correctness rests on instead
        # of silently counting a wrong (held → first) transition when
        # a replay source delivers batches out of event-time order —
        # the mtime-replay trap class (ADVICE r9), now loud (r11
        # review: these two state fields were stored but never read)
        if (int(first["us"]), int(first["event_id"])) <= (last_us, last_eid):
            raise ValueError(
                "transition_counts_stream: micro-batch out of event-"
                f"time order for key {key}: first incoming "
                f"({int(first['us'])}, {int(first['event_id'])}) <= "
                f"held ({last_us}, {last_eid}) — the source must "
                "deliver per-key-ordered batches"
            )
        types = [last_type] + types
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


P2_OUTPUT_SCHEMA = (
    "event_type string, n_seen long, p2_estimate double"
)
# 5 marker heights + 5 marker positions + the desired-position
# increments are derivable, so state is (n, q1..q5, pos1..pos5)
P2_STATE_SCHEMA = (
    "n long, q1 double, q2 double, q3 double, q4 double, q5 double,"
    " n1 long, n2 long, n3 long, n4 long, n5 long"
)


def _p2_step(q: list, pos: list, n: int, x: float, p: float):
    """One P² update (Jain & Chlamtac 1985, Algorithm after init):
    pure-Python double arithmetic — deterministic given arrival order.
    ``q`` = 5 marker heights, ``pos`` = 5 marker positions (1-based),
    ``n`` = observations so far (>= 5). Returns updated (q, pos)."""
    # cell of the new observation + extreme adjustment
    if x < q[0]:
        q[0] = x
        k = 0
    elif x >= q[4]:
        q[4] = x
        k = 3
    else:
        k = 0
        while not (q[k] <= x < q[k + 1]):
            k += 1
    for i in range(k + 1, 5):
        pos[i] += 1
    n += 1
    # desired positions for quantile p at count n
    nd = [
        1.0,
        (n - 1) * p / 2.0 + 1.0,
        (n - 1) * p + 1.0,
        (n - 1) * (1.0 + p) / 2.0 + 1.0,
        float(n),
    ]
    for i in (1, 2, 3):
        d = nd[i] - pos[i]
        if (d >= 1.0 and pos[i + 1] - pos[i] > 1) or (
            d <= -1.0 and pos[i - 1] - pos[i] < -1
        ):
            s = 1 if d >= 0 else -1
            # parabolic (P²) candidate
            qp = q[i] + s / (pos[i + 1] - pos[i - 1]) * (
                (pos[i] - pos[i - 1] + s)
                * (q[i + 1] - q[i])
                / (pos[i + 1] - pos[i])
                + (pos[i + 1] - pos[i] - s)
                * (q[i] - q[i - 1])
                / (pos[i] - pos[i - 1])
            )
            if q[i - 1] < qp < q[i + 1]:
                q[i] = qp
            else:  # linear fallback
                q[i] = q[i] + s * (q[i + s] - q[i]) / (pos[i + s] - pos[i])
            pos[i] += s
    return q, pos, n


def _update_p2(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    # ORDER-SENSITIVE like the packing fold: P² estimates depend on
    # arrival order, so the runner feeds rank-range slices and rows are
    # sorted within each batch — the estimate is then a pure function
    # of the (ts, event_id) stream order and reproducible across runs.
    P = 0.5
    if state.exists:
        st = state.get
        n = int(st[0])
        if n >= 5:
            q = [float(v) for v in st[1:6]]
            pos = [int(v) for v in st[6:11]]
        else:
            # pre-init state holds only n real values; slots beyond n
            # are 0.0 PADDING written below — restoring them as held
            # observations would inject spurious zeros at the n==5
            # sort (ADVICE r10 high: 3-row first batch gave est 30.44
            # vs correct 34.01 with len(q)==7)
            q = [float(v) for v in st[1 : 1 + n]]
            pos = []
    else:
        n, q, pos = 0, [], []
    pdf = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    if len(pdf) == 0:
        return
    for x in pdf["value"].astype("float64"):
        x = float(x)
        if n < 5:
            q.append(x)
            n += 1
            if n == 5:
                q.sort()
                pos = [1, 2, 3, 4, 5]
            continue
        q, pos, n = _p2_step(q, pos, n, x, P)
    # estimate: the middle marker once initialized; before 5 obs, the
    # median of the held values (exact, tiny)
    if n < 5:
        held = sorted(q)
        m = len(held)
        est = (
            held[m // 2]
            if m % 2
            else (held[m // 2 - 1] + held[m // 2]) / 2.0
        )
        state.update((n, *(held + [0.0] * (5 - m)), 0, 0, 0, 0, 0))
    else:
        est = q[2]
        state.update((n, *q, *pos))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "n_seen": [n],
            "p2_estimate": [est],
        }
    )


def p2_quantile_stream(events: DataFrame) -> DataFrame:
    """Streaming P² median estimator per event type — constant-memory
    online quantiles (Jain & Chlamtac 1985): five markers per key,
    parabolic updates, NO sample storage. The state-size story at
    100 TB: O(types·5 doubles) regardless of stream length, where any
    exact method needs the data. Emits (type, n_seen, estimate) per
    micro-batch; the last emission is the settled estimate."""
    return (
        events.select("event_type", "ts_us", "event_id", "value")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update_p2,
            outputStructType=P2_OUTPUT_SCHEMA,
            stateStructType=P2_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
