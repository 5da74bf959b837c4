"""Property-based checks for the round-9 fold/arithmetic operators:
randomized inputs against independent Python references — the
hypothesis generalization of the fixed edge-case tests in
test_round9_ops.py. Example counts are kept small because every
example is a Spark round-trip."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from dumbo_spark.operators import events as E
from dumbo_spark.operators import packing, textstats

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _docs_of_lengths(spark, lens, source="s"):
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n), source) for i, n in enumerate(lens)],
        "doc_id long, text string, source string",
    )


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=25)
)
def test_greedy_pack_invariants_hold_on_random_streams(spark, lens):
    rows = packing.greedy_pack_bins(
        _docs_of_lengths(spark, lens), budget=256, buckets=1
    ).collect()
    # conservation
    assert sum(r["n_docs"] for r in rows) == len(lens)
    assert sum(r["bin_tokens"] for r in rows) == sum(lens)
    # no bin overflows unless it is a single oversized doc
    for r in rows:
        assert r["bin_tokens"] <= 256 or r["n_docs"] == 1
    # bin ids are contiguous from 0
    ids = sorted(r["bin_id"] for r in rows)
    assert ids == list(range(len(ids)))


@settings(**_SETTINGS)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=1000), min_size=1, max_size=20)
)
def test_ewma_scaled_integer_form_equals_float_recurrence(spark, counts):
    import datetime

    rows = []
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (
                    eid,
                    datetime.datetime(2024, 1, 1, 0, 0, 0)
                    + datetime.timedelta(days=d),
                    1,
                    "t",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    got = {r["day"]: r["ewma"] for r in E.ewma_event_volume(ev).collect()}
    s = None
    for d, c in enumerate(counts):
        s = c if s is None else 0.75 * s + 0.25 * c
        day = (
            datetime.date(2024, 1, 1) + datetime.timedelta(days=d)
        ).isoformat()
        # EWMA values are dyadic rationals, so exact 6dp midpoints
        # occur (hypothesis found 2.1953125): Spark F.round and DuckDB
        # ROUND both go half-away-from-zero there, Python round() is
        # half-even — the reference must use the HALF_UP helper
        assert got[day] == E._round6_half_up(s), (day, got[day], s)


@settings(**_SETTINGS)
@given(
    word=st.text(alphabet="ab", min_size=1, max_size=12),
    a=st.sampled_from("ab"),
    b=st.sampled_from("ab"),
)
def test_bpe_catalyst_fold_matches_python_ltr_merge(spark, word, a, b):
    # the F.aggregate fold inside the trainer vs the canonical Python
    # left-to-right non-overlapping merge
    merged = a + b
    df = spark.createDataFrame([(word,)], "word string").select(
        F.split("word", "").alias("syms")
    )
    out = df.select(
        F.aggregate(
            "syms",
            F.expr("cast(array() as array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (x == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        ).alias("m")
    ).collect()[0]["m"]
    ref, syms = [], list(word)
    for s in syms:
        if ref and ref[-1] == a and s == b:
            ref[-1] = merged
        else:
            ref.append(s)
    assert out == ref, (word, a, b, out, ref)


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=5000), min_size=1, max_size=30)
)
def test_padding_length_classes_match_bit_length(spark, lens):
    rows = packing.padding_waste_census(
        _docs_of_lengths(spark, [0]), batch_size=4
    )  # warm path; real check below uses the raw expression
    df = spark.createDataFrame([(n,) for n in lens], "n int").select(
        "n",
        F.length(F.conv(F.col("n").cast("string"), 10, 2)).alias("len_class"),
    )
    got = {r["n"]: r["len_class"] for r in df.collect()}
    for n in lens:
        expect = max(n.bit_length(), 1)  # bin(0) = '0' has length 1
        assert got[n] == expect, (n, got[n], expect)


@settings(**_SETTINGS)
@given(
    lens=st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=25),
    size=st.sampled_from([16, 64]),
    stride=st.sampled_from([8, 32]),
)
def test_passage_chunks_closed_form_on_random_lengths(spark, lens, size, stride):
    d = _docs_of_lengths(spark, lens)
    row = packing.passage_chunks(d, size=size, stride=stride).collect()[0]
    total_chunks = total_ct = 0
    for n in lens:
        s = 0
        while n > 0:
            total_chunks += 1
            total_ct += min(size, n - s)
            if s + size >= n:
                break
            s += stride
    assert (row["total_chunks"], row["chunk_tokens"]) == (
        total_chunks,
        total_ct,
    ), (lens, size, stride)
