"""Property tests for the round-11 engine-neutral index machinery:
the distributed integer-exact Lloyd k-means must match an INDEPENDENT
pure-python reference implementation bit-for-bit on arbitrary
generated inputs — a third leg next to the DuckDB oracle (which shares
the SQL formulation) and the fixture differential."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

KM_QUANT = 1_000_000


def _py_kmeans(rows, n_cells, n_iter):
    """Reference Lloyd: same contract as similarity.det_kmeans_cells —
    floor(e*1e6) quantization, md5-smallest seeding, exact integer
    squared-distance argmin with cell tie-break, floor-division
    centroid update, empty cells keep their centers."""
    import math

    x = {vid: [math.floor(e * KM_QUANT) for e in emb] for vid, emb in rows}
    seeds = sorted(
        x, key=lambda v: (hashlib.md5(str(v).encode()).hexdigest(), v)
    )[:n_cells]
    centers = [list(x[v]) for v in seeds]
    k = len(centers)

    def assign():
        out = {}
        for vid, xv in x.items():
            best = min(
                range(k),
                key=lambda c: (
                    sum((a - b) * (a - b) for a, b in zip(xv, centers[c])),
                    c,
                ),
            )
            out[vid] = best
        return out

    for _ in range(n_iter):
        a = assign()
        groups: dict[int, list] = {}
        for vid, c in a.items():
            groups.setdefault(c, []).append(x[vid])
        for c, members in groups.items():
            n = len(members)
            # the contract is floor of the IEEE double quotient (what
            # the DuckDB oracle computes); equals // below 2^53
            centers[c] = [
                math.floor(sum(m[i] for m in members) / n)
                for i in range(len(members[0]))
            ]
    return assign(), centers


@st.composite
def kmeans_case(draw):
    dim = draw(st.integers(min_value=2, max_value=6))
    n = draw(st.integers(min_value=4, max_value=40))
    vals = draw(
        st.lists(
            st.lists(
                st.floats(
                    min_value=-100,
                    max_value=100,
                    allow_nan=False,
                    allow_infinity=False,
                ),
                min_size=dim,
                max_size=dim,
            ),
            min_size=n,
            max_size=n,
        )
    )
    n_cells = draw(st.integers(min_value=2, max_value=5))
    n_iter = draw(st.integers(min_value=1, max_value=3))
    return [(i, v) for i, v in enumerate(vals)], n_cells, n_iter


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=kmeans_case())
def test_det_kmeans_matches_python_reference(spark, case):
    from dumbo_spark.operators.similarity import det_kmeans_cells

    rows, n_cells, n_iter = case
    # array<double> so the reference sees EXACTLY the values Spark
    # sees (array<float> would truncate to float32 on one side only)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    assigned, centers = det_kmeans_cells(emb, n_cells=n_cells, n_iter=n_iter)
    got = {r.vec_id: r.cell for r in assigned.collect()}
    want_assign, want_centers = _py_kmeans(rows, n_cells, n_iter)
    assert got == want_assign
    assert [list(c) for c in centers] == want_centers


# ── md5 MinHash-LSH verified pairs vs python reference ──────────────────


def _py_fuzzy_md5(docs, k=32, bands=8, rows_per_band=4, min_matches=12):
    """Reference for dedup.dedup_fuzzy_verified_md5: lower+\\W+ tokens,
    space-joined 3-shingles, 32-wise md5 minhash (r13: four 8-hex-char
    lanes sliced from each of 8 digests), 8x4 banding,
    >= min_matches component screen, exact integer-threshold Jaccard
    (10·|∩| >= 7·|∪|)."""
    import re

    def shingles(text):
        toks = [t for t in re.split(r"\W+", text.lower()) if t]
        return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]

    sig = {}
    sets = {}
    for did, text in docs:
        sh = shingles(text)
        if not sh:
            continue
        sets[did] = set(sh)
        sig[did] = [
            min(
                hashlib.md5(f"{i // 4}:{s}".encode()).hexdigest()[
                    (i % 4) * 8 : (i % 4) * 8 + 8
                ]
                for s in sh
            )
            for i in range(k)
        ]
    buckets: dict[str, list] = {}
    for did, s in sig.items():
        for t in range(bands):
            key = hashlib.md5(
                (f"{t}|" + "".join(s[t * rows_per_band : (t + 1) * rows_per_band])).encode()
            ).hexdigest()
            buckets.setdefault(key, []).append(did)
    cands = set()
    for ids in buckets.values():
        for a in ids:
            for b in ids:
                if a < b:
                    cands.add((a, b))
    out = set()
    for a, b in cands:
        m = sum(1 for i in range(k) if sig[a][i] == sig[b][i])
        if m < min_matches:
            continue
        c = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if 10 * c >= 7 * u:
            out.add((a, b))
    return out


_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf"]


@st.composite
def corpus_case(draw):
    n = draw(st.integers(min_value=2, max_value=10))
    docs = []
    for i in range(n):
        # small word pool + short docs => planted collisions are
        # common, so both branches (pair kept / pair rejected) run
        words = draw(
            st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8)
        )
        docs.append((i, " ".join(words)))
    return docs


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_case())
def test_fuzzy_md5_matches_python_reference(spark, docs):
    from dumbo_spark.operators.dedup import dedup_fuzzy_verified_md5

    d = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        (r.doc_a, r.doc_b) for r in dedup_fuzzy_verified_md5(d).collect()
    }
    assert got == _py_fuzzy_md5(docs)
