"""Round-14 operator semantics: substring_dedup_trim (the ExactSubstr
REMOVAL half) and the planted-duplicate semantic_dedup registration."""

import pyspark.sql.functions as F

from dumbo_spark.operators import dedup


def _trim(spark, rows, w=5):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.substring_dedup_trim(df, window_tokens=w)
    return {r["doc_id"]: r.asDict() for r in out.collect()}


def test_trim_excises_shared_span_from_later_doc_only(spark):
    span = "a b c d e"  # exactly w=5 tokens
    rows = [
        (1, f"{span} unique tail one"),
        (2, f"other head {span} two"),
        (3, "completely novel text with no shared span at all"),
    ]
    got = _trim(spark, rows)
    # keeper (min doc_id) keeps everything
    assert got[1]["n_removed"] == 0
    assert got[1]["kept_text"] == "a b c d e unique tail one"
    # later doc loses exactly the 5 covered positions, order preserved
    assert got[2]["n_removed"] == 5
    assert got[2]["kept_text"] == "other head two"
    # untouched doc round-trips as its token rejoin
    assert got[3]["n_removed"] == 0
    assert got[3]["kept_text"].startswith("completely novel")


def test_trim_fully_duplicated_doc_becomes_empty_not_missing(spark):
    text = "one two three four five six"
    got = _trim(spark, [(10, text), (20, text)])
    assert got[10]["n_removed"] == 0 and got[10]["kept_text"] == text
    # every position of doc 20 is covered by some shared 5-window
    assert got[20]["kept_text"] == ""
    assert got[20]["n_removed"] == got[20]["n_tokens"] == 6
    assert set(got) == {10, 20}  # the trimmed-empty doc still emits a row


def test_trim_short_and_empty_docs_pass_through(spark):
    got = _trim(spark, [(1, "too short"), (2, ""), (3, None)])
    for d in (1, 2, 3):
        assert got[d]["n_removed"] == 0
    assert got[1]["kept_text"] == "too short"
    assert got[2]["kept_text"] == "" and got[2]["n_tokens"] == 0
    assert got[3]["kept_text"] == "" and got[3]["n_tokens"] == 0


def test_trim_overlapping_windows_cover_union_of_positions(spark):
    # docs share a 7-token span -> three overlapping 5-windows in the
    # later doc; covered set is the UNION (7 positions), not 15
    span = "p q r s t u v"
    got = _trim(spark, [(1, f"{span} alpha"), (2, f"beta {span} gamma")])
    assert got[2]["n_removed"] == 7
    assert got[2]["kept_text"] == "beta gamma"


def test_trim_matches_pure_python_reference(spark):
    # randomized cross-check on a seeded corpus with heavy overlap
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    base = [rng.choice(vocab) for _ in range(40)]
    docs = {}
    for d in range(8):
        if d % 2:
            start = rng.randrange(0, 20)
            chunk = base[start : start + 15]
            extra = [rng.choice(vocab) for _ in range(10)]
            docs[d] = extra[:5] + chunk + extra[5:]
        else:
            docs[d] = [rng.choice(vocab) for _ in range(30)]
    w = 5

    # pure-python reference of the documented rule
    from collections import defaultdict

    owners = defaultdict(set)
    occs = defaultdict(list)
    for d, toks in docs.items():
        for p in range(len(toks) - w + 1):
            wh = tuple(toks[p : p + w])
            owners[wh].add(d)
            occs[wh].append((d, p))
    covered = defaultdict(set)
    for wh, ds in owners.items():
        if len(ds) >= 2:
            keeper = min(ds)
            for d, p in occs[wh]:
                if d != keeper:
                    covered[d].update(range(p, p + w))
    expect = {
        d: " ".join(t for i, t in enumerate(toks) if i not in covered[d])
        for d, toks in docs.items()
    }

    rows = [(d, " ".join(toks)) for d, toks in docs.items()]
    got = _trim(spark, rows, w=w)
    for d in docs:
        assert got[d]["kept_text"] == expect[d], d
        assert got[d]["n_removed"] == len(covered[d])
