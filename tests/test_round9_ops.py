"""Round-9 operator tests: Gopher repetition char-fractions, stupid
backoff (Brants et al. 2007), Kneser-Ney continuation counts, CCNet
perplexity terciles, mT5 temperature mix. Differential coverage is in
test_differential.py (auto-parametrized over the registry); these are
semantic edge cases + scale-posture plan assertions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dumbo_spark.operators import packing, textstats
from dumbo_spark.plans.explain import physical_summary
from dumbo_spark.sources.catalog import load_table


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


# ── gopher_repetition_screen ────────────────────────────────────────────


def test_repetition_one_repeated_word_scores_one(spark):
    d = _docs(spark, [(1, "spam " * 20, "s")])
    row = textstats.gopher_repetition_screen(d).collect()[0]
    # every 2-gram is "spam spam": top2 covers all chars
    assert row["top2_char_frac"] == 1.0
    assert row["top3_char_frac"] == 1.0
    assert row["dup5_char_frac"] == 1.0
    assert not row["repetition_pass"]


def test_repetition_all_distinct_tokens(spark):
    d = _docs(spark, [(1, "a bb ccc dddd eeeee ffffff ggggggg", "s")])
    row = textstats.gopher_repetition_screen(d).collect()[0]
    assert row["dup5_char_frac"] == 0.0  # no duplicated 5-gram
    assert row["dup5_ok"]
    # top 2-gram is the lexicographically smallest among count-1 ties:
    # "a bb" = 3 of 28 total token chars (separator-free)
    assert row["top2_char_frac"] == round(3 / 28, 4)
    # NOTE a 7-token doc legitimately fails the top-3 threshold (its
    # single most frequent 3-gram necessarily covers > 18% of chars) —
    # the Gopher rules are calibrated for real document lengths


def test_repetition_short_and_empty_docs(spark):
    d = _docs(spark, [(1, "one", "s"), (2, "", "s"), (3, "a b", "s")])
    rows = {r["doc_id"]: r for r in textstats.gopher_repetition_screen(d).collect()}
    assert rows[2]["n_chars_tok"] == 0 and rows[2]["repetition_pass"]
    assert rows[1]["top2_char_frac"] == 0.0  # < 2 tokens: no 2-grams
    assert rows[1]["repetition_pass"]
    assert rows[3]["dup5_char_frac"] == 0.0
    # doc 3 "a b": its only 2-gram covers ALL chars → top2 fails, as
    # the char-fraction definition demands for degenerate tiny docs
    assert rows[3]["top2_char_frac"] == 1.0 and not rows[3]["repetition_pass"]


# ── stupid_backoff_scores ───────────────────────────────────────────────


def test_stupid_backoff_seen_trigram_scores_mle(spark):
    # train doc (even id) contains "a b c" once; scored doc (odd id) is
    # the same trigram → S = c3/c2 = 1/1, log10 = 0
    d = _docs(spark, [(0, "a b c", "s"), (1, "a b c", "s")])
    row = textstats.stupid_backoff_scores(d).collect()[0]
    assert row["doc_id"] == 1 and row["n_trigrams"] == 1
    assert row["mean_log10_s"] == 0.0


def test_stupid_backoff_oov_floor(spark):
    # scored trigram of tokens never seen in train → α³/N = 0.064/3
    d = _docs(spark, [(0, "a b c", "s"), (1, "x y z", "s")])
    row = textstats.stupid_backoff_scores(d).collect()[0]
    assert row["mean_log10_s"] == round(math.log10(0.4**3 / 3), 4)


def test_stupid_backoff_bigram_backoff(spark):
    # train: "a b" and "b c" bigrams but never "a b c" as a trigram
    # (separate docs); scored "a b c": c3 miss, backoff to
    # α·c2("b c")/c1("b") = 0.4·1/2 ("b" occurs in both train docs)
    d = _docs(spark, [(0, "a b", "s"), (2, "b c", "s"), (1, "a b c", "s")])
    row = textstats.stupid_backoff_scores(d).collect()[0]
    assert row["mean_log10_s"] == round(math.log10(0.4 * 1 / 2), 4)


# ── kn_continuation_counts ──────────────────────────────────────────────


def test_kn_francisco_effect(spark):
    # "francisco" frequent but only ever follows "san" → continuation
    # count 1; "paris" appears twice after distinct contexts → 2
    d = _docs(
        spark,
        [
            (1, "san francisco san francisco san francisco", "s"),
            (2, "in paris to paris", "s"),
        ],
    )
    rows = {r["tok"]: r for r in textstats.kn_continuation_counts(d).collect()}
    assert rows["francisco"]["c_total"] == 3
    assert rows["francisco"]["n_left_contexts"] == 1
    assert rows["paris"]["n_left_contexts"] == 2
    # doc-initial-only token: no left context (bigrams don't cross docs)
    assert rows["san"]["n_left_contexts"] == 1  # follows "francisco"
    assert rows["in"]["n_left_contexts"] == 0


def test_kn_cont_prob_normalizes_over_bigram_types(spark):
    d = _docs(spark, [(1, "a b a c", "s")])
    rows = {r["tok"]: r for r in textstats.kn_continuation_counts(d).collect()}
    # bigram types: (a,b),(b,a),(a,c) → 3; left contexts: b←a, a←b, c←a
    assert rows["b"]["cont_prob"] == round(1 / 3, 6)
    total = sum(r["n_left_contexts"] for r in rows.values())
    assert total == 3


# ── perplexity_tercile_mix ──────────────────────────────────────────────


def test_tercile_mix_counts_and_buckets(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = textstats.perplexity_tercile_mix(docs).collect()
    n = sum(r["n_docs"] for r in out)
    scored = textstats.doc_perplexity(docs).count()
    assert n == scored  # every scored doc lands in exactly one bucket
    buckets = {r["ppl_bucket"] for r in out}
    assert buckets == {"head", "middle", "tail"}
    # head has lower mean ppl than tail for every source present in both
    per = {(r["source"], r["ppl_bucket"]): r["avg_ppl"] for r in out}
    shared = {s for s, b in per if b == "head"} & {s for s, b in per if b == "tail"}
    assert shared, "fixture should populate head and tail for some source"
    # global invariant: the mean over head buckets < mean over tail
    head = [v for (s, b), v in per.items() if b == "head"]
    tail = [v for (s, b), v in per.items() if b == "tail"]
    assert max(head) < min(tail) or sum(head) / len(head) < sum(tail) / len(tail)


def test_tercile_sizes_are_exact(spark, sf_dir):
    """NTILE(3) bucket sizes must differ by at most 1 — the permanent
    live guard on the round-9 rank-machinery fix (this consumer keeps
    extra columns, the pruning-divergent shape)."""
    docs = load_table(spark, sf_dir, "documents")
    out = textstats.perplexity_tercile_mix(docs).collect()
    sizes = {}
    for r in out:
        sizes[r["ppl_bucket"]] = sizes.get(r["ppl_bucket"], 0) + r["n_docs"]
    assert len(sizes) == 3
    assert max(sizes.values()) - min(sizes.values()) <= 1


# ── source_temperature_mix ──────────────────────────────────────────────


def test_temperature_mix_dampens_head_boosts_tail(spark):
    d = _docs(
        spark,
        [(i, "w " * 100, "big") for i in range(9)] + [(9, "w " * 10, "small")],
    )
    rows = {r["source"]: r for r in packing.source_temperature_mix(d).collect()}
    assert rows["big"]["oversample_factor"] < 1.0
    assert rows["small"]["oversample_factor"] > 1.0
    # temperature shares still sum to 1
    assert abs(sum(r["p_temperature"] for r in rows.values()) - 1.0) < 1e-4


def test_temperature_alpha_one_is_natural(spark):
    d = _docs(spark, [(1, "a b c", "x"), (2, "d e", "y")])
    rows = packing.source_temperature_mix(d, alpha=1.0).collect()
    for r in rows:
        assert r["p_natural"] == r["p_temperature"]
        assert r["oversample_factor"] == 1.0


# ── scale posture ───────────────────────────────────────────────────────


@pytest.mark.parametrize(
    "build",
    [
        lambda d: textstats.gopher_repetition_screen(d),
        lambda d: textstats.stupid_backoff_scores(d),
        lambda d: textstats.kn_continuation_counts(d),
        lambda d: packing.source_temperature_mix(d),
    ],
)
def test_round9_ops_stay_jvm_side(spark, sf_dir, build):
    s = physical_summary(build(load_table(spark, sf_dir, "documents")))
    assert s["python_evals"] == 0, "hot path must stay in codegen"


def test_tercile_mix_rides_fixed_rank_machinery(spark, sf_dir):
    s = physical_summary(
        textstats.perplexity_tercile_mix(load_table(spark, sf_dir, "documents"))
    )
    assert s["python_evals"] == 0
    # the checkpoint barrier + _pid window is the post-round-9 signature
    assert "existingrdd" in s["plan"].lower()
    assert "_pid" in s["plan"]


def test_repetition_screen_no_global_window(spark, sf_dir):
    s = physical_summary(
        textstats.gopher_repetition_screen(load_table(spark, sf_dir, "documents"))
    )
    # the top-1 windows partition by doc_id — no empty partition spec
    # (a single-task global sort would be a 100 TB scale killer)
    import re

    assert not re.search(r"Window .*partitionBy=\[\]", s["plan"])


# ── knn_cosine_ivfpq (IVFADC: coarse cells + residual PQ) ───────────────


def test_ivfpq_codes_shape_and_ranges(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    coded = similarity.ivfpq_codes(emb).collect()
    assert len(coded) == emb.count()
    cells = {r["cell"] for r in coded}
    assert cells <= set(range(16)) and len(cells) > 1
    for r in coded[:50]:
        assert len(r["codes"]) == 16
        assert all(0 <= c < 32 for c in r["codes"])


def test_ivfpq_deterministic_across_runs(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    a = sorted(map(tuple, similarity.knn_cosine_ivfpq(emb).collect()))
    b = sorted(map(tuple, similarity.knn_cosine_ivfpq(emb).collect()))
    assert a == b and len(a) == 40  # 8 queries x k=5


def test_ivfpq_recall_floor_vs_exact(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_cosine(emb).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in similarity.knn_cosine_ivfpq(emb).collect()
    }
    # measured 14/40 = 0.35 on the near-isotropic fixtures (cell
    # pruning discards true neighbors that land in unprobed cells —
    # random data is IVF's worst case, no cluster structure); gate at
    # 0.2 to absorb fixture regeneration while failing a broken
    # residual-coding or probe path (which craters toward 0)
    assert len(ex & got) >= 0.2 * len(ex)


def test_ivfpq_probes_prune_the_candidate_set(spark, sf_dir):
    from dumbo_spark.operators import similarity
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    index = similarity._ivfpq_index(emb, 16, 16, 32, 2048)
    coded = similarity.ivfpq_codes(emb, index=index)
    sizes = {r["cell"]: r["n"] for r in coded.groupBy("cell").agg(
        F.count("*").alias("n")).collect()}
    n = sum(sizes.values())
    # 4 probed cells can never cover the whole corpus unless 12 cells
    # are empty — the pruning that makes IVFADC scan ~n_probe/n_cells
    assert sum(sorted(sizes.values(), reverse=True)[:4]) < n


def test_ivfpq_scoring_is_broadcast_jvm_lookups(spark, sf_dir):
    from dumbo_spark.operators import similarity
    from dumbo_spark.plans.explain import physical_summary

    emb = load_table(spark, sf_dir, "embeddings")
    s = physical_summary(similarity.knn_cosine_ivfpq(emb))
    # queries (with their m x ksub lookup tables) broadcast to the
    # coded corpus; the only Python eval is the Arrow coding pass
    assert "broadcast" in s["plan"].lower()
    assert s["python_evals"] <= 1


def test_ivfpq_recall_gate_passes_on_fixtures(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    row = similarity.ivfpq_recall_checked(emb).collect()[0]
    assert row["n_queries"] == 8 and row["n_exact_pairs"] == 40
    assert row["ivfpq_recall_ok"]
    assert row["n_hits"] >= 8  # 0.2 gate at 40 pairs


# ── greedy_pack_bins (first-fit whole-document packing) ─────────────────


def test_greedy_pack_never_overflows_except_oversized_singletons(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = packing.greedy_pack_bins(docs, budget=256, buckets=8).collect()
    for r in rows:
        # a bin over budget must be a single oversized document
        assert r["bin_tokens"] <= 256 or r["n_docs"] == 1
        assert r["bin_slack"] == 256 - r["bin_tokens"]


def test_greedy_pack_conserves_tokens_and_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    from dumbo_spark.operators.packing import _doc_perm

    got = packing.greedy_pack_bins(docs, budget=256, buckets=8).agg(
        F.sum("n_docs").alias("d"), F.sum("bin_tokens").alias("t")
    ).collect()[0]
    want = _doc_perm(docs, 8).agg(
        F.count("*").alias("d"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert (got["d"], got["t"]) == (want["d"], want["t"])


def test_greedy_pack_first_fit_fold_semantics(spark):
    # stream of known sizes in one group: 100, 100, 100, 300, 50, 0, 200
    # with budget 256 → bins [100+100], [100], [300], [50+0+200]
    docs = _docs(
        spark,
        [(i, "w " * n, "s") for i, n in enumerate([100, 100, 100, 300, 50, 0, 200])],
    )
    # pin the permutation to doc_id order by monkey-packing via buckets=1
    # and replacing the md5 key sort with known ids is NOT possible from
    # outside — instead recompute the expected fold over the ACTUAL
    # permutation order, then compare
    from dumbo_spark.operators.packing import _doc_perm

    perm = (
        _doc_perm(docs, 1)
        .orderBy("_k", "doc_id")
        .select("doc_id", "n_tokens")
        .collect()
    )
    bins, bin_id, fill = {}, 0, 0
    for r in perm:
        n = r["n_tokens"]
        if fill > 0 and fill + n > 256:
            bin_id += 1
            fill = n
        else:
            fill += n
        bins.setdefault(bin_id, [0, 0])
        bins[bin_id][0] += 1
        bins[bin_id][1] += n
    got = {
        r["bin_id"]: (r["n_docs"], r["bin_tokens"])
        for r in packing.greedy_pack_bins(docs, budget=256, buckets=1).collect()
    }
    assert got == {b: tuple(v) for b, v in bins.items()}
    # the 300-token doc is alone in its bin with negative slack
    oversized = [
        r for r in packing.greedy_pack_bins(docs, budget=256, buckets=1).collect()
        if r["bin_tokens"] > 256
    ]
    assert len(oversized) == 1 and oversized[0]["n_docs"] == 1


# ── bpe_learn_merges (distributed BPE training loop) ────────────────────


def test_bpe_ltr_overlap_scan(spark):
    # "aaa" x2: round 1 merges (a,a) — LTR non-overlapping gives
    # [aa, a], NOT [a, aa]; round 2 must therefore merge (aa, a)
    d = _docs(spark, [(1, "aaa aaa", "s")])
    rows = textstats.bpe_learn_merges(d, n_merges=2).collect()
    assert [(r["merge_rank"], r["left_sym"], r["right_sym"]) for r in rows] == [
        (1, "a", "a"),
        (2, "aa", "a"),
    ]
    assert rows[0]["pair_count"] == 4  # 2 positions x word freq 2


def test_bpe_tie_breaks_lexicographic(spark):
    # "ab" and "ba" both appear twice: pair counts tie at 2 → (a,b) wins
    d = _docs(spark, [(1, "ab ab ba ba", "s")])
    rows = textstats.bpe_learn_merges(d, n_merges=1).collect()
    assert (rows[0]["left_sym"], rows[0]["right_sym"]) == ("a", "b")


def test_bpe_stops_when_nothing_left_to_merge(spark):
    # single-char vocabulary: no pairs at all → 0 merges, not a crash
    d = _docs(spark, [(1, "a b c a b", "s")])
    assert textstats.bpe_learn_merges(d, n_merges=3).count() == 0


def test_bpe_merge_frequency_monotone_on_fixtures(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        textstats.bpe_learn_merges(docs, n_merges=4).collect(),
        key=lambda r: r["merge_rank"],
    )
    assert len(rows) == 4
    # greedy BPE within a round picks the max — counts can rise after a
    # merge creates a new symbol, but round 1 must dominate round 2's
    # count only if round 2's pair existed in round 1; the universally
    # safe invariant is positivity + rank integrity
    assert all(r["pair_count"] > 0 for r in rows)
    assert [r["merge_rank"] for r in rows] == [1, 2, 3, 4]


# ── padding_waste_census (length-bucketed dynamic batching) ─────────────


def test_padding_waste_identical_lengths_is_zero(spark):
    # all docs same token count → pad-to-batch-max wastes nothing
    d = _docs(spark, [(i, "a b c d", "s") for i in range(10)])
    rows = packing.padding_waste_census(d, batch_size=4).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["len_class"] == 3 and (r["seq_lo"], r["seq_hi"]) == (4, 7)
    assert r["waste_pct"] == 0.0 and r["padded_tokens"] == r["total_tokens"]
    assert r["n_docs"] == 10


def test_padding_waste_mixed_lengths_within_class(spark):
    # lengths 4 and 7 share class 3 ([4, 7]); one shard-batch of both
    # pads the 4 up to 7
    d = _docs(spark, [(1, "a b c d", "s"), (2, "a b c d e f g", "s")])
    rows = packing.padding_waste_census(d, batch_size=32, buckets=1).collect()
    r = rows[0]
    assert r["n_batches"] == 1 and r["total_tokens"] == 11
    assert r["padded_tokens"] == 14  # 2 rows x max 7
    assert r["waste_pct"] == round(3 / 14, 4)


def test_padding_waste_class_boundaries_are_exact(spark):
    # 8 tokens is class 4 (seq_lo 8), 7 tokens class 3 — the integer
    # log2 must not wobble at the power-of-two boundary
    d = _docs(
        spark,
        [(1, " ".join(["w"] * 7), "s"), (2, " ".join(["w"] * 8), "s")],
    )
    got = {
        r["len_class"]: (r["seq_lo"], r["seq_hi"])
        for r in packing.padding_waste_census(d).collect()
    }
    assert got == {3: (4, 7), 4: (8, 15)}


def test_bpe_compression_counts_on_known_corpus(spark):
    # vocab {ab:2, cd:1}: merges (a,b) then (c,d); init symbols =
    # 2*2 + 2*1 = 6, final = 2*1 + 1*1 = 3 → 50% compression
    d = _docs(spark, [(1, "ab ab cd", "s")])
    r = textstats.bpe_compression_stats(d, n_merges=2).collect()[0]
    assert (r["n_merges"], r["total_words"]) == (2, 3)
    assert (r["init_symbols"], r["final_symbols"]) == (6, 3)
    assert r["compression_pct"] == 0.5


# ── cms_hitters_checked (count-min sketch + theorem check) ──────────────


def test_cms_overestimate_theorem_holds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = textstats.cms_hitters_checked(docs).collect()
    assert len(rows) == 20
    # estimate >= exact is a theorem (min of sums each containing the
    # true count), not a probabilistic bound — must hold for every row
    assert all(r["overestimate_ok"] for r in rows)
    assert all(r["cms_estimate"] >= r["exact_cnt"] for r in rows)


def test_cms_exact_when_no_collisions(spark):
    # 3 distinct words in 64 buckets x4 rows: min over rows recovers
    # exact counts unless all 4 rows collide (md5 makes that absurd)
    d = _docs(spark, [(1, "alpha alpha beta gamma", "s")])
    rows = textstats.cms_hitters_checked(d, k=3).collect()
    got = {r["word"]: (r["exact_cnt"], r["cms_estimate"]) for r in rows}
    assert got == {"alpha": (2, 2), "beta": (1, 1), "gamma": (1, 1)}


# ── filter_funnel_report (curation funnel attrition) ────────────────────


def test_funnel_conservation_and_order(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted(
        textstats.filter_funnel_report(docs).collect(),
        key=lambda r: r["rule_order"],
    )
    assert [r["rule"] for r in rows] == [
        "nonempty", "word_count", "mean_word_len",
        "alpha_frac", "stopwords", "repetition",
    ]
    assert rows[0]["n_input"] == docs.count()
    for prev, cur in zip(rows, rows[1:]):
        # each rule's input is exactly the previous rule's survivors
        assert cur["n_input"] == prev["n_pass"]
    for r in rows:
        assert r["n_fail"] == r["n_input"] - r["n_pass"] >= 0


def test_funnel_empty_doc_fails_nonempty(spark):
    d = _docs(spark, [(1, "", "s"),
                      (2, "the cat and the dog sat on the mat and the cat "
                          "ran to the dog while the mat sat still", "s")])
    rows = {r["rule"]: r for r in textstats.filter_funnel_report(d).collect()}
    assert rows["nonempty"]["n_input"] == 2
    assert rows["nonempty"]["n_fail"] == 1  # the zero-token doc


# ── matryoshka_fidelity + interleaved_mix_head ──────────────────────────


def test_matryoshka_full_dim_is_identity(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r["dim"]: r for r in
            similarity.matryoshka_fidelity(emb, dims=(64,)).collect()}
    # truncating to the full width must reproduce the exact top-k
    assert rows[64]["n_hits"] == rows[64]["n_exact_pairs"]
    assert rows[64]["overlap_pct"] == 1.0


def test_matryoshka_overlap_tends_up_with_dim(spark, sf_dir):
    from dumbo_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = {r["dim"]: r["n_hits"] for r in
            similarity.matryoshka_fidelity(emb).collect()}
    assert set(rows) == {8, 16, 32}
    # random projections aren't strictly monotone, but the 32-dim half
    # must beat the 8-dim prefix on any non-adversarial fixture
    assert rows[32] >= rows[8]


def test_interleave_positions_round_robin(spark):
    # 2 sources x 3 docs: positions must alternate a,b,a,b,a,b
    d = _docs(
        spark,
        [(i, f"doc {i}", "a") for i in range(3)]
        + [(10 + i, f"doc {10+i}", "b") for i in range(3)],
    )
    rows = packing.interleaved_mix_head(d, head=6).collect()
    assert [r["position"] for r in rows] == [0, 1, 2, 3, 4, 5]
    assert [r["source"] for r in rows] == ["a", "b", "a", "b", "a", "b"]


def test_interleave_positions_unique_and_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = packing.interleaved_mix_head(docs).collect()
    b = packing.interleaved_mix_head(docs).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len({r["position"] for r in a}) == len(a) == 24


def test_passage_chunks_closed_form_vs_enumeration(spark):
    # brute-force the chunk enumeration for assorted lengths and
    # compare to the closed form
    lens = [0, 1, 31, 32, 33, 63, 64, 65, 70, 100, 129]
    d = _docs(spark, [(i, " ".join(["w"] * n), f"s{i}") for i, n in enumerate(lens)])
    got = {r["source"]: (r["total_chunks"], r["chunk_tokens"])
           for r in packing.passage_chunks(d).collect()}
    for i, n in enumerate(lens):
        # standard stride enumeration: stop once a window reaches the
        # end (no chunk starts inside an already-complete window)
        chunks, s = [], 0
        while n > 0:
            chunks.append(min(64, n - s))
            if s + 64 >= n:
                break
            s += 32
        assert got[f"s{i}"] == (len(chunks), sum(chunks)), (n, got[f"s{i}"])


@pytest.mark.parametrize(
    "build",
    [
        lambda d: packing.padding_waste_census(d),
        lambda d: packing.interleaved_mix_head(d),
        lambda d: packing.passage_chunks(d),
        lambda d: textstats.cms_hitters_checked(d),
        lambda d: textstats.filter_funnel_report(d),
    ],
)
def test_round9_batch2_ops_stay_jvm_side(spark, sf_dir, build):
    from dumbo_spark.plans.explain import physical_summary

    s = physical_summary(build(load_table(spark, sf_dir, "documents")))
    assert s["python_evals"] == 0, "hot path must stay in codegen"


def test_greedy_pack_is_single_arrow_fold(spark, sf_dir):
    from dumbo_spark.plans.explain import physical_summary

    s = physical_summary(
        packing.greedy_pack_bins(load_table(spark, sf_dir, "documents"))
    )
    # exactly one Python boundary: the per-bucket applyInPandas fold
    assert s["python_evals"] == 1


# ── ewma_event_volume (exact-arithmetic exponential smoothing) ──────────


def test_ewma_matches_float_recurrence(spark):
    import datetime

    rows = []
    counts = [8, 4, 12, 4, 20, 1, 7]
    eid = 0
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + d, 12, 0, 0), 1, "click", 1.0, "{}")
            )
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string"
    )
    from dumbo_spark.operators import events as E

    got = {r["day"]: (r["n_events"], r["ewma"])
           for r in E.ewma_event_volume(ev).collect()}
    s = None
    for d, c in enumerate(counts):
        s = c if s is None else 0.75 * s + 0.25 * c
        day = f"2024-01-{1 + d:02d}"
        assert got[day][0] == c
        # output is rounded to 6dp; the underlying sum is exact
        assert got[day][1] == round(s, 6), (day, got[day], s)


def test_ewma_smooths_toward_baseline(spark, sf_dir):
    from dumbo_spark.operators import events as E

    ev = load_table(spark, sf_dir, "events")
    rows = E.ewma_event_volume(ev).collect()
    # variance of the smoothed series must be below the raw series'
    import statistics

    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append((r["day"], r["n_events"], r["ewma"]))
    for t, xs in by_type.items():
        xs.sort()
        raw = [x for _, x, _ in xs]
        sm = [e for _, _, e in xs]
        if len(raw) > 2 and statistics.pvariance(raw) > 0:
            assert statistics.pvariance(sm) <= statistics.pvariance(raw)
