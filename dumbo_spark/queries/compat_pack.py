"""Compat veneer, multimodal plumbing, packing, and Q11/Q15 composition shapes — mechanically split out of registry.py in round 13
(VERDICT r12 Next #7: no source file over 3k lines). Pure move, no
behavior change: registration order is preserved by the import
sequence in dumbo_spark/registry.py, and each query/oracle pair stays
adjacent exactly as it was."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from dumbo_spark.operators import (  # noqa: F401
    agg,
    analytics,
    dedup,
    dq,
    events,
    graph,
    joins,
    packing,
    sampling,
    setops,
    shape,
    similarity,
    temporal,
    textstats,
    topk,
)
from dumbo_spark.queries._base import (  # noqa: F401
    DUCK_TOKENS,
    QUERIES,
    Query,
    QueryFn,
    _in_list,
    register,
)
from dumbo_spark.sources.catalog import load_table  # noqa: F401
from dumbo_spark.queries.dedup_sim import (  # shared oracle helpers
    _GOPHER_REP_SQL,
    _duck_dot,
)

# ═══ M4: compat veneer + multimodal plumbing ════════════════════════════


@register(
    "compat_wordcount",
    oracle=f"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
    GROUP BY word
    """,
)
def q_compat_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """examples/wordcount.py run through the compat veneer — the same
    mapper/reducer/combiner callables dumbo users write, executed on
    mapInPandas + applyInPandas, asserted against the same oracle as
    the DataFrame-native `wordcount`."""
    import re

    from dumbo_spark.compat.mapred import map_reduce

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("key"), F.col("text").alias("value")
    )

    def mapper(k, v):
        if v:
            for w in re.split(r"\W+", v.lower()):
                if w:
                    yield (w, 1.0)

    def reducer(k, vals):
        yield (k, float(sum(vals)))

    out = map_reduce(
        docs, mapper, reducer, combiner=reducer, output_schema="word string, cnt double"
    )
    return out.select("word", F.col("cnt").cast("long").alias("cnt"))


@register(
    "repetition_score",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 3
                  THEN list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                  ELSE [] END AS grams
      FROM toks)
    SELECT doc_id,
           CAST(len(grams) AS INTEGER) AS n_grams,
           CAST(len(list_distinct(grams)) AS INTEGER) AS n_distinct,
           CASE WHEN len(grams) > 0
                THEN ROUND(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)
                                 / len(grams), 4)
                ELSE 0.0 END AS rep_ratio
    FROM g
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repetition_score(load_table(spark, sf_dir, "documents"), n=3)


@register(
    "token_entropy",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY doc_id, tok)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           ROUND(log2(SUM(c)) - SUM(c * log2(c)) / SUM(c), 4) AS entropy_bits
    FROM tf GROUP BY doc_id
    """,
)
def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per doc (textstats.token_entropy) —
    vocabulary-diversity quality signal; two partial-agg shuffles,
    H = log2(N) − Σc·log2(c)/N computed identically in both engines."""
    return textstats.token_entropy(load_table(spark, sf_dir, "documents"))


# Shared contamination-score SQL (round 10): benchmark_contamination
# returns it whole; decontamination_census wraps it with the removal
# rule and per-source census.
_CONTAM_SQL = f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    g AS (
      SELECT doc_id,
             list_distinct(
               CASE WHEN len(t) >= 3
                    THEN list_transform(range(1, len(t) - 1),
                                        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                    ELSE [] END) AS grams
      FROM toks),
    eval_g AS (
      SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 20 = 0),
    corpus AS (
      SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 20 <> 0)
    SELECT c.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_contaminated,
           ROUND(CAST(SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 4) AS contamination
    FROM corpus c LEFT JOIN eval_g e USING (gram)
    GROUP BY c.doc_id
    """


@register("benchmark_contamination", oracle=_CONTAM_SQL)
def q_benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.benchmark_contamination(
        load_table(spark, sf_dir, "documents"), n=3, eval_mod=20
    )


@register(
    "bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len({DUCK_TOKENS}) AS INTEGER) AS n_ws_tokens,
           CAST(len(list_filter(
                 regexp_extract_all(text,
                   '''s|''t|''re|''ve|''m|''ll|''d| ?\\p{{L}}+| ?\\p{{N}}+| ?[^\\s\\p{{L}}\\p{{N}}]+|\\s+'),
                 t -> NOT regexp_matches(t, '^\\s+$'))) AS INTEGER) AS n_bpe_tokens,
           CAST(length(text) AS INTEGER) AS n_chars
    FROM documents
    """,
)
def q_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Java and RE2 run the byte-identical GPT-2-style split pattern
    (common-subset regex, no lookahead), so the oracle is a full
    value hash, not an approximation."""
    return textstats.bpe_token_count(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_by_source",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_unique,
           ROUND(1.0 - CAST(COUNT(DISTINCT md5(text)) AS DOUBLE) / COUNT(*), 4)
             AS dup_ratio
    FROM documents GROUP BY source
    """,
)
def q_dedup_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_by_source(load_table(spark, sf_dir, "documents"))


@register(
    "embedding_centroids",
    oracle="""
    SELECT label, CAST(pos AS INTEGER) AS pos,
           ROUND(AVG(v), 4) + 0.0 AS centroid_v
    FROM (
      SELECT label,
             unnest(range(0, len(embedding))) AS pos,
             unnest(embedding) AS v
      FROM embeddings)
    GROUP BY label, pos
    """,
)
def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.embedding_centroids(load_table(spark, sf_dir, "embeddings"))


@register(
    "multimodal_features",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS h
      FROM documents)
    SELECT doc_id, n_bytes, h AS content_md5,
           CAST(64 + ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                      + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 192
                AS INTEGER) AS width,
           CAST(64 + ((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                      + strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 192
                AS INTEGER) AS height
    FROM m
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dumbo_spark.operators import multimodal

    return multimodal.multimodal_features(load_table(spark, sf_dir, "documents"))


# ═══ round-4 batch 3: packing, heavy hitters, Q11/Q15 shapes ═══════════


@register(
    "sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             len({DUCK_TOKENS}) AS n_tokens,
             CAST({sampling.sql_md5_bucket('doc_id', 8)} AS INTEGER) AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    c AS (
      SELECT source, bucket, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source, bucket
                                 ORDER BY k, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM d)
    SELECT source, bucket,
           CAST(FLOOR((cum - n_tokens) / 256.0) AS BIGINT) AS pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM c GROUP BY source, bucket, pack_id
    """,
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence-packing census (packing.sequence_packing):
    per-(source, md5-bucket) deterministic concatenation split at
    256-token boundaries — every window task bounded by one bucket."""
    return packing.sequence_packing(
        load_table(spark, sf_dir, "documents"), budget=256, buckets=8
    )


# Shared first-fit fold oracle (round 9): the batch operator and its
# streaming twin settle to the identical bin census, so both
# registrations hash against this one recursive-CTE replay.
_GREEDY_PACK_SQL = f"""
    WITH RECURSIVE o AS MATERIALIZED (
      SELECT source, bucket, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source, bucket
                                ORDER BY k, doc_id) AS rn
      FROM (
        SELECT doc_id, source,
               CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,
               CAST({sampling.sql_md5_bucket('doc_id', 8)} AS INTEGER)
                 AS bucket,
               md5(CAST(doc_id AS VARCHAR)) AS k
        FROM documents)),
    walk(source, bucket, rn, n_tokens, bin_id, fill, in_bin) AS (
      SELECT source, bucket, rn, n_tokens, CAST(0 AS BIGINT), n_tokens,
             CAST(1 AS BIGINT)
      FROM o WHERE rn = 1
      UNION ALL
      SELECT n.source, n.bucket, n.rn, n.n_tokens,
             CASE WHEN w.in_bin > 0 AND w.fill + n.n_tokens > {packing.PACK_BUDGET}
                  THEN w.bin_id + 1 ELSE w.bin_id END,
             CASE WHEN w.in_bin > 0 AND w.fill + n.n_tokens > {packing.PACK_BUDGET}
                  THEN n.n_tokens ELSE w.fill + n.n_tokens END,
             CASE WHEN w.in_bin > 0 AND w.fill + n.n_tokens > {packing.PACK_BUDGET}
                  THEN 1 ELSE w.in_bin + 1 END
      FROM walk w
      JOIN o n ON n.source = w.source AND n.bucket = w.bucket
              AND n.rn = w.rn + 1)
    SELECT source, bucket, bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens,
           CAST({packing.PACK_BUDGET} - SUM(n_tokens) AS BIGINT) AS bin_slack
    FROM walk GROUP BY source, bucket, bin_id
    """


@register(
    "greedy_pack_bins",
    # The first-fit fold replayed as a recursive CTE: one step per
    # document position per (source, bucket) group, carrying (bin_id,
    # fill). `o` is MATERIALIZED so the tokenization pass isn't
    # re-inlined into every recursion step.
    oracle=_GREEDY_PACK_SQL,
)
def q_greedy_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-fit whole-document packing census (packing.
    greedy_pack_bins): the no-splitting variant of sequence_packing —
    a sequential fold per (source, md5-bucket) stream that prefix-sum
    windows cannot express, run as one Arrow-batched applyInPandas
    fold per bucket and oracle-replayed as a recursive CTE."""
    return packing.greedy_pack_bins(
        load_table(spark, sf_dir, "documents"),
        budget=packing.PACK_BUDGET,
        buckets=8,
    )


@register("streaming_greedy_packing", oracle=_GREEDY_PACK_SQL)
def q_streaming_greedy_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming first-fit packing
    (streaming/runners.streaming_greedy_packing): the fold's open-bin
    state carried across three rank-range micro-batches via
    applyInPandasWithState; settled bins equal the batch operator and
    share its recursive-CTE oracle."""
    from dumbo_spark.streaming import runners

    return runners.streaming_greedy_packing(spark, sf_dir)


@register(
    "passage_chunks",
    oracle=f"""
    WITH d AS (
      SELECT source, CAST(len({DUCK_TOKENS}) AS BIGINT) AS n
      FROM documents),
    c AS (
      SELECT source, n,
             CASE WHEN n <= 0 THEN 0
                  ELSE 1 + CAST(CEIL(GREATEST(n - 64, 0) / 32.0) AS BIGINT)
             END AS nc
      FROM d),
    e AS (
      SELECT source, n, nc,
             CASE WHEN n <= 0 THEN 0
                  ELSE (nc - 1) * 64 + (n - 32 * (nc - 1)) END AS ct
      FROM c)
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(nc) AS BIGINT) AS total_chunks,
           CAST(SUM(ct) AS BIGINT) AS chunk_tokens,
           CASE WHEN SUM(n) > 0
                THEN ROUND(SUM(ct) / CAST(SUM(n) AS DOUBLE), 4)
                ELSE 0.0 END AS inflation
    FROM e GROUP BY source
    """,
)
def q_passage_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG chunking census (packing.passage_chunks): 64-token windows
    at stride 32, chunk counts and overlap-inflation per source in
    closed-form integer arithmetic — map-only, no per-chunk explode."""
    return packing.passage_chunks(
        load_table(spark, sf_dir, "documents"), size=64, stride=32
    )


@register(
    "interleaved_mix_head",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST({sampling.sql_md5_bucket('doc_id', 8)} AS INTEGER)
               AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    s AS (SELECT source,
                 ROW_NUMBER() OVER (ORDER BY source) - 1 AS src_idx
          FROM (SELECT DISTINCT source FROM documents)),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM s),
    r AS (SELECT doc_id, source,
                 ROW_NUMBER() OVER (PARTITION BY source
                                    ORDER BY bucket, k, doc_id) AS rn
          FROM d)
    SELECT CAST((r.rn - 1) * ns.c + s.src_idx AS BIGINT) AS position,
           r.doc_id, r.source
    FROM r JOIN s USING (source) CROSS JOIN ns
    ORDER BY position LIMIT 24
    """,
)
def q_interleaved_mix_head(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin source interleave (packing.
    interleaved_mix_head): position = (rank−1)·n_sources + src_idx
    over the fixed permutation, ranks from the two-phase bucket prefix
    sum — the mixture-ordering step; first 24 positions shown."""
    return packing.interleaved_mix_head(
        load_table(spark, sf_dir, "documents"), head=24, buckets=8
    )


@register(
    "padding_waste_census",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({DUCK_TOKENS}) AS BIGINT) AS n_tokens,
             CAST({sampling.sql_md5_bucket('doc_id', 8)} AS INTEGER)
               AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    c AS (
      SELECT *, CAST(length(bin(n_tokens)) AS INTEGER) AS len_class,
             ROW_NUMBER() OVER (PARTITION BY length(bin(n_tokens)), bucket
                                ORDER BY k, doc_id) AS rn
      FROM d),
    pb AS (
      SELECT len_class, bucket, (rn - 1) // 32 AS batch_idx,
             COUNT(*) AS n_rows, MAX(n_tokens) AS mx, SUM(n_tokens) AS sm
      FROM c GROUP BY 1, 2, 3),
    agg AS (
      SELECT len_class,
             CAST(SUM(n_rows) AS BIGINT) AS n_docs,
             CAST(COUNT(*) AS BIGINT) AS n_batches,
             CAST(SUM(sm) AS BIGINT) AS total_tokens,
             CAST(SUM(n_rows * mx) AS BIGINT) AS padded_tokens
      FROM pb GROUP BY 1)
    SELECT len_class,
           CAST(CASE WHEN len_class > 1 THEN 1 << (len_class - 1)
                     ELSE 0 END AS BIGINT) AS seq_lo,
           CAST((1 << len_class) - 1 AS BIGINT) AS seq_hi,
           n_docs, n_batches, total_tokens, padded_tokens,
           CASE WHEN padded_tokens > 0
                THEN ROUND((padded_tokens - total_tokens)
                           / CAST(padded_tokens AS DOUBLE), 4)
                ELSE 0.0 END AS waste_pct
    FROM agg
    """,
)
def q_padding_waste_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-batching padding-waste census (packing.
    padding_waste_census): power-of-two length classes via
    integer-exact log2 (binary-digit count, no float log2), batches of
    32 per (class, md5-shard) stream, pad-to-batch-max waste per
    class — the measurement behind length-bucketed batching."""
    return packing.padding_waste_census(
        load_table(spark, sf_dir, "documents"), batch_size=32, buckets=8
    )


@register(
    "token_budget_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len({DUCK_TOKENS}) AS INTEGER) AS n_tokens,
             CAST({sampling.sql_md5_bucket('doc_id', 8)} AS INTEGER) AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS k
      FROM documents),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(SUM(n_tokens) OVER (PARTITION BY source
                                      ORDER BY bucket, k, doc_id
                                      ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum_tokens
      FROM d)
    SELECT doc_id, source, n_tokens, cum_tokens
    FROM c WHERE cum_tokens - n_tokens < 600
    """,
)
def q_token_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source token budget (packing.token_budget_sample):
    two-phase terasort-style prefix sum — bucket totals, running
    offsets on the tiny aggregate, broadcast back, per-bucket window.
    The oracle's single global window is the semantic spec; the Spark
    plan computes the identical prefix order without ever giving one
    task a whole source."""
    return packing.token_budget_sample(
        load_table(spark, sf_dir, "documents"), budget=600, buckets=8
    )


@register(
    "ngram_novelty_rate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    owner AS (SELECT gram, MIN(doc_id) AS first_doc FROM grams GROUP BY gram)
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(COUNT(*) FILTER (WHERE g.doc_id = o.first_doc) AS BIGINT)
             AS n_novel,
           ROUND(CAST(COUNT(*) FILTER (WHERE g.doc_id = o.first_doc) AS DOUBLE)
                 / COUNT(*), 6) AS novelty_rate
    FROM grams g JOIN owner o USING (gram)
    GROUP BY g.doc_id
    """,
)
def q_ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty vs ingestion order
    (textstats.ngram_novelty_rate): gram → min-doc_id owner aggregate
    joined back — O(total grams), no pairwise work."""
    return textstats.ngram_novelty_rate(load_table(spark, sf_dir, "documents"))


@register(
    "bm25_topk",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({DUCK_TOKENS}) AS tok FROM documents),
    lens AS (
      SELECT doc_id, len({DUCK_TOKENS}) AS len_d FROM documents),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(len_d) AS avg_len FROM lens),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks
      WHERE tok IN ('hash', 'join', 'vector')
      GROUP BY doc_id, tok),
    dft AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    scored AS (
      SELECT tf.doc_id,
             COUNT(*) AS n_hit_terms,
             SUM(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                 * tf * 2.2
                 / (tf + 1.2 * (0.25 + 0.75 * len_d / avg_len))) AS s
      FROM tf
      JOIN lens ON tf.doc_id = lens.doc_id
      JOIN dft ON tf.tok = dft.tok
      CROSS JOIN stats
      GROUP BY tf.doc_id)
    SELECT doc_id, n_hit_terms, ROUND(s, 6) AS score,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT doc_id, n_hit_terms, s,
             ROW_NUMBER() OVER (ORDER BY ROUND(s, 6) DESC, doc_id ASC) AS rank
      FROM scored)
    WHERE rank <= 10
    """,
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed 3-token query
    (textstats.bm25_topk): inverted-index-probe shape — the token
    filter prunes at the scan, postings shuffle only query terms,
    TakeOrderedAndProject cuts the top-k."""
    return textstats.bm25_topk(load_table(spark, sf_dir, "documents"))


@register(
    "training_mix_epochs",
    oracle=f"""
    WITH avail AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len({DUCK_TOKENS})) AS BIGINT) AS available_tokens
      FROM documents GROUP BY source),
    tw AS (SELECT CAST(COUNT(*) AS DOUBLE) AS total_w FROM avail)
    SELECT source, n_docs, available_tokens,
           ROUND(2000000.0 * 1.0 / total_w, 4) AS target_tokens,
           ROUND(2000000.0 * 1.0 / total_w
                 / CAST(available_tokens AS DOUBLE), 6) AS epochs
    FROM avail, tw
    """,
)
def q_training_mix_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planning table (packing.training_mix_epochs):
    per-source epochs/repeat factors implied by a 2M-token budget at
    uniform target weights — one k-row partial-agg shuffle plus
    broadcast arithmetic, corpus-size-independent."""
    return packing.training_mix_epochs(load_table(spark, sf_dir, "documents"))


@register(
    "heavy_hitter_tokens",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM wc)
    SELECT word, cnt,
           ROUND(CAST(1000000 AS DOUBLE) * cnt / total_tokens, 2) AS ppm
    FROM wc, t
    WHERE cnt * 500 >= total_tokens
    """,
)
def q_heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequency heavy hitters ≥ 1/500 of all tokens
    (textstats.heavy_hitter_tokens): wordcount partial agg + broadcast
    scalar total + integer-arithmetic membership cut."""
    return textstats.heavy_hitter_tokens(
        load_table(spark, sf_dir, "documents"), k=500
    )


@register(
    "cms_hitters_checked",
    # err_bound embeds repr(e/64) so both engines parse the identical
    # double literal; everything else is integer arithmetic
    oracle=f"""
    WITH wc AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    rows_i AS (SELECT CAST(i AS INTEGER) AS row_i FROM (VALUES (0), (1),
               (2), (3)) t(i)),
    sk AS (
      SELECT row_i,
             {sampling.sql_md5_bucket("CAST(row_i AS VARCHAR) || ':' || word", 64)}
               AS bucket,
             SUM(cnt) AS bucket_cnt
      FROM wc, rows_i GROUP BY 1, 2),
    top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word ASC LIMIT 20),
    pr AS (
      SELECT word, cnt, row_i,
             {sampling.sql_md5_bucket("CAST(row_i AS VARCHAR) || ':' || word", 64)}
               AS bucket
      FROM top, rows_i),
    est AS (
      SELECT p.word, p.cnt, MIN(s.bucket_cnt) AS cms_estimate
      FROM pr p JOIN sk s USING (row_i, bucket)
      GROUP BY 1, 2),
    n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS _n FROM wc)
    SELECT word, cnt AS exact_cnt,
           CAST(cms_estimate AS BIGINT) AS cms_estimate,
           cms_estimate >= cnt AS overestimate_ok,
           CAST(CEIL({repr(__import__('math').e / 64)} * _n) AS BIGINT)
             AS err_bound,
           cms_estimate - cnt
             <= CEIL({repr(__import__('math').e / 64)} * _n) AS within_bound
    FROM est, n
    """,
)
def q_cms_hitters_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch with its overestimate theorem checked
    (textstats.cms_hitters_checked): a 4×64-cell mergeable frequency
    sketch built from the vocabulary table, probed for the top-20
    exact hitters — completes the sketch matrix (HLL, approx-quantile,
    MinHash, SimHash, CMS), each with an exact `_checked` twin."""
    return textstats.cms_hitters_checked(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "revenue_share_parts",
    oracle="""
    WITH per AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem GROUP BY l_partkey),
    t AS (SELECT SUM(rev) AS tot FROM per)
    SELECT l_partkey,
           CAST(rev AS DOUBLE) AS part_revenue,
           ROUND(CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE)
                 * CAST(10000 AS DOUBLE), 4) AS share_bp
    FROM per, t
    WHERE CAST(rev AS DOUBLE) / CAST(tot AS DOUBLE)
          > CAST(7 AS DOUBLE) / CAST(10000 AS DOUBLE)
    """,
)
def q_revenue_share_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (analytics.revenue_share_parts): parts above 7
    basis points of total revenue — per-part partial agg, global total
    as broadcast 1-row re-aggregate, no second fact scan."""
    return analytics.revenue_share_parts(
        load_table(spark, sf_dir, "lineitem"), threshold_bp=7
    )


@register(
    "top_supplier_revenue",
    oracle="""
    WITH per AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)))) AS rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(rev AS DOUBLE) AS total_revenue
    FROM per JOIN supplier ON l_suppkey = s_suppkey
    WHERE rev = (SELECT MAX(rev) FROM per)
    """,
)
def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (analytics.top_supplier_revenue): quarterly
    revenue per supplier, max taken by a window over the aggregated
    (|suppliers|-row) frame; supplier dim broadcasts in."""
    return analytics.top_supplier_revenue(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "supplier")
    )


@register(
    "multimodal_resize",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS h
      FROM documents),
    d AS (
      SELECT doc_id, n_bytes,
             CAST(64 + ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) % 192
                  AS INTEGER) AS orig_width,
             CAST(64 + ((strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                        + strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 192
                  AS INTEGER) AS orig_height
      FROM m)
    SELECT doc_id, orig_width, orig_height,
           CAST(CASE WHEN greatest(orig_width, orig_height) <= 128
                     THEN orig_width
                     ELSE orig_width * 128 // greatest(orig_width, orig_height)
                END AS INTEGER) AS width,
           CAST(CASE WHEN greatest(orig_width, orig_height) <= 128
                     THEN orig_height
                     ELSE orig_height * 128 // greatest(orig_width, orig_height)
                END AS INTEGER) AS height,
           n_bytes
    FROM d
    """,
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plan (multimodal.resize_images):
    Arrow-batched narrow pass, integer-arithmetic output dims, payload
    bytes never shuffle. Pixel resample stubbed (no codec in
    container); dims math is the tested contract."""
    from dumbo_spark.operators import multimodal

    return multimodal.resize_images(
        multimodal.attach_binary(load_table(spark, sf_dir, "documents")), max_dim=128
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             1000 + ((((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                       + strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16
                      + strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 16
                     + strpos('0123456789abcdef', substr(h, 4, 1)) - 1) % 59000
               AS duration_ms
      FROM (SELECT doc_id, md5(text) AS h FROM documents))
    SELECT doc_id,
           CAST(i AS INTEGER) AS frame_idx,
           CAST(FLOOR(duration_ms * i / 4) AS BIGINT) AS offset_ms,
           CAST(duration_ms AS BIGINT) AS duration_ms
    FROM m, (SELECT unnest([0, 1, 2, 3]) AS i)
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame offsets per video payload
    (multimodal.frame_sample): pure JVM sequence+posexplode fan-out
    AFTER payload pruning — the frame table never carries bytes."""
    from dumbo_spark.operators import multimodal

    return multimodal.frame_sample(load_table(spark, sf_dir, "documents"), k=4)


@register(
    "position_attribution",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id AS click_id, ts AS click_ts
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    pairs AS (
      SELECT p.purchase_id, c.click_id, c.click_ts
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.purchase_ts > c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE),
    r AS (
      SELECT purchase_id, click_id,
             CAST(ROW_NUMBER() OVER w AS INTEGER) AS position,
             COUNT(*) OVER (PARTITION BY purchase_id) AS n_touches
      FROM pairs
      WINDOW w AS (PARTITION BY purchase_id ORDER BY click_ts, click_id))
    SELECT purchase_id, click_id, position, n_touches,
           ROUND(CASE WHEN n_touches = 1 THEN CAST(1.0 AS DOUBLE)
                      WHEN n_touches = 2 THEN CAST(0.5 AS DOUBLE)
                      WHEN position = 1 OR position = n_touches
                           THEN CAST(0.4 AS DOUBLE)
                      ELSE CAST(0.2 AS DOUBLE)
                           / CAST(n_touches - 2 AS DOUBLE)
                 END, 6) AS credit
    FROM r
    """,
)
def q_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based 40/20/40 multi-touch attribution
    (temporal.position_attribution): user-keyed equi-join candidates,
    per-purchase rank windows (bounded groups)."""
    return temporal.position_attribution(
        load_table(spark, sf_dir, "events"), window_minutes=30
    )


@register(
    "dq_expectations",
    oracle="""
    SELECT 'o_totalprice_nonpositive' AS rule,
           COUNT(*) FILTER (WHERE o_totalprice <= 0) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'o_orderdate_null', COUNT(*) FILTER (WHERE o_orderdate IS NULL)
    FROM orders
    UNION ALL
    SELECT 'o_orderkey_duplicate', COUNT(*) - COUNT(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'l_quantity_out_of_range',
           COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount_out_of_range',
           COUNT(*) FILTER (WHERE l_discount < 0 OR l_discount > 0.5)
    FROM lineitem
    UNION ALL
    SELECT 'orders_orphan_custkey', COUNT(*)
    FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
    UNION ALL
    SELECT 'lineitem_orphan_orderkey', COUNT(*)
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style expectation report (dq.dq_expectations): one
    conditional-aggregate scan per table + anti-join referential
    checks; all-zero on the clean fixtures proves the PASS state."""
    return dq.dq_expectations(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "discount_band_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)
             AS potential_revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.02 AND l_discount <= 0.04
      AND l_quantity < 24
    """,
)
def q_discount_band_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (analytics.discount_band_revenue): every
    predicate pushes to the parquet reader; single exact-decimal
    aggregate out."""
    return analytics.discount_band_revenue(load_table(spark, sf_dir, "lineitem"))


@register(
    "centroid_affinity",
    oracle=f"""
    WITH cent AS (
      SELECT label, pos, ROUND(AVG(v), 4) + 0.0 AS cv
      FROM (
        SELECT label,
               unnest(range(0, len(embedding))) AS pos,
               unnest(embedding) AS v
        FROM embeddings)
      GROUP BY label, pos),
    vecs AS (
      SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY label)
    SELECT a.label AS label_a, b.label AS label_b,
           ROUND({_duck_dot('a.cvec', 'b.cvec')}
                 / (sqrt({_duck_dot('a.cvec', 'a.cvec')})
                    * sqrt({_duck_dot('b.cvec', 'b.cvec')})), 6) AS cos_sim
    FROM vecs a JOIN vecs b ON a.label < b.label
    """,
)
def q_centroid_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-centroid cosine matrix (similarity.centroid_affinity):
    4dp-rounded centroids then deterministic sequential-fold cosine;
    |labels|² pairing is a broadcast self-join over bytes."""
    return similarity.centroid_affinity(load_table(spark, sf_dir, "embeddings"))


@register(
    "session_path_topk",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts, event_type,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sessions AS (
      SELECT user_id, event_id, ts, event_type,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flagged),
    numbered AS (
      SELECT user_id, session_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY CAST(ts AS TIMESTAMP), event_id) AS rn
      FROM sessions),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM numbered WHERE rn <= 3 GROUP BY user_id, session_id)
    SELECT path, COUNT(*) AS cnt
    FROM paths GROUP BY path
    ORDER BY cnt DESC, path ASC LIMIT 10
    """,
)
def q_session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 session entry paths (events.session_path_topk): islands
    sessionizer + order-exact struct-sort path assembly +
    TakeOrderedAndProject cut."""
    return events.session_path_topk(load_table(spark, sf_dir, "events"))


@register(
    "error_bursts",
    oracle="""
    WITH errs AS (
      SELECT user_id, event_id, ts
      FROM events WHERE event_type = 'error'),
    flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_burst
      FROM errs
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    bursts AS (
      SELECT user_id, ts,
             CAST(SUM(new_burst) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS burst_id
      FROM flagged)
    SELECT user_id, burst_id,
           COUNT(*) AS n_errors,
           epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS burst_start_us,
           epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS burst_end_us
    FROM bursts GROUP BY user_id, burst_id
    HAVING COUNT(*) >= 2
    """,
)
def q_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-burst detection (events.error_bursts): islands over the
    pushdown-filtered error stream, 30-minute gap, ≥2 cut."""
    return events.error_bursts(load_table(spark, sf_dir, "events"))


@register(
    "topk_movers",
    oracle="""
    WITH per AS (
      SELECT l_partkey,
             COUNT(*) FILTER (WHERE year(l_shipdate) = 1996) AS n_prev,
             COUNT(*) FILTER (WHERE year(l_shipdate) = 1997) AS n_curr
      FROM lineitem
      WHERE year(l_shipdate) IN (1996, 1997)
      GROUP BY l_partkey)
    SELECT l_partkey, n_prev, n_curr, n_curr - n_prev AS delta
    FROM per ORDER BY delta DESC, l_partkey ASC LIMIT 10
    """,
)
def q_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period top movers (analytics.topk_movers): one
    conditional-agg pass, exact integer delta, TakeOrderedAndProject
    cut with key tie-break."""
    return analytics.topk_movers(load_table(spark, sf_dir, "lineitem"))


@register(
    "asof_nearest_click",
    oracle="""
    WITH carried AS (
      SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             last_value(CASE WHEN event_type = 'click' THEN event_id END
                        IGNORE NULLS) OVER wb AS back_id,
             last_value(CASE WHEN event_type = 'click'
                             THEN epoch_us(CAST(ts AS TIMESTAMP)) END
                        IGNORE NULLS) OVER wb AS back_us,
             first_value(CASE WHEN event_type = 'click' THEN event_id END
                         IGNORE NULLS) OVER wf AS fwd_id,
             first_value(CASE WHEN event_type = 'click'
                              THEN epoch_us(CAST(ts AS TIMESTAMP)) END
                         IGNORE NULLS) OVER wf AS fwd_us
      FROM events
      WINDOW wb AS (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP), event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             wf AS (PARTITION BY user_id
                    ORDER BY CAST(ts AS TIMESTAMP), event_id
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
    flagged AS (
      SELECT user_id, event_id, event_type, us, back_id, fwd_id,
             us - back_us AS back_gap, fwd_us - us AS fwd_gap,
             (back_id IS NOT NULL AND us - back_us <= 3600000000) AS back_ok,
             (fwd_id IS NOT NULL AND fwd_us - us <= 3600000000) AS fwd_ok
      FROM carried)
    SELECT user_id,
           event_id AS target_id,
           CASE WHEN back_ok AND (NOT fwd_ok OR back_gap <= fwd_gap)
                THEN back_id ELSE fwd_id END AS source_id,
           CASE WHEN back_ok AND (NOT fwd_ok OR back_gap <= fwd_gap)
                THEN back_gap ELSE -fwd_gap END AS gap_us
    FROM flagged
    WHERE event_type = 'purchase' AND (back_ok OR fwd_ok)
    """,
)
def q_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join within 1h tolerance
    (temporal.asof_nearest_event): one window pass carries both
    directions; ties go backward."""
    return temporal.asof_nearest_event(
        load_table(spark, sf_dir, "events"), tolerance_sec=3600
    )


@register(
    "share_of_parent",
    oracle="""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)))) AS rv
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name)
    SELECT region, nation,
           CAST(rv AS DOUBLE) AS revenue,
           ROUND(CAST(rv AS DOUBLE)
                 / CAST(SUM(rv) OVER (PARTITION BY region) AS DOUBLE)
                 * CAST(100 AS DOUBLE), 4) AS pct_of_region
    FROM rev
    """,
)
def q_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent contribution (analytics.share_of_parent):
    Q5-style star join to the (region, nation) grain, parent total as
    a window over the ~25-row aggregate."""
    return analytics.share_of_parent(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "source_quality_matrix",
    oracle="""
    WITH r AS (
      SELECT source,
             ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk,
             COUNT(*) OVER () AS n
      FROM documents),
    m AS (
      SELECT source,
             CAST(FLOOR((rnk - 1) * 4 / n) AS INTEGER) AS quartile,
             COUNT(*) AS n_docs
      FROM r GROUP BY source, quartile)
    SELECT source, quartile, n_docs,
           ROUND(CAST(n_docs AS DOUBLE)
                 / CAST(SUM(n_docs) OVER (PARTITION BY source) AS DOUBLE),
                 4) AS share
    FROM m
    """,
)
def q_source_quality_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source × global-length-quartile matrix
    (sampling.source_quality_matrix): exact global rank via the
    distinct-value offset trick — the oracle's single global
    ROW_NUMBER is the spec; the Spark plan never globally sorts."""
    return sampling.source_quality_matrix(load_table(spark, sf_dir, "documents"))


@register(
    "token_source_mi",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({DUCK_TOKENS}) AS token FROM documents),
    n_ts AS (
      SELECT token, source, COUNT(*) AS n_ts FROM tok GROUP BY token, source),
    n_t AS (
      SELECT token, CAST(SUM(n_ts) AS BIGINT) AS n_t FROM n_ts GROUP BY token),
    n_s AS (
      SELECT source, CAST(SUM(n_ts) AS BIGINT) AS n_s FROM n_ts GROUP BY source),
    tot AS (SELECT CAST(SUM(n_t) AS BIGINT) AS n_total FROM n_t),
    scored AS (
      SELECT s.source, s.token, s.n_ts,
             ROUND((CAST(s.n_ts AS DOUBLE) / CAST(n_s.n_s AS DOUBLE))
                   * ln((CAST(s.n_ts AS DOUBLE) / CAST(n_s.n_s AS DOUBLE))
                        / (CAST(n_t.n_t AS DOUBLE) / CAST(tot.n_total AS DOUBLE))),
                   6) AS mi_score
      FROM n_ts s
      JOIN n_t USING (token)
      JOIN n_s USING (source), tot
      WHERE s.n_ts >= 10)
    SELECT source, token, n_ts, mi_score, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY source
                                   ORDER BY mi_score DESC, token ASC) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def q_token_source_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-indicative tokens per source (textstats.token_source_mi):
    pointwise-KL scores from exact integer counts, 6dp-rounded rank
    cut with token tie-break."""
    return textstats.token_source_mi(
        load_table(spark, sf_dir, "documents"), k=5, min_count=10
    )


@register(
    "benford_screen",
    oracle="""
    WITH c AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders),
    counts AS (
      SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INTEGER) AS digit,
             COUNT(*) AS n
      FROM c WHERE cents > 0 GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts)
    SELECT digit, n,
           ROUND(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS observed,
           ROUND(log10(CAST(1 AS DOUBLE)
                       + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 6) AS benford,
           ROUND(CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE)
                 - log10(CAST(1 AS DOUBLE)
                         + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)
             AS deviation
    FROM counts, tot
    """,
)
def q_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit screen (dq.benford_screen): leading digit
    via exact integer cents, never log10 of a double."""
    return dq.benford_screen(load_table(spark, sf_dir, "orders"))


@register(
    "dow_hour_heatmap",
    oracle="""
    WITH cells AS (
      SELECT CAST(isodow(CAST(ts AS TIMESTAMP)) AS INTEGER) AS dow,
             CAST(hour(CAST(ts AS TIMESTAMP)) AS INTEGER) AS hr,
             COUNT(*) AS n_events
      FROM events GROUP BY dow, hr),
    tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS n_total FROM cells)
    SELECT dow, hr, n_events,
           ROUND(CAST(n_events AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS share
    FROM cells, tot
    """,
)
def q_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO weekday × hour seasonality heatmap (events.dow_hour_heatmap):
    one partial-agg scan to ≤168 cells + broadcast total."""
    return events.dow_hour_heatmap(load_table(spark, sf_dir, "events"))


@register(
    "basket_rules",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey HAVING COUNT(*) <= 20),
    pq AS (SELECT po.l_orderkey, po.l_partkey FROM po JOIN ok USING (l_orderkey)),
    t AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders FROM pq),
    freq AS (SELECT l_partkey, COUNT(*) AS n_item FROM pq GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
      FROM pq a JOIN pq b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY part_a, part_b HAVING COUNT(*) >= 3)
    SELECT part_a, part_b, n_ab,
           ROUND(CAST(n_ab AS DOUBLE) / CAST(n_orders AS DOUBLE), 6) AS support,
           ROUND(CAST(n_ab AS DOUBLE) / CAST(fa.n_item AS DOUBLE), 6) AS conf_a_b,
           ROUND(CAST(n_ab AS DOUBLE) / CAST(fb.n_item AS DOUBLE), 6) AS conf_b_a,
           ROUND(CAST(n_ab AS DOUBLE) * CAST(n_orders AS DOUBLE)
                 / (CAST(fa.n_item AS DOUBLE) * CAST(fb.n_item AS DOUBLE)), 6)
             AS lift
    FROM pairs
    JOIN freq fa ON pairs.part_a = fa.l_partkey
    JOIN freq fb ON pairs.part_b = fb.l_partkey, t
    """,
)
def q_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules (graph.basket_rules):
    basket-bounded pair generation, metrics as ratios of exact longs."""
    return graph.basket_rules(load_table(spark, sf_dir, "lineitem"))


@register(
    "lang_source_contingency",
    oracle="""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS observed
      FROM documents GROUP BY lang, source),
    row_m AS (
      SELECT lang, CAST(SUM(observed) AS BIGINT) AS n_lang
      FROM cells GROUP BY lang),
    col_m AS (
      SELECT source, CAST(SUM(observed) AS BIGINT) AS n_source
      FROM cells GROUP BY source),
    tot AS (SELECT CAST(SUM(observed) AS BIGINT) AS n_total FROM cells)
    SELECT lang, source, observed,
           ROUND(CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                 / CAST(n_total AS DOUBLE), 4) AS expected,
           ROUND((CAST(observed AS DOUBLE)
                  - CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                    / CAST(n_total AS DOUBLE))
                 / sqrt(CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                        / CAST(n_total AS DOUBLE)), 4) AS residual
    FROM cells
    JOIN row_m USING (lang)
    JOIN col_m USING (source), tot
    """,
)
def q_lang_source_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language × source independence screen
    (textstats.lang_source_contingency): expectations and Pearson
    residuals from exact integer marginals."""
    return textstats.lang_source_contingency(load_table(spark, sf_dir, "documents"))


@register(
    "cohort_ltv",
    oracle="""
    WITH mn AS (
      SELECT user_id, event_type, value,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7 AS w
      FROM events),
    pur AS (
      SELECT user_id, w, SUM(CAST(value AS DECIMAL(18,2))) AS rev
      FROM mn WHERE event_type = 'purchase' GROUP BY user_id, w),
    first AS (SELECT user_id, MIN(w) AS cohort_w FROM pur GROUP BY user_id),
    cell AS (
      SELECT cohort_w, CAST(w - cohort_w AS INTEGER) AS week_offset,
             SUM(rev) AS rv
      FROM pur JOIN first USING (user_id) GROUP BY cohort_w, week_offset)
    SELECT CAST(DATE '1970-01-01' + CAST(cohort_w * 7 AS INTEGER) AS VARCHAR)
             AS cohort_week,
           week_offset,
           CAST(rv AS DOUBLE) AS revenue,
           CAST(SUM(rv) OVER (PARTITION BY cohort_w ORDER BY week_offset
                              ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             AS cum_revenue
    FROM cell
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve (events.cohort_ltv): exact integer epoch-week
    arithmetic, exact decimal revenue, cumulative window over the
    bounded cohort × offset aggregate."""
    return events.cohort_ltv(load_table(spark, sf_dir, "events"))


@register(
    "item_similarity",
    oracle="""
    WITH po AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    ok AS (SELECT l_orderkey FROM po GROUP BY l_orderkey HAVING COUNT(*) <= 20),
    pq AS (SELECT po.l_orderkey, po.l_partkey FROM po JOIN ok USING (l_orderkey)),
    freq AS (SELECT l_partkey, COUNT(*) AS n_item FROM pq GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_common
      FROM pq a JOIN pq b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY pa, pb HAVING COUNT(*) >= 3),
    sym AS (
      SELECT pa AS item, pb AS other, n_common FROM pairs
      UNION ALL
      SELECT pb AS item, pa AS other, n_common FROM pairs),
    scored AS (
      SELECT item, other, n_common,
             ROUND(CAST(n_common AS DOUBLE)
                   / CAST(fi.n_item + fo.n_item - n_common AS DOUBLE), 6)
               AS jaccard
      FROM sym
      JOIN freq fi ON sym.item = fi.l_partkey
      JOIN freq fo ON sym.other = fo.l_partkey)
    SELECT item, other, n_common, jaccard, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY item
                                   ORDER BY jaccard DESC, other ASC) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based CF top-k (graph.item_similarity): Jaccard over order
    neighborhoods via inclusion-exclusion on the co-purchase counts."""
    return graph.item_similarity(load_table(spark, sf_dir, "lineitem"))


_CES_KEEP_C = sampling.sql_md5_bucket("c_custkey")
_CES_KEEP_O = sampling.sql_md5_bucket("o_custkey")


@register(
    "consistent_entity_sample",
    oracle=f"""
    WITH kc AS (SELECT * FROM customer WHERE {_CES_KEEP_C} < 10),
    ko AS (SELECT * FROM orders WHERE {_CES_KEEP_O} < 10),
    kl AS (SELECT * FROM lineitem
           WHERE l_orderkey IN (SELECT o_orderkey FROM ko))
    SELECT 'customer' AS table_name,
           (SELECT COUNT(*) FROM kc) AS n_kept,
           (SELECT COUNT(*) FROM customer) AS n_total,
           ROUND(CAST((SELECT COUNT(*) FROM kc) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM customer) AS DOUBLE), 6) AS share
    UNION ALL
    SELECT 'orders',
           (SELECT COUNT(*) FROM ko),
           (SELECT COUNT(*) FROM orders),
           ROUND(CAST((SELECT COUNT(*) FROM ko) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM orders) AS DOUBLE), 6)
    UNION ALL
    SELECT 'lineitem',
           (SELECT COUNT(*) FROM kl),
           (SELECT COUNT(*) FROM lineitem),
           ROUND(CAST((SELECT COUNT(*) FROM kl) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM lineitem) AS DOUBLE), 6)
    UNION ALL
    SELECT 'closure_violations',
           (SELECT COUNT(*) FROM ko
            WHERE o_custkey NOT IN (SELECT c_custkey FROM kc)),
           CAST(0 AS BIGINT),
           CAST(0.0 AS DOUBLE)
    """,
)
def q_consistent_entity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-consistent 10% sample census
    (sampling.consistent_entity_sample): hash keep-predicate pushes
    into every custkey-carrying table; lineitem follows by semi-join;
    closure violations must be zero."""
    return sampling.consistent_entity_sample(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
        pct=10,
    )


@register(
    "streaming_error_bursts",
    oracle="""
    WITH errs AS (
      SELECT user_id, event_id, ts
      FROM events WHERE event_type = 'error'),
    flagged AS (
      SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       >= 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_burst
      FROM errs
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    bursts AS (
      SELECT user_id, us,
             SUM(new_burst) OVER (PARTITION BY user_id ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS burst_id
      FROM flagged)
    SELECT user_id, MIN(us) AS burst_start_us, COUNT(*) AS n_errors
    FROM bursts GROUP BY user_id, burst_id
    HAVING COUNT(*) >= 2
    """,
)
def q_streaming_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming error-burst monitor
    (streaming/runners.py::streaming_error_bursts): session_window over
    the error-FILTERED stream, state bounded by erroring users; oracle
    is the batch islands form with ≥-gap split semantics."""
    from dumbo_spark.streaming.runners import streaming_error_bursts

    return streaming_error_bursts(spark, sf_dir)


@register(
    "funnel_time_bounded",
    oracle="""
    WITH pu AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view'
                      THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS t_view,
             list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (WHERE event_type = 'click')) AS clicks,
             list_sort(list(epoch_us(CAST(ts AS TIMESTAMP)))
                       FILTER (WHERE event_type = 'purchase')) AS purchases
      FROM events GROUP BY user_id),
    st AS (
      SELECT user_id, t_view, clicks, purchases,
             list_min(list_filter(clicks,
               x -> x > t_view AND x <= t_view + 3600000000)) AS t_click
      FROM pu),
    st2 AS (
      SELECT user_id, t_view, t_click,
             list_min(list_filter(purchases,
               x -> x > t_click AND x <= t_click + 3600000000)) AS t_purchase
      FROM st),
    c AS (SELECT COUNT(t_view) AS v, COUNT(t_click) AS k,
                 COUNT(t_purchase) AS p FROM st2)
    SELECT '1_view' AS stage, v AS n_users FROM c
    UNION ALL SELECT '2_click', k FROM c
    UNION ALL SELECT '3_purchase', p FROM c
    """,
)
def q_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded ordered funnel (temporal.funnel_time_bounded):
    each stage within 1h of the previous — conversion velocity, same
    one-shuffle conditional-min shape as conversion_funnel."""
    return temporal.funnel_time_bounded(load_table(spark, sf_dir, "events"))


@register(
    "segment_priority_mode",
    oracle="""
    WITH counts AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment, o_orderpriority),
    ranked AS (
      SELECT c_mktsegment, o_orderpriority, n_orders,
             ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                ORDER BY n_orders DESC,
                                         o_orderpriority ASC) AS rn
      FROM counts)
    SELECT c_mktsegment, o_orderpriority AS modal_priority, n_orders
    FROM ranked WHERE rn = 1
    """,
)
def q_segment_priority_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped mode with deterministic tie-break
    (analytics.segment_priority_mode): rank window over the tiny
    (segment, priority) aggregate."""
    return analytics.segment_priority_mode(
        load_table(spark, sf_dir, "customer"), load_table(spark, sf_dir, "orders")
    )


def _duck_plane_dot(plane: list[float]) -> str:
    lits = ", ".join("1.0" if v > 0 else "-1.0" for v in plane)
    return (
        "list_sum(list_transform(list_zip(embedding, [" + lits + "]), "
        "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


_JL_ORACLE = (
    "SELECT vec_id, "
    + ", ".join(
        f"ROUND({_duck_plane_dot(similarity._hyperplane(64, j))}, 4) AS proj_{j}"
        for j in range(4)
    )
    + " FROM embeddings"
)


@register("jl_projection", oracle=_JL_ORACLE)
def q_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL ±1 random projection to 4 components
    (similarity.jl_projection): the LSH hyperplanes' real-valued form,
    zero-shuffle scan projection; plane constants inlined into the
    oracle so the reduction is value-checked end-to-end."""
    return similarity.jl_projection(load_table(spark, sf_dir, "embeddings"))


@register(
    "fulfillment_latency",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           ROUND(quantile_cont(date_diff('day', CAST(o_orderdate AS DATE),
                                         CAST(l_shipdate AS DATE)), 0.5), 4)
             AS p50_days,
           ROUND(quantile_cont(date_diff('day', CAST(o_orderdate AS DATE),
                                         CAST(l_shipdate AS DATE)), 0.9), 4)
             AS p90_days,
           CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(l_shipdate AS DATE))) AS INTEGER) AS max_days
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency percentiles per priority
    (analytics.fulfillment_latency): exact integer day lags through
    the orderkey fact join, percentile aggregate to |priorities|
    rows."""
    return analytics.fulfillment_latency(
        load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
    )


@register(
    "label_outlier_screen",
    oracle=f"""
    WITH cent AS (
      SELECT label, pos, ROUND(AVG(v), 4) + 0.0 AS cv
      FROM (
        SELECT label,
               unnest(range(0, len(embedding))) AS pos,
               unnest(embedding) AS v
        FROM embeddings)
      GROUP BY label, pos),
    vecs AS (
      SELECT label, list(cv ORDER BY pos) AS cvec FROM cent GROUP BY label),
    scored AS (
      SELECT e.label, e.vec_id,
             ROUND(CAST(1 AS DOUBLE)
                   - {_duck_dot('e.embedding', 'v.cvec')}
                     / (sqrt({_duck_dot('e.embedding', 'e.embedding')})
                        * sqrt({_duck_dot('v.cvec', 'v.cvec')})), 6)
               AS centroid_dist
      FROM embeddings e JOIN vecs v USING (label))
    SELECT label, vec_id, centroid_dist, CAST(rn AS INTEGER) AS rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY label
                                   ORDER BY centroid_dist DESC,
                                            vec_id ASC) AS rn
      FROM scored)
    WHERE rn <= 3
    """,
)
def q_label_outlier_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mislabeled-point candidates (similarity.label_outlier_screen):
    per label, top-3 furthest vectors from their own centroid —
    rank-based deterministic cut."""
    return similarity.label_outlier_screen(load_table(spark, sf_dir, "embeddings"))


@register(
    "ab_test_readout",
    oracle=f"""
    WITH pu AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  >= 14 AS INTEGER) AS converted
      FROM events GROUP BY user_id),
    pv AS (
      SELECT CASE WHEN {sampling.sql_md5_bucket('user_id')} < 50
                  THEN 'A' ELSE 'B' END AS variant,
             converted
      FROM pu),
    arms AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM pv GROUP BY variant),
    t AS (SELECT CAST(SUM(n_users) AS BIGINT) AS tu,
                 CAST(SUM(n_converted) AS BIGINT) AS tc FROM arms)
    SELECT variant, n_users, n_converted,
           ROUND(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
             AS conversion_rate,
           CASE WHEN tu - n_users > 0 AND tc > 0 AND tc < tu THEN
           ROUND((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE)
                  - CAST(tc - n_converted AS DOUBLE)
                    / CAST(tu - n_users AS DOUBLE))
                 / sqrt((CAST(tc AS DOUBLE) / CAST(tu AS DOUBLE))
                        * (CAST(1 AS DOUBLE)
                           - CAST(tc AS DOUBLE) / CAST(tu AS DOUBLE))
                        * (CAST(1 AS DOUBLE) / CAST(n_users AS DOUBLE)
                           + CAST(1 AS DOUBLE)
                             / CAST(tu - n_users AS DOUBLE))), 4)
           END AS z_vs_other
    FROM arms, t
    """,
)
def q_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B heavy-purchaser readout (events.ab_test_readout):
    entity-stable hash assignment, two-proportion z from exact
    integer counts."""
    return events.ab_test_readout(load_table(spark, sf_dir, "events"))


@register(
    "streaming_upsert_sink",
    oracle="""
    WITH r AS (
      SELECT user_id, event_id, value,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY CAST(ts AS TIMESTAMP) DESC,
                                         event_id DESC) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS n_events
      FROM events)
    SELECT user_id, us AS last_us, event_id AS last_event_id,
           CAST(value AS DOUBLE) AS last_value, n_events
    FROM r WHERE rn = 1
    """,
)
def q_streaming_upsert_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch MERGE into a keyed parquet state table
    (streaming/runners.py::streaming_upsert_sink): the settled
    materialized view must equal the batch latest-per-key answer —
    batch-boundary independence of the associative combine is exactly
    what this oracle checks."""
    from dumbo_spark.streaming.runners import streaming_upsert_sink

    return streaming_upsert_sink(spark, sf_dir)


@register(
    "hashed_features",
    oracle=f"""
    SELECT doc_id,
           CAST({sampling.sql_md5_bucket('token', 64)} AS INTEGER) AS bucket,
           COUNT(*) AS cnt
    FROM (SELECT doc_id, unnest({DUCK_TOKENS}) AS token FROM documents)
    GROUP BY doc_id, bucket
    """,
)
def q_hashed_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick sparse features (textstats.hashed_features):
    engine-neutral md5 buckets so the feature map is reproducible
    across engines — a feature-store contract."""
    return textstats.hashed_features(load_table(spark, sf_dir, "documents"))


@register(
    "knn_classifier_eval",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 32),
    scored AS (
      SELECT q.query_id,
             e.vec_id AS neighbor_id,
             round({_duck_dot('q.q_emb', 'e.embedding')}
                   / (sqrt({_duck_dot('q.q_emb', 'q.q_emb')})
                      * sqrt({_duck_dot('e.embedding', 'e.embedding')})), 6)
               AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id),
    nn AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
        FROM scored)
      WHERE rn <= 5),
    votes AS (
      SELECT nn.query_id, e.label AS n_label, COUNT(*) AS votes
      FROM nn JOIN embeddings e ON nn.neighbor_id = e.vec_id
      GROUP BY nn.query_id, n_label),
    pred AS (
      SELECT query_id, n_label AS pred_label, votes FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY votes DESC, n_label ASC) AS rn
        FROM votes)
      WHERE rn = 1)
    SELECT p.query_id, e.label AS true_label, p.pred_label, p.votes,
           CAST(p.pred_label = e.label AS INTEGER) AS correct
    FROM pred p JOIN embeddings e ON p.query_id = e.vec_id
    """,
)
def q_knn_classifier_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out kNN label vote vs true label
    (similarity.knn_classifier_eval) — the embedding-quality probe
    layered on knn_cosine's broadcast top-k."""
    return similarity.knn_classifier_eval(load_table(spark, sf_dir, "embeddings"))


@register(
    "daily_autocorrelation",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY day),
    lags AS (SELECT unnest(range(1, 8)) AS lag),
    pairs AS (
      SELECT l.lag, a.cnt AS x, b.cnt AS y
      FROM daily a CROSS JOIN lags l
      JOIN daily b ON b.day = a.day + l.lag),
    mom AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy,
             CAST(SUM(x * y) AS BIGINT) AS sxy
      FROM pairs GROUP BY lag)
    SELECT CAST(lag AS INTEGER) AS lag, n,
           ROUND((CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / sqrt((CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                           / CAST(n AS DOUBLE))
                        * (CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                             / CAST(n AS DOUBLE))), 6) AS autocorr
    FROM mom
    """,
)
def q_daily_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-series autocorrelation at lags 1..7
    (events.daily_autocorrelation): Pearson r from exact integer
    co-moment sums, closed-form double finish."""
    return events.daily_autocorrelation(load_table(spark, sf_dir, "events"))


_RW_CASE = "CASE w " + " ".join(
    f"WHEN {w} THEN CAST({2.0 ** -w:.10f} AS DECIMAL(11,10))" for w in range(11)
) + " ELSE CAST(0 AS DECIMAL(11,10)) END"


@register(
    "recency_weighted_value",
    oracle=f"""
    WITH anchor AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
    p AS (
      SELECT user_id, value,
             CAST(FLOOR(date_diff('day', CAST(ts AS DATE), maxd) / 7.0)
                  AS INTEGER) AS w
      FROM events, anchor WHERE event_type = 'purchase')
    SELECT user_id, COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2)) * ({_RW_CASE})) AS DOUBLE)
             AS recency_score
    FROM p GROUP BY user_id
    """,
)
def q_recency_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-per-week recency-decayed purchase value per user
    (events.recency_weighted_value): dyadic decimal weights keep the
    sum exact and order-independent — no float exp() anywhere."""
    return events.recency_weighted_value(load_table(spark, sf_dir, "events"))


#: ONE ANSI-portable SQL string executed verbatim by BOTH engines —
#: the spark.sql() surface demonstration: a user can hand this engine
#: the same SQL they run on DuckDB/Trino and get hash-identical
#: results (dialect discipline: explicit CASTs, no engine functions).
_PORTABLE_SQL = """
    SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2))
                       - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
             AS revenue
    FROM lineitem
    GROUP BY CAST(year(l_shipdate) AS INTEGER)
"""


@register("sql_portable_revenue", oracle=_PORTABLE_SQL)
def q_sql_portable_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() API surface, proven portable: this query's
    ORACLE IS ITS OWN SOURCE — the identical string executes on Spark
    (over catalog.register_views) and on DuckDB, and the driver
    hash-compares the results. Catalyst still gets the declarative
    plan (pushdown, partial agg) exactly as the DataFrame form
    would."""
    from dumbo_spark.sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_PORTABLE_SQL)


@register(
    "skyline_parts",
    oracle="""
    WITH s AS (
      SELECT p_partkey, p_retailprice, p_size,
             MIN(p_size) OVER (ORDER BY p_retailprice, p_size, p_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS rm
      FROM part)
    SELECT p_partkey, p_retailprice, p_size
    FROM s WHERE rm IS NULL OR p_size < rm
    """,
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto skyline on (price, size)
    (analytics.skyline_parts): single cummin pass over the ordered
    part dimension."""
    return analytics.skyline_parts(load_table(spark, sf_dir, "part"))


@register(
    "decile_lift_table",
    oracle="""
    WITH pu AS (
      SELECT user_id, COUNT(*) AS score,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  >= 14 AS INTEGER) AS converted
      FROM events GROUP BY user_id),
    t AS (SELECT CAST(COUNT(*) AS BIGINT) AS tn,
                 CAST(SUM(converted) AS BIGINT) AS tc FROM pu),
    r AS (
      SELECT user_id, converted,
             ROW_NUMBER() OVER (ORDER BY score DESC, user_id ASC) AS rnk
      FROM pu),
    d AS (
      SELECT CAST(FLOOR((rnk - 1) * 10 / tn) AS INTEGER) AS decile, converted
      FROM r, t),
    g AS (
      SELECT decile, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted
      FROM d GROUP BY decile)
    SELECT decile, n_users, n_converted,
           ROUND(CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
             AS conv_rate,
           ROUND((CAST(n_converted AS DOUBLE) / CAST(n_users AS DOUBLE))
                 / (CAST(tc AS DOUBLE) / CAST(tn AS DOUBLE)), 4) AS lift
    FROM g, t
    """,
)
def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeting-model decile lift (analytics.decile_lift_table):
    exact global deciles via the distinct-value offsets trick (the
    oracle's single ROW_NUMBER is the spec, the plan never globally
    sorts), heavy-purchaser rates and lifts from exact longs."""
    return analytics.decile_lift_table(load_table(spark, sf_dir, "events"))


@register(
    "dup_cluster_sizes",
    oracle="""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE 100 * c >= 60 * (sa.n + sb.n - c)),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    cc AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    cs AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY cluster_id)
    SELECT cluster_size, COUNT(*) AS n_clusters FROM cs GROUP BY cluster_size
    """,
)
def q_dup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster size histogram (dedup.cluster_size_histogram
    over the exact-Jaccard CC labeling) — dedup triage: template
    content shows as a fat head, true near-dups as a pair tail."""
    edges = dedup.jaccard_ngram_pairs(
        load_table(spark, sf_dir, "documents")
    ).select("doc_a", "doc_b")
    return dedup.cluster_size_histogram(dedup.connected_components(edges))


@register(
    "contrastive_pairs",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb, label AS q_label
      FROM embeddings WHERE vec_id < 32),
    scored AS (
      SELECT q.query_id,
             e.vec_id AS neighbor_id,
             round({_duck_dot('q.q_emb', 'e.embedding')}
                   / (sqrt({_duck_dot('q.q_emb', 'q.q_emb')})
                      * sqrt({_duck_dot('e.embedding', 'e.embedding')})), 6)
               AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id),
    pos AS (
      SELECT query_id, neighbor_id AS other_id, 'pos' AS role,
             CAST(1 AS INTEGER) AS rank
      FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
        FROM scored)
      WHERE rn = 1),
    keyed AS (
      SELECT q.query_id, e.vec_id AS other_id,
             md5(CAST(q.query_id AS VARCHAR) || '-'
                 || CAST(e.vec_id AS VARCHAR)) AS k
      FROM embeddings e CROSS JOIN q
      WHERE e.label <> q.q_label),
    neg AS (
      SELECT query_id, other_id, 'neg' AS role, CAST(rn AS INTEGER) AS rank
      FROM (
        SELECT query_id, other_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY k, other_id) AS rn
        FROM keyed)
      WHERE rn <= 3)
    SELECT * FROM pos UNION ALL SELECT * FROM neg
    """,
)
def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor/positive/negative mining (similarity.contrastive_pairs):
    nearest-neighbor positives + md5-permutation negatives from other
    labels — a reproducible, versionable training set."""
    return similarity.contrastive_pairs(load_table(spark, sf_dir, "embeddings"))


@register(
    "bigram_pmi",
    oracle=f"""
    WITH toks AS (SELECT {DUCK_TOKENS} AS t FROM documents),
    bi AS (
      SELECT ngram, COUNT(*) AS n_xy
      FROM (
        SELECT unnest(
          CASE WHEN len(t) >= 2
               THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
               ELSE [] END) AS ngram
        FROM toks)
      GROUP BY ngram HAVING COUNT(*) >= 10),
    uni AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tok FROM uni),
    sp AS (
      SELECT ngram, n_xy,
             string_split(ngram, ' ')[1] AS x,
             string_split(ngram, ' ')[2] AS y
      FROM bi),
    scored AS (
      SELECT sp.ngram, sp.n_xy,
             ROUND(ln(CAST(sp.n_xy AS DOUBLE) * CAST(tot.n_tok AS DOUBLE)
                      / (CAST(ux.cnt AS DOUBLE) * CAST(uy.cnt AS DOUBLE))), 6)
               AS pmi
      FROM sp
      JOIN uni ux ON sp.x = ux.word
      JOIN uni uy ON sp.y = uy.word, tot)
    SELECT ngram, n_xy, pmi FROM scored
    ORDER BY pmi DESC, ngram ASC LIMIT 20
    """,
)
def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by PMI (textstats.bigram_pmi): exact-count
    probabilities, 6dp rank cut, TakeOrderedAndProject."""
    return textstats.bigram_pmi(load_table(spark, sf_dir, "documents"))


@register(
    "vocab_coverage",
    oracle=f"""
    WITH uni AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_tok FROM uni),
    r AS (
      SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, word ASC) AS rnk
      FROM uni),
    per AS (
      SELECT k, CAST(SUM(cnt) AS BIGINT) AS tokens_covered
      FROM r CROSS JOIN (SELECT unnest([10, 100, 1000]) AS k)
      WHERE rnk <= k GROUP BY k)
    SELECT CAST(k AS INTEGER) AS k, tokens_covered,
           ROUND(CAST(tokens_covered AS DOUBLE) / CAST(n_tok AS DOUBLE), 6)
             AS coverage
    FROM per, tot
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k vocabulary coverage shares (textstats.vocab_coverage):
    exact frequency ranks via the shared offsets machinery, integer
    covered-token sums."""
    return textstats.vocab_coverage(load_table(spark, sf_dir, "documents"))


@register(
    "gini_revenue",
    oracle="""
    WITH per AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY o_custkey),
    r AS (
      SELECT rev,
             ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey ASC) AS rnk,
             COUNT(*) OVER () AS n
      FROM per),
    s AS (
      SELECT MAX(n) AS n,
             SUM(rnk * rev) AS swx,
             SUM(rev) AS sx
      FROM r)
    SELECT n AS n_customers,
           CAST(sx AS DOUBLE) AS total_revenue,
           ROUND(CAST(2 AS DOUBLE) * CAST(swx AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
                 - (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE))
                   / CAST(n AS DOUBLE), 6) AS gini
    FROM s
    """,
)
def q_gini_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer revenue
    (analytics.gini_revenue): decimal rank·revenue sums via the shared
    offsets rank, double only in the closed form."""
    return analytics.gini_revenue(load_table(spark, sf_dir, "orders"))


@register(
    "discount_elasticity",
    oracle="""
    WITH j AS (
      SELECT p_brand,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT) AS bp,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc
      FROM lineitem JOIN part ON l_partkey = p_partkey),
    mom AS (
      SELECT p_brand, COUNT(*) AS n,
             CAST(SUM(bp) AS BIGINT) AS sx,
             CAST(SUM(qc) AS BIGINT) AS sy,
             CAST(SUM(bp * bp) AS BIGINT) AS sxx,
             CAST(SUM(bp * qc) AS BIGINT) AS sxy
      FROM j GROUP BY p_brand)
    SELECT p_brand, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 / CAST(100 AS DOUBLE), 6) AS qty_per_pct
    FROM mom
    """,
)
def q_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of quantity on discount percentage
    (analytics.discount_elasticity): integer-exact co-moments, double
    closed form."""
    return analytics.discount_elasticity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "entity_clusters",
    oracle="""
    WITH RECURSIVE v AS (SELECT DISTINCT p_name AS val FROM part),
    b AS (SELECT val, right(val, 4) AS blk FROM v),
    pairs AS (
      SELECT a.val AS doc_a, c.val AS doc_b
      FROM b a JOIN b c ON a.blk = c.blk AND a.val < c.val
      WHERE levenshtein(a.val, c.val) <= 3),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src)
    SELECT node AS name, MIN(r) AS canonical_name FROM reach GROUP BY node
    """,
)
def q_entity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end (dedup.near_match_values edges →
    dedup.connected_components): edit-distance matches close
    transitively into canonical entity groups — the MDM endgame the
    pairwise near-match feeds; recursive-CTE oracle over the same
    deterministic edges."""
    edges = dedup.near_match_values(
        load_table(spark, sf_dir, "part"), "p_name"
    ).select(F.col("val_a").alias("doc_a"), F.col("val_b").alias("doc_b"))
    return dedup.connected_components(edges).select(
        F.col("doc_id").alias("name"), F.col("cluster_id").alias("canonical_name")
    )


@register(
    "diversified_topk",
    oracle="""
    WITH quota AS (
      SELECT p_size, p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_size, p_brand
                 ORDER BY CAST(p_retailprice AS DECIMAL(18,2)) ASC,
                          p_partkey ASC) AS br
      FROM part),
    kept AS (SELECT * FROM quota WHERE br <= 2)
    SELECT p_size, p_brand, p_partkey, p_retailprice,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT p_size, p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_size
                 ORDER BY CAST(p_retailprice AS DECIMAL(18,2)) ASC,
                          p_partkey ASC) AS rank
      FROM kept)
    WHERE rank <= 10
    """,
)
def q_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-constrained top-k (topk.diversified_topk): cheapest
    10 parts per size class with at most 2 per brand — two nested
    bounded windows, quota pass first so the re-rank input is
    quota-bounded."""
    return topk.diversified_topk(load_table(spark, sf_dir, "part"))


@register(
    "theil_sen_trend",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y
      FROM orders GROUP BY 1),
    base AS (SELECT MIN(day) AS d0 FROM daily),
    xy AS (SELECT CAST(date_diff('day', d0, day) AS DOUBLE) AS x, y
           FROM daily, base),
    slopes AS (
      SELECT (b.y - a.y) / (b.x - a.x) AS s
      FROM xy a JOIN xy b ON a.x < b.x),
    ms AS (SELECT COUNT(*) AS n_pairs, quantile_cont(s, 0.5) AS slope
           FROM slopes),
    resid AS (SELECT n_pairs, slope, y - slope * x AS r FROM xy, ms)
    SELECT CAST(MAX(n_days) AS BIGINT) AS n_days,
           CAST(MAX(n_pairs) AS BIGINT) AS n_pairs,
           ROUND(MAX(slope), 6) AS slope,
           ROUND(quantile_cont(r, 0.5), 6) AS intercept
    FROM (SELECT n_pairs, slope, r,
                 COUNT(*) OVER () AS n_days
          FROM resid)
    """,
)
def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust daily-revenue trend (analytics.theil_sen_trend):
    exact median of pairwise slopes on the calendar-bounded daily
    rollup — the outlier-resistant sibling of group_regression's OLS."""
    return analytics.theil_sen_trend(load_table(spark, sf_dir, "orders"))


@register(
    "auc_roc_exact",
    oracle="""
    WITH s AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS score,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    ps AS (SELECT score, SUM(y) AS pos, COUNT(*) AS c FROM s GROUP BY score),
    w AS (
      SELECT score, pos, c,
             SUM(c) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM ps),
    t AS (
      SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
             CAST(SUM(c - pos) AS BIGINT) AS n_neg,
             SUM(CAST(pos AS DOUBLE) * (2 * cum - c + 1) / 2.0) AS s_pos
      FROM w)
    SELECT n_pos, n_neg,
           ROUND(CASE WHEN n_pos > 0 AND n_neg > 0
                      THEN (s_pos - CAST(n_pos AS DOUBLE) * (n_pos + 1) / 2.0)
                           / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
                 END, 6) AS auc
    FROM t
    """,
)
def q_auc_roc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tie-corrected ROC-AUC via the Mann-Whitney rank identity
    (analytics.auc_roc_exact): range-partitioned exact rank, per-score
    contiguous-block tie averaging, scalar ratio — the oracle's single
    global window over DISTINCT scores is the semantic spec; the Spark
    plan never totals-orders rows in one task."""
    return analytics.auc_roc_exact(load_table(spark, sf_dir, "orders"))


@register(
    "dataset_manifest",
    oracle="""
    SELECT * FROM (
      SELECT 'region' AS table_name, COUNT(*) AS n_rows, 2 AS n_cols FROM region
      UNION ALL SELECT 'nation', COUNT(*), 3 FROM nation
      UNION ALL SELECT 'customer', COUNT(*), 5 FROM customer
      UNION ALL SELECT 'supplier', COUNT(*), 4 FROM supplier
      UNION ALL SELECT 'part', COUNT(*), 6 FROM part
      UNION ALL SELECT 'orders', COUNT(*), 6 FROM orders
      UNION ALL SELECT 'lineitem', COUNT(*), 11 FROM lineitem
      UNION ALL SELECT 'events', COUNT(*), 6 FROM events
      UNION ALL SELECT 'documents', COUNT(*), 5 FROM documents
      UNION ALL SELECT 'embeddings', COUNT(*), 3 FROM embeddings)
    """,
)
def q_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset manifest — the "data card" audit row per table (name,
    row count, column count) a versioned corpus publishes with every
    release; schema drift or a short-loaded table flips the hash. Each
    count is one metadata-cheap aggregate; the union is k rows."""
    from functools import reduce

    names = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    frames = []
    for n in names:
        df = load_table(spark, sf_dir, n)
        frames.append(
            df.agg(F.count("*").alias("n_rows")).select(
                F.lit(n).alias("table_name"),
                "n_rows",
                F.lit(len(df.columns)).alias("n_cols"),
            )
        )
    return reduce(lambda a, b: a.unionByName(b), frames)


@register(
    "linenumber_density_check",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*) AS n,
             COUNT(DISTINCT l_linenumber) AS nd,
             MIN(l_linenumber) AS mn, MAX(l_linenumber) AS mx
      FROM lineitem GROUP BY 1)
    SELECT CASE WHEN nd <> n THEN 'duplicate_linenumber'
                WHEN mn < 1 THEN 'nonpositive_linenumber'
                WHEN mn = 1 AND mx = n THEN 'dense_ok'
                ELSE 'gapped_sequence' END AS seq_check,
           COUNT(*) AS n_orders
    FROM per_order GROUP BY 1
    """,
)
def q_linenumber_density_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-sequence integrity check (dq.linenumber_density_check):
    every order's line numbers must be exactly 1..n — dropped or
    double-written child rows that FK and total checks cannot see.
    One partial-agg pass; k-row output."""
    return dq.linenumber_density_check(load_table(spark, sf_dir, "lineitem"))


@register(
    "calibration_bins",
    oracle="""
    WITH s AS (
      SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS score, o_orderkey,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders),
    b AS (
      SELECT score, y,
             NTILE(10) OVER (ORDER BY score DESC, o_orderkey ASC) AS bin
      FROM s)
    SELECT CAST(bin AS INTEGER) AS bin,
           COUNT(*) AS n_rows,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           ROUND(AVG(CAST(score AS DOUBLE)), 6) AS mean_score,
           ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate
    FROM b GROUP BY bin
    """,
)
def q_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram over exact global score deciles
    (analytics.calibration_bins): global_ntile range-partitioned
    binning + one k-group partial agg — AUC's calibration companion."""
    return analytics.calibration_bins(load_table(spark, sf_dir, "orders"))


@register(
    "cusum_drift",
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
             AVG(CAST(value AS DOUBLE)) AS x
      FROM events GROUP BY 1),
    st AS (SELECT AVG(x) AS mu, STDDEV_SAMP(x) AS sigma FROM daily),
    idx AS (SELECT day, x, ROW_NUMBER() OVER (ORDER BY day) AS i FROM daily),
    walk(i, day, x, s) AS (
      SELECT i, day, x, GREATEST(0, 0 + (x - mu - 0.25 * sigma))
      FROM idx, st WHERE i = 1
      UNION ALL
      SELECT idx.i, idx.day, idx.x,
             GREATEST(0, walk.s + (idx.x - st.mu - 0.25 * st.sigma))
      FROM walk JOIN idx ON idx.i = walk.i + 1 CROSS JOIN st)
    SELECT day, ROUND(x, 6) AS daily_mean, ROUND(s, 6) AS cusum,
           ROUND(s, 6) > ROUND(2.0 * (SELECT sigma FROM st), 6) AS alarm
    FROM walk
    """,
)
def q_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift monitor over daily mean event value
    (events.cusum_drift): non-associative sequential state walked on
    the calendar-bounded daily rollup in one Arrow group; the oracle
    re-runs the recursion level-by-level (recursive CTE — the
    pagerank_checked technique applied to sequential state)."""
    return events.cusum_drift(load_table(spark, sf_dir, "events"))


@register(
    "interval_coverage_daily",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sess0 AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    sessions AS (
      SELECT user_id, sid,
             epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS s_us,
             epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS e_us
      FROM sess0 GROUP BY user_id, sid),
    covered AS (
      SELECT CAST(gs.d AS DATE) AS day, s.s_us, s.e_us
      FROM sessions s,
           UNNEST(generate_series(CAST(make_timestamp(s.s_us) AS DATE),
                                  CAST(make_timestamp(s.e_us) AS DATE),
                                  INTERVAL 1 DAY)) AS gs(d)),
    clipped AS (
      SELECT day,
             GREATEST(s_us, epoch_us(CAST(day AS TIMESTAMP))) AS cs,
             LEAST(e_us, epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP))) AS ce
      FROM covered
      WHERE LEAST(e_us, epoch_us(CAST(day + INTERVAL 1 DAY AS TIMESTAMP)))
            > GREATEST(s_us, epoch_us(CAST(day AS TIMESTAMP)))),
    marked AS (
      SELECT day, cs, ce,
             CASE WHEN MAX(ce) OVER (PARTITION BY day ORDER BY cs, ce
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                      IS NULL
                  OR cs > MAX(ce) OVER (PARTITION BY day ORDER BY cs, ce
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  THEN 1 ELSE 0 END AS new_isl
      FROM clipped),
    islands AS (
      SELECT day, cs, ce,
             SUM(new_isl) OVER (PARTITION BY day ORDER BY cs, ce
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
      FROM marked),
    spans AS (
      SELECT day, isl, MAX(ce) - MIN(cs) AS span
      FROM islands GROUP BY day, isl)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(SUM(span) AS BIGINT) AS covered_us,
           COUNT(*) AS n_intervals
    FROM spans GROUP BY day
    """,
)
def q_interval_coverage_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day union-of-intervals session coverage
    (events.interval_coverage_daily): merge-overlapping-intervals
    sweep per day on the shared gap-islands sessionizer — the
    occupancy complement of peak_concurrency."""
    return events.interval_coverage_daily(load_table(spark, sf_dir, "events"))


@register(
    "market_concentration",
    oracle="""
    WITH rev AS (
      SELECT r_name AS region, n_name AS nation,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                 * (CAST(1 AS DECIMAL(18,2))
                    - CAST(l_discount AS DECIMAL(18,2)))) AS rv
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name),
    sh AS (
      SELECT region,
             CAST(rv AS DOUBLE)
               / CAST(SUM(rv) OVER (PARTITION BY region) AS DOUBLE) AS s
      FROM rev)
    SELECT region, COUNT(*) AS n_nations, ROUND(SUM(s * s), 6) AS hhi
    FROM sh GROUP BY region
    """,
)
def q_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region HHI (analytics.market_concentration): Σ share² over
    the star-join aggregate."""
    return analytics.market_concentration(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
    )


@register(
    "cart_abandonment",
    oracle="""
    WITH c AS (
      SELECT user_id, ts AS click_ts, CAST(ts AS DATE) AS day
      FROM events WHERE event_type = 'click'),
    p AS (
      SELECT user_id, ts AS purchase_ts
      FROM events WHERE event_type = 'purchase'),
    conv AS (
      SELECT DISTINCT c.day, c.user_id
      FROM c JOIN p ON c.user_id = p.user_id
       AND p.purchase_ts > c.click_ts
       AND p.purchase_ts <= c.click_ts + INTERVAL 60 MINUTE),
    clickers AS (SELECT DISTINCT day, user_id FROM c),
    d AS (
      SELECT cl.day,
             COUNT(*) AS n_clickers,
             COUNT(conv.user_id) AS n_converted
      FROM clickers cl
      LEFT JOIN conv ON cl.day = conv.day AND cl.user_id = conv.user_id
      GROUP BY cl.day)
    SELECT CAST(day AS VARCHAR) AS day, n_clickers, n_converted,
           ROUND(CAST(n_clickers - n_converted AS DOUBLE)
                 / CAST(n_clickers AS DOUBLE), 6) AS abandonment_rate
    FROM d
    """,
)
def q_cart_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily abandonment rate (temporal.cart_abandonment): clickers
    without a purchase within 1h of any same-day click."""
    return temporal.cart_abandonment(load_table(spark, sf_dir, "events"))


@register(
    "duplicate_payment_screen",
    oracle="""
    SELECT o_custkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS amount,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey, CAST(o_totalprice AS DECIMAL(18,2)),
             CAST(o_orderdate AS DATE)
    HAVING COUNT(*) > 1
    """,
)
def q_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-charge audit (dq.duplicate_payment_screen): distinct
    orders sharing (customer, exact amount, date)."""
    return dq.duplicate_payment_screen(load_table(spark, sf_dir, "orders"))


@register(
    "daily_new_vs_returning",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    first AS (SELECT user_id, MIN(day) AS first_day FROM active GROUP BY user_id),
    d AS (
      SELECT a.day,
             COUNT(*) AS n_active,
             COUNT(*) FILTER (WHERE a.day = f.first_day) AS n_new
      FROM active a JOIN first f USING (user_id)
      GROUP BY a.day)
    SELECT CAST(day AS VARCHAR) AS day, n_active, n_new,
           n_active - n_new AS n_returning
    FROM d
    """,
)
def q_daily_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily actives split new vs returning
    (events.daily_new_vs_returning): two partial aggs, exact
    integers."""
    return events.daily_new_vs_returning(load_table(spark, sf_dir, "events"))


@register(
    "peak_concurrency",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sess0 AS (
      SELECT user_id, event_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    sessions AS (
      SELECT user_id, sid,
             epoch_us(CAST(MIN(ts) AS TIMESTAMP)) AS s_us,
             epoch_us(CAST(MAX(ts) AS TIMESTAMP)) AS e_us
      FROM sess0 GROUP BY user_id, sid),
    endpoints AS (
      SELECT s_us AS us, 1 AS delta FROM sessions
      UNION ALL SELECT e_us, -1 FROM sessions),
    swept AS (
      SELECT CAST(make_timestamp(us) AS DATE) AS day, us, delta,
             SUM(delta) OVER (PARTITION BY CAST(make_timestamp(us) AS DATE)
                  ORDER BY us ASC, delta DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
      FROM endpoints),
    per_day AS (SELECT day, MAX(running) AS mx FROM swept GROUP BY day),
    days AS (
      SELECT DISTINCT CAST(gs.d AS DATE) AS day
      FROM sessions s,
           UNNEST(generate_series(CAST(make_timestamp(s.s_us) AS DATE),
                                  CAST(make_timestamp(s.e_us) AS DATE),
                                  INTERVAL 1 DAY)) AS gs(d)),
    carry AS (
      SELECT d.day, COUNT(*) AS c
      FROM days d JOIN sessions s
        ON CAST(make_timestamp(s.s_us) AS DATE) < d.day
       AND CAST(make_timestamp(s.e_us) AS DATE) >= d.day
      GROUP BY d.day)
    SELECT CAST(d.day AS VARCHAR) AS day,
           CAST(COALESCE(c.c, 0) + greatest(COALESCE(p.mx, 0), 0) AS BIGINT)
             AS peak_concurrent
    FROM days d
    LEFT JOIN per_day p ON d.day = p.day
    LEFT JOIN carry c ON d.day = c.day
    """,
)
def q_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line peak concurrent sessions per day
    (events.peak_concurrency): +1/−1 endpoints, deterministic tie
    order, midnight carry from a tiny day-keyed aggregate."""
    return events.peak_concurrency(load_table(spark, sf_dir, "events"))


@register(
    "return_rate_by_brand",
    oracle="""
    SELECT p_brand,
           COUNT(*) AS n_lines,
           COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
           ROUND(CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_return_rate_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return-rate screen (analytics.return_rate_by_brand):
    one conditional-agg pass over the broadcast-dim join."""
    return analytics.return_rate_by_brand(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )


@register(
    "session_depth_histogram",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                       - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w
                       > 30 * 60 * 1000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
    sess AS (
      SELECT user_id,
             SUM(new_session) OVER (PARTITION BY user_id
                  ORDER BY CAST(ts AS TIMESTAMP), event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged),
    depths AS (
      SELECT user_id, sid, COUNT(*) AS depth FROM sess GROUP BY user_id, sid),
    hist AS (SELECT depth, COUNT(*) AS n_sessions FROM depths GROUP BY depth),
    tot AS (SELECT CAST(SUM(n_sessions) AS BIGINT) AS n_total FROM hist)
    SELECT depth, n_sessions,
           ROUND(CAST(n_sessions AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
             AS share
    FROM hist, tot
    """,
)
def q_session_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session depth distribution (events.session_depth_histogram):
    islands → per-session count → histogram + shares."""
    return events.session_depth_histogram(load_table(spark, sf_dir, "events"))


@register(
    "value_drift_psi",
    oracle="""
    WITH hist AS (
      SELECT event_type,
             CAST(floor(CAST(value AS DECIMAL(18,2)) / CAST(10.0 AS DECIMAL(18,2)))
                  AS BIGINT) AS bucket,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_before,
             CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END)
                  AS BIGINT) AS n_after
      FROM events GROUP BY event_type, bucket),
    totals AS (
      SELECT event_type,
             CAST(SUM(n_before) AS BIGINT) AS tb,
             CAST(SUM(n_after) AS BIGINT) AS ta,
             COUNT(*) AS n_bins
      FROM hist GROUP BY event_type),
    j AS (
      SELECT h.event_type, t.n_bins,
             CAST(h.n_before + 1 AS DOUBLE)
               / CAST(t.tb + t.n_bins * 1 AS DOUBLE) AS p,
             CAST(h.n_after + 1 AS DOUBLE)
               / CAST(t.ta + t.n_bins * 1 AS DOUBLE) AS q
      FROM hist h JOIN totals t USING (event_type))
    SELECT event_type, MAX(n_bins) AS n_bins,
           ROUND(SUM((p - q) * ln(p / q)), 6) AS psi
    FROM j GROUP BY event_type
    """,
)
def q_value_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type
    (events.value_drift_psi): Laplace-smoothed binned shares over the
    same decimal buckets and split as the KS screen."""
    return events.value_drift_psi(load_table(spark, sf_dir, "events"))


@register(
    "approx_distinct_checked",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct with its 5% error claim as an oracle-checked
    boolean (agg.approx_distinct_checked, VERDICT r4 #6): the oracle
    computes exact and asserts TRUE; sketch drift flips the hash."""
    return agg.approx_distinct_checked(load_table(spark, sf_dir, "events"))


@register(
    "hll_rollup_checked",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d'))
                AS BIGINT) AS n_days,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_hll_rollup_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable per-(day,type) HLL sketch rollup with the union
    estimate's 5% bound oracle-checked (agg.hll_rollup_checked): the
    incremental 100 TB distinct-count pattern, now externally
    verified instead of rows-only."""
    return agg.hll_rollup_checked(load_table(spark, sf_dir, "events"))


@register(
    "approx_percentiles_checked",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_in_band,
           TRUE AS p90_in_band
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_approx_percentiles_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile's rank-error guarantee oracle-checked
    (agg.approx_percentiles_checked): the sketch value's true rank
    interval must intersect p·n ± (n/accuracy + 2) — the exact
    1/accuracy bound plus two rows of discreteness slack, in rank
    space (no value-interpolation ambiguity)."""
    return agg.approx_percentiles_checked(load_table(spark, sf_dir, "lineitem"))


@register(
    "stratified_sample_checked",
    oracle="""
    SELECT lang AS stratum,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           TRUE AS within_bound
    FROM documents GROUP BY lang
    """,
)
def q_stratified_sample_checked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum Bernoulli sampler with its 6σ count bound (and the
    fraction-1.0 exact-passthrough) oracle-checked
    (sampling.stratified_sample_checked)."""
    return sampling.stratified_sample_checked(load_table(spark, sf_dir, "documents"))


@register(
    "zipf_fit",
    oracle=f"""
    WITH wc AS (
      SELECT word, COUNT(*) AS cnt
      FROM (SELECT unnest({DUCK_TOKENS}) AS word FROM documents)
      GROUP BY word),
    r AS (
      SELECT cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rnk
      FROM wc),
    p AS (
      SELECT ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
      FROM r WHERE rnk <= 1000)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                 / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS slope,
           ROUND((SUM(y) - (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y))
                           / (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                           * SUM(x)) / COUNT(*), 6) AS intercept
    FROM p
    """,
)
def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law OLS fit over the top-1000 word frequencies
    (textstats.zipf_fit): corpus-health slope/intercept; ranks from
    the range-partitioned global rank."""
    return textstats.zipf_fit(load_table(spark, sf_dir, "documents"))


@register(
    "pii_screen",
    oracle=f"""
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN regexp_matches(text, '{textstats.PII_EMAIL}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_email,
           CAST(SUM(CASE WHEN regexp_matches(text, '{textstats.PII_PHONE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_phone,
           CAST(SUM(CASE WHEN regexp_matches(text, '{textstats.PII_LONGNUM}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_longnum,
           ROUND(CAST(SUM(CASE WHEN regexp_matches(text, '{textstats.PII_EMAIL}')
                               OR regexp_matches(text, '{textstats.PII_PHONE}')
                               OR regexp_matches(text, '{textstats.PII_LONGNUM}')
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS pii_share
    FROM documents GROUP BY source
    """,
)
def q_pii_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure screen (textstats.pii_screen): email /
    phone / long-digit-run document counts — the scrub gate before a
    source enters the training mix. The synthetic corpus is clean, so
    both engines must agree on zeros; detection semantics are pinned
    on planted PII in tests/test_round5_fixes.py."""
    return textstats.pii_screen(load_table(spark, sf_dir, "documents"))


@register(
    "weighted_median_price",
    oracle="""
    WITH t AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             CAST(l_quantity AS DECIMAL(18,2)) AS q,
             l_orderkey, l_linenumber
      FROM lineitem),
    c AS (
      SELECT l_returnflag, p,
             SUM(q) OVER (PARTITION BY l_returnflag
                          ORDER BY p, l_orderkey, l_linenumber
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum,
             SUM(q) OVER (PARTITION BY l_returnflag) AS tot
      FROM t)
    SELECT l_returnflag,
           CAST(MAX(tot) AS DOUBLE) AS total_qty,
           CAST(MIN(CASE WHEN 2 * cum >= tot THEN p END) AS DOUBLE)
             AS weighted_median_price
    FROM c GROUP BY l_returnflag
    """,
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag
    (agg.weighted_median_price): range-partitioned cumulative-weight
    sweep — the weighted-percentile primitive no built-in covers,
    computed without any task sweeping a whole flag."""
    return agg.weighted_median_price(load_table(spark, sf_dir, "lineitem"))


@register(
    "gopher_repetition_screen",
    oracle=_GOPHER_REP_SQL,
)
def q_gopher_repetition_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (textstats.gopher_repetition_screen,
    Rae et al. 2021 Table A1): top-2/3-gram and duplicated-5-gram
    character fractions with pass flags — the char-fraction complement
    to repetition_score's occurrence fraction."""
    return textstats.gopher_repetition_screen(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "stupid_backoff_scores",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    tr AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
    sc AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
    tri AS (SELECT unnest(CASE WHEN len(t) >= 3
              THEN list_transform(range(1, len(t)-1),
                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
              ELSE [] END) AS g FROM tr),
    big AS (SELECT unnest(CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)),
                   i -> t[i] || ' ' || t[i+1])
              ELSE [] END) AS g FROM tr),
    uni AS (SELECT unnest(t) AS g FROM tr),
    c3 AS (SELECT g, COUNT(*) AS c3 FROM tri GROUP BY g),
    c2 AS (SELECT g, COUNT(*) AS c2 FROM big GROUP BY g),
    c1 AS (SELECT g, COUNT(*) AS c1 FROM uni GROUP BY g),
    n AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS n FROM tr),
    occ AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2, t[i+2] AS w3
            FROM sc, LATERAL (SELECT unnest(range(1, len(t)-1)) AS i) s
            WHERE len(t) >= 3),
    j AS (SELECT occ.doc_id,
            -- literal backoff constants are Python float repr of
            -- 0.4**2 and 0.4**3 so both engines see identical doubles
            CASE WHEN c3.c3 IS NOT NULL THEN CAST(c3.c3 AS DOUBLE) / cp.c2
                 WHEN cs.c2 IS NOT NULL THEN 0.4 * cs.c2 / u2.c1
                 WHEN u3.c1 IS NOT NULL
                   THEN 0.16000000000000003 * u3.c1 / n.n
                 ELSE 0.06400000000000002 / n.n END AS s
          FROM occ
          LEFT JOIN c3 ON c3.g = occ.w1 || ' ' || occ.w2 || ' ' || occ.w3
          LEFT JOIN c2 cp ON cp.g = occ.w1 || ' ' || occ.w2
          LEFT JOIN c2 cs ON cs.g = occ.w2 || ' ' || occ.w3
          LEFT JOIN c1 u2 ON u2.g = occ.w2
          LEFT JOIN c1 u3 ON u3.g = occ.w3
          CROSS JOIN n)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           ROUND(AVG(log10(s)), 4) AS mean_log10_s
    FROM j GROUP BY doc_id
    """,
)
def q_stupid_backoff_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram scoring (textstats.stupid_backoff_scores,
    Brants et al. 2007): even-doc counts score odd docs through the
    count/backoff CASE — the canonical web-scale distributed n-gram LM
    re-expressed as gram-keyed joins."""
    return textstats.stupid_backoff_scores(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "kn_continuation_counts",
    oracle=f"""
    WITH toks AS (SELECT {DUCK_TOKENS} AS t FROM documents),
    uni AS (SELECT unnest(t) AS tok FROM toks),
    cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c_total
           FROM uni GROUP BY tok),
    pairs AS (SELECT DISTINCT string_split(g, ' ')[1] AS v,
                              string_split(g, ' ')[2] AS w
              FROM (SELECT unnest(CASE WHEN len(t) >= 2
                      THEN list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS g
                    FROM toks)),
    nt AS (SELECT COUNT(*) AS nt FROM pairs),
    lc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_left_contexts
           FROM pairs GROUP BY w),
    rc AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_right_contexts
           FROM pairs GROUP BY v)
    SELECT cu.tok, cu.c_total,
           COALESCE(lc.n_left_contexts, 0) AS n_left_contexts,
           COALESCE(rc.n_right_contexts, 0) AS n_right_contexts,
           ROUND(CAST(COALESCE(lc.n_left_contexts, 0) AS DOUBLE) / nt.nt, 6)
             AS cont_prob
    FROM cu LEFT JOIN lc ON lc.w = cu.tok
    LEFT JOIN rc ON rc.v = cu.tok CROSS JOIN nt
    """,
)
def q_kn_continuation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kneser-Ney continuation statistics per token
    (textstats.kn_continuation_counts): distinct left/right contexts
    and the KN continuation probability — one distinct-bigram agg plus
    vocab-bounded counts."""
    return textstats.kn_continuation_counts(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "perplexity_tercile_mix",
    # reuses doc_perplexity's bigram-LM CTE verbatim so the two oracles
    # can never drift apart, then buckets with SQL NTILE(3) — the exact
    # semantics topk.global_ntile implements
    oracle=f"""
    WITH toks AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    bi AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)),
                  i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS bigram
           FROM toks),
    uni AS (SELECT unnest({DUCK_TOKENS}) AS tok FROM documents),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bi GROUP BY bigram),
    c1 AS (SELECT tok, COUNT(*) AS c1 FROM uni GROUP BY tok),
    v AS (SELECT COUNT(DISTINCT tok) AS v FROM uni),
    s AS (SELECT bi.doc_id,
                 log2(CAST(c2.c2 + 1 AS DOUBLE) / (c1.c1 + v.v)) AS lp
          FROM bi JOIN c2 USING (bigram)
          JOIN c1 ON c1.tok = string_split(bi.bigram, ' ')[1]
          CROSS JOIN v),
    ppl AS (SELECT doc_id, ROUND(pow(2.0, -AVG(lp)), 4) AS ppl
            FROM s GROUP BY doc_id),
    binned AS (SELECT doc_id, ppl,
                      NTILE(3) OVER (ORDER BY ppl, doc_id) AS b FROM ppl)
    SELECT d.source,
           CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
             AS ppl_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           -- decimal SUM then one UNROUNDED divide: order-independent
           -- and bit-identical to the Spark side (rounding the mean is
           -- structurally unsafe — 4dp sums over small n hit exact
           -- .00005 midpoints where the engines' round modes disagree)
           CAST(SUM(CAST(binned.ppl AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg_ppl
    FROM binned JOIN documents d USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q_perplexity_tercile_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity terciles per source
    (textstats.perplexity_tercile_mix): bigram-LM perplexity bucketed
    by the range-partitioned exact NTILE — a permanent live guard on
    the round-9 rank-machinery fix (its downstream aggregate keeps
    source and ppl, the pruning-divergent consumer shape)."""
    return textstats.perplexity_tercile_mix(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "source_temperature_mix",
    oracle=f"""
    WITH per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                        CAST(SUM(len({DUCK_TOKENS})) AS BIGINT) AS n_tokens
                 FROM documents GROUP BY source),
    tot AS (SELECT SUM(n_tokens) AS tot FROM per),
    p AS (SELECT per.*, CAST(n_tokens AS DOUBLE) / tot.tot AS p FROM per
          CROSS JOIN tot),
    z AS (SELECT SUM(pow(p, 0.3)) AS z FROM p)
    SELECT source, n_docs, n_tokens,
           ROUND(p, 6) AS p_natural,
           ROUND(pow(p, 0.3) / z.z, 6) AS p_temperature,
           ROUND(pow(p, 0.3) / z.z / p, 4) AS oversample_factor
    FROM p CROSS JOIN z ORDER BY source
    """,
)
def q_source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-temperature source sampling weights
    (packing.source_temperature_mix, the mT5/XLM-R recipe): natural vs
    temperature token shares and oversample factors per source — one
    partial-agg pass plus broadcast scalars."""
    return packing.source_temperature_mix(
        load_table(spark, sf_dir, "documents")
    )


