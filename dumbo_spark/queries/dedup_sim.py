"""Dedup + similarity-search queries (SURVEY §2.5) — mechanically split out of registry.py in round 13
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


# ═══ M5: dedup (north star §2.5) ════════════════════════════════════════


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_exact(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_normalized",
    oracle=r"""
    SELECT md5(trim(regexp_replace(lower(text), '\W+', ' ', 'g'))) AS norm_hash,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def q_dedup_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_normalized(load_table(spark, sf_dir, "documents"))


@register("dedup_fuzzy", oracle=None)  # probabilistic (MinHash-LSH)
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_fuzzy(load_table(spark, sf_dir, "documents"))


@register("dedup_fuzzy_verified", oracle=None)  # LSH recall is probabilistic
def q_dedup_fuzzy_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_fuzzy_verified(load_table(spark, sf_dir, "documents"))


@register("dedup_clusters", oracle=None)  # edges are LSH-derived
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_clusters(load_table(spark, sf_dir, "documents"))


@register("dedup_simhash", oracle=None)  # probabilistic (SimHash)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.dedup_simhash(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_simhash_md5",
    # md5-twin of dedup_simhash (VERDICT r11 Next #5): per-token hash
    # bits come from md5 hex digits, which both engines compute
    # identically, so DuckDB replays signature construction
    # bit-for-bit. The oracle pairs BRUTE-FORCE (sig a × sig b) — the
    # engine's 4×16-bit banding is LOSSLESS for Hamming ≤ 3 by
    # pigeonhole, so the exhaustive pair set is the exact same set;
    # brute force in the oracle is the ground-truth discipline
    # (dedup_recall_checked), n² only at verification scale.
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS ts
      FROM documents),
    tok AS (SELECT doc_id, t AS tok FROM toks, UNNEST(ts) AS u(t)),
    hx AS (SELECT doc_id, md5(tok) AS h FROM tok),
    bits AS (
      SELECT doc_id, j,
             SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, j // 4 + 1, 1)) - 1)
                            >> (j % 4)) & 1 = 1
                      THEN 1 ELSE -1 END) AS s
      FROM hx, UNNEST(generate_series(0, 63)) AS u(j)
      GROUP BY doc_id, j),
    sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0
                           THEN CASE WHEN j = 63 THEN -9223372036854775808
                                     ELSE CAST(1 AS BIGINT) << j END
                           ELSE 0 END) AS BIGINT) AS sim
      FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sim, b.sim)) <= 3
    """,
)
def q_dedup_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs on the engine-neutral md5 hash family —
    the provability twin that makes the SimHash pipeline (per-token
    hash bits → 64 signed bit-sums → sign signature → banded Hamming
    join) value-checked end to end; dedup_simhash keeps the xxhash64
    throughput family."""
    return dedup.dedup_simhash_md5(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_clusters_md5",
    # md5-twin of dedup_clusters: the doc_pagerank oracle's edge
    # replay (md5 MinHash → 8-band LSH → ≥12/32 screen → integer
    # Jaccard verify) feeding jaccard_clusters' recursive-CTE
    # transitive closure, summarized per cluster — the full
    # corpus-dedup END SHAPE (what you'd delete) checked cross-engine.
    oracle=r"""
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    dg AS (SELECT DISTINCT doc_id, gram FROM grams),
    hd AS (
      SELECT doc_id, d, md5(CAST(d AS VARCHAR) || ':' || gram) AS hx
      FROM dg, UNNEST(generate_series(0, 7)) AS u(d)),
    hs AS (
      SELECT doc_id, d * 4 + l AS i, MIN(substr(hx, l * 8 + 1, 8)) AS h
      FROM hd, UNNEST(generate_series(0, 3)) AS v(l)
      GROUP BY doc_id, d * 4 + l),
    sig AS (SELECT doc_id, list(h ORDER BY i) AS s FROM hs GROUP BY doc_id),
    bands AS (
      SELECT doc_id, s,
             md5(CAST(t AS VARCHAR) || '|' ||
                 s[4*t+1] || s[4*t+2] || s[4*t+3] || s[4*t+4]) AS band_key
      FROM sig, UNNEST(generate_series(0, 7)) AS b(t)),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_key = b.band_key AND a.doc_id < b.doc_id
      WHERE len(list_filter(generate_series(1, 32),
                            i -> a.s[i] = b.s[i])) >= 12),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM dg GROUP BY 1),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS c
      FROM cand c JOIN dg x ON x.doc_id = c.doc_a
                  JOIN dg y ON y.doc_id = c.doc_b AND y.gram = x.gram
      GROUP BY 1, 2),
    pairs AS (
      SELECT i.doc_a, i.doc_b
      FROM inter i JOIN sizes sa ON i.doc_a = sa.doc_id
                   JOIN sizes sb ON i.doc_b = sb.doc_id
      WHERE 10 * i.c >= 7 * (sa.n + sb.n - i.c)),
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    cc AS (SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node)
    SELECT cluster_id, COUNT(*) AS n_members, MIN(doc_id) AS keep_id
    FROM cc GROUP BY cluster_id
    """,
)
def q_dedup_clusters_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level fuzzy-dedup clustering on the md5 hash family
    (dedup.dedup_clusters_md5) — LSH edges, connected components, and
    the keeper/size summary all replayed in DuckDB; dedup_clusters
    keeps the xxhash64 throughput family."""
    return dedup.dedup_clusters_md5(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_jaccard",
    oracle="""
    WITH toks AS (
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
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE 100 * c >= 60 * (sa.n + sb.n - c)
    """,
)
def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard join: the ONLY dedup query with a full
    value oracle — prefix filtering is lossless, so the brute-force
    DuckDB pair set must match bit-for-bit (unlike MinHash/SimHash,
    which are recall-bounded in unit tests instead)."""
    return dedup.jaccard_ngram_pairs(load_table(spark, sf_dir, "documents"))


@register(
    "fuzzy_join_sources",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             list_filter(string_split_regex(lower(text), '\\W+'), x -> x <> '') AS ts
      FROM documents),
    grams AS (
      SELECT DISTINCT doc_id, source, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id, COUNT(*) AS c
      FROM grams a JOIN grams b ON a.gram = b.gram
      WHERE a.source = 'src0' AND b.source <> 'src0'
      GROUP BY 1, 2)
    SELECT left_id, right_id,
           ROUND(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON left_id = sa.doc_id
    JOIN sizes sb ON right_id = sb.doc_id
    WHERE 100 * c >= 60 * (sa.n + sb.n - c)
    """,
)
def q_fuzzy_join_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table exact Jaccard JOIN (dedup.fuzzy_join_jaccard):
    source 'src0' matched against every other source — the
    entity-resolution form; brute-force DuckDB oracle must match
    bit-for-bit (prefix filter is lossless across tables too)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.fuzzy_join_jaccard(
        docs.where(F.col("source") == "src0"),
        docs.where(F.col("source") != "src0"),
    )


@register(
    "jaccard_clusters",
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
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src)
    SELECT node AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY node
    """,
)
def q_jaccard_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the EXACT Jaccard pair set — the
    iterative min-label operator with a full value oracle (DuckDB
    recursive-CTE transitive closure over the same deterministic
    edges). This is the end-to-end check dedup_clusters can't have
    (its MinHash edges are probabilistic)."""
    edges = dedup.jaccard_ngram_pairs(
        load_table(spark, sf_dir, "documents")
    ).select("doc_a", "doc_b")
    return dedup.connected_components(edges)


@register(
    "dedup_canonical",
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
    clusters AS (SELECT node AS doc_id, MIN(r) AS cluster_id
                 FROM reach GROUP BY node),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id ASC) AS rk
      FROM clusters c JOIN documents d USING (doc_id))
    SELECT cluster_id,
           COUNT(*) AS n_members,
           MIN(CASE WHEN rk = 1 THEN doc_id END) AS canonical_doc,
           MIN(CASE WHEN rk = 1 THEN n_chars END) AS canonical_chars,
           COUNT(*) - 1 AS n_dropped
    FROM ranked GROUP BY cluster_id HAVING COUNT(*) >= 2
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection per exact-Jaccard cluster
    (dedup.canonical_per_cluster): clusters via PPJoin + iterative CC,
    arg-max by (n_chars, doc_id) inside each near-dup clique."""
    return dedup.canonical_per_cluster(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_incremental",
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))
               AS norm_hash
      FROM documents),
    batch AS (
      SELECT norm_hash,
             MIN(doc_id) AS admit_id,
             COUNT(*) AS n_in_batch
      FROM fp WHERE source = 'src0' GROUP BY norm_hash)
    SELECT b.norm_hash, b.admit_id, b.n_in_batch
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM fp c
                      WHERE c.source <> 'src0' AND c.norm_hash = b.norm_hash)
    """,
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup (dedup.incremental_dedup): the src0
    batch is admitted only where its normalized md5 is novel vs the
    rest-of-corpus fingerprint table — O(|batch|) marginal cost."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.incremental_dedup(
        corpus=docs.where(F.col("source") != "src0"),
        batch=docs.where(F.col("source") == "src0"),
    )


@register(
    "dedup_substring",
    # ADVICE r8: tokenize with the shared DUCK_TOKENS fragment (exact
    # match for tokens() — drops empty tokens) instead of the
    # trim/regexp_replace variant, which returns [''] for empty or
    # punctuation-only text; the len filter happened to hide it here.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {DUCK_TOKENS} AS toks
      FROM documents),
    w AS (
      SELECT doc_id, md5(array_to_string(toks[p : p + 19], ' ')) AS wh
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 19, 1))
                       AS p) s
      WHERE len(toks) >= 20),
    uw AS (SELECT DISTINCT doc_id, wh FROM w),
    band AS (SELECT wh FROM uw GROUP BY wh HAVING COUNT(*) BETWEEN 2 AND 50)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS n_shared_windows
    FROM uw a
    JOIN band USING (wh)
    JOIN uw b ON b.wh = a.wh AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def q_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dup pairs (dedup.substring_dup_pairs):
    verbatim 20-token spans shared across documents via every-position
    window fingerprints with a document-frequency band — the Lee et
    al. 2022 dedup mode that document-level Jaccard under-detects."""
    return dedup.substring_dup_pairs(load_table(spark, sf_dir, "documents"))


# dedup_substring_trim's window width, shared by the operator call and
# the oracle SQL below (ADVICE r14: the oracle used to hardcode 19/20
# literals, silently desyncing if the operator default ever changed).
_TRIM_W = 20
# the trim operator coalesces null text to '' (n_tokens=0, kept_text='')
# — the oracle must tokenize the same value or a null-text row would
# yield NULL n_tokens and diverge (ADVICE r14; latent, no fixture has
# null text today). DUCK_TOKENS itself stays un-coalesced because the
# detection-half oracles filter len(toks) >= w, which drops NULLs.
_TRIM_TOKENS = (
    r"list_filter(string_split_regex(lower(coalesce(text, '')), '\W+'),"
    r" t -> t <> '')"
)


@register(
    "dedup_substring_trim",
    # r14: the REMOVAL half of ExactSubstr dedup (dedup_substring is
    # the detection half) — 747 duplicated windows exist at sf0.01, so
    # the trim is exercised on real rows. Same tokenization and
    # 1-based inclusive list slicing as the detection oracle; ordered
    # reassembly via string_agg(... ORDER BY i) mirrors Spark's
    # ordered-position rejoin. The oracle deliberately keeps the
    # direct covered-position anti-join formulation as an INDEPENDENT
    # recomputation of the r15 operator's interval-merge plan.
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_TRIM_TOKENS} AS toks
      FROM documents),
    occ AS (
      SELECT doc_id, p,
             md5(array_to_string(toks[p : p + {_TRIM_W - 1}], ' ')) AS wh
      FROM d, LATERAL (SELECT unnest(
                         generate_series(1, len(toks) - {_TRIM_W - 1}, 1))
                       AS p) s
      WHERE len(toks) >= {_TRIM_W}),
    stats AS (
      SELECT wh, MIN(doc_id) AS keeper, COUNT(DISTINCT doc_id) AS df
      FROM occ GROUP BY wh),
    cov AS (
      SELECT DISTINCT doc_id, i FROM (
        SELECT o.doc_id,
               unnest(generate_series(o.p, o.p + {_TRIM_W - 1}, 1)) AS i
        FROM occ o JOIN stats USING (wh)
        WHERE stats.df >= 2 AND o.doc_id <> stats.keeper) t),
    tp AS (
      SELECT doc_id, i, toks[i] AS tok
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks), 1))
                       AS i) s),
    kept AS (
      SELECT tp.doc_id, tp.i, tp.tok FROM tp
      ANTI JOIN cov ON tp.doc_id = cov.doc_id AND tp.i = cov.i),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY i) AS kept_text
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(len(d.toks) - COALESCE(agg.n_kept, 0) AS BIGINT)
             AS n_removed,
           COALESCE(agg.kept_text, '') AS kept_text
    FROM d LEFT JOIN agg USING (doc_id)
    """,
)
def q_dedup_substring_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr REMOVAL (dedup.substring_dedup_trim): positions
    covered by a verbatim _TRIM_W-token span already present in an
    earlier (min-doc_id) document are excised; every document
    re-emitted from its surviving tokens in order."""
    return dedup.substring_dedup_trim(
        load_table(spark, sf_dir, "documents"), window_tokens=_TRIM_W
    )


# selfrepeat_trim's window width and the planted-prefix length, shared
# operator-call/oracle like _TRIM_W (same desync class: a literal
# edited on one side would silently diverge until the differential
# fails). w=10 (not 20): the planted partial repeat is a ~120-char
# prefix (~20 tokens), so w=10 exercises both full- and partial-repeat
# branches.
_SELF_W = 10
_SELF_PREFIX_CHARS = 120


@register(
    "dedup_selfrepeat_trim",
    # r15: INTRA-document ExactSubstr trim. The synthetic corpus has
    # ZERO intra-doc repeated windows at any w (measured 5..20 at
    # sf0.01), so repeats are PLANTED by SQL-replayable doc_id
    # arithmetic (the semantic_dedup_planted pattern): doc_id%7=0 docs
    # append a full self-copy, doc_id%7=3 docs append their 120-char
    # prefix — the trim must excise exactly the planted repetition
    # (keep-first) and round-trip every other doc untouched.
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text
                  WHEN doc_id % 7 = 3 THEN text || ' ' || substr(text, 1, {_SELF_PREFIX_CHARS})
                  ELSE text END AS text
      FROM documents),
    d AS (
      SELECT doc_id, {_TRIM_TOKENS} AS toks
      FROM base),
    occ AS (
      SELECT doc_id, p,
             md5(array_to_string(toks[p : p + {_SELF_W - 1}], ' ')) AS wh
      FROM d, LATERAL (SELECT unnest(
                         generate_series(1, len(toks) - {_SELF_W - 1}, 1))
                       AS p) s
      WHERE len(toks) >= {_SELF_W}),
    firsts AS (
      SELECT doc_id, wh, MIN(p) AS fp, COUNT(*) AS n
      FROM occ GROUP BY doc_id, wh),
    cov AS (
      SELECT DISTINCT doc_id, i FROM (
        SELECT o.doc_id,
               unnest(generate_series(o.p, o.p + {_SELF_W - 1}, 1)) AS i
        FROM occ o JOIN firsts f ON o.doc_id = f.doc_id AND o.wh = f.wh
        WHERE f.n >= 2 AND o.p <> f.fp) t),
    tp AS (
      SELECT doc_id, i, toks[i] AS tok
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks), 1))
                       AS i) s),
    kept AS (
      SELECT tp.doc_id, tp.i, tp.tok FROM tp
      ANTI JOIN cov ON tp.doc_id = cov.doc_id AND tp.i = cov.i),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(tok, ' ' ORDER BY i) AS kept_text
      FROM kept GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(len(d.toks) AS BIGINT) AS n_tokens,
           CAST(len(d.toks) - COALESCE(agg.n_kept, 0) AS BIGINT)
             AS n_removed,
           COALESCE(agg.kept_text, '') AS kept_text
    FROM d LEFT JOIN agg USING (doc_id)
    """,
)
def q_dedup_selfrepeat_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document ExactSubstr trim (dedup.selfrepeat_trim) on the
    planted-repeat corpus: keep-first removal of every _SELF_W-token
    span repeated within one document."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" "), F.col("text")),
        )
        .when(
            F.col("doc_id") % 7 == 3,
            F.concat(
                F.col("text"), F.lit(" "), F.substring(F.col("text"), 1, _SELF_PREFIX_CHARS)
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.selfrepeat_trim(planted, window_tokens=_SELF_W)


@register(
    "dedup_winnowed",
    # ADVICE r8: shared DUCK_TOKENS fragment (see dedup_substring).
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {DUCK_TOKENS} AS toks
      FROM documents),
    g AS (
      SELECT doc_id, p, md5(array_to_string(toks[p : p + 7], ' ')) AS gh
      FROM d, LATERAL (SELECT unnest(generate_series(1, len(toks) - 7, 1))
                       AS p) s
      WHERE len(toks) >= 11),
    wn AS (
      SELECT doc_id, p,
             MIN(gh) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
             COUNT(*) OVER (PARTITION BY doc_id) AS n_grams
      FROM g),
    uf AS (SELECT DISTINCT doc_id, fp FROM wn WHERE p <= n_grams - 3),
    band AS (SELECT fp FROM uf GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 50)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared_fps
    FROM uf a
    JOIN band USING (fp)
    JOIN uf b ON b.fp = a.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    """,
)
def q_dedup_winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-fingerprint substring dedup (dedup.winnowed_dup_pairs,
    MOSS algorithm): min-hash of each 4-window of consecutive 8-token
    gram hashes — alignment-robust span detection at ~0.4x the
    fingerprint density of every-position windows; any shared span of
    >= 11 tokens is caught."""
    return dedup.winnowed_dup_pairs(load_table(spark, sf_dir, "documents"))


# Shared DSIR-weight SQL (round 10): dsir_importance_weights returns it
# whole; dsir_topk_selection wraps it with the deterministic rank cut.
_DSIR_SQL = f"""
    WITH toks AS (SELECT doc_id, source, {DUCK_TOKENS} AS t FROM documents),
    g AS (
      SELECT doc_id, source,
             CAST({sampling.sql_md5_bucket('gram', 256)} AS INTEGER) AS bucket
      FROM (SELECT doc_id, source,
                   unnest(CASE WHEN len(t) >= 2
                          THEN list_transform(range(1, len(t)),
                                              i -> t[i] || ' ' || t[i+1])
                          ELSE [] END) AS gram
            FROM toks)),
    raw AS (SELECT bucket, COUNT(*) AS cr FROM g GROUP BY bucket),
    tgt AS (SELECT bucket, COUNT(*) AS ct FROM g
            WHERE source = 'src0' GROUP BY bucket),
    tot AS (SELECT COUNT(*) AS nr,
                   COUNT(*) FILTER (WHERE source = 'src0') AS nt FROM g),
    r AS (SELECT raw.bucket,
                 CAST(ROUND(ln(CAST((COALESCE(ct, 0) + 1) * (nr + 256)
                                    AS DOUBLE)
                               / CAST((cr + 1) * (nt + 256) AS DOUBLE))
                            * 1e6) AS BIGINT) AS lr_micro
          FROM raw LEFT JOIN tgt USING (bucket) CROSS JOIN tot)
    SELECT g.doc_id, COUNT(*) AS n_grams,
           CAST(SUM(r.lr_micro) AS BIGINT) AS log_weight_micro
    FROM g JOIN r ON r.bucket = g.bucket
    GROUP BY g.doc_id
    """


@register("dsir_importance_weights", oracle=_DSIR_SQL)
def q_dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance weights
    (packing.dsir_importance_weights, Xie et al. 2023): per-document
    target-vs-raw log-likelihood ratio over engine-neutral md5 gram
    buckets, fixed-pointed to integer micro-units per bucket so the
    per-doc aggregation is an exact integer sum."""
    return packing.dsir_importance_weights(
        load_table(spark, sf_dir, "documents")
    )


# Shared Gopher-screen SQL replicas (round 9): the funnel report
# embeds both as derived tables, so the flag definitions have one
# source of truth per screen.
_GOPHER_QUALITY_SQL = f"""
    WITH d AS (
      SELECT doc_id, {DUCK_TOKENS} AS toks
      FROM documents),
    m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             ROUND(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
                   / len(toks), 4) AS mean_word_len,
             ROUND(CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
                        AS DOUBLE) / len(toks), 4) AS alpha_frac,
             CAST(len(list_filter(toks, x -> x IN
                  ('the','and','of','to','in','is','it','a'))) AS INTEGER)
               AS n_stopwords
      FROM d WHERE len(toks) > 0)
    SELECT doc_id,
           CAST(n_words AS INTEGER) AS n_words,
           mean_word_len, alpha_frac, n_stopwords,
           n_words BETWEEN 10 AND 100000 AS words_ok,
           mean_word_len BETWEEN 3.0 AND 10.0 AS word_len_ok,
           alpha_frac >= 0.8 AS alpha_ok,
           n_stopwords >= 2 AS stopword_ok,
           (n_words BETWEEN 10 AND 100000)
             AND (mean_word_len BETWEEN 3.0 AND 10.0)
             AND alpha_frac >= 0.8
             AND n_stopwords >= 2 AS gopher_pass
    FROM m
    """


_GOPHER_REP_SQL = f"""
    WITH d AS (SELECT doc_id, {DUCK_TOKENS} AS t FROM documents),
    chars AS (SELECT doc_id,
                     CAST(COALESCE(list_sum(list_transform(t, x -> length(x))),
                                   0) AS BIGINT) AS n_chars_tok
              FROM d),
    g2 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE [] END) AS g FROM d),
    c2 AS (SELECT doc_id, g, COUNT(*) AS c, length(g) - 1 AS gchars
           FROM g2 GROUP BY doc_id, g),
    t2 AS (SELECT doc_id, c * gchars AS topchars FROM
           (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY c DESC, g ASC) AS rn FROM c2) WHERE rn = 1),
    g3 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 3
             THEN list_transform(range(1, len(t)-1),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
             ELSE [] END) AS g FROM d),
    c3 AS (SELECT doc_id, g, COUNT(*) AS c, length(g) - 2 AS gchars
           FROM g3 GROUP BY doc_id, g),
    t3 AS (SELECT doc_id, c * gchars AS topchars FROM
           (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                      ORDER BY c DESC, g ASC) AS rn FROM c3) WHERE rn = 1),
    g5 AS (SELECT doc_id, unnest(CASE WHEN len(t) >= 5
             THEN list_transform(range(1, len(t)-3),
                  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' ||
                       t[i+3] || ' ' || t[i+4])
             ELSE [] END) AS g FROM d),
    c5 AS (SELECT doc_id, g, COUNT(*) AS c, length(g) - 4 AS gchars
           FROM g5 GROUP BY doc_id, g),
    d5 AS (SELECT doc_id,
                  SUM(CASE WHEN c >= 2 THEN c * gchars ELSE 0 END) AS dupchars
           FROM c5 GROUP BY doc_id),
    m AS (
      SELECT chars.doc_id, n_chars_tok,
             CASE WHEN n_chars_tok > 0 THEN LEAST(
               ROUND(CAST(COALESCE(t2.topchars, 0) AS DOUBLE) / n_chars_tok, 4),
               1.0) ELSE 0.0 END AS top2_char_frac,
             CASE WHEN n_chars_tok > 0 THEN LEAST(
               ROUND(CAST(COALESCE(t3.topchars, 0) AS DOUBLE) / n_chars_tok, 4),
               1.0) ELSE 0.0 END AS top3_char_frac,
             CASE WHEN n_chars_tok > 0 THEN LEAST(
               ROUND(CAST(COALESCE(d5.dupchars, 0) AS DOUBLE) / n_chars_tok, 4),
               1.0) ELSE 0.0 END AS dup5_char_frac
      FROM chars LEFT JOIN t2 ON chars.doc_id = t2.doc_id
      LEFT JOIN t3 ON chars.doc_id = t3.doc_id
      LEFT JOIN d5 ON chars.doc_id = d5.doc_id)
    SELECT doc_id, n_chars_tok, top2_char_frac, top3_char_frac,
           dup5_char_frac,
           top2_char_frac <= 0.20 AS top2_ok,
           top3_char_frac <= 0.18 AS top3_ok,
           dup5_char_frac <= 0.15 AS dup5_ok,
           top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
             AND dup5_char_frac <= 0.15 AS repetition_pass
    FROM m
    """


@register(
    "gopher_quality_screen",
    # ADVICE r8: shared DUCK_TOKENS fragment — the trim/regexp_replace
    # variant keeps empty/punct-only docs as [''] (n_words=1) while the
    # engine's tokens() yields [] and drops them via n_words > 0.
    oracle=_GOPHER_QUALITY_SQL,
)
def q_gopher_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-rule quality screen (textstats.gopher_quality_screen):
    word-count / mean-word-length / alpha-fraction / stopword-presence
    flags per document plus the conjunctive pass — the Rae et al. 2021
    rule set as an auditable map-only pass."""
    return textstats.gopher_quality_screen(load_table(spark, sf_dir, "documents"))


@register(
    "filter_funnel_report",
    oracle=f"""
    WITH q AS (SELECT doc_id, words_ok, word_len_ok, alpha_ok,
                      stopword_ok FROM ({_GOPHER_QUALITY_SQL})),
    rep AS (SELECT doc_id, repetition_pass FROM ({_GOPHER_REP_SQL})),
    fl AS (
      SELECT q.doc_id IS NOT NULL AS c0,
             q.doc_id IS NOT NULL AND COALESCE(q.words_ok, FALSE) AS c1,
             q.doc_id IS NOT NULL AND COALESCE(q.words_ok, FALSE)
               AND COALESCE(q.word_len_ok, FALSE) AS c2,
             q.doc_id IS NOT NULL AND COALESCE(q.words_ok, FALSE)
               AND COALESCE(q.word_len_ok, FALSE)
               AND COALESCE(q.alpha_ok, FALSE) AS c3,
             q.doc_id IS NOT NULL AND COALESCE(q.words_ok, FALSE)
               AND COALESCE(q.word_len_ok, FALSE)
               AND COALESCE(q.alpha_ok, FALSE)
               AND COALESCE(q.stopword_ok, FALSE) AS c4,
             q.doc_id IS NOT NULL AND COALESCE(q.words_ok, FALSE)
               AND COALESCE(q.word_len_ok, FALSE)
               AND COALESCE(q.alpha_ok, FALSE)
               AND COALESCE(q.stopword_ok, FALSE)
               AND COALESCE(rep.repetition_pass, FALSE) AS c5
      FROM documents b
      LEFT JOIN q ON q.doc_id = b.doc_id
      LEFT JOIN rep ON rep.doc_id = b.doc_id),
    a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c0 THEN 1 ELSE 0 END) AS BIGINT) AS s0,
             CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS s2,
             CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS s3,
             CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS s4,
             CAST(SUM(CASE WHEN c5 THEN 1 ELSE 0 END) AS BIGINT) AS s5
      FROM fl),
    u AS (
      SELECT 1 AS rule_order, 'nonempty' AS rule, n AS n_input,
             s0 AS n_pass FROM a
      UNION ALL SELECT 2, 'word_count', s0, s1 FROM a
      UNION ALL SELECT 3, 'mean_word_len', s1, s2 FROM a
      UNION ALL SELECT 4, 'alpha_frac', s2, s3 FROM a
      UNION ALL SELECT 5, 'stopwords', s3, s4 FROM a
      UNION ALL SELECT 6, 'repetition', s4, s5 FROM a)
    SELECT rule_order, rule, n_input, n_pass,
           n_input - n_pass AS n_fail,
           CASE WHEN n_input > 0
                THEN ROUND(n_pass / CAST(n_input AS DOUBLE), 4)
                ELSE 0.0 END AS pass_pct
    FROM u
    """,
)
def q_filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel attrition report (textstats.
    filter_funnel_report): the six-rule quality chain applied in order
    with per-rule reached/passed/failed counts — the observability
    artifact threshold tuning runs on, anchored on the full documents
    table so zero-token docs fail `nonempty` instead of vanishing."""
    return textstats.filter_funnel_report(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "dedup_incremental_pruned",
    # Same oracle as dedup_incremental: the Bloom-style bucket prune is
    # semantics-preserving (equal hashes share a bucket; false
    # positives die in the exact anti-join), so the admitted set is
    # identical by construction — and the shared oracle proves it.
    oracle="""
    WITH fp AS (
      SELECT doc_id, source,
             md5(trim(regexp_replace(lower(text), '\\W+', ' ', 'g')))
               AS norm_hash
      FROM documents),
    batch AS (
      SELECT norm_hash,
             MIN(doc_id) AS admit_id,
             COUNT(*) AS n_in_batch
      FROM fp WHERE source = 'src0' GROUP BY norm_hash)
    SELECT b.norm_hash, b.admit_id, b.n_in_batch
    FROM batch b
    WHERE NOT EXISTS (SELECT 1 FROM fp c
                      WHERE c.source <> 'src0' AND c.norm_hash = b.norm_hash)
    """,
)
def q_dedup_incremental_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup with the Bloom-style pre-shuffle prune
    (dedup.incremental_dedup_pruned): the batch's bounded bucket set
    broadcasts to a left-semi join that drops non-colliding corpus
    fingerprints BEFORE the anti-join shuffle — O(|batch| +
    |corpus|·fp_rate) shuffle volume instead of O(|corpus|)."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.incremental_dedup_pruned(
        corpus=docs.where(F.col("source") != "src0"),
        batch=docs.where(F.col("source") == "src0"),
    )


# ═══ M5: similarity search (north star §2.5) ════════════════════════════

#: dot-product fragment folding left-to-right in double — bit-identical
#: to functions used by operators/similarity.py::_dot (verified:
#: list_inner_product is float-typed and does NOT match)
def _duck_dot(x: str, y: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({x}, {y}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    )


def _duck_lsh_sig(emb: str, dim: int = 64, n_bits: int = 16) -> str:
    """SQL fragment computing similarity.lsh_signatures' 16-bit
    random-hyperplane signature in DuckDB. The hyperplanes are FIXED
    ±1 operator-contract constants (similarity._hyperplane, seeded
    splitmix PRNG, no runtime randomness), so they inline into the
    oracle verbatim as +/- mask strings — the r11 promotion move that
    makes the LSH ANN family value-checkable (VERDICT r10 Next #3).
    Per bit j: the ±1 dot over floor(e·1e6)-quantized components — an
    EXACT integer, so the sign is summation-order-free on both engines
    (a float dot near zero is BLAS-order-dependent; r11 review) —
    contributes 2^j when positive."""
    from dumbo_spark.operators.similarity import _hyperplane

    qterm = f"CAST(FLOOR(CAST({emb}[i] AS DOUBLE) * 1000000) AS BIGINT)"
    terms = []
    for j in range(n_bits):
        mask = "".join(
            "+" if v > 0 else "-" for v in _hyperplane(dim, j)
        )
        dot = (
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> CASE WHEN substr('{mask}', i, 1) = '+' "
            f"THEN {qterm} "
            f"ELSE -{qterm} END))"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return "\n         + ".join(terms)


@register(
    "knn_cosine",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS q_emb
      FROM embeddings WHERE vec_id < 8),
    scored AS (
      SELECT q.query_id,
             e.vec_id AS neighbor_id,
             round({_duck_dot('q.q_emb', 'e.embedding')}
                   / (sqrt({_duck_dot('q.q_emb', 'q.q_emb')})
                      * sqrt({_duck_dot('e.embedding', 'e.embedding')})), 6)
               AS cos_sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id)
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_cosine(load_table(spark, sf_dir, "embeddings"))


@register(
    "knn_cosine_lsh",
    # Promoted from rows-only in r11: the hyperplanes are deterministic
    # operator-contract constants, so the oracle recomputes the exact
    # signatures/bands/candidates and the exact re-rank — the ANN path
    # is approximate vs knn_cosine but DETERMINISTIC vs itself, which
    # is what a value oracle checks (recall bounds live in
    # knn_recall_checked).
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
           {_duck_lsh_sig('embedding')} AS sg
      FROM embeddings),
    bands AS (
      SELECT vec_id, embedding, t, (sg >> (2 * t)) & 3 AS val
      FROM sig, UNNEST(generate_series(0, 7)) AS b(t)),
    q AS (SELECT vec_id AS query_id, embedding AS q_emb, t, val
          FROM bands WHERE vec_id < 8),
    cand AS (
      SELECT DISTINCT q.query_id, q.q_emb, c.vec_id, c.embedding
      FROM bands c JOIN q ON c.t = q.t AND c.val = q.val
      WHERE c.vec_id <> q.query_id),
    scored AS (
      SELECT query_id,
             vec_id AS neighbor_id,
             round({_duck_dot('q_emb', 'embedding')}
                   / (sqrt({_duck_dot('q_emb', 'q_emb')})
                      * sqrt({_duck_dot('embedding', 'embedding')})), 6)
               AS cos_sim
      FROM cand)
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rn
      FROM scored)
    WHERE rn <= 5
    """,
)
def q_knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_cosine_lsh(load_table(spark, sf_dir, "embeddings"))


def _duck_ivf_sql(
    n_cells: int = 16,
    n_probe: int = 4,
    n_iter: int = 5,
    k: int = 5,
    n_queries: int = 8,
    dim: int = 64,
) -> str:
    """Generated oracle for knn_cosine_ivf: replays the distributed
    integer-exact Lloyd iteration of similarity.det_kmeans_cells as an
    UNROLLED chain of CTEs (one assign+update pair per iteration —
    unrolling sidesteps DuckDB's single-self-reference recursion rule
    so empty cells can LEFT-JOIN their previous center), then the
    probe and exact re-rank. Every quantity the two engines compare is
    an exact BIGINT (squared distances, per-dim sums) or an IEEE
    double both compute from identical inputs in identical order."""
    sql = [
        f"""
    WITH qv AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
               e -> CAST(FLOOR(CAST(e AS DOUBLE) * 1000000) AS BIGINT)) AS x
      FROM embeddings),
    km0 AS (
      SELECT cell, m FROM (
        SELECT CAST(ROW_NUMBER() OVER (
                 ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
               AS INTEGER) - 1 AS cell, x AS m
        FROM qv) WHERE cell < {n_cells})"""
    ]
    assign = (
        "      SELECT vec_id, x, cell FROM (\n"
        "        SELECT qv.vec_id, qv.x, km{t}.cell,\n"
        "               ROW_NUMBER() OVER (PARTITION BY qv.vec_id ORDER BY\n"
        "                 list_sum(list_transform(list_zip(qv.x, km{t}.m),\n"
        "                          p -> (p[1] - p[2]) * (p[1] - p[2]))) ASC,\n"
        "                 km{t}.cell ASC) AS rn\n"
        "        FROM qv, km{t}) WHERE rn = 1"
    )
    for t in range(n_iter):
        sql.append(
            f""",
    a{t} AS (
{assign.format(t=t)}),
    u{t} AS (
      SELECT cell,
             list(CAST(FLOOR(CAST(s AS DOUBLE) / cnt) AS BIGINT)
                  ORDER BY i) AS m
      FROM (SELECT cell, i, SUM(x[i]) AS s, COUNT(*) AS cnt
            FROM a{t}, UNNEST(generate_series(1, {dim})) AS g(i)
            GROUP BY cell, i)
      GROUP BY cell),
    km{t + 1} AS (
      SELECT km{t}.cell, COALESCE(u{t}.m, km{t}.m) AS m
      FROM km{t} LEFT JOIN u{t} ON km{t}.cell = u{t}.cell)"""
        )
    cs = (
        f"{_duck_dot('qs.q_emb', 'cent.c')}"
        f" / (sqrt({_duck_dot('qs.q_emb', 'qs.q_emb')})"
        f" * sqrt({_duck_dot('cent.c', 'cent.c')}))"
    )
    sql.append(
        f""",
    afin AS (
{assign.format(t=n_iter)}),
    cent AS (
      SELECT cell,
             list_transform(m, v -> CAST(v AS DOUBLE) / 1000000.0) AS c
      FROM km{n_iter}),
    qs AS (SELECT vec_id AS query_id, embedding AS q_emb
           FROM embeddings WHERE vec_id < {n_queries}),
    probes AS (
      SELECT query_id, q_emb, cell FROM (
        SELECT qs.query_id, qs.q_emb, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY qs.query_id ORDER BY
                 {cs} DESC, cent.cell ASC) AS pr
        FROM qs, cent) WHERE pr <= {n_probe}),
    cand AS (
      SELECT DISTINCT p.query_id, p.q_emb, a.vec_id, e.embedding
      FROM probes p JOIN afin a ON a.cell = p.cell
                    JOIN qv e ON e.vec_id = a.vec_id
      WHERE a.vec_id <> p.query_id),
    scored AS (
      SELECT query_id, vec_id AS neighbor_id,
             round({_duck_dot('q_emb', 'embedding')}
                   / (sqrt({_duck_dot('q_emb', 'q_emb')})
                      * sqrt({_duck_dot('embedding', 'embedding')})), 6)
               AS cos_sim
      FROM cand)
    SELECT * FROM (
      SELECT query_id, neighbor_id, cos_sim,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY cos_sim DESC, neighbor_id ASC) AS INTEGER) AS rn
      FROM scored)
    WHERE rn <= {k}
    """
    )
    return "".join(sql)


@register(
    "knn_cosine_ivf",
    # Promoted from rows-only in r11 (VERDICT r10 Next #3): the coarse
    # quantizer is no longer Spark-ML KMeans but the distributed
    # integer-exact md5-seeded Lloyd iteration det_kmeans_cells, which
    # DuckDB replays verbatim (unrolled-CTE oracle) — the last of the
    # round's promotable ANN/graph names; rows-only drops to 9.
    oracle=_duck_ivf_sql(),
)
def q_knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.knn_cosine_ivf(load_table(spark, sf_dir, "embeddings"))


@register(
    "embedding_near_dup",
    # Promoted from rows-only in r11: same inlined-hyperplane move as
    # knn_cosine_lsh — candidates share the full 16-bit signature,
    # verification is the exact fold-ordered cosine both engines
    # compute identically.
    oracle=f"""
    WITH sig AS (
      SELECT vec_id, embedding,
           {_duck_lsh_sig('embedding')} AS sg
      FROM embeddings)
    SELECT vec_a, vec_b, cos_sim FROM (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             round({_duck_dot('a.embedding', 'b.embedding')}
                   / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
                      * sqrt({_duck_dot('b.embedding', 'b.embedding')})), 6)
               AS cos_sim
      FROM sig a JOIN sig b ON a.sg = b.sg AND a.vec_id < b.vec_id)
    WHERE cos_sim >= 0.2
    """,
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold 0.2 here (production default 0.95): the fixture
    embeddings are near-orthogonal random vectors (max same-signature
    cosine 0.26 at sf0.01), so the historical 0.9 threshold returned
    0 rows in every round — a VACUOUS check. 0.2 keeps the verified
    set non-empty so the r11 oracle exercises bucketing AND
    verification on real rows."""
    return similarity.embedding_near_dup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.2
    )


@register(
    "semantic_dedup",
    # Promoted from rows-only in r13 (VERDICT r12 Next #1): the r12
    # external row was VACUOUS (threshold 0.95 on a duplicate-free
    # fixture → 0 rows, indistinguishable from broken-empty). Same fix
    # embedding_near_dup got in r11: register the fixture-informative
    # threshold 0.2, and since BOTH halves of the pipeline were already
    # oracle-proven separately (LSH pair SQL: embedding_near_dup;
    # recursive-CTE CC: semantic_dedup_checked), composing them gives
    # the production path a FULL value oracle — cluster ids, keeper
    # flags and sizes hash-checked end to end.
    oracle=f"""
    WITH RECURSIVE sig AS (
      SELECT vec_id, embedding,
           {_duck_lsh_sig('embedding')} AS sg
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM sig a JOIN sig b ON a.sg = b.sg AND a.vec_id < b.vec_id
      WHERE round({_duck_dot('a.embedding', 'b.embedding')}
                  / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
                     * sqrt({_duck_dot('b.embedding', 'b.embedding')})),
                  6) >= 0.2),
    edges AS (SELECT va AS src, vb AS dst FROM p
              UNION ALL SELECT vb, va FROM p),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    cc AS (SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
    SELECT cc.vec_id, cc.cluster_id,
           cc.vec_id = cc.cluster_id AS is_keeper, sz.cluster_size
    FROM cc JOIN sz USING (cluster_id)
    """,
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (similarity.semantic_dedup):
    LSH-bucketed embedding near-dup pairs closed into clusters by
    iterative CC, min-id keeper per cluster. Threshold 0.2 here
    (production default 0.95) for the same reason as
    embedding_near_dup: the synthetic fixture is duplicate-free at
    0.95 (max pairwise cosine 0.513 at sf0.01), so the historical
    registration's external row was vacuously empty. The 0.95
    planted-duplicate semantics stay pinned in
    tests/test_round4_ops.py."""
    return similarity.semantic_dedup(
        load_table(spark, sf_dir, "embeddings"), threshold=0.2
    )


@register(
    "semantic_dedup_planted",
    # VERDICT r13 Next #2: semantic_dedup's external row runs the
    # fixture-informative threshold 0.2 (the fixture is duplicate-free
    # at 0.95), so the SHIPPED default threshold never carried an
    # external value row. This registration plants exact-replica
    # duplicates deterministically IN SQL-REPLAYABLE form (the
    # max-duplication replica trick scale_smoke uses): every vec_id
    # divisible by 10 gains a replica at vec_id+1e7, every vec_id
    # divisible by 20 a second replica at vec_id+2e7 — identical float
    # lists, so cosine rounds to 1.0 ≥ 0.95 in both engines and the
    # LSH signatures collide by construction. Expected clusters: size-3
    # for %20 ids, size-2 for the remaining %10 ids; the oracle is the
    # same composed LSH-pair + recursive-CTE-CC SQL as semantic_dedup,
    # over the planted union at the PRODUCTION threshold 0.95.
    oracle=f"""
    WITH RECURSIVE base AS (
      SELECT vec_id, embedding FROM embeddings WHERE vec_id IS NOT NULL),
    planted AS (
      SELECT vec_id, embedding FROM base
      UNION ALL
      SELECT vec_id + 10000000, embedding FROM base WHERE vec_id % 10 = 0
      UNION ALL
      SELECT vec_id + 20000000, embedding FROM base WHERE vec_id % 20 = 0),
    sig AS (
      SELECT vec_id, embedding,
           {_duck_lsh_sig('embedding')} AS sg
      FROM planted),
    p AS (
      SELECT a.vec_id AS va, b.vec_id AS vb
      FROM sig a JOIN sig b ON a.sg = b.sg AND a.vec_id < b.vec_id
      WHERE round({_duck_dot('a.embedding', 'b.embedding')}
                  / (sqrt({_duck_dot('a.embedding', 'a.embedding')})
                     * sqrt({_duck_dot('b.embedding', 'b.embedding')})),
                  6) >= 0.95),
    edges AS (SELECT va AS src, vb AS dst FROM p
              UNION ALL SELECT vb, va FROM p),
    reach(node, r) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, reach.r FROM reach JOIN edges e ON reach.node = e.src),
    cc AS (SELECT node AS vec_id, MIN(r) AS cluster_id FROM reach GROUP BY node),
    sz AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM cc GROUP BY 1)
    SELECT cc.vec_id, cc.cluster_id,
           cc.vec_id = cc.cluster_id AS is_keeper, sz.cluster_size
    FROM cc JOIN sz USING (cluster_id)
    """,
)
def q_semantic_dedup_planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """semantic_dedup at the PRODUCTION threshold 0.95 over the fixture
    union exact-replica planted duplicates (deterministic vec_id
    arithmetic, so the DuckDB oracle reconstructs the identical input).
    Proves the shipped default end to end: replica pairs cosine to
    exactly 1.0, survive the 0.95 gate, and close into the expected
    size-2/size-3 clusters with min-id keepers."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.where(F.col("vec_id").isNotNull())
    r1 = emb.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    r2 = emb.where(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + F.lit(20_000_000)).alias("vec_id"), "embedding"
    )
    return similarity.semantic_dedup(
        emb.unionByName(r1).unionByName(r2), threshold=0.95
    )


