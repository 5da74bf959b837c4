"""Corpus-distribution analytics + selection (round 10+) — mechanically split out of registry.py in round 13
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
from dumbo_spark.queries.compat_pack import (  # shared oracle helpers
    _CONTAM_SQL,
)
from dumbo_spark.queries.dedup_sim import (  # shared oracle helpers
    _DSIR_SQL,
)

# ═══ Round-10 additions: corpus-distribution analytics + selection ═════


@register(
    "source_divergence_matrix",
    oracle=f"""
    WITH counts AS (
      SELECT source, tok AS token, COUNT(*) AS c
      FROM (SELECT source, unnest({DUCK_TOKENS}) AS tok FROM documents)
      GROUP BY 1, 2),
    totals AS (SELECT source, SUM(c) AS n FROM counts GROUP BY 1),
    j AS (
      SELECT a.source AS src_a, b.source AS src_b,
             a.c AS ca, ta.n AS na, b.c AS cb, tb.n AS nb
      FROM counts a
      JOIN counts b ON b.token = a.token AND a.source < b.source
      JOIN totals ta ON ta.source = a.source
      JOIN totals tb ON tb.source = b.source),
    agg AS (
      SELECT src_a, src_b,
             CAST(COUNT(*) AS BIGINT) AS shared_tokens,
             SUM(CAST(ROUND((
                   (ca / CAST(na AS DOUBLE))
                     * ln((ca / CAST(na AS DOUBLE))
                          / (((ca / CAST(na AS DOUBLE))
                              + (cb / CAST(nb AS DOUBLE))) / 2))
                 + (cb / CAST(nb AS DOUBLE))
                     * ln((cb / CAST(nb AS DOUBLE))
                          / (((ca / CAST(na AS DOUBLE))
                              + (cb / CAST(nb AS DOUBLE))) / 2))
                 ) * 0.5 * 1e9) AS BIGINT)) AS shared_nano,
             SUM(ca) AS sca, SUM(cb) AS scb
      FROM j GROUP BY 1, 2),
    universe AS (
      SELECT ta.source AS src_a, ta.n AS na, tb.source AS src_b, tb.n AS nb
      FROM totals ta JOIN totals tb ON ta.source < tb.source)
    SELECT u.src_a, u.src_b,
           CAST(COALESCE(shared_tokens, 0) AS BIGINT) AS shared_tokens,
           ROUND(COALESCE(shared_nano, 0) / 1e9
                 + 0.5 * ln(2)
                   * ((na - COALESCE(sca, 0)) / CAST(na AS DOUBLE)
                      + (nb - COALESCE(scb, 0)) / CAST(nb AS DOUBLE)),
                 6) AS js_divergence
    FROM universe u LEFT JOIN agg
      ON agg.src_a = u.src_a AND agg.src_b = u.src_b
    """,
)
def q_source_divergence_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions (textstats.source_divergence_matrix) — the
    domain-distance matrix behind mixture design. DSIR's exactness
    discipline: per-token contributions fixed-pointed to integer
    nano-units, pair aggregation an exact integer sum; one-sided mass
    in closed form from exact shared-count sums (inner join only)."""
    return textstats.source_divergence_matrix(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "ngram_coverage_curve",
    oracle=f"""
    WITH toks AS (SELECT {DUCK_TOKENS} AS ts FROM documents),
    grams AS (
      SELECT ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS gram,
             COUNT(*) AS c
      FROM toks, UNNEST(generate_series(1, len(ts) - 2)) AS t(i)
      WHERE len(ts) >= 3
      GROUP BY 1),
    total AS (SELECT SUM(c) AS total FROM grams),
    ranked AS (
      SELECT c,
             ROW_NUMBER() OVER (ORDER BY c DESC, gram ASC) AS r,
             SUM(c) OVER (ORDER BY c DESC, gram ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
      FROM grams),
    ks AS (SELECT * FROM (VALUES (10), (100), (1000)) v(k))
    SELECT k,
           CAST(COUNT(*) AS BIGINT) AS head_types,
           CAST(MAX(cum) AS BIGINT) AS covered_occurrences,
           (SELECT CAST(total AS BIGINT) FROM total) AS total_occurrences,
           ROUND(MAX(cum) / (SELECT CAST(total AS DOUBLE) FROM total), 6)
             AS coverage
    FROM ranked JOIN ks ON r <= k
    GROUP BY k
    """,
)
def q_ngram_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram head-coverage curve (textstats.ngram_coverage_curve):
    the fraction of n-gram occurrences covered by the top-10/100/1000
    types — vocabulary/cache truncation design. The head cut is
    TakeOrderedAndProject (per-task heap, no global sort); the
    cumulative walk is a window over the bounded head frame."""
    return textstats.ngram_coverage_curve(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "token_position_stats",
    oracle=f"""
    WITH placed AS (
      SELECT t[i] AS token,
             CASE WHEN len(t) <= 1 THEN 500
                  ELSE (1000 * (i - 1)) // (len(t) - 1) END AS pos_mil
      FROM (SELECT {DUCK_TOKENS} AS t FROM documents),
           UNNEST(generate_series(1, len(t))) AS u(i)),
    stats AS (
      SELECT token, COUNT(*) AS n_occurrences,
             SUM(CAST(pos_mil AS DECIMAL(38,0))) AS s1,
             SUM(CAST(pos_mil * pos_mil AS DECIMAL(38,0))) AS s2
      FROM placed GROUP BY 1)
    SELECT token,
           CAST(n_occurrences AS BIGINT) AS n_occurrences,
           ROUND(CAST(s1 AS DOUBLE) / n_occurrences, 2) AS mean_pos_mil,
           ROUND(sqrt(GREATEST(
                 CAST(s2 AS DOUBLE) / n_occurrences
                 - (CAST(s1 AS DOUBLE) / n_occurrences)
                   * (CAST(s1 AS DOUBLE) / n_occurrences), 0.0)), 2)
             AS stddev_pos_mil
    FROM stats
    ORDER BY n_occurrences DESC, token ASC
    LIMIT 20
    """,
)
def q_token_position_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional token distribution (textstats.token_position_stats):
    integer-permille positions via exact integer division (no floats
    in the per-token path), DECIMAL(38,0) moment sums, top-20 by
    occurrence — the boilerplate/header screen content dedup misses."""
    return textstats.token_position_stats(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "stratified_kfold_assign",
    oracle=f"""
    SELECT doc_id, source AS stratum,
           CAST((ROW_NUMBER() OVER (
                 PARTITION BY source
                 ORDER BY {sampling.sql_md5_bucket('doc_id', 8)},
                          md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) % 5
                AS INTEGER) AS fold
    FROM documents
    """,
)
def q_stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified 5-fold assignment
    (sampling.stratified_kfold_assign): round-robin deal over the fixed
    md5 permutation within each source stratum, ranks from the
    two-phase bucket prefix sum (no whole-stratum window task). The
    oracle's single per-stratum window is the semantic spec."""
    return sampling.stratified_kfold_assign(
        load_table(spark, sf_dir, "documents"), k=5, buckets=8
    )


@register(
    "dsir_topk_selection",
    oracle=f"""
    SELECT * FROM (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY log_weight_micro DESC,
                                     doc_id ASC) AS INTEGER) AS sel_rank,
             doc_id, n_grams, log_weight_micro
      FROM ({_DSIR_SQL}) w)
    WHERE sel_rank <= 50
    """,
)
def q_dsir_topk_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection head (packing.dsir_topk_selection): top-50 most
    target-like documents by the importance log-ratio, deterministic
    (weight DESC, doc_id ASC) — TakeOrderedAndProject cut over the
    shared weight computation; oracle wraps the shared DSIR SQL."""
    return packing.dsir_topk_selection(
        load_table(spark, sf_dir, "documents"), k=50
    )


@register(
    "ks_drift_exact",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS before
      FROM events),
    per_v AS (
      SELECT event_type, value,
             SUM(before) AS ca, SUM(1 - before) AS cb
      FROM tagged GROUP BY 1, 2),
    cum AS (
      SELECT event_type,
             SUM(ca) OVER w AS cuma, SUM(cb) OVER w AS cumb
      FROM per_v
      WINDOW w AS (PARTITION BY event_type ORDER BY value
                   ROWS UNBOUNDED PRECEDING)),
    tot AS (SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
            FROM per_v GROUP BY 1),
    m AS (
      SELECT c.event_type, MAX(na) AS na, MAX(nb) AS nb,
             MAX(ABS(CAST(cuma AS HUGEINT) * nb
                     - CAST(cumb AS HUGEINT) * na)) AS ks_num
      FROM cum c JOIN tot USING (event_type) GROUP BY 1)
    SELECT event_type,
           CAST(na AS BIGINT) AS n_before,
           CAST(nb AS BIGINT) AS n_after,
           CASE WHEN na > 0 AND nb > 0
                THEN ROUND(CAST(ks_num AS DOUBLE)
                           / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6)
           END AS ks_stat
    FROM m
    """,
)
def q_ks_drift_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT two-sample KS drift statistic per event type
    (events.ks_drift_exact) — the unbucketed upgrade of
    value_drift_screen: DECIMAL(38,0) CDF-gap numerators maximized
    exactly over the value-domain-bounded distinct frame, one float
    division at the end."""
    return events.ks_drift_exact(load_table(spark, sf_dir, "events"))


@register(
    "mannwhitney_value_shift",
    oracle="""
    WITH tagged AS (
      SELECT event_type, value,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END
               AS before
      FROM events),
    per_v AS (
      SELECT event_type, value,
             SUM(before) AS ca, SUM(1 - before) AS cb
      FROM tagged GROUP BY 1, 2),
    ranked AS (
      SELECT event_type, ca, cb,
             CAST(ca AS HUGEINT)
               * (2 * COALESCE(SUM(ca + cb) OVER (
                      PARTITION BY event_type ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  + (ca + cb) + 1) AS c
      FROM per_v),
    per_type AS (
      SELECT event_type,
             CAST(SUM(ca) AS BIGINT) AS n_before,
             CAST(SUM(cb) AS BIGINT) AS n_after,
             SUM(c) AS r2a
      FROM ranked GROUP BY 1)
    SELECT event_type, n_before, n_after,
           CAST(r2a - CAST(n_before AS HUGEINT) * (n_before + 1) AS DOUBLE)
             / 2.0 AS u_stat,
           CASE WHEN n_before > 0 AND n_after > 0
                THEN ROUND(CAST(r2a - CAST(n_before AS HUGEINT)
                                      * (n_before + 1) AS DOUBLE)
                           / (2.0 * CAST(n_before AS DOUBLE)
                              * CAST(n_after AS DOUBLE)), 6)
           END AS cles
    FROM per_type
    """,
)
def q_mannwhitney_value_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U location-shift test per event type
    (events.mannwhitney_value_shift): doubled midrank sums carried as
    exact DECIMAL(38,0) integers (ties are half-integer midranks), U
    presented as the exact half-integer double, CLES (Vargha-Delaney
    A) as one 6dp division — the rank-based complement to the exact
    KS shape test."""
    return events.mannwhitney_value_shift(load_table(spark, sf_dir, "events"))


@register(
    "streaming_p2_median",
    # approx_distinct_checked pattern: the P2 marker recurrence is not
    # SQL-replayable, so the oracle pins (count, exact median,
    # accuracy-contract flag) and the estimate participates through
    # the flag
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(quantile_cont(CAST(value AS DOUBLE), 0.5), 4)
             AS exact_median,
           TRUE AS within_10pct
    FROM events GROUP BY event_type
    """,
)
def q_streaming_p2_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming P2 median estimator per event type
    (streaming/runners.streaming_p2_median; Jain & Chlamtac 1985):
    five-marker constant-memory state carried across three
    chronological micro-batches via applyInPandasWithState; settled
    estimate checked against the exact range-partitioned median."""
    from dumbo_spark.streaming import runners

    return runners.streaming_p2_median(spark, sf_dir)


@register(
    "min_cost_supplier",
    oracle="""
    WITH region_supp AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'),
    costs AS (
      SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
             CAST(MIN((2 * CAST(ROUND(l_extendedprice * 10000) AS BIGINT)
                       + CAST(l_quantity AS BIGINT))
                      // (2 * CAST(l_quantity AS BIGINT)))
                  AS BIGINT) AS unit_cost_e4
      FROM lineitem
      JOIN (SELECT p_partkey, p_name FROM part WHERE p_size = 15) p
        ON l_partkey = p_partkey
      JOIN region_supp ON l_suppkey = s_suppkey
      WHERE l_quantity > 0
      GROUP BY 1, 2, 3, 4, 5, 6),
    mn AS (SELECT p_partkey, MIN(unit_cost_e4) AS m FROM costs GROUP BY 1)
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost_e4
    FROM costs JOIN mn USING (p_partkey)
    WHERE unit_cost_e4 = m
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 20
    """,
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (analytics.min_cost_supplier, adapted — supply
    cost is the min OBSERVED lineitem unit price since the fixture has
    no partsupp): correlated-min via partial agg + equi-join back,
    all argmin ties kept, dims broadcast."""
    return analytics.min_cost_supplier(
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
        load_table(spark, sf_dir, "region"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "dominant_part_suppliers",
    oracle="""
    WITH promo AS (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'),
    sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem JOIN promo ON l_partkey = p_partkey
      GROUP BY 1, 2),
    pt AS (SELECT l_partkey, SUM(q) AS tot FROM sp GROUP BY 1),
    dom AS (
      SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_dominated_parts
      FROM sp JOIN pt USING (l_partkey)
      WHERE q * 5 > tot
      GROUP BY 1)
    SELECT s_name, n_name, n_dominated_parts
    FROM supplier
    JOIN dom ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    ORDER BY s_name
    """,
)
def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (analytics.dominant_part_suppliers, adapted —
    the availqty excess-stock predicate becomes shipped-share
    dominance): nested-IN chain as filter -> partial aggs -> DIVISIONLESS
    threshold (5q > tot over exact DECIMAL sums) -> semi-join back."""
    return analytics.dominant_part_suppliers(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "part"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "nation"),
    )


@register(
    "audio_window_energy",
    oracle="""
    WITH d AS (
      -- the operator works on UTF-8 PAYLOAD BYTES (attach_binary);
      -- this oracle walks CHARACTERS, which is only equivalent for
      -- pure-ASCII text — assert that loudly (ADVICE r10 low) so a
      -- fixture regeneration with non-ASCII fails instead of
      -- silently diverging
      SELECT doc_id, source, text AS t,
             CASE WHEN length(text) = octet_length(encode(text))
                  THEN length(text)
                  ELSE CAST(error('audio_window_energy oracle requires '
                                  'ASCII fixture text') AS BIGINT)
             END AS n
      FROM documents),
    c AS (
      SELECT *, CASE WHEN n = 0 THEN 0
                     WHEN n <= 25 THEN 1
                     ELSE 1 + CAST(CEIL((n - 25) / 10.0) AS BIGINT)
                END AS nw
      FROM d),
    win AS (
      SELECT source, t, n,
             (w - 1) * 10 AS lo, LEAST((w - 1) * 10 + 25, n) AS hi
      FROM c, UNNEST(generate_series(1, nw)) AS u(w)),
    we AS (
      SELECT source, hi - lo AS wl,
             list_sum(list_transform(generate_series(lo + 1, hi),
                                     i -> ord(substr(t, i, 1)))) AS e
      FROM win),
    clip AS (SELECT source, COUNT(*) AS n_clips, SUM(nw) AS n_windows
             FROM c GROUP BY 1),
    agg AS (SELECT source, SUM(e) AS es,
                   SUM(CASE WHEN e < 80 * wl THEN 1 ELSE 0 END) AS qw
            FROM we GROUP BY 1)
    SELECT clip.source,
           CAST(n_clips AS BIGINT) AS n_clips,
           CAST(n_windows AS BIGINT) AS n_windows,
           CASE WHEN n_windows > 0
                THEN ROUND(es / CAST(n_windows AS DOUBLE), 4)
           END AS mean_energy,
           CASE WHEN n_windows > 0
                THEN ROUND(qw / CAST(n_windows AS DOUBLE), 4)
           END AS silence_frac
    FROM clip LEFT JOIN agg USING (source)
    """,
)
def q_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped multimodal census (multimodal.audio_window_energy):
    25ms/10ms windowed energy + silence fraction over binary payloads
    via an Arrow mapInPandas pass (real plumbing, analytically-defined
    stand-in decode — hence a FULL oracle, unlike typical stubs)."""
    from dumbo_spark.operators import multimodal

    return multimodal.audio_window_energy(
        load_table(spark, sf_dir, "documents")
    )


@register(
    "chi2_lang_source",
    oracle="""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS observed
      FROM documents GROUP BY 1, 2),
    r AS (SELECT lang, SUM(observed) AS n_lang FROM cells GROUP BY 1),
    c AS (SELECT source, SUM(observed) AS n_source FROM cells GROUP BY 1),
    t AS (SELECT SUM(observed) AS n_total FROM cells),
    fl AS (
      SELECT r.lang, c.source, COALESCE(observed, 0) AS o,
             n_lang, n_source, n_total
      FROM r CROSS JOIN c
      LEFT JOIN cells ON cells.lang = r.lang AND cells.source = c.source
      CROSS JOIN t),
    k AS (
      SELECT CAST(ROUND((CAST(o AS DOUBLE)
                         - CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                           / CAST(n_total AS DOUBLE))
                        * (CAST(o AS DOUBLE)
                           - CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                             / CAST(n_total AS DOUBLE))
                        / (CAST(n_lang AS DOUBLE) * CAST(n_source AS DOUBLE)
                           / CAST(n_total AS DOUBLE))
                        * 1e9) AS BIGINT) AS cn,
             lang, source, n_total
      FROM fl)
    SELECT CAST(COUNT(DISTINCT lang) AS INTEGER) AS n_langs,
           CAST(COUNT(DISTINCT source) AS INTEGER) AS n_sources,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
                AS INTEGER) AS dof,
           CAST(MAX(n_total) AS BIGINT) AS n_total,
           ROUND(SUM(cn) / 1e9, 4) AS chi2
    FROM k
    """,
)
def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test over lang x source
    (textstats.chi2_lang_source): structural-zero cells included via
    the marginal cross, per-cell contributions fixed-pointed to
    integer nano-units (order-independent exact sum), dof from the
    marginal cardinalities."""
    return textstats.chi2_lang_source(load_table(spark, sf_dir, "documents"))


@register(
    "error_rate_wilson",
    oracle="""
    WITH base AS (
      SELECT EXTRACT(hour FROM ts) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1)
    SELECT hour_of_day, n_events, n_errors,
           ROUND(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE), 6)
             AS error_rate,
           ROUND(GREATEST(
             ((CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
              + 3.8416 / (2.0 * CAST(n_events AS DOUBLE))
              - 1.96 * sqrt(
                  (CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
                  * (1.0 - CAST(n_errors AS DOUBLE)
                           / CAST(n_events AS DOUBLE))
                  / CAST(n_events AS DOUBLE)
                  + 3.8416 / (4.0 * CAST(n_events AS DOUBLE)
                              * CAST(n_events AS DOUBLE))))
             / (1.0 + 3.8416 / CAST(n_events AS DOUBLE)), 0.0), 4)
             AS wilson_lo,
           ROUND(LEAST(
             ((CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
              + 3.8416 / (2.0 * CAST(n_events AS DOUBLE))
              + 1.96 * sqrt(
                  (CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE))
                  * (1.0 - CAST(n_errors AS DOUBLE)
                           / CAST(n_events AS DOUBLE))
                  / CAST(n_events AS DOUBLE)
                  + 3.8416 / (4.0 * CAST(n_events AS DOUBLE)
                              * CAST(n_events AS DOUBLE))))
             / (1.0 + 3.8416 / CAST(n_events AS DOUBLE)), 1.0), 4)
             AS wilson_hi
    FROM base ORDER BY hour_of_day
    """,
)
def q_error_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly error rate with Wilson-score 95% bounds
    (events.error_rate_wilson): the uncertainty-aware companion to
    error_rate_by_hour; fixed closed-form expression over exact
    integer counts, written identically in both engines."""
    return events.error_rate_wilson(load_table(spark, sf_dir, "events"))


@register(
    "decontamination_census",
    oracle=f"""
    WITH scores AS ({_CONTAM_SQL}),
    corpus AS (
      SELECT doc_id, source, len({DUCK_TOKENS}) AS n_tokens
      FROM documents WHERE doc_id % 20 <> 0),
    j AS (
      SELECT c.source, c.n_tokens,
             CASE WHEN 100 * COALESCE(s.n_contaminated, 0)
                       > 10 * COALESCE(s.n_grams, 0)
                  THEN 1 ELSE 0 END AS d
      FROM corpus c LEFT JOIN scores s USING (doc_id))
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(d) AS BIGINT) AS n_dropped,
           CAST(SUM(CASE WHEN d = 0 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS kept_tokens,
           CAST(SUM(CASE WHEN d = 1 THEN n_tokens ELSE 0 END) AS BIGINT)
             AS dropped_tokens,
           ROUND(SUM(d) / CAST(COUNT(*) AS DOUBLE), 4) AS drop_rate
    FROM j GROUP BY source
    """,
)
def q_decontamination_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination removal census (textstats.decontamination_census):
    the acting half of benchmark_contamination — drop corpus docs over
    10% eval-gram overlap via a DIVISIONLESS integer threshold and
    report per-source kept/dropped docs and tokens; oracle wraps the
    shared contamination-score SQL."""
    return textstats.decontamination_census(
        load_table(spark, sf_dir, "documents")
    )


