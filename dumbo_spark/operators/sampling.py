"""Sampling / splitting operators — training-corpus assembly steps
(north-star extensions; dumbo has no sampling surface at all).

- :func:`split_train_test` — DETERMINISTIC hash split: the assignment
  is a pure function of the row key (md5 bucket), so it is stable
  across runs, partitionings, engines and re-executions — the property
  a reproducible training pipeline needs (and the reason this carries
  a full SQL oracle while random sampling cannot).
- :func:`stratified_sample` — per-stratum Bernoulli sampling
  (``sampleBy``): rebalancing a skewed corpus. Seeded but
  partitioning-dependent → rows-only check + a tolerance unit test.

Scale: both are narrow one-pass operators; the split's md5 is the only
per-row cost and the bucket predicate pushes no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: hex-digit value lookup used by both engines (see multimodal.py for
#: the same trick; DuckDB cannot cast hex strings numerically)
_HEX = "0123456789abcdef"


def _md5_bucket(col: F.Column, buckets: int = 100) -> F.Column:
    """0..buckets-1 bucket from the first 4 hex chars of md5(col) —
    deterministic, engine-neutral. conv() parses the hex in Spark."""
    h = F.md5(col.cast("string").cast("binary"))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int") % buckets


def sql_md5_bucket(expr: str, buckets: int = 100) -> str:
    """DuckDB fragment computing the same bucket (strpos hex parse)."""
    digit = lambda i: f"(strpos('{_HEX}', substr(md5(CAST({expr} AS VARCHAR)), {i}, 1)) - 1)"
    return (
        f"((({digit(1)} * 16 + {digit(2)}) * 16 + {digit(3)}) * 16 + {digit(4)}) "
        f"% {buckets}"
    )


def split_train_test(
    documents: DataFrame, key: str = "doc_id", test_pct: int = 10
) -> DataFrame:
    """Assign each row to train/test by hash bucket of its key."""
    bucket = _md5_bucket(F.col(key))
    return documents.select(
        key,
        F.when(bucket < test_pct, F.lit("test")).otherwise(F.lit("train")).alias("split"),
        bucket.alias("bucket"),
    )


def stratified_sample(
    documents: DataFrame, strata_col: str = "lang", fractions: dict | None = None, seed: int = 42
) -> DataFrame:
    """Per-stratum Bernoulli sample (corpus rebalancing). Fractions
    default to downsampling the majority class."""
    fractions = fractions or {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 1.0}
    return documents.sampleBy(strata_col, fractions, seed=seed)


def corpus_clean(
    documents: DataFrame, min_tokens: int = 5, max_tokens: int = 100_000
) -> DataFrame:
    """Normalization + length filtering — the first pass of every text
    corpus pipeline: casefold, collapse non-word runs, trim; drop
    out-of-bounds documents. Fully declarative → oracle-checked."""
    clean = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\W+", " "))
    out = documents.select(
        "doc_id",
        "lang",
        clean.alias("clean_text"),
        F.size(F.split(clean, " ")).alias("n_tokens"),
    )
    return out.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    )


def sample_exact_n(df: DataFrame, key_col: str, n: int = 300) -> DataFrame:
    """Deterministic EXACT-n global sample — the distributed stand-in
    for reservoir sampling: order all rows by the md5 of their key
    (a fixed pseudo-random permutation) and keep the first n.

    Unlike ``df.sample(fraction)`` the output size is exact, and unlike
    a seeded reservoir the selection is a pure function of the row keys
    — stable across runs, partitionings and engines, which is what
    makes it oracle-checkable and what a reproducible corpus subset
    needs.

    Scale: Catalyst compiles orderBy+limit to TakeOrderedAndProject —
    each task keeps a local top-n heap and the driver merges n·P rows;
    there is NO global sort and no single-task total-order stage. At
    100 TB the cost is one scan plus an n-row heap per task.
    """
    return (
        df.orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .limit(n)
        .select(key_col, F.md5(F.col(key_col).cast("string")).alias("sample_key"))
    )


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, k: int = 5
) -> DataFrame:
    """Deterministic k-per-group sample: rows ordered by the md5 of
    their key within each group, first k kept. The hash order is a
    fixed pseudo-random permutation, so the sample is uniform-ish,
    reproducible across engines/partitionings/reruns (no seed state),
    and — unlike ``sampleBy`` — exactly k rows per group when the group
    has them. One window shuffle on the group key; for a skewed group
    the salted-top-k pattern (operators/topk.py) applies identically.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    return (
        df.select(group_col, key_col)
        .withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
