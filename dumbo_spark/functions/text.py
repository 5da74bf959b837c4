"""Tokenization and n-gram column functions.

Dumbo's canonical programs are wordcount and ngramcount
(examples/wordcount.py mapper: ``for word in value.split()``;
examples/ngramcount.py: sliding n-grams per line). There, tokenization
is per-record Python; here it is a JVM-side column expression that
stays inside whole-stage codegen — no Python boundary at all.

Regex choice: ``\\W+`` is ASCII-identical between Java regex (Spark)
and RE2 (DuckDB) — ``[^0-9A-Za-z_]`` both — so oracles match exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: token separator — ASCII word-boundary, identical in Java and RE2
TOKEN_RE = r"\W+"


def tokens(col: Column | str) -> Column:
    """Lower-cased word tokens of a text column, empties removed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), TOKEN_RE), lambda t: t != F.lit(""))


def ngrams(tokens_col: Column, n: int, sep: str = " ") -> Column:
    """Sliding word n-grams over a token array (empty if too short).

    Pure higher-order functions (transform/sequence) — stays JVM-side,
    no explode-then-window shuffle; 0..len-n windows like
    examples/ngramcount.py's per-line loop.
    """
    size = F.size(tokens_col)

    def gram_at(i: Column) -> Column:
        return F.concat_ws(sep, *[F.get(tokens_col, i + F.lit(j)) for j in range(n)])

    return F.when(
        size >= n,
        F.transform(F.sequence(F.lit(0), size - F.lit(n)), gram_at),
    ).otherwise(F.array().cast("array<string>"))
