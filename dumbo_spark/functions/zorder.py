"""Z-order (Morton) interleaving for multi-column file clustering.

Why: parquet row-group pruning works off per-file min/max statistics,
and a single-column sort gives tight ranges on ONE column only — a
filter on any other column still reads every file. Interleaving the
bits of two columns and range-partitioning on the result gives every
file a tight range on BOTH columns simultaneously (the Delta/Iceberg
``OPTIMIZE ZORDER BY`` idea), so either-column predicates prune.

All arithmetic is JVM-side column expressions (shift/and/or over
integer ranks) — no UDF, stays in whole-stage codegen. Ranks come from
min/max normalization, computed in the same plan via a broadcast 1-row
aggregate (no driver action).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: bits per dimension; 2×16 interleaves into a 32-bit z-value
ZBITS = 16


def _interleave(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two ``bits``-wide non-negative ints: bit i of
    x lands at position 2i, bit i of y at 2i+1."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def with_zvalue(df: DataFrame, c1: str, c2: str, out: str = "_z") -> DataFrame:
    """Append a Morton z-value column over ``c1``/``c2``.

    Each column is first normalized to a ``ZBITS``-wide integer rank by
    min/max scaling (computed as a broadcast 1-row aggregate cross-join
    — one extra pass over the data, entirely in-plan). Works for any
    numeric/orderable-castable columns; constant columns scale to 0.
    """
    stats = df.agg(
        F.min(F.col(c1).cast("double")).alias("_min1"),
        F.max(F.col(c1).cast("double")).alias("_max1"),
        F.min(F.col(c2).cast("double")).alias("_min2"),
        F.max(F.col(c2).cast("double")).alias("_max2"),
    )
    top = float(2**ZBITS - 1)

    def rank(col: str, lo: str, hi: str) -> Column:
        span = F.col(hi) - F.col(lo)
        scaled = F.when(span > 0, (F.col(col).cast("double") - F.col(lo)) / span).otherwise(
            F.lit(0.0)
        )
        return F.floor(scaled * top).cast("long")

    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out, _interleave(rank(c1, "_min1", "_max1"), rank(c2, "_min2", "_max2")))
        .drop("_min1", "_max1", "_min2", "_max2")
    )
