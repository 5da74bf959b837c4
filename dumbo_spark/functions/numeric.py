"""Exact-decimal aggregation helpers.

Why these exist: the driver's correctness gate hash-compares our values
against a DuckDB oracle. Summing doubles is order-dependent in the last
ulp, and Spark's shuffle order differs run to run — a raw
``SUM(double)`` can never be hash-stable. Every fixture money column is
an exact 2-decimal value (verified against the parquet), so we cast to
DECIMAL(18,2) first: decimal aggregation is exact, associative, and
therefore order-independent — bit-identical across engines, runs, and
partitionings. The final cast back to DOUBLE is exact for these
magnitudes, keeping result schemas engine-neutral.

This mirrors how dumbo jobs avoided the problem by accident (Python
ints for counts — dumbo/lib/__init__.py sumreducer) and fixes the part
they got wrong (float sums drifted with shuffle order there too).

At 100 TB the decimal path costs a few % over double sums and removes a
whole class of nondeterminism; partial aggregation (map-side combine)
still applies because decimal sum is algebraic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

MONEY = DecimalType(18, 2)


def dmoney(col: Column | str) -> Column:
    """Exact 2-decimal view of a money column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dsum(col: Column | str, alias: str | None = None) -> Column:
    """Order-independent SUM of a 2-decimal money column, as DOUBLE."""
    out = F.sum(dmoney(col)).cast("double")
    return out.alias(alias) if alias else out


def sql_dmoney(expr: str) -> str:
    """DuckDB oracle fragment matching :func:`dmoney`."""
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dsum(expr: str, alias: str) -> str:
    """DuckDB oracle fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE) AS {alias}"
