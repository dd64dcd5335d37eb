"""Exact-decimal aggregate helpers for deterministic, order-independent
floating-point results.

Why: the correctness driver hash-compares Spark output against a DuckDB
oracle. ``SUM(double)`` is order-dependent in the last ulps, and Spark and
DuckDB add in different orders — a naive sum of 60k prices differs by
~1e-3. Casting each addend to DECIMAL first makes the sum exact (hence
order-independent); casting the exact decimal total back to double is then
bit-identical in both engines. Derived measures (avg, stddev, ratios) are
computed from those exact sums with plain IEEE double arithmetic, which is
also bit-identical across engines.

Each Spark helper has a twin ``sql_*`` generator producing the equivalent
ANSI SQL, so registered queries keep both sides in lockstep.

At 100 TB these helpers stay cheap: decimal sums are still one-pass
partial+final hash aggregates (slightly wider accumulator than double);
swap to plain double sums via ``F.sum`` when exact reproducibility is not
required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# DECIMAL(27,6): 6 fractional digits covers products of the 2-decimal
# money/discount columns; Spark widens sums to DECIMAL(37,6), DuckDB to
# DECIMAL(38,6) — both exact.
_DEC = "decimal(27,6)"
_SQL_DEC = "DECIMAL(27,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dsum(col: Column | str, precision: int = 27) -> Column:
    """Order-independent sum: exact decimal accumulation, double result.

    ``precision`` widens the accumulator for large-magnitude inputs
    (m06's hour-scale moment sums use 38); the SQL twin takes the same
    parameter so the two sides cannot drift."""
    return F.sum(_c(col).cast(f"decimal({precision},6)")).cast("double")


def sql_dsum(expr: str, precision: int = 27) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},6))) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / non-null count."""
    c = _c(col)
    return F.sum(c.cast(_DEC)).cast("double") / F.count(c)


def sql_davg(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS {_SQL_DEC})) AS DOUBLE) / COUNT({expr}))"


def dstddev(col: Column | str) -> Column:
    """Order-independent sample stddev from exact decimal moments.

    stddev = sqrt((n*Σx² − (Σx)²) / (n(n−1))), with Σx and Σx² exact; the
    final double arithmetic (mul/sub/div/sqrt) is IEEE-identical across
    engines. NULL for n < 2, matching stddev_samp semantics.
    """
    c = _c(col)
    n = F.count(c).cast("double")
    sx = F.sum(c.cast(_DEC)).cast("double")
    sx2 = F.sum((c * c).cast(_DEC)).cast("double")
    var = (n * sx2 - sx * sx) / (n * (n - F.lit(1.0)))
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0))))


def sql_dstddev(expr: str) -> str:
    n = f"CAST(COUNT({expr}) AS DOUBLE)"
    sx = f"CAST(SUM(CAST({expr} AS {_SQL_DEC})) AS DOUBLE)"
    sx2 = f"CAST(SUM(CAST(({expr})*({expr}) AS {_SQL_DEC})) AS DOUBLE)"
    var = f"(({n}*{sx2} - {sx}*{sx}) / ({n}*({n} - 1.0)))"
    return f"CASE WHEN COUNT({expr}) > 1 THEN SQRT(GREATEST({var}, 0.0)) END"


def ratio(num: Column, den: Column) -> Column:
    """Zero-guarded ratio (reference src/spark_etl.py:122-124 pattern)."""
    return F.when(den != 0, num / den).otherwise(F.lit(0.0))
