"""Numeric helpers shared by catalog queries (see catalog.py docstring for
why sums go through DECIMAL: exact + associative in Spark and DuckDB,
so oracle comparisons are bit-stable regardless of aggregation order).

Precision choice — DECIMAL(8,2), not wider: every dsum/davg input is a
money-style column (verified 2-decimal and < 1e6 across all fixture SFs;
TPC-H per-row magnitudes don't grow with scale factor). Keeping input
precision ≤ 8 keeps the SUM result precision ≤ 18, which Spark stores in a
compact long instead of a 128-bit BigDecimal — measured ~30% faster per
aggregate on the sf0.1 fixture. A wider value would silently overflow to
NULL, so the cast doubles as a sanity bound; if a future column needs more
range, add a wide variant rather than widening this one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(8,2)"


def dsum(col: Column | str) -> Column:
    """Order-insensitive exact sum of a money column, surfaced as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Exact-sum / exact-count average (deterministic single division)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def sql_dsum(expr: str) -> str:
    """Oracle-side counterpart of dsum."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(8,2))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """Oracle-side counterpart of davg."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(8,2))) AS DOUBLE) / COUNT({expr})"


# -- exact-decimal arithmetic on computed expressions ------------------------
#
# dsum/sql_dsum cast their input to DECIMAL(8,2) (the module docstring's
# contract: inputs must carry ≤2 decimal digits and stay < 1e6, or the sum
# overflows to NULL), which is only safe for BASE columns (prices/discounts
# carry ≤2 decimal digits, so the cast never rounds). A double PRODUCT like
# l_extendedprice*(1-l_discount) has exactly 4
# decimal digits, and its double representation sits an epsilon away from the
# true value — Spark (shortest-repr BigDecimal) and DuckDB (exact binary)
# then round the boundary cases differently. The fix: cast the base columns
# to decimal FIRST and do the arithmetic in decimal, which is exact in both
# engines, so there is never a double→decimal rounding of a computed value.


def dec(col: Column | str, typ: str = "decimal(12,4)") -> Column:
    """Cast a base column to decimal before arithmetic (exact: base columns
    carry ≤2 decimal digits)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum_exact(expr: Column) -> Column:
    """Sum of an already-decimal expression, surfaced as double.

    The intermediate cast to DECIMAL(38,6) is load-bearing: our revenue
    expressions carry ≤6 real decimal digits (so it is lossless), and at
    scale ≤6 the decimal→double conversion is a single correctly-rounded
    division (unscaled and 10^scale are both exactly representable), which
    both Spark and DuckDB compute identically. Casting straight from a
    scale-12 sum double-rounds in Spark and lands 1 ulp off DuckDB.
    """
    return F.sum(expr).cast("decimal(38,6)").cast("double")


def sql_dsum_exact(expr: str) -> str:
    return f"CAST(CAST(SUM({expr}) AS DECIMAL(38,6)) AS DOUBLE)"
