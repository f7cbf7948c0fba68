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


# -- codegen'd exact sums: two long limbs instead of a wide-decimal SUM ------
#
# dsum_exact's input is a >18-precision decimal product, so its SUM buffer is
# a >18-precision decimal — Spark accumulates those through non-compact
# BigDecimal adds, interpreted per row (the events_zscore_outliers docstring
# records the measurement: 17× slower than a long SUM on this fixture). The
# limb path keeps the whole per-row pipeline in codegen'd long arithmetic:
# the money expression is computed as an exact integer (its value scaled by
# 10^k), split into two base-2^20 limbs, and summed as two plain long
# aggregates; the limbs are reassembled into the exact decimal(38,6) only at
# the group level (one row per group), where the final cast to double is the
# IDENTICAL correctly-rounded conversion dsum_exact performs — so results
# are bit-equal by construction, not by tolerance.
#
# Overflow headroom (ANSI sessions RAISE on long-sum overflow, never wrap):
# each limb is < 2^20 + |cv|/2^20; for the catalog's widest expression
# (charge, |cv| <= 1.1e12) that bounds a limb by ~1.05e6, so a single
# group's long sum is safe to ~8.7e12 rows — beyond a 100 TB lineitem —
# and a larger corpus shards the group or adds a third limb.

_LIMB_BITS = 20
_LIMB_BASE = 1 << _LIMB_BITS


def money_long(col: Column | str) -> Column:
    """Base money column (≤2 decimal digits, |v| < 1e6 — the module
    docstring's contract) as an exact long of hundredths. round() before the
    long cast is load-bearing: v·100 in doubles lands within ~1e-7 of the
    true integer but not ON it (0.07·100 = 7.000000000000001), and a bare
    long cast truncates.

    CONTRACT IS NOT ENFORCED HERE (a per-row guard would put a branch in
    the hottest codegen path this module exists to keep clean): an
    out-of-contract column — more than 2 decimal digits, or |v| ≥ 1e6 —
    silently rounds to hundredths and produces a wrong exact-LOOKING sum,
    unlike the decimal(8,2) path above which overflows to NULL (and raises
    under ANSI) as its sanity bound. Any NEW money_long/dsum_limbs call
    site must re-verify the contract on its column the way the existing
    ones did: (a) assert max |v| and decimal width across fixture SFs, and
    (b) keep/extend a decimal-formulation twin that the oracle hash-checks
    against the limb form (q15_top_supplier and sql_api_revenue_report are
    the standing cross-check twins for the TPC-H money columns)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def limb_sum_exact(cv: Column, n_limbs: int = 2) -> Column:
    """Exact decimal(38,0) SUM of a long expression via ``n_limbs`` plain
    long aggregates over base-2^20 limbs. The top limb uses the bare
    arithmetic shiftright (keeps the sign — negative values split as
    cv = top·2^(20·(n−1)) + non-negative lower limbs and reassemble
    exactly); lower limbs are masked. Two limbs cover |cv| ≤ ~1.1e12 to
    ~8.7e12 rows/group; pass 3 for squared-moment expressions up to ~1e16
    (each masked limb keeps the ~8.8e12-row bound, the top limb's bound
    only grows)."""
    d38 = "decimal(38,0)"
    total = None
    for i in range(n_limbs):
        piece = F.shiftright(cv, _LIMB_BITS * i) if i else cv
        if i < n_limbs - 1:
            piece = piece.bitwiseAND(F.lit(_LIMB_BASE - 1))
        term = F.sum(piece).cast(d38)
        if i:
            term = term * F.lit(_LIMB_BASE**i).cast(d38)
        total = term if total is None else total + term
    return total


def dsum_limbs(cv: Column, pow10: int, n_limbs: int = 2) -> Column:
    """Exact sum of an integer-scaled long expression ``cv`` (true value =
    cv / pow10), surfaced as the identical decimal(38,6)→double that
    ``dsum_exact`` produces. The division by pow10 happens once per GROUP on
    the exact decimal(38,0) total; its result is exact (the expression
    carries ≤6 real decimal digits), so the decimal(38,6) value — and the
    one correctly-rounded double conversion — match dsum_exact bit-for-bit
    (verified against the DuckDB oracle by tools/check_oracle.py on every
    converted entry)."""
    total = limb_sum_exact(cv, n_limbs)
    return (total.cast("decimal(38,6)") / F.lit(pow10)).cast("decimal(38,6)").cast("double")
