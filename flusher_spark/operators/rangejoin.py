"""Binned range join: point-in-interval joins without a cartesian product.

Spark has no native interval-overlap join; the naive formulation
``left.join(right, (p >= s) & (p <= e))`` (plus any equi keys) plans as a
BroadcastNestedLoopJoin or CartesianProduct — O(|L|·|R|) comparisons, dead at
fact scale. The standard scale-out trick (same idea as Databricks' range-join
bin optimization): quantize time into fixed-width bins, explode each interval
across the bins it covers, equi-join on the bin id (+ any extra keys), then
re-check the exact predicate. Shuffle is by (bin, keys) — fully parallel,
skew bounded by bin width.

Bin-width choice: ≈ the typical interval length. Much larger → many false
candidates per bin; much smaller → each interval explodes across many bins.
The explode factor is ceil(interval_len / bin_width) + 1.

The reference has no joins at all (SURVEY.md §2.B); this extends the as-of
operator family (operators/asof.py) with the interval-overlap case.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_SECONDS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
_TERM_RE = re.compile(r"(\d+)\s*([a-z]+)")


def _width_seconds(text: str) -> int:
    """Parse a bin width like "30 minutes" / "1 hour 30 minutes" into seconds,
    in the driver. Evaluating the width Spark-side via an interval anchored at
    an epoch literal is session-timezone dependent (the literal is
    reinterpreted in local time), which would silently mis-bin — and the
    equi-join on bins can only ever DROP candidates, so the residual predicate
    cannot recover them. A Python-side integer is timezone-proof."""
    total = 0
    lowered = text.lower()
    for amount, unit in _TERM_RE.findall(lowered):
        singular = unit.rstrip("s")
        if singular not in _UNIT_SECONDS:
            raise ValueError(f"unknown bin-width unit: {unit!r} in {text!r}")
        total += int(amount) * _UNIT_SECONDS[singular]
    # The whole string must be consumed: '1.5 hours' would otherwise parse
    # as ('5','hours') and silently bin 3.3× coarser than asked. Bare
    # separators between terms ("1 hour, 30 minutes", "1 hour and 30
    # minutes") are fine — stripping them can never hide dropped DIGITS,
    # which is what the residue check exists to catch ("1,000 minutes"
    # still errors: its residue keeps the orphaned '1').
    residue = re.sub(r"[,;]|\band\b", " ", _TERM_RE.sub(" ", lowered))
    if residue.strip():
        raise ValueError(f"cannot parse bin width: {text!r} (integers + units only)")
    if total <= 0:
        raise ValueError(f"bin width must be positive: {text!r}")
    return total


def _bin_explode(df: DataFrame, start: str, end: str, width_s) -> DataFrame:
    """One row per fixed-width bin the [start, end] interval touches."""
    secs = F.unix_timestamp
    return df.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(secs(F.col(start)) / width_s),
                F.floor(secs(F.col(end)) / width_s),
            )
        ),
    )


def _rename_collisions(
    left_cols: list[str], rhs: DataFrame, on: list[str], suffix: str = "_right"
) -> tuple[DataFrame, dict[str, str]]:
    """Suffix right-side columns that collide with left names (join keys
    excluded), picking a target not already taken on EITHER side — the
    fuzzy_join_ed1 guard: a naive f'{c}_right' can itself collide with an
    existing left column and yield two same-named columns, failing only
    later with AMBIGUOUS_REFERENCE (r11 review). Returns the renamed frame
    plus the old→new map so callers resolve bound references through it
    (which also covers bounds listed in ``on``: those are join keys, never
    renamed, and the map just doesn't contain them)."""
    taken = set(left_cols) | set(rhs.columns)
    renames: dict[str, str] = {}
    for c in list(rhs.columns):
        if c in left_cols and c != "__bin" and c not in on:
            new = f"{c}{suffix}"
            while new in taken:
                new += suffix
            taken.add(new)
            rhs = rhs.withColumnRenamed(c, new)
            renames[c] = new
    return rhs, renames


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_point: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bin_width: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to every right interval containing its point:
    ``right_start <= left_point < right_end`` (half-open, the time-window
    convention), optionally also matching equi-keys ``on``.

    All three columns must be timestamps. Output columns: left columns +
    right columns (equi-keys deduplicated); right's interval bounds are
    suffixed ``_right`` if they collide with left names.

    ``how``: ``inner`` or ``left``. Left-outer CANNOT ride the binned
    equi-join directly — the exact predicate runs after the join, and a
    null-extended (or matched-in-bin-only) row fails it, silently giving
    inner results (r9 review). Instead: binned inner join + an anti-join
    on a per-row id that unions back the left rows with no true match,
    null-extended — the standard outer decomposition for candidate-join
    rewrites; both halves stay shuffle-parallel.
    """
    on = on or []
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    width_s = F.lit(_width_seconds(bin_width))
    if how != "inner":
        # Row identity for the outer decomposition: a monotonic id, LAZILY
        # checkpointed so both consumers (the inner join and the anti-join
        # probe) see the SAME materialized ids — monotonically_increasing_id
        # is partitioning-dependent and two independent executions could
        # disagree. The id also replaces the previous all-left-columns
        # eqNullSafe compare, which (a) failed at analysis on map-typed
        # columns (maps don't support equality) and (b) collapsed identical
        # duplicate left rows — if one of two byte-identical rows matched,
        # the anti-join dropped BOTH (r11 review); the row id keeps exact
        # multiplicity.
        left = left.withColumn(
            "__rj_rid", F.monotonically_increasing_id()
        ).localCheckpoint(eager=False)
    secs = F.unix_timestamp  # timestamp -> epoch seconds
    lhs = left.withColumn("__bin", F.floor(secs(F.col(left_point)) / width_s))
    rhs = _bin_explode(right, right_start, right_end, width_s)
    rhs, renames = _rename_collisions(left.columns, rhs, on)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)
    inner = (
        lhs.join(rhs, ["__bin", *on], "inner")
        .where((F.col(left_point) >= F.col(r_start)) & (F.col(left_point) < F.col(r_end)))
        .drop("__bin")
    )
    if how == "inner":
        return inner
    matched_ids = inner.select("__rj_rid").distinct()
    unmatched = left.join(matched_ids, "__rj_rid", "left_anti")
    # ONE null-extension projection (asof._align_to_left's discipline): the
    # per-column withColumn loop nested a Project per right column AND
    # rebuilt dict(inner.dtypes) each iteration — O(cols²) driver-side
    # analysis on wide right sides (r14 review).
    itypes = dict(inner.dtypes)
    have = set(left.columns)
    unmatched = unmatched.select(
        *[
            F.col(c) if c in have else F.lit(None).cast(itypes[c]).alias(c)
            for c in inner.columns
        ]
    )
    return inner.unionByName(unmatched).drop("__rj_rid")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bin_width: str = "30 minutes",
) -> DataFrame:
    """Join interval×interval on overlap: half-open ``[left_start, left_end)``
    meets ``[right_start, right_end)`` iff ``left_start < right_end AND
    right_start < left_end`` — the SCD2/maintenance-window/meeting-conflict
    join. All four columns must be timestamps; extra equi-keys via ``on``.

    Scale design: BOTH sides explode across the fixed-width bins their
    interval covers and equi-join on the bin id (+ keys) — shuffle-parallel,
    never a nested loop. A pair overlapping k shared bins would surface k
    times, so instead of a post-join ``distinct`` (a second full-width
    shuffle), each surviving row is kept only at its CANONICAL bin — the bin
    of ``greatest(left_start, right_start)``. For an overlapping pair that
    bin is guaranteed present in both explode ranges exactly once
    (max(starts) lies in [s_i, min(ends)) ⊆ [s_i, e_i] for both sides), so
    every overlapping pair appears exactly once and the dedup costs a
    codegen'd filter, not a shuffle. Explode factor per row is
    ceil(len/width)+1 — pick the width near the typical interval length.
    """
    on = on or []
    secs = F.unix_timestamp
    width_s = F.lit(_width_seconds(bin_width))
    lhs = _bin_explode(left, left_start, left_end, width_s)
    rhs = _bin_explode(right, right_start, right_end, width_s)
    rhs, renames = _rename_collisions(left.columns, rhs, on)
    r_start = renames.get(right_start, right_start)
    r_end = renames.get(right_end, right_end)
    canonical = F.floor(
        F.greatest(secs(F.col(left_start)), secs(F.col(r_start))) / width_s
    )
    joined = (
        lhs.join(rhs, ["__bin", *on], "inner")
        .where((F.col(left_start) < F.col(r_end)) & (F.col(r_start) < F.col(left_end)))
        .where(F.col("__bin") == canonical)
    )
    return joined.drop("__bin")
