"""Distributed total-order ranking.

``ROW_NUMBER() OVER (ORDER BY ...)`` with no PARTITION BY makes Spark move
every row to ONE task (WindowExec warns about it) — fine for a dimension
table, fatal at fact scale. These operators compute the same numbering
distributed:

1. range-repartition by the order columns (so partition p holds a contiguous
   key range, p < q  ⇒  all keys in p sort before q),
2. row_number() within each partition (parallel),
3. add each partition's starting offset — a tiny per-partition count map,
   broadcast-joined back.

Two passes over the data, both parallel; the only single-point state is the
#partitions-sized count list. The input is cached between the passes so the
partition ids of pass 1 and pass 2 are the same physical partitioning.

The reference has no ranking at all (SURVEY.md §2.B); this backs the A1
row-slice semantic (reference export.py:46-51) at beyond-spreadsheet scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_global_row_number(
    df: DataFrame,
    order_cols: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a 1-based global row number over a total order, without a
    single-partition window. ``order_cols`` must be a total order (add a
    unique tiebreak column) for the numbering to be deterministic.

    Returns the input columns + ``out``. The range-partitioned copy of the
    input is localCheckpoint'ed (lazily) so the count pass and the numbering
    pass observe the SAME physical partition ids; the executor-local blocks
    free when the DataFrame is garbage-collected — unlike the previous
    ``.cache()``, which the caller could never reach to unpersist (r9
    review: the returned frame is a derived join, so ``.unpersist()`` on it
    was a no-op and each call pinned an unreachable cached copy).
    """
    numbered, _counts = _global_row_number_parts(df, order_cols, out, num_partitions)
    return numbered


def _global_row_number_parts(
    df: DataFrame,
    order_cols: list[str | Column],
    out: str,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame]:
    """(numbered frame, per-partition counts) — the counts ride the SAME
    checkpointed blocks as the numbering, so a caller needing the total row
    count (with_global_ntile) can sum them instead of scanning the source a
    second time (r13 review: the second scan also risked a DIFFERENT N on a
    concurrently-appended source, making N inconsistent with the row
    numbers it brackets)."""
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Materialize once so the count pass and the numbering pass see the
    # same pids (see docstring on why localCheckpoint, not cache).
    ranged = ranged.localCheckpoint(eager=False)
    counts = ranged.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    offsets = counts.select(
        "__pid",
        (
            F.sum("__cnt").over(
                Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("__offset"),
    ).fillna(0, ["__offset"])
    # offsets has one row per partition — broadcast join, no shuffle of data.
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    numbered = (
        ranged.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )
    return numbered, counts


def with_group_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
    totals_out: list | None = None,
) -> DataFrame:
    """``ROW_NUMBER() OVER (PARTITION BY group ORDER BY ...)`` for LOW-
    cardinality groups, distributed.

    A plain partitioned window puts each group in ONE task — fine for
    thousands of groups, fatal when a fact has 3 distinct flags. Same
    offsets trick as :func:`with_global_row_number`, but range-partitioned
    on (group, order) so a group spans many contiguous partitions, with the
    count map keyed by (partition, group): rank = local rank within
    (partition, group) + the group's prefix count over earlier partitions.
    The offsets table has ≤ partitions × groups rows — broadcast-joined.
    ``order_cols`` must totally order rows WITHIN a group (add a unique
    tiebreak) for determinism.

    ``totals_out``: callers that ALSO need per-group row counts (the
    nearest-rank median picks elements by n) pass a list; a
    (group_cols..., n) DataFrame derived from the SAME per-(partition,
    group) count table is appended — the totals ride the ranking pass's
    materialized partitions instead of a second full scan of the fact
    (guide §2.4: one pass, not two).
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint(eager=False)  # same-pid guarantee, freed on GC
    counts = ranged.groupBy("__pid", *group_cols).agg(F.count("*").alias("__cnt"))
    if totals_out is not None:
        totals_out.append(
            counts.groupBy(*group_cols).agg(F.sum("__cnt").cast("long").alias("n"))
        )
    offsets = counts.select(
        "__pid",
        *group_cols,
        (
            F.sum("__cnt").over(
                Window.partitionBy(*group_cols)
                .orderBy("__pid")
                .rowsBetween(Window.unboundedPreceding, -1)
            )
        ).alias("__offset"),
    ).fillna(0, ["__offset"])
    w = Window.partitionBy("__pid", *group_cols).orderBy(*order_cols)
    # NULL-SAFE offsets join (r13 review): a plain column-list equi-join
    # silently DROPPED every row whose group key is NULL — a real
    # ROW_NUMBER() OVER (PARTITION BY g) numbers the NULL partition (same
    # class as the corpus mixture's eqNullSafe fix, r12). The offsets side
    # renames its key copies so the condition never self-references one
    # attribute id.
    off = offsets.select(
        F.col("__pid").alias("__off_pid"),
        *[F.col(g).alias(f"__off_g{i}") for i, g in enumerate(group_cols)],
        "__offset",
    )
    cond = F.col("__pid") == F.col("__off_pid")
    for i, g in enumerate(group_cols):
        cond = cond & F.col(g).eqNullSafe(F.col(f"__off_g{i}"))
    return (
        ranged.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(off), cond)
        .withColumn(out, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop(
            "__pid",
            "__local_rn",
            "__offset",
            "__off_pid",
            *[f"__off_g{i}" for i in range(len(group_cols))],
        )
    )


def topk_per_group_skew(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    k: int,
    out: str = "rk",
) -> DataFrame:
    """Top-k rows per group under GROUP SKEW, two-phase.

    A plain ``row_number() OVER (PARTITION BY group ...)`` sorts each group
    on ONE task — fatal when a mega-group holds 10% of a 100 TB corpus.
    When only the top k matter (quota capping, per-domain sampling) the
    full distributed ranking of :func:`with_group_row_number` is overkill;
    a LOCAL PRUNE bounds the problem instead:

    1. window over (group, spark_partition_id()): the ingest partition id
       rides the shuffle key, so a mega-group spreads over as many tasks as
       it had input splits; each keeps its local top-k. A partition's local
       top-k is a superset of its contribution to the global top-k (the
       order is total), so no global winner is ever pruned.
    2. global rank over the surviving candidates — ≤ k × input-partitions
       rows per group, constant-bounded however large the group was.

    The OUTPUT is independent of the physical input split (superset
    property), provided ``order_cols`` totally order rows within a group
    (add a unique tiebreak — same contract as every ranking op here).
    Returns the kept rows with their 1..k rank in ``out``."""
    local = Window.partitionBy(*group_cols, "__pid").orderBy(*order_cols)
    cand = (
        df.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lrk", F.row_number().over(local))
        .where(F.col("__lrk") <= k)
        .drop("__pid", "__lrk")
    )
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return cand.withColumn(out, F.row_number().over(w)).where(F.col(out) <= k)


def with_global_ntile(
    df: DataFrame,
    order_cols: list[str | Column],
    n: int,
    out: str = "bucket",
) -> DataFrame:
    """NTILE(n) over a total order, distributed.

    Standard NTILE semantics (bucket sizes differ by ≤1, larger buckets
    first): with N rows, q = N div n, r = N mod n, the first r buckets get
    q+1 rows. Computed from the global row number plus a broadcast 1-row
    total count.
    """
    if n < 1:
        # NTILE(0) is invalid SQL; fail loudly at call time instead of a
        # mid-job DIVIDE_BY_ZERO from the bucket arithmetic under the
        # repo's ANSI sessions (r14 review, the zorder_key guard class).
        raise ValueError(f"ntile bucket count must be >= 1, got {n}")
    rn, counts = _global_row_number_parts(df, order_cols, "__rn", None)
    # Total from the numbering pass's own per-partition counts — they ride
    # the CHECKPOINTED blocks, so this is a tiny aggregate over already-
    # materialized data, not a second scan of the source plan (r13 review:
    # the old df.agg(count) re-executed an arbitrarily expensive upstream
    # plan, and on a concurrently-appended source could return an N
    # inconsistent with the row numbers).
    total = counts.agg(F.sum("__cnt").alias("__N"))
    big = (F.floor(F.col("__N") / n) + 1).cast("long")  # rows per early bucket
    small = F.floor(F.col("__N") / n).cast("long")
    r = (F.col("__N") % n).cast("long")
    cutoff = (r * big).cast("long")  # rows covered by the r larger buckets
    bucket = F.when(
        F.col("__rn") <= cutoff, F.floor((F.col("__rn") - 1) / big) + 1
    ).otherwise(r + F.floor((F.col("__rn") - 1 - cutoff) / small) + 1)
    return (
        rn.crossJoin(F.broadcast(total))
        .withColumn(out, bucket.cast("long"))
        .drop("__rn", "__N")
    )


def global_row_slice(
    df: DataFrame,
    order_cols: list[str | Column],
    start: int,
    end: int,
) -> DataFrame:
    """Rows [start, end] (1-based, inclusive) of the total order — the A1
    row-range semantic (`A11:E50`), distributed: no single-partition
    window, numbering + a row-level filter. Every partition is still
    numbered before the filter discards rows (the filter cannot push below
    the window) — the win over a global sort is parallelism, not pruning
    (r13 review: the docstring used to promise an early-exit that nothing
    implemented)."""
    rn = with_global_row_number(df, order_cols, out="__rn")
    return rn.where(F.col("__rn").between(start, end)).drop("__rn")


def skyline_2d(df: DataFrame, min_col: str, max_col: str, num_bins: int = 64) -> DataFrame:
    """2D Pareto frontier: the distinct (min_col, max_col) pairs no other
    pair dominates (other.min_col <= mine AND other.max_col >= mine, at
    least one strict). Textbook formulation is ONE global sort by min_col
    with a running max over max_col — a single-partition window, fatal at
    fact scale. This stays parallel:

    1. distinct pairs (one hash shuffle — also the dedup a skyline needs
       anyway, since equal pairs never dominate each other);
    2. bin by min_col range (bounds via a broadcast 1-row min/max agg —
       no driver collect); per-bin max of max_col is a <= num_bins row
       aggregate;
    3. carry[b] = running max of per-bin maxima over bins < b — a window
       over the tiny per-bin table only;
    4. prune: a pair below-or-equal its carry is dominated by some pair
       in a strictly-lower bin (strictly smaller min_col, >= max_col) —
       this discards ~everything outside the frontier's staircase;
    5. settle in-bin dominance with a bin-PARTITIONED window (order
       min_col asc, max_col desc; running max over preceding rows):
       keep iff max_col beats both the carry and the in-bin running max.

    Every wide op is hash- or bin-partitioned; the only unpartitioned
    window runs over <= num_bins rows. Survives any scale-up in rows;
    num_bins trades prune sharpness for per-bin-table size."""
    # The distinct-pair index feeds three consumers (bounds agg, binning,
    # per-bin maxima); without lineage truncation Spark re-runs the scan +
    # distinct shuffle once per branch (3 full passes in the executed
    # plan). localCheckpoint(eager=False) materializes it once on first
    # action — same trade as operators/dedup.py::minhash_lsh_pairs
    # documents (executor-local, a production run would persist instead).
    pairs = (
        df.select(F.col(min_col).alias("__x"), F.col(max_col).alias("__y"))
        .where(F.col("__x").isNotNull() & F.col("__y").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    bounds = F.broadcast(
        pairs.agg(
            F.min("__x").alias("__xlo"),
            F.max("__x").alias("__xhi"),
        )
    )
    span = F.col("__xhi").cast("double") - F.col("__xlo").cast("double")
    bin_of = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("__x").cast("double") - F.col("__xlo").cast("double"))
                / span * num_bins
            ),
            F.lit(num_bins - 1),
        )
    )
    binned = pairs.crossJoin(bounds).select("__x", "__y", bin_of.alias("__bin"))
    wb = (
        Window.orderBy("__bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        binned.groupBy("__bin")
        .agg(F.max("__y").alias("__binmax"))
        .select("__bin", F.max("__binmax").over(wb).alias("__carry"))
    )
    pruned = binned.join(F.broadcast(carry), "__bin").where(
        F.col("__carry").isNull() | (F.col("__y") > F.col("__carry"))
    )
    win = (
        Window.partitionBy("__bin")
        .orderBy(F.col("__x").asc(), F.col("__y").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.max("__y").over(win)
    return (
        pruned.withColumn("__prev", prev)
        .where(F.col("__prev").isNull() | (F.col("__y") > F.col("__prev")))
        .select(F.col("__x").alias(min_col), F.col("__y").alias(max_col))
    )
