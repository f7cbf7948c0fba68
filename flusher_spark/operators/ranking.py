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

    Returns the input columns + ``out``. The returned DataFrame is backed by
    a cached range-partitioned copy of the input; call ``.unpersist()`` on it
    (or let it age out) after the downstream action if memory matters.
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Cache so the count pass and the numbering pass see the same pids.
    ranged = ranged.cache()
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
    return (
        ranged.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


def with_group_row_number(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[str | Column],
    out: str = "rn",
    num_partitions: int | None = None,
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
    """
    if num_partitions is None:
        num_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("__pid", F.spark_partition_id())
    )
    ranged = ranged.cache()
    counts = ranged.groupBy("__pid", *group_cols).agg(F.count("*").alias("__cnt"))
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
    return (
        ranged.withColumn("__local_rn", F.row_number().over(w))
        .join(F.broadcast(offsets), ["__pid", *group_cols])
        .withColumn(out, (F.col("__offset") + F.col("__local_rn")).cast("long"))
        .drop("__pid", "__local_rn", "__offset")
    )


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
    rn = with_global_row_number(df, order_cols, out="__rn")
    total = rn.agg(F.count("*").alias("__N"))
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
    row-range semantic (`A11:E50`), distributed. Range partitioning lets
    every partition whose offset range misses [start, end] return early
    after the (cheap) count pass."""
    rn = with_global_row_number(df, order_cols, out="__rn")
    return rn.where(F.col("__rn").between(start, end)).drop("__rn")
