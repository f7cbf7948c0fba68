"""Scale toolkit: co-located (bucketed) joins and skew salting.

The two shuffle levers the DataFrame API doesn't apply for you:

- **Bucketing**: pre-shuffle a fact table ONCE at write time
  (``bucketBy(key)``) so every later equi-join/aggregation on that key runs
  shuffle-free — the biggest single win for a repeatedly-joined 100 TB fact
  table. ``write_bucketed``/``read_table`` wrap the catalog round-trip;
  tests assert the join plan has no Exchange over the bucketed sides.

- **Salting**: a skewed join key (one user with 10M events) puts its entire
  key group in one task. ``salted_join`` splits each left key group across
  ``n_salt`` sub-keys (deterministic row-hash, not rand() — retries must not
  reshuffle rows) and replicates the matching right rows once per sub-key:
  parallelism × n_salt for the hot key, n_salt× duplication of only the
  right side. AQE's skew-join handles moderate skew automatically
  (session.py enables it); salting is for the pathological tail where a
  single key exceeds an executor.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    One shuffle now; every later join/groupBy on ``key`` against another
    table bucketed the same way is exchange-free (and sort-free when
    ``sort``). The bucket count is a layout contract — both join sides must
    match it."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # A previous SESSION may have left the managed location behind while this
    # session's in-memory catalog has no entry for it — saveAsTable then
    # fails with LOCATION_ALREADY_EXISTS. Clear the orphan.
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    path = os.path.join(warehouse.removeprefix("file:"), table)
    shutil.rmtree(path, ignore_errors=True)
    writer = df.write.mode("overwrite").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: plans as a
    SortMergeJoin with NO Exchange on either side (asserted in
    tests/test_operators.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each left key group over ``n_salt``
    deterministic sub-keys and replicate right rows across all of them.

    Exactly equal to ``left.join(right, on, how)`` for inner/left joins:
    each left row carries ONE salt value, and the right side has exactly one
    replica per salt value, so no duplicates and no losses. The salt is a
    hash of the whole left row — deterministic under task retries (rand()
    would re-deal rows between attempts and can drop/duplicate under
    speculative execution)."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(n_salt))
    lhs = left.withColumn("__salt", salt)
    rhs = right.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return lhs.join(rhs, [on, "__salt"], how).drop("__salt")
