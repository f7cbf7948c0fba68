"""Deterministic hash-based sampling and splits.

``df.sample()`` is seed-dependent per partition layout — a repartition or a
Spark upgrade re-deals the sample, which is unacceptable for training-data
pipelines (the held-out set must never leak into training across reruns).
Hash-based sampling decides membership from the ROW KEY alone:

    split = md5(key) mod N → bucket

Properties that matter at 100 TB:
- reproducible across runs, partitionings, engines (md5 is portable — the
  DuckDB oracle computes the identical split);
- stable under append: new rows get buckets without disturbing old ones;
- no shuffle, no state: a codegen'd projection + filter, fully pushdown-able.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from the md5 of the key's
    string form. The first 8 hex chars give 32 uniform bits — plenty for
    percentage-grade splits."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast("long") % n_buckets
    )


def hash_split(
    df: DataFrame,
    key: str,
    test_pct: int = 10,
    bucket_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(train, test) split: rows whose hash bucket < ``test_pct`` (of 100)
    are test. Disjoint, exhaustive, append-stable, engine-portable."""
    b = hash_bucket(F.col(key))
    if bucket_col:
        df = df.withColumn(bucket_col, b)
        b = F.col(bucket_col)
    return df.where(b >= test_pct), df.where(b < test_pct)
