"""Data-lake table sink: the reference's BigQuery load semantics on Spark.

Reference behavior preserved (bigquery.py:42-47): full-refresh = drop target
then load; incremental = append. Fixed by construction: the reference never
awaits its LoadJob (bigquery.py:25-28 — a failed load can still be recorded
as Success); Spark writes are synchronous actions, so a returned load IS a
completed load, and tests assert it.

Tables are parquet directories under a warehouse root (one 'dataset', like
the reference's hard-coded ``g_sheets``, bigquery.py:9). At cluster scale
the same API fronts saveAsTable/Delta; the parquet layout keeps v1
dependency-free.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class Warehouse:
    """A directory-backed 'dataset' of parquet tables."""

    def __init__(self, spark: SparkSession, root: str, dataset: str = "g_sheets") -> None:
        self.spark = spark
        self.root = os.path.join(root, dataset)
        os.makedirs(self.root, exist_ok=True)  # reference auto-creates, bigquery.py:13-16

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def table_exists(self, table: str) -> bool:
        """Catalog probe (reference table_exists, bigquery.py:31-35)."""
        return os.path.isdir(self._path(table))

    def drop(self, table: str) -> None:
        """DROP TABLE (reference delete, bigquery.py:38-39)."""
        shutil.rmtree(self._path(table), ignore_errors=True)

    def load(self, df: DataFrame, table: str, incremental: bool = False) -> str:
        """Load a DataFrame: full-refresh (drop + recreate) unless
        ``incremental`` (append) — reference load(), bigquery.py:42-47.
        Synchronous: when this returns, the data is on disk."""
        mode = "append" if incremental else "overwrite"
        if not incremental and self.table_exists(table):
            self.drop(table)
        df.write.mode(mode).parquet(self._path(table))
        return f"{os.path.basename(self.root)}.{table}"

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self._path(table))

    def compact(self, table: str, target_partitions: int | None = None) -> int:
        """Small-files compaction: rewrite the table into ``target_partitions``
        files (default: size-based — one file per 64 MB, min 1).

        Incremental append (the reference's load mode, bigquery.py:45-47)
        accumulates one file-set per load; at high cadence the table becomes
        thousands of tiny files and every scan pays per-file open cost. This
        is the maintenance half of an append-mode sink. Returns the new file
        count. Rewrite is staged through a sibling directory + atomic rename,
        so a crash mid-compact never loses the table.
        """
        path = self._path(table)
        df = self.read(table)
        if target_partitions is None:
            size = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
            target_partitions = max(1, size // (64 * 1024 * 1024))
        staged = path + ".__compacting"
        shutil.rmtree(staged, ignore_errors=True)
        df.coalesce(int(target_partitions)).write.mode("overwrite").parquet(staged)
        old = path + ".__old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(path, old)
        os.rename(staged, path)
        shutil.rmtree(old, ignore_errors=True)
        return len([f for f in os.listdir(path) if f.endswith(".parquet")])
