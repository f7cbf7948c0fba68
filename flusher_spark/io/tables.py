"""Typed loaders for the driver-generated analytics tables.

One quirk handled here: ``events.parquet`` has shipped with two different
physical encodings for ``ts`` across driver testdata generations:

* INT64 TIMESTAMP(NANOS), which Spark 4 only reads with
  ``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.configure)
  and surfaces as ``bigint`` — we truncate ns → µs, matching exactly how
  DuckDB reads the same file (its TIMESTAMP is µs, ns truncated);
* plain ``timestamp[us]`` (no UTC flag), which Spark 4 surfaces as
  ``TIMESTAMP_NTZ`` — we cast to the session-local ``TIMESTAMP`` (session tz
  is pinned to UTC in session.py, so the wall-clock instant is unchanged and
  DuckDB's naive read lines up).

``normalize_event_ts`` handles both so every consumer — batch loaders here
and the streaming reader in streaming/windows.py — sees one canonical
``timestamp`` column regardless of which testdata generation is on disk.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flusher_spark.session import configure

#: Every driver-generated table (TESTDATA.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def normalize_event_ts(df: DataFrame, col: str = "ts") -> DataFrame:
    """Canonicalize the events ``ts`` column to session-tz ``timestamp``.

    Handles every encoding the driver's testdata generator has produced:
    ``bigint`` (INT64 ns under nanosAsLong), ``timestamp_ntz``
    (parquet timestamp[us] with no UTC flag), and the already-canonical
    ``timestamp``. Downstream code (``F.unix_micros``, ``F.window``,
    watermarks) requires plain TIMESTAMP.
    """
    dtype = dict(df.dtypes).get(col)
    if dtype == "bigint":
        # ns → µs truncation; identical to DuckDB's read of the same column.
        # Integer division (`div`), NOT `/`: float division of an ~1.7e18 ns
        # value loses the last microsecond digit (doubles are exact only to
        # 2^53) — caught by the asof oracle check.
        # Backticked: `col` is a public parameter, and an unquoted name
        # with a space (or a SQL keyword) fails F.expr at plan time while
        # the ntz branch's F.col handles it fine (r13 review).
        df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    elif dtype == "timestamp_ntz":
        # Session tz is UTC (session.py), so NTZ → TIMESTAMP preserves the
        # wall-clock value and matches DuckDB's naive read bit-for-bit.
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one analytics table as a typed DataFrame."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_event_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
