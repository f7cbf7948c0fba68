"""Typed loaders for the driver-generated analytics tables.

One quirk handled here: ``events.parquet`` stores ``ts`` as INT64
TIMESTAMP(NANOS) which Spark 4 only reads with
``spark.sql.legacy.parquet.nanosAsLong=true`` (set in session.configure).
We convert nanoseconds → microsecond timestamps by truncation, which matches
exactly how DuckDB reads the same file (its TIMESTAMP is µs, ns truncated),
so oracle comparisons line up.
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one analytics table as a typed DataFrame."""
    configure(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns → µs truncation; identical to DuckDB's read of the same column.
        # Integer division (`div`), NOT `/`: float division of an ~1.7e18 ns
        # value loses the last microsecond digit (doubles are exact only to
        # 2^53) — caught by the asof oracle check.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so operators can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)
