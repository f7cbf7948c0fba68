"""Driver contract for the flusher_spark engine.

``entry`` runs the flagship pricing-summary query at sf0.001; ``queries`` /
``oracle_sql`` expose the full catalog (flusher_spark/plans/) — one entry per
implemented operator from SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL
oracle unless the operator is genuinely non-SQL-expressible (LSH/approximate
ops → rows-only checks).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flusher_spark.plans.catalog import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["q1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: e.fn for name, e in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible catalog entry."""
    return {name: e.oracle for name, e in registry().items() if e.oracle is not None}
