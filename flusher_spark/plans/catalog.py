"""Query catalog: the engine's registry of named operators/queries.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with an optional ANSI-SQL oracle string (run by the driver on DuckDB over the
same parquet tables). Entries without an oracle are genuinely
non-SQL-expressible (LSH dedup, approximate similarity) and get rows-only
checks.

Column-name discipline: every computed column is aliased identically in the
Spark plan and the oracle SQL — the correctness harness sorts columns by name
and hashes values, so names must line up exactly.

Numeric discipline (why sums cast to DECIMAL everywhere): double summation
is order-sensitive, and Spark's partial aggregation order differs from
DuckDB's sequential scan. Casting each addend to decimal makes the sum exact
and associative in both engines, so results compare bit-for-bit after the
final cast back to double. Averages divide that exact sum by an exact
count — one deterministic IEEE division on each side. Precision choices
(DECIMAL(8,2) for base money columns — compact-long fast path — and wider
for computed revenue expressions) are documented in plans/num.py.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CatalogEntry:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str


_REGISTRY: dict[str, CatalogEntry] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog (oracle=None → rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate catalog entry: {name}")
        _REGISTRY[name] = CatalogEntry(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def registry() -> dict[str, CatalogEntry]:
    """All catalog entries (importing the defining modules on first use)."""
    import flusher_spark.plans.etl  # noqa: F401
    import flusher_spark.plans.llm  # noqa: F401
    import flusher_spark.plans.relational  # noqa: F401

    return dict(_REGISTRY)
