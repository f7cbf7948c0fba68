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


#: Names surfaced first by ``registry()``. The driver's correctness harness
#: covers a bounded prefix of the registry (50 entries per round), so this
#: list rotates per round toward the entries whose driver-recorded verdict is
#: still missing. Round-3 rotation: the 42 entries never yet covered by any
#: CORRECTNESS_r*.json window (rounds 1+2 covered 78 of 120), plus the five
#: entries fixed this round (TIMESTAMP_NTZ regression + sketch column shape)
#: so the fixes land as green driver rows, plus the entries changed this
#: round (stream-stream oracle, PNG decode, MinHash perf). Union of r1-r3
#: windows = all 120 entries. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # fixed this round — prove the fix with a green driver row
    "asof_purchase_last_view",
    "events_tumbling_hourly",
    "events_sliding_2h_1h",
    "events_sessionize_30m",
    "agg_approx_sketches",
    # changed this round
    "events_stream_stream_join",
    "dedup_minhash_lsh",
    "multimodal_png_decode",
    # never in a driver window before round 3 (42 entries)
    "setop_union",
    "setop_intersect",
    "setop_except",
    "distinct_values",
    "topk_orders_global",
    "range_scan_rows",
    "filter_projection_pushdown",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_json_extract",
    "scalar_array_ops",
    "case_when_bucketing",
    "pivot_linestatus",
    "unpivot_part_attrs",
    "agg_exact_median_ranked",
    "agg_exact_median_histogram",
    "profile_lineitem_columns",
    "quality_expectations_orders",
    "etl_partitioned_write_pruning",
    "etl_upsert_latest",
    "events_funnel_conversion",
    "events_retention_cohorts",
    "events_resample_gapfill",
    "events_scd2_intervals",
    "events_zscore_outliers",
    "events_stream_upsert_latest",
    "text_pii_redact",
    "text_html_strip",
    "text_tfidf_top_terms",
    "text_fuzzy_join_typos",
    "decontaminate_ngram_overlap",
    "pack_sequences_fill",
    "shuffle_deterministic_order",
    "vocab_bigram_counts",
    "docs_chunk_overlap",
    "docs_repetition_signals",
    "embedding_quantize_int8",
    "similarity_topk_quantized",
    "sample_per_group_topk",
    "multimodal_wav_decode",
    "multimodal_ppm_decode",
)


def registry() -> dict[str, CatalogEntry]:
    """All catalog entries, PRIORITY names first (importing the defining
    modules on first use)."""
    import flusher_spark.plans.corpus  # noqa: F401
    import flusher_spark.plans.etl  # noqa: F401
    import flusher_spark.plans.llm  # noqa: F401
    import flusher_spark.plans.relational  # noqa: F401

    ordered = {name: _REGISTRY[name] for name in PRIORITY if name in _REGISTRY}
    ordered.update((n, e) for n, e in _REGISTRY.items() if n not in ordered)
    return ordered
