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
#: list rotates per round toward the entries whose latest driver verdict is
#: weakest. Round-13 rotation, in order: (1) the two round-13 NEW entries
#: (dedup_stream_neardup — the streaming MinHash sink, rows-only by the
#: approximate-operator convention; corpus_e2e_incremental — the composed
#: incremental pipeline, FULL oracle via the monotone doc_id split),
#: getting their FIRST driver verdicts per the freshness-guard convention;
#: (2) the five r7-verdict entries spilled from the r12 window (join_semi
#: + the four window_* entries — the stalest cohort, six fixture
#: regenerations old); (3) 43 of the 50 r8-verdict entries. The seven
#: spilled r8 entries (count_rows, distinct_values, setop_union,
#: setop_intersect, setop_except, join_cross, case_when_bucketing —
#: single-operator relational plans with direct pytest twins and no code
#: touched since r8, the lowest-risk picks) queue first for the r14
#: window; after this round the freshness histogram bottoms at r8 with
#: exactly SEVEN entries. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) round-13 additions — first driver verdicts
    "dedup_stream_neardup",  # rows-only: streaming MinHash near-dup sink
    "corpus_e2e_incremental",  # FULL oracle: composed incremental pipeline
    # (2) the r7-verdict cohort (the five spilled from r12)
    "join_semi",
    "window_ntile",
    "window_topk_per_group",
    "window_running_sum",
    "window_range_interval",
    # (3) the r8-verdict cohort (43 of 50)
    "agg_exact_median_histogram",
    "agg_exact_median_ranked",
    "asof_purchase_last_view",
    "corpus_e2e_pipeline",
    "dedup_substring_mask",
    "dedup_substring_spans",
    "embedding_quantize_int8",
    "etl_partitioned_write_pruning",
    "etl_snapshot_clustered_scan",
    "etl_upsert_latest",
    "events_markov_transitions",
    "events_resample_gapfill",
    "events_retention_cohorts",
    "events_rfm_segmentation",
    "events_scd2_intervals",
    "events_sessionize_30m",
    "events_sliding_2h_1h",
    "events_stream_stream_join",
    "events_stream_stream_right_join",
    "events_stream_upsert_latest",
    "events_tumbling_hourly",
    "filter_projection_pushdown",
    "join_anti",
    "multimodal_png_decode",
    "multimodal_ppm_decode",
    "multimodal_wav_decode",
    "pivot_linestatus",
    "profile_lineitem_columns",
    "quality_expectations_orders",
    "range_scan_rows",
    "sample_per_group_topk",
    "scalar_array_ops",
    "scalar_date_funcs",
    "scalar_json_extract",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "shuffle_deterministic_order",
    "similarity_topk_quantized",
    "text_bm25_topk",
    "text_fuzzy_join_typos",
    "text_pii_redact",
    "topk_orders_global",
    "unpivot_part_attrs",
    # ---- driver window ends here (50) ----
    # r14 rotation head: the seven spilled r8 entries
    "count_rows",
    "distinct_values",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "join_cross",
    "case_when_bucketing",
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
