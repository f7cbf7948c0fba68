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
#: weakest. Round-8 rotation, in order: (1) the LAST three r1-verdict
#: entries (count_rows/join_cross/join_anti, deferred from r7's window —
#: after this round nothing in the registry has a verdict older than r5);
#: (2) the full r3-verdict cohort (39 entries, the oldest remaining
#: record); (3) the round-8 NEW entries in the order added — each gets its
#: FIRST driver verdict this round (first-verdict beats re-verdict by
#: policy). Groups (1)+(2)+(3) fill exactly 50. Past the window, the
#: r4-verdict cohort is queued first (it leads the r9 rotation), then the
#: rows-only family (re-windowed whenever tail slots exist — none this
#: round), then back-fill. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) last r1-latest verdicts anywhere in the registry
    "count_rows",
    "join_cross",
    "join_anti",
    # (2) the r3-verdict cohort (39)
    "agg_exact_median_histogram",
    "agg_exact_median_ranked",
    "asof_purchase_last_view",
    "case_when_bucketing",
    "distinct_values",
    "embedding_quantize_int8",
    "etl_partitioned_write_pruning",
    "etl_upsert_latest",
    "events_resample_gapfill",
    "events_retention_cohorts",
    "events_scd2_intervals",
    "events_sessionize_30m",
    "events_sliding_2h_1h",
    "events_stream_stream_join",
    "events_stream_upsert_latest",
    "events_tumbling_hourly",
    "filter_projection_pushdown",
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
    "setop_except",
    "setop_intersect",
    "setop_union",
    "shuffle_deterministic_order",
    "similarity_topk_quantized",
    "text_fuzzy_join_typos",
    "text_pii_redact",
    "topk_orders_global",
    "unpivot_part_attrs",
    # (3) round-8 additions - first driver verdict (slots 43-50)
    "dedup_substring_spans",
    "dedup_substring_mask",
    "corpus_e2e_pipeline",
    "events_stream_stream_right_join",
    "etl_snapshot_clustered_scan",
    "text_bm25_topk",
    "events_markov_transitions",
    "events_rfm_segmentation",
    # ---- driver window ends here (50) ----
    # r4-verdict cohort: leads the r9 rotation
    "asof_nearest_view",
    "decontaminate_ngram_overlap",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "docs_chunk_overlap",
    "docs_repetition_signals",
    "events_funnel_conversion",
    "events_minmax_norm_arrow",
    "events_stream_dedup_native",
    "join_bucketed_colocated",
    "join_interval_overlap",
    "join_range_binned",
    "join_salted_skew",
    "multimodal_bmp_decode",
    "multimodal_gif_decode",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_region_revenue",
    "q6_revenue_filter",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_parts",
    "q12_conditional_agg",
    "q13_order_distribution",
    "q14_promo_ratio",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q20_qualified_suppliers",
    "q21_sole_flagged_supplier",
    "q22_global_avg_anti",
    "text_html_strip",
    "text_tfidf_top_terms",
    "text_token_stats",
    "vocab_bigram_counts",
    # rows-only family - re-window whenever tail slots exist
    "similarity_topk_arrow",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "similarity_topk_pq",
    "dedup_simhash",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
    "agg_count_min_freq",
    "agg_approx_sketches",
    "agg_hll_rollup_reuse",
    "vocab_bpe_merges",
    "vocab_bpe_encode",
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
