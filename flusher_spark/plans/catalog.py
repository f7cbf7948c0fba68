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
#: weakest. Round-9 rotation, in order: (1) ``etl_dynamic_partition_overwrite``
#: — the ONLY entry never driver-checked (registered after r8's window froze;
#: first-verdict beats everything); (2) the full r4-verdict cohort (42
#: entries, the oldest remaining records — after this round nothing in the
#: registry has a verdict older than r5); (3) the round-9 NEW entries in the
#: order added, each getting its FIRST driver verdict. (1)+(2)+(3) fill
#: exactly 50. Past the window, the r5-verdict cohort is queued first (it
#: leads the r10 rotation — 37 entries + the rows-only family re-window
#: next), then back-fill. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) never driver-checked (registered post-rotation in r8)
    "etl_dynamic_partition_overwrite",
    # (2) the r4-verdict cohort (42)
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
    "text_tfidf_top_terms",
    "text_token_stats",
    # (3) round-9 additions - first driver verdict (slots 42-50).
    # Two r4-cohort re-verdicts (text_html_strip, vocab_bigram_counts) were
    # displaced by the two late-r9 additions — first-verdict beats
    # re-verdict; they lead the r10 rotation below.
    "corpus_e2e_pipeline_minhash",
    "dedup_substring_spans_hashed",
    "events_time_weighted_avg",
    "skyline_price_quantity",
    "scalar_business_days",
    "docs_ngram_novelty",
    "etl_snapshot_expire_vacuum",
    "events_stream_dedup_watermarked",
    "etl_referential_integrity",
    # ---- driver window ends here (50) ----
    # displaced r4-cohort members: head of the r10 rotation
    "text_html_strip",
    "vocab_bigram_counts",
    # r5-verdict cohort: leads the r10 rotation (37)
    "agg_corr_exact",
    "agg_incremental_merge",
    "agg_mode_exact",
    "corpus_importance_resample",
    "corpus_mix_apply",
    "corpus_mix_upsample",
    "corpus_source_mix",
    "dedup_containment_ngram",
    "docs_bigram_familiarity",
    "docs_boilerplate_ngrams",
    "etl_backfill_partition_overwrite",
    "etl_cdc_apply",
    "etl_content_checksum",
    "etl_jsonl_ingest",
    "etl_orc_roundtrip",
    "etl_schema_evolution_merge",
    "etl_sheet_writeback",
    "etl_table_diff",
    "etl_zorder_layout",
    "events_anomaly_mad",
    "events_attribution_first_touch",
    "events_audience_overlap",
    "events_ewma_per_user",
    "events_histogram_equiwidth",
    "events_stream_stream_left_join",
    "events_top_paths",
    "events_tz_local_days",
    "events_winsorized_stats",
    "join_dynamic_partition_pruning",
    "join_null_safe",
    "multimodal_tiff_decode",
    "pack_sequences_fill",
    "q15_top_supplier",
    "sample_split_by_source",
    "scalar_variant_extract",
    "top_suppliers_revenue",
    "window_rank_distributions",
    # rows-only family - re-window with the r10 rotation
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
