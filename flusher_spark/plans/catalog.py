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
#: weakest. Round-7 rotation, in order: (1) 26 of the 28 entries whose latest
#: driver verdict is r1/r2 — the stalest record in the registry (fixtures
#: have drifted six windows since; all 24 oracle-checkable ones re-verified
#: green locally in r6, so this is record freshness, not suspected
#: breakage); (2) round-7 NEW entries in the order added — each gets its
#: FIRST driver verdict this round (first-verdict beats re-verdict by
#: policy); (3) the rows-only entries — the weakest verdict class
#: re-windows every round by policy (as many as fit the tail of the
#: 50-slot window); (4) back-fill: everything r6-green, freshest last.
#: Union of r1..r6 windows = every entry, each checked at least twice;
#: after this window every entry's latest verdict is ≤2 rounds old.
#: Every name here must exist (asserted in tests/test_plans.py); the rest
#: follow in import order.
PRIORITY = (
    # (1) stalest driver verdicts: the r1 family not re-windowed in r6 (13
    # of 16 — count_rows/join_cross/join_anti deferred below)
    "multimodal_binary_stats",
    "multimodal_feature_extract",
    "text_edit_distance",
    "text_winnow_fingerprints",
    "sample_hash_split",
    "join_left_outer",
    "join_full_outer",
    "join_semi",
    "agg_distinct",
    "agg_rollup",
    "agg_variance_manual",
    "window_running_sum",
    "window_lag_delta",
    # ... and the full r2-verdict family (12)
    "similarity_topk_exact",
    "sample_stratified_split",
    "text_quality_filter_pipeline",
    "join_broadcast_dim",
    "agg_cube",
    "agg_grouping_sets",
    "window_topk_per_group",
    "window_ntile",
    "window_range_interval",
    "events_rollup_day_hour",
    "events_stateful_running_totals",
    "events_stateful_dedup_first",
    # (2) round-7 additions — first driver verdict
    "etl_snapshot_cdc_delete",
    "etl_snapshot_schema_evolution",
    "similarity_ivf_appended",
    "graph_pagerank_weighted",
    "graph_connected_components",
    "corpus_perplexity_buckets",
    "events_attribution_split_touch",
    "dedup_canonical_url",
    "dedup_sorted_neighborhood",
    "events_session_funnel",
    "events_histogram_equidepth",
    "corpus_gopher_rules",
    "events_stream_stream_full_join",
    "multimodal_png_variants",
    "join_scd2_pointintime",
    "etl_snapshot_changes_feed",
    "agg_weighted_median_udaf",
    "reco_copurchase_similarity",
    "graph_triangle_stats",
    "similarity_matryoshka_truncated",
    "corpus_dup_rate_by_source",
    "events_longest_streak",
    "multimodal_audio_decimate",
    "events_trend_grouped_map",
    "events_cumulative_reach",
    # (the r7 additions grew to 25, so groups (1)+(2) fill exactly 50 —
    # every first-verdict row is inside the driver window — by deferring
    # the THREE most trivial stale rows (count_rows, join_cross, join_anti:
    # all r1-green and locally re-verified twice this round) to lead the
    # r8 rotation from here)
    "count_rows",
    "join_cross",
    "join_anti",
    # (3) rows-only family — re-window every round by policy (12; the tail
    # past slot 50 back-fills next round's window first)
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
    # (4) back-fill: r6-green entries, in r6-window order
    "agg_weighted_avg_exact",
    "corpus_boilerplate_mask",
    "embedding_centroid_int8",
    "multimodal_audio_spectral",
    "multimodal_media_routing",
    "agg_bitmap_distinct",
    "events_zscore_outliers",
    "events_funnel_single_scan",
    "multimodal_jpeg_decode",
    "dedup_semantic_embedding",
    "similarity_pq_persisted",
    "similarity_ivf_persisted",
    "text_hash_classifier",
    "profile_join_key_skew",
    "graph_pagerank_bipartite",
    "dedup_semantic_clusters",
    "etl_snapshot_merge_timetravel",
    "dedup_minhash_builtin",
    "events_sessionize_dynamic_gap",
    "agg_histogram_rollup_percentile",
    "multimodal_video_frames",
    "multimodal_jpeg_color_decode",
    "multimodal_image_resize",
    "events_sliding_distinct_bitmap",
    "corpus_c4_rules",
    "asof_view_staleness_bound",
    "sql_api_revenue_report",
    "agg_exact_quantile_interpolated",
    "docs_chunk_udtf",
    "text_url_components",
    "etl_sheet_range_scan",
    "etl_schema_inference_typed",
    "etl_load_full_vs_incremental",
    "etl_csv_export_roundtrip",
    "etl_schema_drift_report",
    "text_quality_score",
    "text_lang_id",
    "similarity_neardup_cosine",
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
