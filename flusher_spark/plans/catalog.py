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
#: weakest. Round-12 rotation, in order: (1) the four round-12 NEW entries
#: (dedup_incremental_clusters, dedup_index_delete,
#: dedup_stream_incremental, similarity_ivf_deleted), getting their FIRST
#: driver verdicts (first-verdict beats re-verdict; the middle two are
#: FULL-oracle — the delete/compact lifecycle and the monotone-split
#: streaming dedup are both deterministic); (2) the lone r6 straggler
#: (etl_load_full_vs_incremental, deferred from the r11 window); (3) 45 of
#: the 50 r7-verdict entries — the stalest remaining cohort, five fixture
#: regenerations old. graph_pagerank_weighted carries extra weight: the
#: r12 out-weight-denominator fix can change its output wherever fixture
#: weights are non-positive. The five spilled r7 entries (join_semi,
#: window_ntile, window_topk_per_group, window_running_sum,
#: window_range_interval — single-shuffle hash-green plans with direct
#: pytest twins, the lowest-risk picks) queue first for the r13 window;
#: after this round the freshness histogram bottoms at r7 with exactly
#: FIVE entries. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) round-12 additions — first driver verdicts
    "dedup_incremental_clusters",  # rows-only: seeded-hash clusters
    "dedup_index_delete",  # FULL oracle: delete+compact lifecycle
    "dedup_stream_incremental",  # FULL oracle: foreachBatch index dedup
    "similarity_ivf_deleted",  # rows-only: ANN delete+compact lifecycle
    # (2) the r6 straggler
    "etl_load_full_vs_incremental",
    # (3) the r7-verdict cohort (45 of 50)
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_rollup",
    "agg_variance_manual",
    "agg_weighted_median_udaf",
    "corpus_dup_rate_by_source",
    "corpus_gopher_rules",
    "corpus_perplexity_buckets",
    "dedup_canonical_url",
    "dedup_sorted_neighborhood",
    "etl_snapshot_cdc_delete",
    "etl_snapshot_changes_feed",
    "etl_snapshot_schema_evolution",
    "events_attribution_split_touch",
    "events_cumulative_reach",
    "events_histogram_equidepth",
    "events_longest_streak",
    "events_rollup_day_hour",
    "events_session_funnel",
    "events_stateful_dedup_first",
    "events_stateful_running_totals",
    "events_stream_stream_full_join",
    "events_trend_grouped_map",
    "graph_connected_components",
    "graph_pagerank_weighted",
    "graph_triangle_stats",
    "join_broadcast_dim",
    "join_full_outer",
    "join_left_outer",
    "join_scd2_pointintime",
    "multimodal_audio_decimate",
    "multimodal_binary_stats",
    "multimodal_feature_extract",
    "multimodal_png_variants",
    "reco_copurchase_similarity",
    "sample_hash_split",
    "sample_stratified_split",
    "similarity_ivf_appended",
    "similarity_matryoshka_truncated",
    "similarity_topk_exact",
    "text_edit_distance",
    "text_quality_filter_pipeline",
    "text_winnow_fingerprints",
    "window_lag_delta",
    # ---- driver window ends here (50) ----
    # r13 rotation head: the five spilled r7 entries
    "join_semi",
    "window_ntile",
    "window_topk_per_group",
    "window_running_sum",
    "window_range_interval",
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
