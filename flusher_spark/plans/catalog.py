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
#: weakest. Round-11 rotation, in order: (1) the round-11 NEW entries, each
#: getting its FIRST driver verdict (first-verdict beats re-verdict); (2)
#: the full r6-verdict cohort — 48 entries, the stalest records in the
#: registry, including all 19 rows-only entries (MinHash/SimHash/semantic/
#: similarity/BPE/sketch/PageRank) whose rows-only driver check is their
#: only cross-process signal and whose last one was r6, four fixture
#: regenerations ago. Extra weight this round: the MinHash permutation
#: family changed (dedup.minhash_min_aggs — the affine family was
#: order-preserving on small hashes), so every minhash-derived entry's
#: output is new — which also pulls corpus_e2e_pipeline_minhash (r9
#: verdict, stage 3 = minhash_lsh_pairs) into the window ahead of one r6
#: hash-green entry whose code is unchanged since r6
#: (etl_load_full_vs_incremental — fully pytest-covered warehouse
#: mechanics, deferred to r12): a changed-output entry outranks a stale
#: re-verdict of identical output. (1)+(2) fill exactly 50; the r7
#: cohort plus the one deferred r6 entry queue for the r12 window. After
#: this round the freshness histogram bottoms at r6 with exactly ONE
#: entry there. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) round-11 additions — first driver verdict
    "dedup_incremental_exact",
    "dedup_minhash_index",  # rows-only: signature-agreement estimate
    # changed-output re-verdict: the only minhash consumer NOT already in
    # the r6 cohort below
    "corpus_e2e_pipeline_minhash",
    # (2) the r6-verdict cohort (47 of 48) — includes the whole stale
    # rows-only family plus the r6 hash-green entries, all four fixtures
    # stale
    "agg_approx_sketches",
    "agg_bitmap_distinct",
    "agg_count_min_freq",
    "agg_exact_quantile_interpolated",
    "agg_histogram_rollup_percentile",
    "agg_hll_rollup_reuse",
    "agg_weighted_avg_exact",
    "asof_view_staleness_bound",
    "corpus_boilerplate_mask",
    "corpus_c4_rules",
    "dedup_clusters_minhash",
    "dedup_minhash_builtin",
    "dedup_minhash_lsh",
    "dedup_semantic_clusters",
    "dedup_semantic_embedding",
    "dedup_simhash",
    "docs_chunk_udtf",
    "embedding_centroid_int8",
    "etl_csv_export_roundtrip",
    "etl_schema_drift_report",
    "etl_schema_inference_typed",
    "etl_sheet_range_scan",
    "etl_snapshot_merge_timetravel",
    "events_funnel_single_scan",
    "events_sessionize_dynamic_gap",
    "events_sliding_distinct_bitmap",
    "events_zscore_outliers",
    "graph_pagerank_bipartite",
    "multimodal_audio_spectral",
    "multimodal_image_resize",
    "multimodal_jpeg_color_decode",
    "multimodal_jpeg_decode",
    "multimodal_media_routing",
    "multimodal_video_frames",
    "profile_join_key_skew",
    "similarity_ivf_persisted",
    "similarity_neardup_cosine",
    "similarity_pq_persisted",
    "similarity_topk_lsh",
    "similarity_topk_pq",
    "sql_api_revenue_report",
    "text_hash_classifier",
    "text_lang_id",
    "text_quality_score",
    "text_url_components",
    "vocab_bpe_encode",
    "vocab_bpe_merges",
    # ---- driver window ends here (50) ----
    # r12 rotation head: the one deferred r6 entry, then the r7 cohort
    "etl_load_full_vs_incremental",
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
