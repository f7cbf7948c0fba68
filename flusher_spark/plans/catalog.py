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
#: weakest. Round-5 rotation, in order: (1) the five r1-r4 hash-FAILs whose
#: oracles were re-typed this round (uncast top-level SUM → DuckDB HUGEINT vs
#: Spark int64; VERDICT r4 root cause) — their green rows are the round's
#: headline deliverable; (2) the rows-only family whose freshest verdict is
#: r1/r2 (fixtures have drifted twice since) — re-window for a current
#: rows-only check, including agg_count_min_freq after its Spark-Connect-safe
#: rewrite; (3) the two global-max entries whose physical plan changed this
#: round (single-partition window → 1-row broadcast max) — keep them in the
#: window to prove no regression; (4) every round-5 NEW entry in the order
#: added — the 50-entry window exactly covers groups (1)-(4) (minus
#: agg_approx_sketches, which yields its slot; see below), so each new
#: entry gets its FIRST driver verdict this round; (5) back-fill with the
#: highest-value re-checks — the full TPC-H suite (all green r4,
#: unchanged). Union of r1..r5 windows = every entry. Every name here must
#: exist (asserted in tests/test_plans.py); the rest follow in import
#: order.
PRIORITY = (
    # (1) re-typed oracles (CAST(SUM(...) AS BIGINT)) — prove hash-green
    "corpus_mix_apply",
    "corpus_source_mix",
    "corpus_mix_upsample",
    "events_zscore_outliers",
    "pack_sequences_fill",
    # (2) rows-only family, freshest verdict r1/r2 — re-window
    "similarity_topk_arrow",
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "dedup_simhash",
    "dedup_clusters_minhash",
    "dedup_minhash_lsh",
    "agg_count_min_freq",
    # (3) plan changed this round (global-max de-single-partitioned)
    "q15_top_supplier",
    "top_suppliers_revenue",
    # (4) round-5 additions — first driver verdict
    "similarity_topk_pq",
    "docs_boilerplate_ngrams",
    "docs_bigram_familiarity",
    "sample_split_by_source",
    "corpus_importance_resample",
    "events_stream_stream_left_join",
    "join_dynamic_partition_pruning",
    "etl_jsonl_ingest",
    "events_ewma_per_user",
    "scalar_variant_extract",
    "etl_zorder_layout",
    "vocab_bpe_merges",
    "agg_hll_rollup_reuse",
    "window_rank_distributions",
    "agg_mode_exact",
    "etl_schema_evolution_merge",
    "etl_sheet_writeback",
    "dedup_containment_ngram",
    "agg_incremental_merge",
    "etl_orc_roundtrip",
    "events_winsorized_stats",
    "vocab_bpe_encode",
    "agg_corr_exact",
    "events_audience_overlap",
    "etl_table_diff",
    "events_attribution_first_touch",
    "etl_cdc_apply",
    "events_top_paths",
    "multimodal_tiff_decode",
    "agg_bitmap_distinct",
    "events_histogram_equiwidth",
    "join_null_safe",
    "etl_backfill_partition_overwrite",
    "events_anomaly_mad",
    "events_tz_local_days",
    "etl_content_checksum",
    # agg_approx_sketches yields its group-(2) slot to keep every round-5
    # entry's FIRST driver verdict inside the 50-entry window: it is
    # rows-only (weakest verdict class), its fixtures are the most stable
    # of that family, and its r5 local sweep is green — it re-enters the
    # window here, first of the back-fills.
    "agg_approx_sketches",
    # Added after the r5 window filled — first candidates for the r6 window,
    # locally oracle-verified this round.
    "multimodal_audio_spectral",
    "multimodal_media_routing",
    "embedding_centroid_int8",
    "corpus_boilerplate_mask",
    "agg_weighted_avg_exact",
    # (5) back-fill: recent r4 additions worth a second verdict, then TPC-H
    # (4) back-fill: TPC-H all 22 + the scale-join family
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
    # q15_top_supplier already windowed in group (3) above
    "q19_disjunctive_filter",
    "q20_qualified_suppliers",
    "q21_sole_flagged_supplier",
    "q22_global_avg_anti",
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
