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
#: weakest. Round-10 rotation, in order: (1) the two r4-verdict strays that
#: r9's late additions displaced (the oldest records in the registry);
#: (2) the full r5-verdict cohort (37 entries — after this round nothing in
#: the registry has a verdict older than r6); (3) the round-10 NEW entries
#: in the order added, each getting its FIRST driver verdict; (4) the head
#: of the rows-only (no-oracle) family, last driver-windowed in r6 — the
#: driver's rows-only check is their only cross-process signal, so they
#: re-window ahead of the hash-green r6 cohort. (1)+(2)+(3)+(4) fill
#: exactly 50. Past the window, the REMAINING rows-only family is queued
#: first (it leads the r11 rotation), then the r6 cohort, then back-fill.
#: Every name here must exist (asserted in tests/test_plans.py); the rest
#: follow in import order.
PRIORITY = (
    # (1) r4-verdict strays displaced from the r9 window
    "text_html_strip",
    "vocab_bigram_counts",
    # (2) the r5-verdict cohort (37)
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
    # (3) round-10 additions — first driver verdict
    "events_linreg_per_type",
    "events_interval_coverage",
    "corpus_k_anonymity",
    "corpus_domain_quota",
    "events_stream_static_join",
    "graph_label_propagation",
    "events_cusum_changepoint",
    "events_l_diversity",
    "similarity_mmr_rerank",
    # (4) rows-only family head (last windowed r6; rows-only checks are
    # their only cross-process signal — the rest queue for r11, displaced
    # by the four late round-10 additions above, which must take window
    # slots for their FIRST verdict)
    "similarity_topk_arrow",
    "similarity_topk_ivf",
    # ---- driver window ends here (50) ----
    # remaining rows-only family: head of the r11 rotation
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
