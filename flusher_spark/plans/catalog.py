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
#: weakest. Round-14 rotation, in order: (1) the four round-14 NEW entries
#: (dedup_stream_semantic — the streaming embedding near-dup sink over the
#: persisted IVF index, rows-only by the approximate-operator convention;
#: corpus_e2e_incremental_neardup — the composed incremental pipeline with
#: the MinHash-index near-dup stage, rows-only by the same convention;
#: corpus_e2e_incremental_semantic — the same pipeline with the IVF-index
#: semantic stage, completing the incremental × index-family matrix,
#: rows-only by the IVF-bucketed convention;
#: corpus_e2e_incremental_full — the production funnel chaining all three
#: persisted-index stages in one composed run, rows-only), getting their
#: FIRST driver verdicts per the freshness-guard convention;
#: (2) the seven r8-verdict entries spilled from the r13 window
#: (count_rows, distinct_values, setop_* ×3, join_cross,
#: case_when_bucketing — the stalest cohort, six fixture regenerations
#: old); (3) 39 of the 49 r9-verdict entries. The r13 verdict asked for
#: "≤6 spill", which is unsatisfiable together with the first-verdict
#: convention (4 new + 7 r8 + 49 r9 = 60 > 50); first-verdicts win
#: because a never-driver-checked entry is strictly weaker evidence than
#: a 6-round-stale one with a pytest twin. The TEN spilled r9 entries
#: (q6_revenue_filter, q10_returned_items, q11_important_parts,
#: q12_conditional_agg, q13_order_distribution, q14_promo_ratio,
#: q16_supplier_variety, q17_small_quantity_revenue,
#: q19_disjunctive_filter, q22_global_avg_anti — the simplest TPC-H
#: shapes, each a reference-equality pytest twin in tests/test_tpch.py
#: with plan code untouched since r9) queue first for the r15 window;
#: after this round the freshness histogram bottoms at r9 with exactly
#: TEN entries. Every name here must exist (asserted in
#: tests/test_plans.py); the rest follow in import order.
PRIORITY = (
    # (1) round-14 additions — first driver verdicts
    "dedup_stream_semantic",  # rows-only: streaming IVF semantic dedup sink
    "corpus_e2e_incremental_neardup",  # rows-only: incremental + MinHash stage
    "corpus_e2e_incremental_semantic",  # rows-only: incremental + IVF stage
    "corpus_e2e_incremental_full",  # rows-only: exact→MinHash→semantic funnel
    # (2) the r8-verdict cohort (the seven spilled from r13)
    "count_rows",
    "distinct_values",
    "setop_union",
    "setop_intersect",
    "setop_except",
    "join_cross",
    "case_when_bucketing",
    # (3) the r9-verdict cohort (41 of 49)
    "asof_nearest_view",
    "decontaminate_ngram_overlap",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_keep_best",
    "dedup_ngram_jaccard",
    "dedup_substring_spans_hashed",
    "docs_chunk_overlap",
    "docs_ngram_novelty",
    "docs_repetition_signals",
    "etl_dynamic_partition_overwrite",
    "etl_referential_integrity",
    "etl_snapshot_expire_vacuum",
    "events_funnel_conversion",
    "events_minmax_norm_arrow",
    "events_stream_dedup_native",
    "events_stream_dedup_watermarked",
    "events_time_weighted_avg",
    "join_bucketed_colocated",
    "join_interval_overlap",
    "join_range_binned",
    "join_salted_skew",
    "multimodal_bmp_decode",
    "multimodal_gif_decode",
    "q18_large_orders",
    "q1_pricing_summary",
    "q20_qualified_suppliers",
    "q21_sole_flagged_supplier",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority_exists",
    "q5_region_revenue",
    "q7_nation_trade_volume",
    "q8_market_share",
    "q9_product_profit",
    "scalar_business_days",
    "skyline_price_quantity",
    "text_tfidf_top_terms",
    "text_token_stats",
    # ---- driver window ends here (50) ----
    # r15 rotation head: the ten spilled r9 entries
    "q6_revenue_filter",
    "q10_returned_items",
    "q11_important_parts",
    "q12_conditional_agg",
    "q13_order_distribution",
    "q14_promo_ratio",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_filter",
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
