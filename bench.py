"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: median_sec}, "queries_min": {name: min_sec}, "sf": ...}.

Each query is warmed once (whole-stage codegen compiles per query shape),
then timed $SPARK_GRAFT_REPEATS times (default 3) to a noop-sink action that
materializes the full result without collecting it to the driver. "queries"
carries the per-query MEDIAN and "value" the sum of medians; "queries_min"
carries the per-query minimum so a reader can separate noise from plan
regression without re-running. Why medians: the r5→r4 comparison showed a
uniform ~1.33× inflation across 31 unrelated plans — session-level drift
(GC/codegen-cache pressure as one JVM accumulates 64 query shapes), not 31
plan regressions. Single-shot timings conflate that drift with real
slowdowns; consecutive-run medians are steady-state per query and keep
cross-round ratios meaningful.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Observation  # noqa: E402

from flusher_spark.instrumentation import (  # noqa: E402
    Recorder,
    median_seconds,
    noop_write,
    observed,
)
from flusher_spark.plans.catalog import registry  # noqa: E402
from flusher_spark.session import get_session  # noqa: E402

HEADLINE = [
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
    "q15_top_supplier",
    "q16_supplier_variety",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_filter",
    "q20_qualified_suppliers",
    "q21_sole_flagged_supplier",
    "q22_global_avg_anti",
    "join_broadcast_dim",
    "join_salted_skew",
    "agg_distinct",
    "window_topk_per_group",
    "events_tumbling_hourly",
    "events_sessionize_30m",
    "events_rollup_day_hour",
    "asof_purchase_last_view",
    "join_range_binned",
    "dedup_minhash_lsh",
    "similarity_topk_exact",
    "text_quality_score",
    # round 2 additions
    "events_funnel_conversion",
    "agg_exact_median_ranked",
    "agg_exact_median_histogram",
    "decontaminate_ngram_overlap",
    "pack_sequences_fill",
    "vocab_bigram_counts",
    "text_pii_redact",
    "quality_expectations_orders",
    # round 3 additions
    "dedup_keep_best",
    "corpus_source_mix",
    "asof_nearest_view",
    # round 4 additions
    "join_interval_overlap",
    "events_funnel_single_scan",
    "corpus_mix_upsample",
    # round 5 additions — the re-typed oracle family now fully hash-checked
    "corpus_mix_apply",
    "events_zscore_outliers",
    # round 5 new operators (batch entries; the streaming left join runs a
    # full staged stream and is timed by its own tests instead)
    "similarity_topk_pq",
    "docs_boilerplate_ngrams",
    "docs_bigram_familiarity",
    "sample_split_by_source",
    "corpus_importance_resample",
    "join_dynamic_partition_pruning",
    "etl_jsonl_ingest",
    "events_ewma_per_user",
    "scalar_variant_extract",
    "etl_zorder_layout",
    "etl_schema_evolution_merge",
    "agg_hll_rollup_reuse",
    "window_rank_distributions",
    "agg_mode_exact",
    "dedup_containment_ngram",
    "agg_incremental_merge",
    "etl_orc_roundtrip",
    "events_winsorized_stats",
    "agg_corr_exact",
    "events_audience_overlap",
    "etl_table_diff",
    "events_attribution_first_touch",
    "etl_cdc_apply",
    "events_top_paths",
    "agg_bitmap_distinct",
    "events_histogram_equiwidth",
    "join_null_safe",
    "events_anomaly_mad",
    "events_tz_local_days",
    "etl_content_checksum",
    # round 6 additions (similarity_{pq,ivf}_persisted are excluded: their
    # time is dominated by the one-time index WRITE, which the build/query
    # split exists to amortize — the query-half cost is what matters and is
    # covered by the fused twins already in this list)
    "multimodal_jpeg_decode",
    "text_hash_classifier",
    "profile_join_key_skew",
    "etl_snapshot_merge_timetravel",
    "dedup_minhash_builtin",  # pyspark.ml MinHashLSH twin of dedup_minhash_lsh
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
    "docs_chunk_udtf",  # UDTF twin of docs_chunk_overlap — measures the Python-worker cost
    "text_url_components",
    # (graph_pagerank_bipartite is excluded like the BPE learner: the
    # iterative loop with per-iteration scalar collects would dominate the
    # headline total; covered by its numpy-reference test + rows-only check.
    # dedup_semantic_embedding/_clusters are excluded for the same reason:
    # their pair scoring deliberately uses the interpreted fold-left cosine
    # so emitted scores are bit-identical to the exact twin — ~15 s at
    # sf0.1, dominated by that documented choice, not by the bucketed plan
    # under audit; the Arrow matmul in brute_force_topk_arrow is the
    # throughput variant of the same arithmetic.)
    "agg_weighted_avg_exact",
    "corpus_boilerplate_mask",
    "embedding_centroid_int8",
    "multimodal_audio_spectral",
    "multimodal_media_routing",
    # (vocab_bpe_merges and vocab_bpe_encode are excluded: both run the
    # iterative merge-learning loop, ~5-13 s at sf0.1, and would dominate
    # the headline total; they are covered by their reference-equality
    # tests and the driver's rows-only checks.)
    # round 7 additions (graph_connected_components and
    # graph_pagerank_weighted are excluded like the other iterative-loop
    # entries; similarity_ivf_appended is excluded like the persisted-index
    # builds — index-WRITE dominated; etl_snapshot_schema_evolution shares
    # etl_snapshot_cdc_delete's table-format cost shape, so one of the two
    # carries the snapshot-write timing signal)
    "etl_snapshot_cdc_delete",
    "corpus_perplexity_buckets",
    "events_attribution_split_touch",
    "dedup_canonical_url",
    "dedup_sorted_neighborhood",
    "events_session_funnel",
    "events_histogram_equidepth",
    "corpus_gopher_rules",
    "multimodal_png_variants",
    "join_scd2_pointintime",
    "agg_weighted_median_udaf",
    "reco_copurchase_similarity",
    "similarity_matryoshka_truncated",
    "corpus_dup_rate_by_source",
    "events_longest_streak",
    "multimodal_audio_decimate",
    "events_trend_grouped_map",
    "events_cumulative_reach",
    # (events_stream_stream_full_join runs a full staged stream like its
    # inner/left siblings — timed by its own tests, not the headline.
    # etl_snapshot_changes_feed shares etl_snapshot_cdc_delete's
    # table-format write cost shape, which that entry already times.)
    # round 8 additions (events_stream_stream_right_join is stream-executed
    # like its siblings — excluded; dedup_substring_mask shares
    # dedup_substring_spans' gram-pipeline cost shape, spans carries the
    # timing signal)
    "dedup_substring_spans",
    "corpus_e2e_pipeline",
    "etl_snapshot_clustered_scan",
    "text_bm25_topk",
    "events_markov_transitions",
    "events_rfm_segmentation",
    # round 9 additions (corpus_e2e_pipeline_minhash is excluded:
    # corpus_e2e_pipeline already times the six-stage composed plan and
    # dedup_minhash_lsh times the swapped stage — the variant would
    # double-bill both; etl_snapshot_expire_vacuum is table-format-write
    # dominated like the other excluded snapshot maintenance entries,
    # etl_snapshot_cdc_delete carries that timing signal)
    "etl_dynamic_partition_overwrite",
    "dedup_substring_spans_hashed",
    "events_time_weighted_avg",
    "skyline_price_quantity",
    "scalar_business_days",
    "docs_ngram_novelty",
    # (events_stream_dedup_watermarked is stream-executed like the other
    # streaming entries — timed by its own tests, not the headline.)
    "etl_referential_integrity",
    # round 10 additions (events_stream_static_join is stream-executed like
    # the other streaming entries — timed by its own tests, not the
    # headline)
    "events_linreg_per_type",
    "events_interval_coverage",
    "corpus_k_anonymity",
    "corpus_domain_quota",
    "graph_label_propagation",
    "events_cusum_changepoint",
    "events_l_diversity",
    "similarity_mmr_rerank",
    # round 11 additions (dedup_incremental_exact and dedup_minhash_index
    # are excluded like similarity_{pq,ivf}_persisted: their time is
    # dominated by the one-time fingerprint/signature index WRITE that the
    # build/append/probe split exists to amortize; the probe-half cost
    # shapes are already timed — the signature pipeline + banded bucket
    # join by dedup_minhash_lsh, and the exact probe is a sub-second md5
    # anti-join whose scan/groupBy shape dedup_keep_best covers)
    # round 12 additions (dedup_incremental_clusters is excluded like its
    # siblings above: the entry's cached-build half writes THREE index
    # tables plus the bootstrap clustering — index-write-dominated and
    # iterative (label propagation); the probe/labels read shapes it adds
    # are a broadcast-ledger resolve + one groupBy, both already headline-
    # timed shapes. NOTES.md r12 records a probe-only timing instead.
    # dedup_index_delete: same reasoning — its cached build half is the
    # index write PLUS a delete and a full compact rewrite; the probe it
    # returns is byte-for-byte the dedup_incremental_exact probe shape.
    # dedup_stream_incremental is stream-executed like the other streaming
    # entries — its cached build runs a real StreamingQuery; timed by its
    # own tests, not the headline. similarity_ivf_deleted is excluded like
    # similarity_ivf_persisted: build+delete+compact dominated; the query
    # half is the same pruned probe similarity_ivf_persisted's family
    # already shapes.)
    # round 13 additions (both excluded by the precedents above:
    # dedup_stream_neardup is stream-executed — its cached build runs a
    # real StreamingQuery whose per-batch probe/self-join shapes are
    # already headline-timed by dedup_minhash_lsh; corpus_e2e_incremental
    # is index-write-dominated on first call like dedup_incremental_exact,
    # and its read half composes three shapes the headline already times —
    # corpus_gopher_rules' stats filter, the exact probe's anti-join, and
    # corpus_source_mix's broadcast mixture.)
    # round 14 additions (both excluded by the precedents above:
    # dedup_stream_semantic is stream-executed — its cached build runs a
    # real StreamingQuery whose per-batch pruned-list cosine join is the
    # ivf_query_index shape already headline-timed by similarity_ivf_*;
    # corpus_e2e_incremental_neardup is index-write-dominated on first call
    # like corpus_e2e_incremental, and its read half composes shapes the
    # headline already times — the gopher stats filter, dedup_minhash_lsh's
    # band join + agreement verify, and the broadcast mixture.)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # The sf field degrades to the raw suffix string when the dir doesn't
    # follow the sf<N> convention — a late float() crash would discard a
    # completed run and break the one-JSON-line contract.
    raw_sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf: float | str = float(raw_sf)
    except ValueError:
        sf = raw_sf
    spark = get_session("flusher_spark_bench")
    reg = registry()
    names = [n for n in HEADLINE if n in reg]
    # Local-iteration subset (SPARK_GRAFT_ONLY=a,b,c): time just the named
    # queries while tuning one family. Unset in the driver run, where the
    # whole headline set is the contract — a subset run prints sum-of-subset
    # as its value, which is only comparable to another run of the same set.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        want = [s.strip() for s in only.split(",") if s.strip()]
        unknown = [s for s in want if s not in reg]
        if unknown:
            # Fail loudly: a typo'd subset would otherwise time ZERO queries
            # and still print a well-formed {"value": ~0} line — which a
            # before/after tuning comparison reads as a huge speedup.
            raise SystemExit(
                f"SPARK_GRAFT_ONLY names not in the registry: {unknown}"
            )
        names = want
    # Warmup: exercise the scan, shuffle, whole-stage-codegen, and noop-sink
    # machinery once on a tiny slice so one-time JVM/classloader costs don't
    # bill q1. (Different query shape than any headline — no result caching.)
    warm = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    warm.groupBy("n_regionkey").count().write.format("noop").mode("overwrite").save()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    # Structured instrumentation (instrumentation.py): per-query wall time +
    # result row count to stderr, leaving stdout's one-line JSON contract
    # untouched.
    rec = Recorder(logfunc=lambda msg: print(msg, file=sys.stderr))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    timings: dict[str, float] = {}
    minima: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        # One untimed execution first: whole-stage codegen compiles once per
        # query shape (~0.5-2 s on this JVM) and would otherwise dominate the
        # sub-second queries. The timed runs measure steady-state execution —
        # scan + shuffle + compute — which is what scales with data volume.
        # The row-count Observation rides the warmup so the timed plan below
        # stays exactly the plan under measurement (no CollectMetrics node).
        # Per-query fault isolation: one failing query must never kill the
        # whole run — the JSON contract line prints no matter what, with the
        # failure recorded in "errors".
        try:
            obs = Observation()
            noop_write(observed(reg[name].fn(spark, sf_dir), obs))
            runs = []
            for _ in range(repeats):
                t0 = time.time()
                noop_write(reg[name].fn(spark, sf_dir))
                runs.append(time.time() - t0)
            timings[name] = round(median_seconds(runs), 3)
            minima[name] = round(min(runs), 3)
            rec.observe(name, timings[name], rows=int(obs.get["rows"]))
        except Exception as exc:  # noqa: BLE001 — survive any per-query failure
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"bench ERROR {name}: {errors[name]}", file=sys.stderr)
    # A crashed query drops out of `timings`, so a summed total would READ
    # as a round-over-round speedup exactly when a regression made a query
    # die. With any error the headline value is null — totals are only
    # comparable between runs that executed the same query set.
    total = round(sum(timings.values()), 3) if not errors else None
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_min": minima,
        "repeats": repeats,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
        out["completed_total"] = round(sum(timings.values()), 3)
    # Persist the complete per-query JSON in-repo: the driver's BENCH capture
    # keeps only a 2000-char tail of stdout, so without this file the
    # per-query history is lost between rounds. bench_results/latest.json is
    # overwritten every run; round snapshots (bench_results/r<N>.json) are
    # copies committed once per round. Override with SPARK_GRAFT_BENCH_OUT;
    # set it empty to skip writing (e.g. sub-second smoke runs).
    out_path = os.environ.get(
        "SPARK_GRAFT_BENCH_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_results", "latest.json"),
    )
    if out_path:
        if os.path.dirname(out_path):  # bare filename ⇒ cwd, no dir to make
            os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
