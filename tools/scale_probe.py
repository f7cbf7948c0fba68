"""Scaling probe: measure representative queries across the three fixture
scale factors (sf0.001 / sf0.01 / sf0.1 — 100× end to end) and fit the
log-log slope of steady-state runtime vs input scale.

This is the EMPIRICAL half of the 100 TB argument (PLANS.md is the
structural half): a query whose physical plan is scan + partial-agg +
bounded shuffle should time-scale with an exponent ≤ ~1 (linear in data;
sub-linear while fixed overheads dominate); an exponent meaningfully above
1 is the smoking gun for quadratic pair fan-out, unbounded windows, or
driver-side loops hiding somewhere the plan audit didn't look. Slopes are
computed between the two LARGEST scale factors (sf0.01 → sf0.1), where
per-query fixed costs (planning, Python worker spin-up, codegen) are the
smallest share of runtime; sub-second absolute numbers still carry those
overheads, which is why exponents well under 1 are common and only
exponents ABOVE ~1.2 are flagged.

Usage: python tools/scale_probe.py [out_md]
Writes SCALING.md with one row per probed query.
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flusher_spark.plans.catalog import registry
from flusher_spark.session import get_session

#: One representative per operator family; favors entries with real data
#: volume sensitivity (scans/joins/aggs/windows/dedup/similarity/text).
PROBES = [
    ("q1_pricing_summary", "scan + partial agg (TPC-H 1)"),
    ("q3_shipping_priority", "3-way join + agg + top-k"),
    ("q9_product_profit", "multi-fact snowflake join"),
    ("join_range_binned", "binned range join"),
    ("asof_purchase_last_view", "as-of join (union + window)"),
    ("agg_distinct", "distinct aggregation"),
    ("agg_bitmap_distinct", "exact bitmap distinct"),
    ("window_topk_per_group", "partitioned window top-k"),
    ("events_sessionize_30m", "gap sessionization"),
    ("events_funnel_single_scan", "single-scan funnel fold"),
    ("dedup_minhash_lsh", "MinHash LSH banding"),
    ("dedup_containment_ngram", "inverted-index containment"),
    ("similarity_topk_arrow", "Arrow-BLAS brute-force top-k"),
    ("text_quality_score", "codegen'd text scoring"),
    ("corpus_perplexity_buckets", "bigram familiarity + ntile"),
    ("dedup_canonical_url", "URL canonicalize + keep-best"),
    ("events_histogram_equidepth", "value-histogram quantile binning"),
    ("reco_copurchase_similarity", "basket pair explode + score"),
    # round 9
    ("dedup_substring_spans_hashed", "hashed-gram substring dedup"),
    ("skyline_price_quantity", "bin-pruned 2D skyline"),
    ("docs_ngram_novelty", "inverted-index novelty score"),
    ("events_time_weighted_avg", "LEAD window + exact weighted agg"),
    ("etl_referential_integrity", "FK orphan audit (3 key joins)"),
    ("events_audience_overlap", "per-user pair explode overlap"),
    # round 10
    ("events_linreg_per_type", "per-group OLS sufficient statistics"),
    ("events_interval_coverage", "interval-union gaps-and-islands"),
    ("corpus_domain_quota", "windowed per-domain quota cap"),
    ("corpus_k_anonymity", "QI window count + suppression"),
    # round 10, second wave
    ("graph_label_propagation", "3-round sync LPA, join+agg per round"),
    ("events_cusum_changepoint", "3-window exact CUSUM argmax"),
    ("events_l_diversity", "two-level distinct-diversity audit"),
    ("similarity_mmr_rerank", "top-50 pools + applyInPandas greedy"),
    # round 11 (both include the one-time index BUILD via _scratch_index on
    # the first sf visit; the timed repeats measure the probe half)
    ("dedup_incremental_exact", "bucket-pruned anti-join vs stored md5 index"),
    ("dedup_minhash_index", "banded probe + signature-agreement verify"),
    # round 12 (build+bootstrap+append run once per sf via _scratch_index;
    # the timed repeats measure the labels read: base scan + broadcast
    # ledger resolve + groupBy)
    ("dedup_incremental_clusters", "persisted cluster labels + merge ledger"),
    # round 12, second wave (build+delete+compact / the full streaming run
    # happen once per sf via _scratch_index; the timed repeats measure the
    # compacted-index probe and the partitioned-sink read respectively)
    ("dedup_index_delete", "probe vs compacted index (post delete)"),
    ("dedup_stream_incremental", "batch_id-partitioned survivor sink read"),
    # round 13 (the full streaming near-dup run / the index build happen
    # once per sf via _scratch_index; the timed repeats measure the
    # partitioned-sink read and the composed quality+probe+mixture read
    # plan respectively)
    ("dedup_stream_neardup", "near-dup survivor sink read"),
    ("corpus_e2e_incremental", "quality + index probe + mixture, one plan"),
    # round 14 (the full streaming semantic run / the MinHash index build
    # happen once per sf via _scratch_index; the timed repeats measure the
    # partitioned-sink read and the composed quality+banded-probe+mixture
    # read plan respectively)
    ("dedup_stream_semantic", "semantic survivor sink read"),
    ("corpus_e2e_incremental_neardup", "quality + banded probe + mixture"),
    # round 14 late (the IVF index build happens once per sf via
    # _scratch_index; the timed repeats measure the composed
    # quality + embedding-join + pruned-list probe + mixture read plan)
    ("corpus_e2e_incremental_semantic", "quality + IVF probe + mixture"),
    # round 14 late (all three index builds happen once per sf via
    # _scratch_index; the timed repeats measure the composed three-stage
    # funnel read plan)
    ("corpus_e2e_incremental_full", "exact→MinHash→semantic funnel"),
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def time_query(spark, fn, sf_dir: str, repeats: int = 3) -> float:
    from flusher_spark.instrumentation import median_seconds, noop_write

    noop_write(fn(spark, sf_dir))  # warm/codegen
    runs = []
    for _ in range(repeats):
        t0 = time.time()
        noop_write(fn(spark, sf_dir))
        runs.append(time.time() - t0)
    return median_seconds(runs)


def main() -> None:
    out_md = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    spark = get_session("scale_probe")
    reg = registry()
    rows = []
    for name, family in PROBES:
        if name not in reg:
            continue
        try:
            times = [time_query(spark, reg[name].fn, sf) for sf in SFS]
        except Exception as exc:  # noqa: BLE001 — one probe must not kill the run
            print(f"probe ERROR {name}: {exc}", file=sys.stderr)
            continue
        # slope between the two largest SFs: log10(t2/t1) / log10(10)
        slope = math.log10(max(times[2], 1e-4) / max(times[1], 1e-4))
        rows.append((name, family, times, slope))
        print(f"{name}: {['%.2f' % t for t in times]} slope10x={slope:.2f}")
    lines = [
        "# Scaling probe (time vs scale factor)",
        "",
        "Generated by `python tools/scale_probe.py` — steady-state medians",
        "(3 repeats after a warm run, noop sink) at sf0.001/0.01/0.1 on the",
        "local[32] harness, plus the log-log slope over the final 10x",
        "(sf0.01 -> sf0.1). Slope ~1.0 = linear in data; well under 1 =",
        "fixed overheads still dominate; above ~1.2 would flag quadratic",
        "fan-out or an unbounded window (none expected — the plan audit in",
        "PLANS.md is the structural version of this check).",
        "",
        "| query | family | sf0.001 s | sf0.01 s | sf0.1 s | slope (last 10x) |",
        "|---|---|---|---|---|---|",
    ]
    for name, family, times, slope in rows:
        flag = " ⚠" if slope > 1.2 else ""
        lines.append(
            f"| {name} | {family} | {times[0]:.2f} | {times[1]:.2f} "
            f"| {times[2]:.2f} | {slope:.2f}{flag} |"
        )
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}: {len(rows)} probes")


if __name__ == "__main__":
    main()
