"""Plan audit: dump the formatted physical plan of every bench headline
query (plus the round's notable additions) with automated plan-property
annotations, into PLANS.md.

This is the "is it the plan you'd want at 100 TB" evidence, machine-checked
rather than hand-claimed: for each query it counts shuffles (Exchange),
notes broadcast joins, whole-stage-codegen coverage, pushed parquet filters,
and flags anything that would be a scale hazard (CartesianProduct,
BroadcastNestedLoopJoin outside the documented whitelist — the same rules
tests/test_plans.py enforces).

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flusher_spark.plans.catalog import registry
from flusher_spark.session import get_session

#: Headline plans plus this round's notable additions. Streaming-executed
#: entries are excluded: their catalog fns run a query to completion rather
#: than return a lazy plan, so the interesting plan is the per-micro-batch
#: one (asserted in tests/test_streaming.py).
EXTRA = [
    "events_funnel_conversion",
    "agg_exact_median_ranked",
    "decontaminate_ngram_overlap",
    "pack_sequences_fill",
    "vocab_bigram_counts",
    "text_pii_redact",
    "quality_expectations_orders",
    "sample_stratified_split",
    "join_bucketed_colocated",
    "topk_orders_global",
    "events_retention_cohorts",
    "events_resample_gapfill",
    "events_scd2_intervals",
    "events_zscore_outliers",
    "docs_chunk_overlap",
    "docs_repetition_signals",
    "embedding_quantize_int8",
    # round 4 additions (join_interval_overlap / events_funnel_single_scan /
    # corpus_mix_upsample are headline and picked up automatically)
    "corpus_mix_apply",
    # round 5: the batch additions are all bench headline (picked up
    # automatically); only the non-headline argmax twin is listed here.
    # The streaming left join is excluded per the SKIP rule.
    "top_suppliers_revenue",
    # round-5 late additions not in the bench headline but plan-worthy:
    "dedup_ngram_jaccard",
    "embedding_centroid_int8",
    "etl_backfill_partition_overwrite",
    # round 6: jpeg/semantic/classifier/skew are bench headline (picked up
    # automatically); the persisted ANN entries and the clusters variant are
    # not (index-write dominated / iterative) but their plans are the 100 TB
    # evidence for partition pruning and bucketed pair generation.
    "similarity_pq_persisted",
    "similarity_ivf_persisted",
    # round 7: cdc_delete/perplexity_buckets/split_touch/canonical_url are
    # bench headline (picked up automatically); schema evolution is the
    # non-headline snapshot twin. The iterative-loop entries
    # (graph_connected_components, graph_pagerank_weighted,
    # similarity_ivf_appended) execute multi-round jobs inside their
    # catalog fn, so "the plan" is per-round — audited structurally in
    # tests instead.
    "etl_snapshot_schema_evolution",
    # (q15_top_supplier is headline — picked up automatically; its old
    # unpartitioned-window global max is gone: the plan now shows the 1-row
    # agg(max) broadcast-joined back, and the only SinglePartition exchange
    # carries one partial-max row per task, the same benign shape as any
    # scalar aggregate.)
    # round 11/12: the incremental-dedup index entries are bench-excluded
    # (index-write dominated) but their PROBE plans are exactly the 100 TB
    # evidence this file exists for — the bucket-pruned anti-join, the
    # banded bucket join verified from stored signatures, and the cluster
    # labels' broadcast-ledger resolve. The fn's eager build half runs
    # before the returned plan is explained; the audited plan is the
    # read-side probe/labels query.
    "dedup_incremental_exact",
    "dedup_minhash_index",
    "dedup_incremental_clusters",
    # round 12: the delete+compact lifecycle entry — the audited plan is the
    # probe against the COMPACTED generation (tombstones already applied, so
    # the plan is the same bucket-pruned anti-join shape; the tombstone-
    # subtraction variant is plan-asserted in tests/test_dedup_index.py).
    "dedup_index_delete",
    # round 12 late: the ANN twin of the lifecycle — the audited plan is
    # the partition-pruned IVF probe against the compacted generation.
    "similarity_ivf_deleted",
    # round 13: the composed incremental pipeline — bench-excluded (its
    # first call is index-write dominated) but the READ half is the 100 TB
    # evidence: quality filter + bucket-pruned probe + broadcast mixture as
    # one lazy plan. The streaming entries (dedup_stream_incremental,
    # dedup_stream_neardup) are stream-executed; their per-micro-batch
    # probe plans are reconstructed below (STREAM_INNER).
    "corpus_e2e_incremental",
    # round 14: the near-dup composed incremental pipeline — bench-excluded
    # like its exact twin, but the READ half (quality filter + banded
    # stored-bands probe + keep-min self-join + broadcast mixture as one
    # lazy plan) is the 100 TB evidence. dedup_stream_semantic is
    # stream-executed; its per-micro-batch probe plan is reconstructed
    # below (STREAM_INNER).
    "corpus_e2e_incremental_neardup",
    # round 14 late: the SEMANTIC composed incremental pipeline — the READ
    # half's 100 TB evidence is the quality filter + the doc→embedding
    # equi-join + the partition-pruned IVF probe (broadcast batch side,
    # stored lists never shuffle) + the keep-min per-list self-join +
    # broadcast mixture, one lazy plan.
    "corpus_e2e_incremental_semantic",
    # round 14 late: the production funnel chaining all three persisted
    # index stages — the audited READ half is quality filter → md5
    # anti-join → banded probe → embedding join + pruned-list probe →
    # broadcast mixture, ONE lazy plan over monotonically shrinking
    # survivor sets.
    "corpus_e2e_incremental_full",
]
SKIP_PREFIXES = ("events_tumbling", "events_sliding", "events_sessionize",
                 "events_rollup", "events_stateful", "events_stream_")


def _audit_scratch(prefix: str) -> str:
    """A tempdir reclaimed at process exit — the audit builders used to
    leak one orphaned directory per run (r13 review)."""
    import atexit
    import shutil
    import tempfile

    root = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, root, ignore_errors=True)
    return root


def _stream_dedup_inner(spark, sf_dir):
    """The per-micro-batch plan of [dedup_stream_incremental]: the entry's
    catalog fn EXECUTES a StreamingQuery (no lazy plan to explain), so the
    audited plan is what every micro-batch runs — the bucket-pruned
    fingerprint probe with src_batch self-exclusion against a
    stream-initialized index over half the corpus."""
    from pyspark.sql import functions as F

    from flusher_spark.io.tables import load_table
    from flusher_spark.operators.dedup_index import fingerprint_index_probe
    from flusher_spark.streaming.dedup_stream import stream_fingerprint_index_init

    docs = load_table(spark, sf_dir, "documents")
    k = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    idx = os.path.join(_audit_scratch("flusher_planaudit_fp_"), "idx")
    stream_fingerprint_index_init(
        spark, idx, seed_df=docs.where(F.col("doc_id") <= k)
    )
    return fingerprint_index_probe(
        spark, idx, docs.where(F.col("doc_id") > k), exclude_src_batch="audit#0"
    )


def _stream_neardup_inner(spark, sf_dir):
    """The per-micro-batch HISTORY-probe plan of [dedup_stream_neardup]:
    the banded bucket join against stored bands (tag-excluded,
    bucket-pruned) verified from stored signatures — the dominant half of
    the sink; the batch-internal self-join shares the same capped-bucket
    shape and is plan-asserted in tests."""
    from pyspark.sql import functions as F

    from flusher_spark.io.tables import load_table
    from flusher_spark.operators.dedup_index import minhash_index_probe
    from flusher_spark.streaming.dedup_stream import stream_minhash_index_init

    docs = load_table(spark, sf_dir, "documents")
    k = docs.agg(F.max("doc_id")).collect()[0][0] // 2
    idx = os.path.join(_audit_scratch("flusher_planaudit_mh_"), "idx")
    stream_minhash_index_init(
        spark, idx, seed_df=docs.where(F.col("doc_id") <= k)
    )
    return minhash_index_probe(
        spark, idx, docs.where(F.col("doc_id") > k), exclude_src_batch="audit#0"
    )


def _stream_semantic_inner(spark, sf_dir):
    """The per-micro-batch HISTORY-probe plan of [dedup_stream_semantic]:
    the pruned-list cosine join against stored vectors (tag-excluded,
    partition-pruned via the bounded probe-list collect) — the dominant
    half of the sink, and the exact implementation it calls
    (operators/similarity.py::ivf_index_neardup_pairs); the batch-internal
    self-join shares the per-list equi-join shape and is pinned in
    tests/test_dedup_stream.py."""
    from pyspark.sql import functions as F

    from flusher_spark.io.tables import load_table
    from flusher_spark.operators.similarity import ivf_index_neardup_pairs
    from flusher_spark.streaming.dedup_stream import stream_ivf_index_init

    emb = load_table(spark, sf_dir, "embeddings")
    k = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    idx = os.path.join(_audit_scratch("flusher_planaudit_ivf_"), "idx")
    stream_ivf_index_init(
        spark, idx, n_lists=8, n_iter=1, seed_df=emb.where(F.col("vec_id") <= k)
    )
    return ivf_index_neardup_pairs(
        spark,
        idx,
        emb.where(F.col("vec_id") > k),
        threshold=0.4,
        n_probe=2,
        exclude_src_batch="audit#0",
    )


#: Stream-EXECUTED catalog entries whose fn runs a StreamingQuery and
#: returns a bare sink scan — the plan worth auditing is the inner
#: per-micro-batch query, reconstructed here (r12 verdict item 5).
STREAM_INNER = {
    "dedup_stream_incremental (per-micro-batch probe)": _stream_dedup_inner,
    "dedup_stream_neardup (per-micro-batch history probe)": _stream_neardup_inner,
    "dedup_stream_semantic (per-micro-batch history probe)": _stream_semantic_inner,
}
#: Batch entries that share a streaming-skip prefix but return LAZY plans —
#: audit them normally (the prefixes exist for stream-EXECUTED entries only).
SKIP_EXCEPTIONS = {
    "events_sessionize_30m",
    "events_sessionize_dynamic_gap",
    "events_sliding_distinct_bitmap",
    "events_tumbling_hourly",
    "events_rollup_day_hour",
}


def annotate(plan: str) -> list[str]:
    notes = []
    n_ex = len(re.findall(r"\(\d+\) Exchange\b", plan))
    n_single = len(re.findall(r"Arguments: SinglePartition", plan))
    if n_ex:
        notes.append(f"shuffles: {n_ex}" + (f" ({n_single} single-partition)" if n_single else ""))
    else:
        notes.append("shuffles: none")
    for op, label in [
        ("BroadcastHashJoin", "broadcast hash join"),
        ("SortMergeJoin", "sort-merge join"),
        ("ShuffledHashJoin", "shuffled hash join"),
        ("TakeOrderedAndProject", "top-k as TakeOrderedAndProject (no global sort)"),
        ("ObjectHashAggregate", "object hash aggregate"),
    ]:
        # Count detail headers only — the formatted explain lists every node
        # TWICE (tree + details section), so a raw substring count doubles.
        n = len(re.findall(rf"\(\d+\) {op}\b", plan))
        if n:
            notes.append(f"{label} ×{n}")
    n_pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    if n_pushed:
        # Per-scan: a full dimension scan with empty PushedFilters must not
        # hide that the fact scan's pushdown IS active.
        notes.append(f"parquet filter pushdown active ({n_pushed} scan{'s' if n_pushed > 1 else ''})")
    ids = set(re.findall(r"codegen id : (\d+)", plan))
    if ids:
        notes.append(f"whole-stage codegen spans: {len(ids)}")
    for hazard in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        if hazard in plan:
            notes.append(f"⚠ {hazard} (see tests/test_plans.py whitelist rationale)")
    return notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    import bench

    spark = get_session("plan_audit", cpus=8)
    reg = registry()
    names = [n for n in bench.HEADLINE if n in reg]
    names += [n for n in EXTRA if n in reg and n not in names]
    skipped = sorted(
        n for n in names
        if n.startswith(SKIP_PREFIXES) and n not in SKIP_EXCEPTIONS
    )
    lines = [
        "# Physical-plan audit",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}` — the formatted plan of",
        "every bench headline query and this round's notable additions, with",
        "machine-extracted plan properties. Streaming-executed entries are audited",
        "per-micro-batch in tests/test_streaming.py instead; the bench headlines",
        f"excluded here on that rule: {', '.join(skipped) or '(none)'}.",
        "",
    ]
    audited = 0
    for name in names:
        if name.startswith(SKIP_PREFIXES) and name not in SKIP_EXCEPTIONS:
            continue
        df = reg[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        props = "; ".join(annotate(plan))
        # The operator tree is the readable half; drop the verbose per-node
        # detail section to keep the artifact reviewable.
        tree = plan.split("\n\n")[0]
        lines += [f"## {name}", "", f"*{props}*", "", "```", tree.rstrip(), "```", ""]
        audited += 1
    for title, build in STREAM_INNER.items():
        df = build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
        props = "; ".join(annotate(plan))
        tree = plan.split("\n\n")[0]
        lines += [
            f"## {title}",
            "",
            f"*{props}*",
            "",
            (build.__doc__ or "").strip().replace("\n    ", "\n"),
            "",
            "```",
            tree.rstrip(),
            "```",
            "",
        ]
        audited += 1
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}: {audited} plans")


if __name__ == "__main__":
    main()
