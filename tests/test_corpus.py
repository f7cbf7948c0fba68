"""Semantic invariants for the training-corpus entries (plans/corpus.py).

The oracle harness already proves cross-engine value equality; these tests
pin the properties the oracle comparison can't see — redaction completeness,
packing bounds, shuffle reproducibility, decontamination set discipline.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from flusher_spark.plans import corpus as C
from tests.conftest import SF_DIR


def test_pii_redact_removes_every_match(spark):
    out = C.text_pii_redact(spark, SF_DIR)
    rows = out.collect()
    assert rows, "empty redaction output"
    email = re.compile(C.EMAIL_RE)
    phone = re.compile(C.PHONE_RE)
    for r in rows:
        # The synthesized artifact guarantees at least one of each per doc.
        assert r.n_emails >= 1 and r.n_phones >= 1
        assert not email.search(r.redacted)
        assert not phone.search(r.redacted)
        assert "<EMAIL>" in r.redacted and "<PHONE>" in r.redacted


def test_html_strip_leaves_no_tags_and_single_spaces(spark):
    out = C.text_html_strip(spark, SF_DIR)
    rows = out.collect()
    tag = re.compile(C.TAG_RE)
    for r in rows:
        assert r.n_tags >= 3  # <p ...>, </p>, <br/>
        assert not tag.search(r.clean_text)
        assert "  " not in r.clean_text
        assert r.clean_text == r.clean_text.strip()


def test_pack_fill_bounds_and_conservation(spark):
    packs = C.pack_sequences_fill(spark, SF_DIR).collect()
    docs = C.load_table(spark, SF_DIR, "documents").select(
        (F.col("doc_id") % C.PACK_BUCKETS).alias("bucket"),
        C.n_tokens(F.col("text")).alias("n_tok"),
    )
    totals = {r.bucket: (r.n, r.tok) for r in
              docs.groupBy("bucket").agg(F.count("*").alias("n"),
                                         F.sum("n_tok").alias("tok")).collect()}
    max_doc = docs.agg(F.max("n_tok")).first()[0]
    by_bucket: dict[int, list] = {}
    for p in packs:
        by_bucket.setdefault(p.bucket, []).append(p)
        # Contiguous fill overshoots by at most the straddling document.
        assert p.pack_tokens <= C.PACK_BUDGET + max_doc
    # Guard the loop's domain: an empty output or a silently dropped bucket
    # would skip every conservation assertion below without failing.
    assert packs and set(by_bucket) == set(totals)
    for bucket, ps in by_bucket.items():
        n_docs, n_tok = totals[bucket]
        assert sum(p.n_docs for p in ps) == n_docs  # every doc packed once
        assert sum(p.pack_tokens for p in ps) == n_tok
        ids = sorted(p.pack_id for p in ps)
        assert ids == list(range(len(ids)))  # dense pack ids per bucket
        # Contiguous-fill law: each pack's first document starts inside the
        # pack's own [pB, (p+1)B) span of the cumulative token stream.
        cum = 0
        for p in sorted(ps, key=lambda p: p.pack_id):
            assert C.PACK_BUDGET * p.pack_id <= cum < C.PACK_BUDGET * (p.pack_id + 1)
            cum += p.pack_tokens


def test_shuffle_order_is_reproducible_and_sorted(spark):
    a = [tuple(r) for r in C.shuffle_deterministic_order(spark, SF_DIR).collect()]
    b = [tuple(r) for r in C.shuffle_deterministic_order(spark, SF_DIR).collect()]
    assert a == b
    keys = [k for _, k in a]
    assert keys == sorted(keys)
    assert len(a) == 100


def test_decontaminate_excludes_eval_docs_and_bounds_ratio(spark):
    rows = C.decontaminate_ngram_overlap(spark, SF_DIR).collect()
    assert rows, "fixture vocabulary should produce trigram overlap"
    for r in rows:
        assert r.doc_id % C.DECON_EVAL_MOD != 0  # train side only
        assert 0 < r.n_overlap <= r.n_shingles
        assert 0.0 < r.overlap_ratio <= 1.0


def test_bigram_counts_match_python_recount(spark):
    top = C.vocab_bigram_counts(spark, SF_DIR).collect()
    assert len(top) == 20
    texts = [r.text for r in
             C.load_table(spark, SF_DIR, "documents").select("text").collect()]
    counts: dict[str, int] = {}
    for t in texts:
        toks = t.strip().lower().split()
        for a, b in zip(toks, toks[1:]):
            counts[f"{a} {b}"] = counts.get(f"{a} {b}", 0) + 1
    best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.bigram, r.n) for r in top] == best


def test_mix_upsample_invariants(spark):
    """Every source repeats r >= 1 times: emitted rows and tokens never drop
    below the originals, every doc appears (n_docs == original count), and
    the per-source amplification sits inside [floor(r), ceil(r)]."""
    from flusher_spark.plans.llm import corpus_mix_upsample, corpus_source_mix
    from flusher_spark.operators.text import n_tokens

    up = {r["source"]: r for r in corpus_mix_upsample(spark, SF_DIR).collect()}
    d = C.load_table(spark, SF_DIR, "documents")
    orig = {
        r["source"]: r
        for r in d.select("source", n_tokens(F.col("text")).alias("nt"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("nt").alias("tokens"))
        .collect()
    }
    shares = {r["source"]: r for r in corpus_source_mix(spark, SF_DIR).collect()}
    assert set(up) == set(orig)
    for src, row in up.items():
        o = orig[src]
        assert row["n_docs"] == o["n_docs"], src  # every doc survives
        assert row["tokens_emitted"] >= o["tokens"], src
        # r from the share table: target/share floored/ceiled bounds the blow-up
        r = max(1.0, (1.0 / len(shares)) / shares[src]["token_share"])
        import math

        assert math.floor(r) * o["n_docs"] <= row["n_rows"] <= math.ceil(r) * o["n_docs"], src


# -- flagship pipeline: MinHash swap-at-scale invariant ------------------------


def test_minhash_near_dup_drops_subset_of_exact(spark):
    """The swap-at-scale contract behind corpus_e2e_pipeline_minhash:
    MinHash-LSH candidates are a subset of all true pairs (banding only
    MISSES) and each candidate is verified with the exact Jaccard at the
    same threshold, so the docs IT drops must be a subset of the docs the
    exact-Jaccard stage drops — i.e. its survivor set is a superset."""
    from flusher_spark.operators.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    docs = C.load_table(spark, SF_DIR, "documents")
    exact_drops = {
        r["doc_b"]
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.5, max_bucket=1000)
        .select("doc_b").distinct().collect()
    }
    mh_drops = {
        r["doc_b"]
        for r in minhash_lsh_pairs(docs, shingle_n=3, threshold=0.5, max_bucket=1000)
        .select("doc_b").distinct().collect()
    }
    assert exact_drops, "fixture must contain near-dup pairs for this to bite"
    assert mh_drops <= exact_drops


def test_minhash_pipeline_shares_schema_and_runs(spark):
    """corpus_e2e_pipeline_minhash is a drop-in: identical output schema to
    the exact pipeline and a non-empty packing result on the fixture."""
    a = C.corpus_e2e_pipeline(spark, SF_DIR)
    b = C.corpus_e2e_pipeline_minhash(spark, SF_DIR)
    assert a.schema == b.schema
    rows = b.collect()
    assert rows and all(r["pack_tokens"] > 0 for r in rows)


def test_domain_quota_skew_precombine_equals_direct(spark):
    """The mega-domain scale path (local per-partition top-Q prune, then a
    global rank over bounded candidates) must emit the SAME report as the
    direct window form — on the fixture AND on a synthetic frame with ties
    and a dominant source."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    direct = sorted(tuple(r) for r in C.domain_quota_report(docs, q=10).collect())
    skew = sorted(
        tuple(r) for r in C.domain_quota_report(docs, q=10, skew_precombine=True).collect()
    )
    assert direct == skew and direct

    # Synthetic frame with ties, a dominant source, AND NULL sources (the
    # NULL group must survive both forms — the skew path's join is
    # null-safe for exactly this).
    rows = [
        (i, None if i % 97 == 0 else ("mega" if i % 10 != 0 else f"s{i % 40}"), (i * 7919) % 500)
        for i in range(4000)
    ]
    synth = spark.createDataFrame(rows, "doc_id long, source string, n_chars long").repartition(16)
    d2 = sorted((tuple(r) for r in C.domain_quota_report(synth, q=5).collect()),
                key=lambda t: (t[0] is not None, t))
    s2 = sorted((tuple(r) for r in C.domain_quota_report(synth, q=5, skew_precombine=True).collect()),
                key=lambda t: (t[0] is not None, t))
    assert d2 == s2 and d2
    assert any(t[0] is None for t in d2), "NULL-source group missing from the report"


def test_domain_quota_precombine_splits_mega_domain(spark):
    """The balance claim, asserted structurally (the join_salted_skew
    discipline): with one source owning ~90% of rows, the direct window's
    sort stage concentrates the mega-domain in ONE task, while the
    pre-combine's local-prune stage spreads it across the ingest partitions
    (shuffle key carries spark_partition_id)."""
    from pyspark.sql import Window

    from flusher_spark.operators.ranking import topk_per_group_skew

    rows = [(i, "mega" if i % 10 != 0 else f"s{i % 40}", (i * 7919) % 500) for i in range(4000)]
    synth = spark.createDataFrame(rows, "doc_id long, source string, n_chars long").repartition(16)

    def max_share(df):
        # Counted at the RDD layer, not groupBy(spark_partition_id()):
        # Catalyst pushes the pid projection BELOW a Window (it depends on
        # no window column), which would measure the input partitioning
        # instead of the window's sort stage.
        counts = df.rdd.mapPartitions(lambda it: iter([sum(1 for _ in it)])).collect()
        return max(counts) / sum(counts)

    # Phase-1 local prune, exactly as topk_per_group_skew builds it: the
    # window shuffle keys on (source, __pid), so the mega source spreads
    # over its 16 ingest partitions instead of serializing on one task.
    local = Window.partitionBy("source", "__pid").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    # Measured BEFORE the rank filter: the per-task row distribution of the
    # window's sort stage is the thing the pre-combine exists to balance.
    phase1 = synth.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__lrk", F.row_number().over(local)
    )
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    direct_ranked = synth.select("source", F.row_number().over(w).alias("rk"))
    prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        # Direct window: the mega source (90% of rows) lands on one task.
        assert max_share(direct_ranked) >= 0.8
        # Local prune: no task sorts more than a few ingest partitions'
        # share of the mega source.
        assert max_share(phase1) <= 0.35
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    # And the op itself shuffles on (source, __pid) first — the structural
    # half of the claim, pinned on the executed plan like the salted join.
    cand = topk_per_group_skew(
        synth, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], k=5
    )
    plan = cand._jdf.queryExecution().executedPlan().toString()
    assert any(
        seg.lstrip().startswith("hashpartitioning") and "__pid" in seg and "source" in seg
        for seg in plan.split("Exchange")[1:]
    ), plan
    # Output contract sanity: the mega source keeps exactly k rows.
    assert cand.where(F.col("source") == "mega").count() == 5


def test_incremental_pipeline_never_rescans_history(spark, tmp_path):
    """r13: [corpus_e2e_incremental]'s contract — batch-2 survivors respect
    batch-1 history through the PERSISTED fingerprint index alone. Proven
    physically: history and batch live in separate parquet directories, the
    executed plan's input files must include the index and must NOT include
    the history directory."""
    import os

    from flusher_spark.operators import dedup_index as DI
    from flusher_spark.plans.llm import _incremental_pipeline

    filler = " ".join(f"tok{i}" for i in range(60))  # clears the 50-word rule
    hist_rows = [(i, "src_a", f"{filler} history doc {i}") for i in range(1, 6)]
    batch_rows = (
        # 11 duplicates history doc 1 verbatim: must be dropped by the probe
        [(11, "src_a", f"{filler} history doc 1")]
        # 12/13 are a batch-internal dup pair: min id 12 survives
        + [(12, "src_b", f"{filler} fresh doc x"), (13, "src_b", f"{filler} fresh doc x")]
        + [(14, "src_b", f"{filler} fresh doc y")]
    )
    schema = "doc_id long, source string, text string"
    hist_dir = str(tmp_path / "hist")
    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(hist_rows, schema).write.parquet(hist_dir)
    spark.createDataFrame(batch_rows, schema).write.parquet(batch_dir)
    idx = str(tmp_path / "fpidx")
    DI.fingerprint_index_build(spark.read.parquet(hist_dir), idx)
    out = _incremental_pipeline(spark, idx, spark.read.parquet(batch_dir))
    files = out.inputFiles()
    assert any(f"fpidx{os.sep}fingerprints" in f for f in files), files
    assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files
    got = {(r["source"], r["n_docs"]) for r in out.collect()}
    # 11 blocked by history, 13 collapsed into 12; with one source left the
    # uniform-target mixture keeps everything (share == target)
    assert got == {("src_b", 2)}


def test_incremental_neardup_pipeline_never_rescans_history(spark, tmp_path):
    """r14: [corpus_e2e_incremental_neardup]'s contract — batch-2 survivors
    respect batch-1 history through the PERSISTED MinHash index alone
    (candidates from the stored bands, verification from the stored sigs).
    Proven physically: history and batch live in separate parquet
    directories; the executed plan's input files must include the index and
    must NOT include the history directory. Each doc family gets a DISJOINT
    60-token vocabulary so only intended (verbatim) near-dups can clear the
    0.5 Jaccard gate."""
    import os

    from flusher_spark.operators import dedup_index as DI
    from flusher_spark.plans.llm import _incremental_pipeline

    def filler(fam: str) -> str:
        return " ".join(f"{fam}tok{i}" for i in range(60))  # clears 50-word rule

    hist_rows = [(i, "src_a", f"{filler(f'h{i}')} history doc {i}") for i in range(1, 6)]
    batch_rows = (
        # 11 duplicates history doc 1 verbatim: must be dropped by the probe
        [(11, "src_a", f"{filler('h1')} history doc 1")]
        # 12/13 are a batch-internal verbatim pair: min id 12 survives
        + [
            (12, "src_b", f"{filler('b')} fresh doc x"),
            (13, "src_b", f"{filler('b')} fresh doc x"),
        ]
        + [(14, "src_b", f"{filler('c')} fresh doc y")]
    )
    schema = "doc_id long, source string, text string"
    hist_dir = str(tmp_path / "hist")
    batch_dir = str(tmp_path / "batch")
    spark.createDataFrame(hist_rows, schema).write.parquet(hist_dir)
    spark.createDataFrame(batch_rows, schema).write.parquet(batch_dir)
    idx = str(tmp_path / "mhidx")
    DI.minhash_index_build(spark.read.parquet(hist_dir), idx)
    out = _incremental_pipeline(
        spark,
        idx,
        spark.read.parquet(batch_dir),
        survivors=lambda s1: DI.minhash_index_dedup(spark, idx, s1, threshold=0.5),
    )
    files = out.inputFiles()
    assert any(f"mhidx{os.sep}bands" in f for f in files), files
    assert any(f"mhidx{os.sep}sigs" in f for f in files), files
    assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files
    got = {(r["source"], r["n_docs"]) for r in out.collect()}
    # 11 blocked by history (verbatim ⇒ signature agreement 1.0 ≥ 0.5),
    # 13 collapsed into 12 (keep-min); with one source left the
    # uniform-target mixture keeps everything (share == target)
    assert got == {("src_b", 2)}


def test_incremental_semantic_pipeline_never_rescans_history(spark, tmp_path):
    """r14: [corpus_e2e_incremental_semantic]'s contract — batch-2
    survivors respect batch-1 history through the PERSISTED IVF index
    alone (exact pruned-list cosine against the STORED vectors). Proven
    physically: history text, history embeddings, batch text, and batch
    embeddings live in four separate parquet directories; the executed
    plan's input files must include the index's partitioned vector table
    and must NOT include either history directory. Orthogonal unit
    embeddings per doc family with n_probe = n_lists make every
    expectation exact, not statistical."""
    import os

    from flusher_spark.operators import similarity as S
    from flusher_spark.plans.llm import _incremental_pipeline

    filler = " ".join(f"tok{i}" for i in range(60))  # clears the 50-word rule

    def v(i):
        return [1.0 if j == i else 0.0 for j in range(8)]

    hist_rows = [(i, "src_a", f"{filler} history doc {i}") for i in range(1, 6)]
    hist_vecs = [(i, v(i - 1)) for i in range(1, 6)]
    batch_rows = (
        # 11's EMBEDDING duplicates history doc 1's: dropped by the probe
        [(11, "src_a", f"{filler} fresh doc w")]
        # 12/13 share an embedding: keep-min collapses 13 into 12
        + [(12, "src_b", f"{filler} fresh doc x"), (13, "src_b", f"{filler} fresh doc y")]
        + [(14, "src_b", f"{filler} fresh doc z")]
    )
    batch_vecs = [(11, v(0)), (12, v(5)), (13, v(5)), (14, v(6))]
    dschema = "doc_id long, source string, text string"
    vschema = "vec_id long, embedding array<float>"
    hist_dir = str(tmp_path / "hist")
    hist_emb_dir = str(tmp_path / "histemb")
    batch_dir = str(tmp_path / "batch")
    batch_emb_dir = str(tmp_path / "bemb")
    spark.createDataFrame(hist_rows, dschema).write.parquet(hist_dir)
    spark.createDataFrame(hist_vecs, vschema).write.parquet(hist_emb_dir)
    spark.createDataFrame(batch_rows, dschema).write.parquet(batch_dir)
    spark.createDataFrame(batch_vecs, vschema).write.parquet(batch_emb_dir)
    idx = str(tmp_path / "ivfidx")
    S.ivf_build_index(spark.read.parquet(hist_emb_dir), idx, n_lists=2, n_iter=1)
    bemb = spark.read.parquet(batch_emb_dir)

    def survivors(s1):
        vec = s1.select(F.col("doc_id").alias("vec_id")).join(bemb, "vec_id", "left")
        return S.ivf_index_dedup(spark, idx, vec, threshold=0.95, n_probe=2).select(
            F.col("vec_id").alias("doc_id")
        )

    out = _incremental_pipeline(
        spark, idx, spark.read.parquet(batch_dir), survivors=survivors
    )
    files = out.inputFiles()
    assert any(f"ivfidx{os.sep}vectors" in f for f in files), files
    assert any(f"{os.sep}bemb{os.sep}" in f for f in files), files
    assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files
    assert not any(f"{os.sep}histemb{os.sep}" in f for f in files), files
    got = {(r["source"], r["n_docs"]) for r in out.collect()}
    # 11 blocked by history (identical vector ⇒ cosine 1.0 ≥ 0.95), 13
    # collapsed into 12 (keep-min); with one source left the uniform-target
    # mixture keeps everything (share == target)
    assert got == {("src_b", 2)}


def test_incremental_full_pipeline_stage_isolation(spark, tmp_path):
    """r14: [corpus_e2e_incremental_full]'s contract — the three-stage
    funnel drops each doc at exactly the intended stage, and history is
    reachable ONLY through the three persisted indexes. Doc 11 is a
    verbatim EXACT dup of history (fresh embedding — only the fingerprint
    stage can catch it); doc 12 is a one-token-changed NEAR dup of history
    (distinct md5, fresh embedding — only the MinHash stage can catch it);
    doc 13 has fresh text but duplicates a history EMBEDDING (only the
    semantic stage can catch it); doc 14 is fresh everywhere and must
    survive. Input-file assertion over six physically separate
    directories: all three index tables read, neither history directory
    ever touched."""
    import os

    from flusher_spark.operators import dedup_index as DI
    from flusher_spark.operators import similarity as S
    from flusher_spark.plans.llm import _incremental_pipeline

    def filler(fam: str) -> str:
        return " ".join(f"{fam}tok{i}" for i in range(60))  # clears 50-word rule

    def v(i):
        return [1.0 if j == i else 0.0 for j in range(10)]

    hist_rows = [(i, "src_a", f"{filler(f'h{i}')} history doc {i}") for i in range(1, 6)]
    hist_vecs = [(i, v(i - 1)) for i in range(1, 6)]
    near_dup_of_h2 = f"{filler('h2')} history doc 2".replace("h2tok30", "h2tok30x")
    batch_rows = [
        (11, "src_a", f"{filler('h1')} history doc 1"),  # exact dup → fp stage
        (12, "src_b", near_dup_of_h2),  # near dup, distinct md5 → MinHash stage
        (13, "src_b", f"{filler('c')} fresh doc x"),  # embedding dup → semantic stage
        (14, "src_b", f"{filler('d')} fresh doc y"),  # survives everything
    ]
    batch_vecs = [(11, v(6)), (12, v(7)), (13, v(2)), (14, v(8))]
    dschema = "doc_id long, source string, text string"
    vschema = "vec_id long, embedding array<float>"
    dirs = {n: str(tmp_path / n) for n in ("hist", "histemb", "batch", "bemb")}
    spark.createDataFrame(hist_rows, dschema).write.parquet(dirs["hist"])
    spark.createDataFrame(hist_vecs, vschema).write.parquet(dirs["histemb"])
    spark.createDataFrame(batch_rows, dschema).write.parquet(dirs["batch"])
    spark.createDataFrame(batch_vecs, vschema).write.parquet(dirs["bemb"])
    fp, mh, ivf = (str(tmp_path / n) for n in ("fpidx", "mhidx", "ivfidx"))
    hist = spark.read.parquet(dirs["hist"])
    DI.fingerprint_index_build(hist, fp)
    DI.minhash_index_build(hist, mh)
    S.ivf_build_index(spark.read.parquet(dirs["histemb"]), ivf, n_lists=2, n_iter=1)
    bemb = spark.read.parquet(dirs["bemb"])

    def survivors(s1):
        ids1 = DI.fingerprint_index_probe(spark, fp, s1).select("doc_id")
        s2 = s1.join(ids1, "doc_id")
        ids2 = DI.minhash_index_dedup(spark, mh, s2, threshold=0.5)
        vec = (
            s2.join(ids2, "doc_id")
            .select(F.col("doc_id").alias("vec_id"))
            .join(bemb, "vec_id", "left")
        )
        return S.ivf_index_dedup(spark, ivf, vec, threshold=0.95, n_probe=2).select(
            F.col("vec_id").alias("doc_id")
        )

    out = _incremental_pipeline(
        spark, fp, spark.read.parquet(dirs["batch"]), survivors=survivors
    )
    files = out.inputFiles()
    assert any(f"fpidx{os.sep}fingerprints" in f for f in files), files
    assert any(f"mhidx{os.sep}bands" in f for f in files), files
    assert any(f"mhidx{os.sep}sigs" in f for f in files), files
    assert any(f"ivfidx{os.sep}vectors" in f for f in files), files
    assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files
    assert not any(f"{os.sep}histemb{os.sep}" in f for f in files), files
    got = {(r["source"], r["n_docs"]) for r in out.collect()}
    # 11/12/13 each blocked by their stage; with one source left the
    # uniform-target mixture keeps the lone survivor (share == target)
    assert got == {("src_b", 1)}


def test_chunk_udtf_matches_twin_on_null_documents(spark, tmp_path):
    """r14: the UDTF chunker used to die with a Python TypeError on a
    NULL-text (or NULL n_chars) document, while the codegen'd twin and the
    shared oracle emit the NULL-chunk row. Both entries must produce
    identical rows over a corpus containing the NULL shapes."""
    import os

    from flusher_spark.plans.catalog import registry

    rows = [
        (1, "x" * 300, 300),   # two chunks
        (2, None, 0),          # NULL text, zero n_chars
        (3, None, None),       # NULL text AND NULL n_chars
        (4, "short doc", 9),   # single chunk
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, n_chars int")
    docs.write.parquet(os.path.join(str(tmp_path), "documents.parquet"))
    reg = registry()
    twin = reg["docs_chunk_overlap"].fn(spark, str(tmp_path)).collect()
    udtf = reg["docs_chunk_udtf"].fn(spark, str(tmp_path)).collect()
    as_set = lambda rs: {tuple(r) for r in rs}  # noqa: E731
    assert as_set(udtf) == as_set(twin)
    assert (2, 1, None, None) in as_set(udtf)  # the NULL-chunk row exists
    assert (3, 1, None, None) in as_set(udtf)  # Spark greatest skips NULL


def test_single_pass_shingle_entries_match_two_pass_reference(spark):
    """r14 optimization guard: the shingle-family entries that now
    materialize their two-consumer gram frame once (localCheckpoint) must
    emit EXACTLY the rows of the pre-optimization two-pass formulations —
    rebuilt verbatim here, shingling the corpus per consumer with no
    checkpoint. Bit-equality, not tolerance: every value either side of
    the final division is an exact integer in both shapes."""
    from flusher_spark.operators.dedup import shingle_rows
    from flusher_spark.plans import llm as L

    d = C.load_table(spark, SF_DIR, "documents")
    rows = lambda df: [tuple(r) for r in df.collect()]  # noqa: E731

    # --- detect + mask reference: two independent shingle passes.
    g_ref = shingle_rows(d, n=C.BOILER_N).distinct()
    b_ref = (
        g_ref.groupBy("s")
        .agg(F.count("*").alias("nd"))
        .orderBy(F.col("nd").desc(), "s")
        .limit(C.BOILER_K)
        .select("s")
    )
    bhit = b_ref.select("s", F.lit(1).alias("__hit"))
    detect_ref = (
        g_ref.join(F.broadcast(bhit), "s", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shingles"), F.count("__hit").alias("n_boiler"))
        .where(F.col("n_boiler") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_boiler",
            (F.col("n_boiler").cast("double") / F.col("n_shingles").cast("double")).alias(
                "boiler_ratio"
            ),
        )
        .orderBy(F.col("boiler_ratio").desc(), "doc_id")
        .limit(100)
    )
    assert rows(C.docs_boilerplate_ngrams(spark, SF_DIR)) == rows(detect_ref)

    t = d.select("doc_id", "source", C.tokens(F.col("text")).alias("toks"))
    occ_ref = (
        shingle_rows(d, n=C.BOILER_N, positions=True)
        .join(F.broadcast(b_ref), "s")
        .select("doc_id", (F.col("pos") + 1).alias("j"))
    )
    cov_ref = (
        occ_ref.select(
            "doc_id",
            F.explode(
                F.expr(f"transform(sequence(0, {C.BOILER_N - 1}), v -> j + v)")
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_masked"))
    )
    mask_ref = (
        t.join(cov_ref, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.size("toks")).alias("tokens_total"),
            F.sum(F.coalesce("n_masked", F.lit(0))).alias("tokens_masked"),
        )
        .orderBy("source")
    )
    assert rows(C.corpus_boilerplate_mask(spark, SF_DIR)) == rows(mask_ref)

    # --- familiarity reference: bigram pass per consumer.
    bg_ref = shingle_rows(d, n=2).withColumnRenamed("s", "b")
    c_ref = bg_ref.groupBy("b").agg(F.count("*").cast("long").alias("cnt"))
    fam_ref = (
        bg_ref.join(c_ref, "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("cnt").cast("long").alias("familiarity_sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "familiarity_sum",
            (
                F.col("familiarity_sum").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("familiarity"),
        )
        .orderBy("doc_id")
    )
    assert rows(C.docs_bigram_familiarity(spark, SF_DIR)) == rows(fam_ref)

    # --- novelty reference: distinct-gram pass per consumer.
    g3_ref = shingle_rows(d, n=3).dropDuplicates(["doc_id", "s"])
    first_ref = g3_ref.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    nov_ref = (
        g3_ref.join(first_ref, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).cast("long").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_grams").cast("double")).alias(
                "novelty"
            ),
        )
        .orderBy("doc_id")
    )
    assert rows(L.docs_ngram_novelty(spark, SF_DIR)) == rows(nov_ref)


def test_gopher_stats_match_hof_reference(spark):
    """r15: the codegen'd string formulations of the Gopher statistics
    (concat length for the word-length fold, one ``[^ ]*[a-z]`` regex count
    for the alpha-word filter) are bit-equal to the interpreted-HOF forms
    _gopher_stats ships — the A/B measured the string forms SLOWER
    (corpus_e2e_pipeline 1.14×, see _gopher_stats' docstring), so the HOFs
    stayed, and this equality proof is what makes the two formulations
    exchangeable if a future engine version shifts the balance.
    Adversarial token shapes: NULL text (stats must stay NULL, not become
    0), empty text (tokens() yields ['']), letterless/digit tokens,
    letters-at-edges, multi-letter tokens (one match each, never two), and
    the real fixture corpus column-for-column."""
    texts = [
        None,
        "",
        "   ",
        "123 456 ...",
        "a 1a a1 1a1 aa a1a1a",
        "the quick brown fox 99 ## x",
        "#### ... #1# z9z9z9",
        "one-token",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", C.tokens(F.col("text")).alias("toks"))
    nw, sumlen, nalpha = C._gopher_stats()
    notnull = F.col("toks").isNotNull()
    ref_sumlen = F.when(notnull, F.length(F.concat_ws("", F.col("toks"))).cast("long"))
    ref_nalpha = F.when(
        notnull,
        F.regexp_count(F.concat_ws(" ", F.col("toks")), F.lit(r"[^ ]*[a-z]")).cast("long"),
    )
    rows = d.select(
        "doc_id", nw.alias("nw"), sumlen.alias("sl"), nalpha.alias("na"),
        ref_sumlen.alias("rsl"), ref_nalpha.alias("rna"),
    ).collect()
    for r in rows:
        assert r["sl"] == r["rsl"], (r["doc_id"], r["sl"], r["rsl"])
        assert r["na"] == r["rna"], (r["doc_id"], r["na"], r["rna"])
    # and over the real fixture corpus, column-for-column
    docs = C.load_table(spark, SF_DIR, "documents").select(
        "doc_id", C.tokens(F.col("text")).alias("toks")
    )
    diff = docs.select(
        sumlen.alias("sl"), nalpha.alias("na"),
        ref_sumlen.alias("rsl"), ref_nalpha.alias("rna"),
    ).where(
        ~F.col("sl").eqNullSafe(F.col("rsl")) | ~F.col("na").eqNullSafe(F.col("rna"))
    )
    assert diff.count() == 0
