"""Streaming incremental dedup: foreachBatch sinks over the persisted
dedup indexes — EXACT (fingerprint index, operators/dedup_index.py),
NEAR-DUP (MinHash band/sig index, same module), and SEMANTIC (IVF vector
index, operators/similarity.py) — one shared retry/self-exclusion
discipline across the whole stream × index-family matrix.

The continuous form of the crawl pattern the batch index serves: documents
arrive as a stream, every micro-batch dedups against EVERYTHING ingested
before it (across all prior batches and stream restarts — the index is the
state, not the state store), survivors land in a per-batch parquet
partition, and the SURVIVORS' fingerprints join the index for the batches
that follow (non-survivors add nothing: duplicates of history are already
blocked by the historical row, batch-internal duplicate groups collapse
into their one survivor). State size is one md5 row per unique FINGERPRINT
ever seen — strictly smaller than per-document, and the same
sliver-of-corpus footprint as the batch index, and unlike
``dropDuplicates``/``streaming_dedup_first_seen`` it survives checkpoint
deletion and is shared with batch probes (``fingerprint_index_probe`` and
the delete/compact lifecycle work on this index unchanged).

EXACTLY-ONCE STORY — foreachBatch is at-least-once, so a crashed micro-batch
re-runs with the same batch_id after its side effects may have partially
landed. Every index row written by the stream carries a ``src_batch`` TAG
("<run_id>#<batch_id>"), and the probe excludes rows tagged with the
CURRENT micro-batch's tag (self-exclusion,
``fingerprint_index_probe(exclude_src_batch=...)``). The run_id half makes
the tag unique across stream RESTARTS: batch ids are only unique per
checkpoint, so a stream restarted with a fresh checkpoint against the same
index re-counts from 0 — a bare batch-id tag would wrongly self-exclude the
PREVIOUS run's batch-0 rows and leak their duplicates. ``run_stream_dedup``
persists the run id inside the checkpoint directory, so a driver restart on
the SAME checkpoint (where Spark re-delivers the same logical batch)
resolves the same tag, while a fresh checkpoint gets a fresh one. The tag
makes each attempt a deterministic function of the index-minus-self:

- retry after the survivor write, before the index append: recomputes the
  identical survivor set (index unchanged from its perspective) and
  overwrites the batch's sink partition with identical bytes;
- retry after the index append: the probe IGNORES the first attempt's own
  fingerprints — still the identical survivor set — and the second append
  merely duplicates rows that are (a) self-excluded for this batch id and
  (b) harmless to later batches (the anti-join tests existence, not count;
  a compact collapses the duplicates physically).

No applied-batch ledger is needed, and no ordering between the survivor
write and the index append matters for correctness; the survivor write goes
first anyway so the sink never trails the index. The sink is partitioned by
(run_id, batch_id), so two runs' outputs never collide either.

At scale: each micro-batch costs one bucket-pruned anti-join against the
fingerprint table (probe cost follows the batch, not the corpus) plus one
bucket-partitioned append. The sink is parquet partitioned by batch_id, so
downstream consumers can incrementally pick up exactly the new partitions.

No counterpart in the reference (danielerapati/flusher): its pipeline is a
Sheets-to-warehouse job runner; streaming corpus dedup is part of the
LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from flusher_spark.io import generations as G
from flusher_spark.operators.dedup_index import (
    _DEFAULT_BUCKETS,
    _band_rows,
    _current_gen,
    _fingerprint_rows,
    _gen_dir,
    _read_meta,
    _signature_rows,
    _write_meta,
    fingerprint_index_probe,
    minhash_index_dedup,
    resolve_min_agree,
)


def stream_fingerprint_index_init(
    spark: SparkSession,
    path: str,
    n_buckets: int = _DEFAULT_BUCKETS,
    seed_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Create a fingerprint index whose rows carry a ``src_batch`` tag
    column — the self-exclusion tag the streaming sink's retry idempotency
    rests on. ``seed_df`` optionally pre-loads an existing corpus (tagged
    "seed" — no run/batch tag ever matches it) so the stream dedups against
    history from its very first micro-batch. Layout-compatible with the
    batch index: probes, deletes, compacts, and appends from
    ``operators/dedup_index`` work on it unchanged (appends backfill the
    tag column with NULL, which no exclusion matches)."""
    # Re-initializing a LIVE index is a rebuild: follow the
    # fingerprint_index_build lifecycle (io/generations.py) — the seed
    # lands in a NEW generation and the pointer flips, so probes/appends
    # resolve the fresh state instead of a dead gen-0 directory, and the
    # overwritten meta (possibly a different n_buckets) can never pair
    # with the old generation's bucketing (r12 review).
    rebuild = os.path.exists(os.path.join(path, "GENERATION")) or os.path.isdir(
        os.path.join(path, "fingerprints")
    )
    new_gen = G.current_gen(path) + 1 if rebuild else 0
    if seed_df is not None:
        rows = (
            _fingerprint_rows(seed_df, text_col, id_col, n_buckets)
            .withColumn("src_batch", F.lit("seed"))
            .select("doc_id", "fingerprint", "src_batch", "fp_bucket")
        )
    else:
        rows = spark.createDataFrame(
            [], "doc_id long, fingerprint string, src_batch string, fp_bucket long"
        )
    # G.write_table, not a bare write: a seed_df with zero fingerprint rows
    # (empty, or all-NULL text) would otherwise emit no data files and
    # brick the first probe with UNABLE_TO_INFER_SCHEMA — the exact hazard
    # the old else-branch guarded for the no-seed case only (r12 review).
    G.write_table(rows, G.gen_dir(path, "fingerprints", new_gen), "fp_bucket")
    _write_meta(spark, path, new_gen, n_buckets=n_buckets)
    if rebuild:
        G.set_gen(path, new_gen)
    for tbl in ("fingerprints", "fp_tombstones", "meta"):
        G.drop_stale_gens(path, tbl, new_gen)
    import shutil

    shutil.rmtree(G.gen_dir(path, "fp_tombstones", new_gen), ignore_errors=True)
    return path


def dedup_stream_sink(
    index_path: str,
    sink_path: str,
    run_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: probe the micro-batch against the index
    (self-excluding this micro-batch's "<run_id>#<batch_id>" tag — see
    module docstring), write survivors to
    ``<sink_path>/run_id=<rid>/batch_id=<bid>/`` (overwrite: retries
    rewrite identical bytes; distinct runs never collide), then append the
    SURVIVORS' tagged fingerprints to the index.

    ``run_id`` must be unique per checkpoint lifetime and stable across
    driver restarts on the same checkpoint — ``run_stream_dedup`` derives
    one; pass your own only with that contract. The sink is readable as
    one partitioned parquet table (``spark.read.parquet(sink_path)`` with
    ``run_id``/``batch_id`` partition columns); survivors have the probe's
    (doc_id, fingerprint, n_copies) shape."""
    meta_cache: dict[str, int] = {}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"{run_id}#{int(batch_id)}"
        part = os.path.join(
            sink_path, f"run_id={run_id}", f"batch_id={int(batch_id)}"
        )
        fingerprint_index_probe(
            spark,
            index_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            exclude_src_batch=tag,
        ).write.mode("overwrite").parquet(part)
        # Index only the SURVIVORS' fingerprints, derived from the sink
        # partition just written (one read instead of recomputing the md5
        # pipeline, and the index can never diverge from what the sink
        # published). Non-survivors add nothing: a dup of history is
        # already blocked by the historical row, and a batch-internal dup
        # group collapsed into its one survivor row. NULL fingerprints
        # (NULL-text docs) stay out of the index — the build-side policy.
        if "n_buckets" not in meta_cache:  # immutable after init: read once
            meta_cache["n_buckets"] = _read_meta(spark, index_path)["n_buckets"]
        n_buckets = meta_cache["n_buckets"]
        (
            spark.read.parquet(part)
            .where(F.col("fingerprint").isNotNull())
            .select(
                "doc_id",
                "fingerprint",
                F.lit(tag).alias("src_batch"),
                F.pmod(F.xxhash64("fingerprint"), F.lit(n_buckets)).alias("fp_bucket"),
            )
            .write.mode("append")
            .partitionBy("fp_bucket")
            .parquet(_gen_dir(index_path, "fingerprints", _current_gen(index_path)))
        )

    return _sink


def stream_minhash_index_init(
    spark: SparkSession,
    path: str,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    n_buckets: int = _DEFAULT_BUCKETS,
    seed_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Create a MinHash near-dup index whose ``sigs`` AND ``bands`` rows
    carry a ``src_batch`` tag column — the self-exclusion tag the streaming
    NEAR-dup sink's retry idempotency rests on (the exact twin is
    ``stream_fingerprint_index_init``). ``seed_df`` optionally pre-loads an
    existing corpus (tagged "seed"). Layout-compatible with the batch
    index: ``minhash_index_probe/append/delete/compact`` and the cluster
    layer work on it unchanged (batch appends backfill the tag with NULL,
    which no exclusion matches)."""
    if bands <= 0 or num_perm <= 0 or num_perm % bands != 0:
        raise ValueError(
            f"num_perm ({num_perm}) must be a positive multiple of bands ({bands})"
        )
    rebuild = os.path.exists(os.path.join(path, "GENERATION")) or os.path.isdir(
        os.path.join(path, "sigs")
    )
    new_gen = G.current_gen(path) + 1 if rebuild else 0
    if seed_df is not None:
        sig = (
            _signature_rows(seed_df, text_col, id_col, num_perm, shingle_n, seed)
            .withColumn("src_batch", F.lit("seed"))
            .select("doc_id", "sig", "src_batch")
        )
    else:
        sig = spark.createDataFrame([], "doc_id long, sig array<long>, src_batch string")
    # Write sigs first, then derive bands FROM THE WRITTEN TABLE so the
    # shingle+aggregate pipeline runs once (the minhash_index_build
    # discipline). G.write_table keeps zero-row seeds readable.
    G.write_table(sig, G.gen_dir(path, "sigs", new_gen), None)
    stored = spark.read.parquet(G.gen_dir(path, "sigs", new_gen))
    band_rows = (
        _band_rows(stored, num_perm, bands, n_buckets)
        .join(stored.select("doc_id", "src_batch"), "doc_id")
        .select("doc_id", "band", "bsig", "src_batch", "lsh_bucket")
    )
    G.write_table(band_rows, G.gen_dir(path, "bands", new_gen), "lsh_bucket")
    _write_meta(
        spark,
        path,
        new_gen,
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        seed=seed,
        n_buckets=n_buckets,
    )
    if rebuild:
        G.set_gen(path, new_gen)
    for tbl in ("sigs", "bands", "mh_tombstones", "meta"):
        G.drop_stale_gens(path, tbl, new_gen)
    import shutil

    shutil.rmtree(G.gen_dir(path, "mh_tombstones", new_gen), ignore_errors=True)
    # The WHOLE cluster layer dies with a rebuild — base AND meta AND the
    # merge ledger (the minhash_index_build discipline): a surviving
    # clusters/meta would make resolve_min_agree silently serve the OLD
    # corpus's frozen cut to the sink and the batch dedup helper.
    shutil.rmtree(os.path.join(path, "clusters"), ignore_errors=True)
    return path


def neardup_stream_sink(
    index_path: str,
    sink_path: str,
    run_id: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> Callable[[DataFrame, int], None]:
    """The NEAR-dup foreachBatch function — the MinHash twin of
    ``dedup_stream_sink``: probe the micro-batch's signatures against the
    STORED band/sig tables (self-excluding this micro-batch's tag), drop
    batch docs that near-match history or a smaller-id batch member, write
    survivors to ``<sink_path>/run_id=<rid>/batch_id=<bid>/``, then append
    the SURVIVORS' band rows and signatures to the index (bands before
    sigs — the torn-append order whose tear the probe detects, see
    minhash_index_append).

    Survivor rule (deterministic, batch-bounded): a doc is dropped iff it
    (a) clears the agreement threshold against ANY historical doc, or
    (b) clears it against a SMALLER-id member of its own batch — the
    greedy keep-min convention of ``semantic_dedup_keep``. Docs too short
    to produce a signature (NULL/blank text) can never near-match and pass
    through. Appending survivors only is the transitive-closure trade: a
    later doc similar to a DROPPED near-dup but not to its surviving
    representative is missed — the standard crawl-dedup semantics, and the
    same trade the batch cluster layer makes explicit.

    Retry idempotency is the exact sink's discipline (module docstring):
    the probe self-excludes "<run_id>#<batch_id>"-tagged rows, so a
    retried at-least-once micro-batch recomputes identical survivors even
    after its own append landed; duplicated append rows are self-excluded
    for this batch, harmless to later batches (candidate dedup +
    max-agreement), and physically collapsed by minhash_index_compact.

    Agreement threshold: when the index has a bootstrapped cluster layer,
    its clusters/meta already froze the integer cut
    (minhash_cluster_bootstrap) — the sink reads THAT and ``threshold`` is
    ignored, so a sink-vs-cluster divergence is impossible by construction
    (the index, not each consumer, owns the near-dup relation). The float
    ceiling recompute applies only to cluster-less indexes
    (operators/dedup_index.py::resolve_min_agree).

    At scale: one bucket-pruned band join per micro-batch (probe cost
    follows the batch), one batch-sized self-join for internal pairs, and
    two append-only writes sized by the batch's survivors."""
    meta_cache: dict[str, int] = {}

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"{run_id}#{int(batch_id)}"
        part = os.path.join(sink_path, f"run_id={run_id}", f"batch_id={int(batch_id)}")
        if not meta_cache:  # immutable after init: read once
            meta_cache.update(_read_meta(spark, index_path))
            meta_cache["__min_agree"] = resolve_min_agree(
                spark, index_path, threshold, meta_cache["num_perm"]
            )
        m = meta_cache
        sig_new = _signature_rows(
            batch_df, text_col, id_col, m["num_perm"], m["shingle_n"], m["seed"]
        ).localCheckpoint(eager=False)  # survivor rule + survivor append
        # Survivor rule: THE one implementation
        # (operators/dedup_index.py::minhash_index_dedup — bucket-pruned
        # history probe + keep-min internal collapse, cutting at the
        # resolved integer agreement), with this micro-batch's tag
        # self-excluded and the checkpointed sig_new passed so the shingle
        # pipeline runs exactly once.
        (
            minhash_index_dedup(
                spark,
                index_path,
                batch_df,
                text_col,
                id_col,
                threshold,
                max_bucket,
                exclude_src_batch=tag,
                sig_new=sig_new,
                _meta=m,
                _min_agree=m["__min_agree"],
            )
            .select(F.col(id_col).alias("doc_id"))
            .write.mode("overwrite")
            .parquet(part)
        )
        # Index only the SURVIVORS' rows, keyed off the sink partition just
        # written (the sink and the index can never diverge). Bands FIRST,
        # sigs second — the torn-append order (minhash_index_append).
        surv_sig = sig_new.join(
            spark.read.parquet(part).select("doc_id"), "doc_id"
        ).withColumn("src_batch", F.lit(tag))
        gen = _current_gen(index_path)
        (
            _band_rows(surv_sig, m["num_perm"], m["bands"], m["n_buckets"])
            .withColumn("src_batch", F.lit(tag))  # one tag per whole batch
            .select("doc_id", "band", "bsig", "src_batch", "lsh_bucket")
            .write.mode("append")
            .partitionBy("lsh_bucket")
            .parquet(_gen_dir(index_path, "bands", gen))
        )
        surv_sig.select("doc_id", "sig", "src_batch").write.mode("append").parquet(
            _gen_dir(index_path, "sigs", gen)
        )

    return _sink


def stream_ivf_index_init(
    spark: SparkSession,
    path: str,
    n_lists: int = 16,
    n_iter: int = 1,
    seed_df: DataFrame | None = None,
    train_df: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Create an IVF vector index whose rows carry a ``src_batch`` tag
    column — the self-exclusion tag the streaming SEMANTIC dedup sink's
    retry idempotency rests on (the exact twin is
    ``stream_fingerprint_index_init``, the MinHash twin
    ``stream_minhash_index_init``). Unlike the hash-based indexes an IVF
    index cannot start empty: centroids must be TRAINED before anything is
    assigned (the FAISS train-before-add contract), so at least one of
    ``seed_df`` (historical corpus — trains the centroids AND pre-loads the
    index, tagged "seed") or ``train_df`` (trains only; the index starts
    empty) is required. Layout-compatible with the batch index:
    ``ivf_query_index/append/delete/compact`` work on it unchanged (batch
    appends backfill the tag with NULL, which no exclusion matches)."""
    from flusher_spark.operators.similarity import (
        _ivf_assign,
        _nearest_lists,
        vec_norm_sq,
    )

    train = train_df if train_df is not None else seed_df
    if train is None:
        raise ValueError(
            "IVF centroids must be trained before streaming appends (the"
            " train-before-add contract): pass seed_df (history, also"
            " indexed) and/or train_df (training only)"
        )
    cents, _assigned_train = _ivf_assign(train, id_col, vec_col, n_lists, n_iter)
    rebuild, new_gen = G.next_build_gen(path, "vectors")
    if seed_df is not None:
        # NULL embeddings stay out of the seed — the sink's own append
        # filter (they can never attract a match; r14 review).
        base = seed_df.where(F.col(vec_col).isNotNull()).select(
            F.col(id_col), F.col(vec_col), vec_norm_sq(F.col(vec_col)).alias("__nsq")
        )
        rows = _nearest_lists(base, cents, 1, "__list", id_col, vec_col).select(
            id_col, vec_col, "__nsq", F.lit("seed").alias("src_batch"), "__list"
        )
    else:
        rows = train.select(
            F.col(id_col),
            F.col(vec_col),
            F.lit(None).cast("double").alias("__nsq"),
            F.lit(None).cast("string").alias("src_batch"),
            F.lit(None).cast("long").alias("__list"),
        ).limit(0)
    # G.write_table keeps a zero-row index readable (train-only init, or an
    # all-NULL-embedding seed) — the stream_fingerprint_index_init hazard.
    G.write_table(rows, G.gen_dir(path, "vectors", new_gen), "__list")
    cents.select("__cid", "__cvec").coalesce(1).write.mode("overwrite").parquet(
        G.gen_dir(path, "centroids", new_gen)
    )
    G.publish_build(path, new_gen, rebuild, ("vectors", "centroids"), "tombstones")
    return path


def semantic_stream_sink(
    index_path: str,
    sink_path: str,
    run_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 2,
) -> Callable[[DataFrame, int], None]:
    """The SEMANTIC (embedding-space) foreachBatch function — the IVF twin
    of ``dedup_stream_sink``/``neardup_stream_sink``, completing the
    stream × index-family matrix: assign the micro-batch's vectors to their
    ``n_probe`` nearest centroid lists, compare them EXACTLY (fold-left
    cosine, the semantic_neardup_pairs arithmetic) against the STORED
    vectors of those lists only (parquet partition pruning — probe cost
    follows the batch, never the corpus), drop batch vectors that clear
    the cosine threshold against history or against a SMALLER-id batch
    member sharing an assigned list (keep-min, the semantic_dedup_keep
    convention), write survivors to
    ``<sink_path>/run_id=<rid>/batch_id=<bid>/``, then append the
    SURVIVORS' vectors (single nearest list, the ivf_append_index
    assignment) tagged with this micro-batch's "<run_id>#<batch_id>".

    Multi-probe (``n_probe``) is the recall lever for Voronoi-boundary
    pairs, exactly as in semantic_neardup_pairs' n_assign; like every
    IVF/LSH family member, recall < 1 by construction (a cross-list pair
    sharing none of the probed lists is missed) — rows-only checks, exact
    twin neardup_cosine_exact. Vectors with NULL embeddings can never
    clear the threshold (NULL cosine) and pass through — the unsigned-doc
    policy of the text sinks.

    Retry idempotency is the shared sink discipline (module docstring):
    the probe excludes rows tagged with the CURRENT micro-batch's tag, so
    a retried at-least-once micro-batch recomputes identical survivors
    even after its own append landed; duplicated append rows are
    self-excluded for this batch, harmless to later batches (the dropped
    set is a distinct of ids), and physically collapsed by
    ivf_compact_index. Deleted vectors stop attracting matches
    immediately (tombstones subtract from the pruned lists — the
    ivf_query_index interop).

    At scale: one bounded centroid read + one pruned-partition join per
    micro-batch, one batch-sized per-list self-join, one survivor write,
    one partitioned append — all sized by the batch."""
    from flusher_spark.operators.similarity import (
        _nearest_lists,
        ivf_index_dedup,
        vec_norm_sq,
    )

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        tag = f"{run_id}#{int(batch_id)}"
        part = os.path.join(sink_path, f"run_id={run_id}", f"batch_id={int(batch_id)}")
        # Centroids re-resolved per batch (not cached): a compact/rebuild
        # between micro-batches flips the generation, and centroids —
        # unlike the hash indexes' meta — CAN legitimately change on a
        # rebuild.
        gen = G.current_gen(index_path)
        cents = spark.read.parquet(G.gen_dir(index_path, "centroids", gen)).select(
            "__cid", "__cvec", vec_norm_sq(F.col("__cvec")).alias("__cnsq")
        )
        base = batch_df.select(
            F.col(id_col), F.col(vec_col), vec_norm_sq(F.col(vec_col)).alias("__nsq")
        )
        # ONE assignment job per micro-batch (the sig_new discipline of the
        # MinHash sink): rank kept so the history probe (all n_probe
        # lists), the internal self-join (all lists), AND the survivor
        # append (rank 1 = single nearest list, the ivf_append_index
        # assignment) all derive from this checkpointed frame.
        assigned = _nearest_lists(
            base, cents, n_probe, "__list", id_col, vec_col, rank_col="__crank"
        ).localCheckpoint(eager=False)
        # Survivor rule: the ONE batch implementation
        # (operators/similarity.py::ivf_index_dedup — pruned-list probe with
        # tombstone subtraction + tag self-exclusion, keep-min internal
        # collapse), so the sink and the batch dedup API can never drift —
        # the neardup_stream_sink/minhash_index_dedup delegation applied to
        # the vector family.
        (
            ivf_index_dedup(
                spark,
                index_path,
                batch_df,
                threshold,
                n_probe,
                id_col,
                vec_col,
                exclude_src_batch=tag,
                _assigned=assigned,
                # The gen this assignment's centroids came from: the probe
                # must read the SAME generation's vectors (list numberings
                # are per-generation; a compact flipping the pointer
                # mid-batch would otherwise prune the wrong partitions).
                _gen=gen,
            )
            .write.mode("overwrite")
            .parquet(part)
        )
        # Index only the SURVIVORS' vectors, keyed off the sink partition
        # just written (sink and index can never diverge); rank-1 rows of
        # the shared assignment = the single nearest list, exactly the
        # ivf_append_index placement. NULL embeddings stay out of the index
        # (they can never attract a match) — the unsigned-doc policy of
        # the text sinks.
        (
            assigned.where(F.col("__crank") == 1)
            .where(F.col(vec_col).isNotNull())
            .join(spark.read.parquet(part).select(id_col), id_col)
            .select(
                id_col, vec_col, "__nsq", F.lit(tag).alias("src_batch"), "__list"
            )
            .write.mode("append")
            .partitionBy("__list")
            .parquet(G.gen_dir(index_path, "vectors", gen))
        )

    return _sink


def run_stream_semantic(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_probe: int = 2,
    run_id: str | None = None,
):
    """Wire an embedding stream through the SEMANTIC dedup sink
    (availableNow trigger — the batch-ingest form; drop the trigger for a
    continuous deployment). The index at ``index_path`` must be
    ``stream_ivf_index_init``-initialized (trained centroids + src_batch
    tag). Same run-id contract as ``run_stream_dedup``. Returns the
    started StreamingQuery."""
    run_id = _resolve_run_id(checkpoint_dir, run_id)
    return (
        stream_df.writeStream.foreachBatch(
            semantic_stream_sink(
                index_path, sink_path, run_id, id_col, vec_col, threshold, n_probe
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _checkpoint_run_id(checkpoint_dir: str) -> str:
    """A run id that is STABLE across driver restarts on the same
    checkpoint (Spark re-delivers the same logical batch ids there — the
    retry tag must match) and FRESH for a new checkpoint (batch ids restart
    from 0 there — the tag must not). The checkpoint directory IS the run
    identity, so the id lives in a marker file inside it; written with the
    atomic tmp+rename discipline (single streaming writer assumed, as
    everywhere in this module)."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    marker = os.path.join(checkpoint_dir, "flusher_run_id")
    try:
        with open(marker) as fh:
            return fh.read().strip()
    except FileNotFoundError:
        pass
    rid = uuid.uuid4().hex[:16]
    with open(marker + ".tmp", "w") as fh:
        fh.write(rid)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(marker + ".tmp", marker)
    # fsync the directory: the marker must be durable BEFORE Spark's first
    # checkpoint commit — a power loss persisting the commit but losing
    # the marker dirent would mint a fresh run id on restart, the
    # re-delivered batch's self-exclusion would match nothing, and its
    # sink partition would be overwritten with an empty survivor set (r12
    # review; the io/generations.set_gen discipline).
    dfd = os.open(checkpoint_dir, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return rid


def run_stream_dedup(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    run_id: str | None = None,
):
    """Wire a document stream through the dedup sink with an availableNow
    trigger (drain everything queued, then stop — the batch-ingest form;
    drop the trigger for a continuous deployment). Returns the started
    StreamingQuery; callers await ``q.awaitTermination()``.

    ``run_id``: required when ``checkpoint_dir`` is a REMOTE URI
    (s3://, hdfs://, ...): the marker file that derives a stable run id
    lives inside the checkpoint directory via local-filesystem I/O, so on
    a remote checkpoint it would silently land on the driver's local disk
    and vanish with the driver — breaking the tag-stability contract
    (r12 review). Supply an id that is stable across driver restarts on
    the same checkpoint and fresh for a new one (e.g. derive it from the
    checkpoint URI itself plus a deploy stamp)."""
    run_id = _resolve_run_id(checkpoint_dir, run_id)
    return (
        stream_df.writeStream.foreachBatch(
            dedup_stream_sink(index_path, sink_path, run_id, text_col, id_col)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _resolve_run_id(checkpoint_dir: str, run_id: str | None) -> str:
    """Shared run-id contract of both streaming sinks (see
    ``run_stream_dedup``'s docstring for the remote-checkpoint rule)."""
    if run_id is not None:
        return run_id
    scheme = checkpoint_dir.split("://", 1)[0] if "://" in checkpoint_dir else ""
    if scheme and scheme != "file":
        raise ValueError(
            f"checkpoint_dir {checkpoint_dir!r} is a remote URI: the"
            " local run-id marker cannot live there — pass run_id="
            " explicitly (stable per checkpoint lifetime)"
        )
    return _checkpoint_run_id(checkpoint_dir.removeprefix("file://"))


def run_stream_neardup(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    run_id: str | None = None,
):
    """Wire a document stream through the NEAR-dup sink (availableNow
    trigger — the batch-ingest form; drop the trigger for a continuous
    deployment). The index at ``index_path`` must be
    ``stream_minhash_index_init``-initialized (rows carry the src_batch
    tag). Same run-id contract as ``run_stream_dedup``. Returns the
    started StreamingQuery."""
    run_id = _resolve_run_id(checkpoint_dir, run_id)
    return (
        stream_df.writeStream.foreachBatch(
            neardup_stream_sink(
                index_path, sink_path, run_id, text_col, id_col, threshold, max_bucket
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
