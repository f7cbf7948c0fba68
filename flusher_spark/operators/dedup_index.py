"""Incremental dedup against a PERSISTED fingerprint index.

The missing 100 TB dedup mode next to the batch operators in
``operators/dedup.py``: a crawl ingests batches continuously, and each batch
must dedup against the WHOLE historical corpus without rescanning (or
re-shingling) history. The pattern is build-once / append / query-many — the
same discipline as the persisted ANN indexes (``similarity.ivf_build_index``
/ ``ivf_append_index`` / ``ivf_query_index``):

- ``fingerprint_index_build``   persist one md5-of-normalized-text row per
                                document, parquet-PARTITIONED BY a stable
                                hash bucket of the fingerprint
- ``fingerprint_index_append``  add a new batch's fingerprints into the same
                                layout (append-only — bucket mapping is a
                                pure function of the fingerprint, so old
                                files are never rewritten)
- ``fingerprint_index_probe``   exact dedup of an incoming batch: within-
                                batch groupBy + LEFT ANTI join against the
                                stored fingerprints; the batch's bucket set
                                prunes the index scan at the parquet layer

and the MinHash twin for NEAR-dup (``minhash_index_build`` / ``_append`` /
``_probe``): per-document signatures and banded LSH bucket rows are
persisted; a probe joins the new batch's band rows against the stored
buckets and verifies candidates by SIGNATURE AGREEMENT (fraction of equal
minima — the standard unbiased Jaccard estimator), so verification touches
only the compact stored signatures, never historical text.

Both indexes also support the rest of the lifecycle a long-lived corpus
needs — DELETE (opt-out / takedown: ``fingerprint_index_delete`` /
``minhash_index_delete`` append tombstone rows; probes subtract them, so a
removed document stops blocking or attracting matches immediately) and
COMPACT (``fingerprint_index_compact`` / ``minhash_index_compact``
physically rewrite the data minus tombstones into a NEW GENERATION
directory and flip an fsync'd ``GENERATION`` pointer file — the same
durable-rename discipline as ``sinks/table.py`` compaction — so a crash at
any step leaves a readable index; reads always resolve through the
pointer). Contract: doc_ids are unique forever — re-ingesting a tombstoned
doc_id before a compact would be masked by its own tombstone.

Scale design notes:

- Exact probe: the anti-join shuffles on md5 hex — maximally uniform keys,
  no skew. With a small batch against a huge index the win is the PARTITION
  PRUNE: the batch covers few fingerprint buckets, and the isin filter on
  the partition column skips every other bucket's files entirely (the same
  mechanism as ``ivf_query_index``'s n_probe prune).
- MinHash probe: candidates come from an equi-join on (band, bsig) — never
  a cartesian; hot buckets are capped on BOTH sides with the same window
  trick as ``dedup.minhash_lsh_pairs``. Historical signatures join back by
  doc id only for surviving candidates. The signature table is ~num_perm
  longs per document — hundreds of bytes against multi-KB documents, so at
  100 TB of text the index is sub-1% of corpus size.
- Parameters (num_perm/bands/shingle_n/seed, n_buckets) are recorded in a
  one-row ``meta`` table at build time; append and probe READ them from the
  index rather than trusting the caller, so a probe can never silently use
  signatures from a different permutation family (a mismatch would yield
  plausible-looking garbage, not an error).

No counterpart in the reference (danielerapati/flusher): its pipeline is a
Sheets-to-warehouse job runner (see ``plans/etl.py`` citations); incremental
corpus dedup is part of the LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flusher_spark.io import generations as G

from flusher_spark.operators.dedup import (
    _ensure_parallelism,
    minhash_min_aggs,
    shingle_rows,
)
from flusher_spark.operators.text import fingerprint_md5

#: Default fingerprint-bucket count: enough files for a pruned small-batch
#: probe to skip most of the index, few enough that each bucket's files stay
#: large at production scale (64 buckets × target_file_bytes-sized files).
_DEFAULT_BUCKETS = 64


def _write_meta(spark: SparkSession, path: str, gen: int = 0, **params: int) -> None:
    """Write the one-row parameter table, GENERATION-SCOPED like the data
    tables (``meta`` at gen 0, ``meta_g<N>`` after — resolved through the
    same pointer). Builds/compacts write the NEW generation's meta before
    the flip, so the flip publishes data and parameters ATOMICALLY — a crash
    in between leaves the old (data, meta) pair intact instead of pairing
    old data with new parameters (a changed n_buckets would silently break
    the probe's bucket pruning — r12 ADVICE)."""
    row = [tuple(int(params[k]) for k in sorted(params))]
    schema = ", ".join(f"{k} long" for k in sorted(params))
    spark.createDataFrame(row, schema).coalesce(1).write.mode("overwrite").parquet(
        G.gen_dir(path, "meta", gen)
    )


def _read_meta(spark: SparkSession, path: str) -> dict[str, int]:
    """Parameters of the LIVE generation. Pre-fix indexes (compacted before
    meta was generation-scoped) have only the bare shared ``meta`` table —
    fall back to it so every existing index keeps working unchanged."""
    mdir = G.gen_dir(path, "meta", G.current_gen(path))
    if not os.path.isdir(mdir):
        mdir = os.path.join(path, "meta")
    row = spark.read.parquet(mdir).collect()[0]
    return {k: int(v) for k, v in row.asDict().items()}


# --- generation pointer + tombstones (delete / compact lifecycle) ----------
#
# The pointer/generation/empty-write machinery is shared with the IVF
# vector-index lifecycle — ONE definition in io/generations.py (the names
# keep their module-private aliases here so call sites and tests read the
# same either way).
_current_gen = G.current_gen
_set_gen = G.set_gen
_gen_dir = G.gen_dir
_drop_stale_gens = G.drop_stale_gens
_write_table = G.write_table


def _tombstones(
    spark: SparkSession, path: str, name: str, gen: int
) -> DataFrame | None:
    """The CURRENT GENERATION's tombstone table if any deletes were
    recorded, else None. Tombstones are generation-scoped (written under
    ``<name>`` at gen 0, ``<name>_g<N>`` after): the pointer flip that
    makes a compacted or rebuilt generation live atomically takes the old
    generation's tombstones OUT of scope with it — no ordering window in
    which stale tombstones subtract rows from a new life (a crash between
    a flip and a tombstone cleanup merely leaves an out-of-scope directory
    for the next sweep). Reads gate on directory existence so pre-delete
    indexes never pay a read."""
    tpath = _gen_dir(path, name, gen)
    if not os.path.isdir(tpath):
        return None
    return spark.read.parquet(tpath)


# ---------------------------------------------------------------------------
# Exact: persisted md5 fingerprints
# ---------------------------------------------------------------------------


def _fingerprint_rows(
    df: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """(doc_id, fingerprint, fp_bucket) per document with non-NULL text.

    NULL-text documents are EXCLUDED from the index on purpose: a NULL
    fingerprint can never equi-match a future probe (exact_dedup's
    "NULL is missing, not equal" policy), so storing them is dead weight
    that every probe would scan past."""
    fp = fingerprint_md5(F.col(text_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .where(F.col("fingerprint").isNotNull())
        # xxhash64 of the hex digest, not the raw md5 bytes: the digest is
        # already uniform, the extra hash only folds it to a small stable
        # bucket id. pmod keeps the bucket non-negative.
        .withColumn(
            "fp_bucket", F.pmod(F.xxhash64("fingerprint"), F.lit(n_buckets))
        )
    )


def fingerprint_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = _DEFAULT_BUCKETS,
) -> str:
    """Build the exact-dedup fingerprint index over a corpus: one
    (doc_id, fingerprint) row per document, written PARTITIONED BY the
    fingerprint's stable hash bucket. Returns ``path``.

    A REBUILD over a live path writes into a NEW generation and flips the
    pointer — never an in-place overwrite — so the previous life (data AND
    its generation-scoped tombstones) stays intact and in scope until one
    atomic flip, exactly the compact crash story; the swept-away old
    directories are reclaimed after. Meta is generation-scoped too (r13),
    so even rebuilding in place with a DIFFERENT n_buckets is atomic: old
    data can never pair with new parameters."""
    spark = df.sparkSession
    rebuild = os.path.exists(os.path.join(path, "GENERATION")) or os.path.isdir(
        os.path.join(path, "fingerprints")
    )
    new_gen = _current_gen(path) + 1 if rebuild else 0
    rows = _fingerprint_rows(df, text_col, id_col, n_buckets)
    _write_table(rows, _gen_dir(path, "fingerprints", new_gen), "fp_bucket")
    _write_meta(spark, path, new_gen, n_buckets=n_buckets)
    if rebuild:
        _set_gen(path, new_gen)
    for tbl in ("fingerprints", "fp_tombstones", "meta"):
        _drop_stale_gens(path, tbl, new_gen)
    shutil.rmtree(_gen_dir(path, "fp_tombstones", new_gen), ignore_errors=True)
    return path


def fingerprint_index_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Append a new batch's fingerprints into an existing index. The bucket
    mapping is a pure function of the fingerprint and the STORED n_buckets
    (read from the index meta, not the caller), so appends only add files
    inside existing bucket directories — no rewrite, and every prior probe
    plan stays valid."""
    n_buckets = _read_meta(spark, path)["n_buckets"]
    rows = _fingerprint_rows(df, text_col, id_col, n_buckets)
    target = _gen_dir(path, "fingerprints", _current_gen(path))
    cols = spark.read.parquet(target).columns
    if "src_batch" in cols:
        # Stream-initialized index (streaming/dedup_stream.py): every file
        # must carry the tag column, or Spark's non-mergeSchema read could
        # infer a schema WITHOUT it from this append's files and break the
        # stream's self-exclusion (or a compact could strip the column for
        # good). NULL = "not written by any stream batch" — always kept by
        # the probe's null-safe exclusion.
        rows = rows.withColumn("src_batch", F.lit(None).cast("string")).select(
            "doc_id", "fingerprint", "src_batch", "fp_bucket"
        )
    rows.write.mode("append").partitionBy("fp_bucket").parquet(target)
    return path


def fingerprint_index_probe(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    prune: bool = True,
    exclude_src_batch: str | None = None,
) -> DataFrame:
    """Exact dedup of an incoming batch against the PERSISTED index: returns
    the surviving documents as (doc_id, fingerprint, n_copies) — one row per
    distinct batch fingerprint not present in the historical corpus, keeping
    the lowest doc id, with the batch-internal copy count.

    Structurally incremental: this function receives only the index path and
    the batch — historical TEXT is unreachable from here; the only
    historical data read is the stored fingerprint table. NULL-text batch
    docs survive as their own single-copy groups (exact_dedup's policy:
    NULL content is missing, not equal — and the stored index holds no NULL
    fingerprints to match them anyway).

    ``prune=True`` spends one cheap aggregate job over the batch's
    fingerprints to collect its distinct bucket ids (bounded ≤ n_buckets
    values) and pushes an isin filter on the PARTITION column — the parquet
    reader then skips every bucket the batch cannot match. Worth it exactly
    when the batch is small relative to the index (the production case);
    a full-corpus re-probe can pass prune=False and skip the extra job.

    Tombstoned documents (``fingerprint_index_delete``) are subtracted from
    the index side before the anti-join — a deleted document stops blocking
    its fingerprint immediately, without waiting for a compact. The
    tombstone table shares the fp_bucket partitioning, so the same isin
    filter prunes it.

    ``exclude_src_batch``: for indexes whose rows carry a ``src_batch``
    tag column (``streaming/dedup_stream.py`` — a "<run_id>#<batch_id>"
    string, unique per logical micro-batch ACROSS stream restarts), ignore
    rows this micro-batch wrote itself — the SELF-EXCLUSION that makes a
    retried streaming micro-batch recompute identical survivors even after
    its own append landed (foreachBatch is at-least-once; without this,
    the retry would see its first attempt's fingerprints and emit zero
    survivors). Null-safe: rows with no/NULL src_batch (batch appends into
    a stream index) are always kept."""
    n_buckets = _read_meta(spark, path)["n_buckets"]
    gen = _current_gen(path)
    fp = fingerprint_md5(F.col(text_col))
    batch_fp = batch.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
    index = spark.read.parquet(_gen_dir(path, "fingerprints", gen))
    if exclude_src_batch is not None:
        if "src_batch" not in index.columns:
            raise ValueError(
                "exclude_src_batch requires an index whose rows carry a"
                " src_batch column (stream_fingerprint_index_init)"
            )
        index = index.where(
            ~F.col("src_batch").eqNullSafe(F.lit(str(exclude_src_batch)))
        )
    tomb = _tombstones(spark, path, "fp_tombstones", gen)
    if prune:
        # The bucket-collect job and the anti-join both consume the batch
        # fingerprints — checkpoint them once so the batch text is scanned
        # (and md5'd) a single time, the same shared-prefix discipline as
        # minhash_index_probe's sig_new (r11 review).
        batch_fp = batch_fp.localCheckpoint(eager=False)
        # Bounded collect (≤ n_buckets ints): drives partition pruning.
        buckets = [
            r["fp_bucket"]
            for r in batch_fp.where(F.col("fingerprint").isNotNull())
            .select(
                F.pmod(F.xxhash64("fingerprint"), F.lit(n_buckets)).alias("fp_bucket")
            )
            .distinct()
            .collect()
        ]
        index = index.where(F.col("fp_bucket").isin(buckets))
        if tomb is not None:
            tomb = tomb.where(F.col("fp_bucket").isin(buckets))
    if tomb is not None:
        # Row-identity subtraction on (doc_id, fingerprint): a fingerprint
        # shared by a deleted AND a live document must keep blocking (the
        # live row survives the anti-join); the tombstone side is the small
        # one — broadcast.
        index = index.join(
            F.broadcast(tomb.select("doc_id", "fingerprint")),
            ["doc_id", "fingerprint"],
            "left_anti",
        )
    survivors = batch_fp.join(
        index.select("fingerprint"), "fingerprint", "left_anti"
    )
    # Within-batch dedup AFTER the anti-join (both orders are correct — a
    # fingerprint is either wholly historical or wholly new; anti-join first
    # lets the group-by run on the already-thinned set).
    return (
        survivors.groupBy(
            "fingerprint",
            F.when(F.col("fingerprint").isNull(), F.col("doc_id")).alias("__null_key"),
        )
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("n_copies"))
        .select("doc_id", "fingerprint", "n_copies")
    )


def fingerprint_index_delete(
    spark: SparkSession, path: str, doc_ids: DataFrame, id_col: str = "doc_id"
) -> int:
    """Tombstone documents out of the exact index (opt-out / takedown):
    appends (doc_id, fingerprint, fp_bucket) tombstone rows; every later
    probe subtracts them, so a deleted document stops blocking its
    fingerprint IMMEDIATELY — ``fingerprint_index_compact`` reclaims the
    space later. Returns the number of index rows tombstoned.

    The delete set arrives as doc_ids only; one scan of the stored
    fingerprints recovers each row's (fingerprint, fp_bucket) so the
    tombstone table can share the index's partitioning (probe-side
    subtraction then prunes with the SAME bucket filter as the index scan).
    That scan is the right trade: deletes are rare relative to probes, the
    fingerprint table is a sliver of corpus size (one md5 per document),
    and the delete set — an opt-out list — broadcasts.

    Contract: doc_ids are unique forever. Re-ingesting a tombstoned doc_id
    before a compact is masked by its own tombstone."""
    gen = _current_gen(path)
    fps = spark.read.parquet(_gen_dir(path, "fingerprints", gen))
    ids = doc_ids.select(F.col(id_col).cast("long").alias("doc_id")).distinct()
    tomb = (
        fps.join(F.broadcast(ids), "doc_id")
        .select("doc_id", "fingerprint", "fp_bucket")
        # duplicate stored rows (torn-append repairs) collapse to one
        # tombstone; the probe's anti-join needs row identity, not counts
        .dropDuplicates(["doc_id", "fingerprint"])
        .localCheckpoint(eager=True)  # consumed by count + write
    )
    n = tomb.count()
    if n:
        tomb.write.mode("append").partitionBy("fp_bucket").parquet(
            _gen_dir(path, "fp_tombstones", gen)
        )
    return n


def fingerprint_index_compact(spark: SparkSession, path: str) -> int:
    """Physically drop tombstoned rows (and coalesce append-accumulated
    small files) by rewriting the live rows into a NEW GENERATION directory,
    then flipping the fsync'd ``GENERATION`` pointer. Returns the new
    generation number.

    Crash-safe at every step, single writer assumed (the scheduler runs
    jobs serially): a crash while writing the new generation leaves the
    pointer — and every reader — on the intact old (data, tombstones) pair
    (the torn directory is reclaimed by the next compact's sweep); a crash
    after the flip but before cleanup leaves only OUT-OF-SCOPE directories
    (tombstones are generation-scoped, so the flip that publishes the
    compacted data atomically retires them) which the next compact
    removes."""
    gen = _current_gen(path)
    # reclaim prior torn/stale dirs (data AND out-of-scope tombstones)
    _drop_stale_gens(path, "fingerprints", gen)
    _drop_stale_gens(path, "fp_tombstones", gen)
    index = spark.read.parquet(_gen_dir(path, "fingerprints", gen))
    tomb = _tombstones(spark, path, "fp_tombstones", gen)
    if tomb is not None:
        index = index.join(
            F.broadcast(tomb.select("doc_id", "fingerprint")),
            ["doc_id", "fingerprint"],
            "left_anti",
        )
    # Collapse IDENTICAL rows (all columns): a retried streaming micro-batch
    # appends its rows twice (self-excluded for that batch, existence-safe
    # for later probes — see streaming/dedup_stream.py), and the documented
    # torn-append repair re-runs a whole append. Without this the "compact
    # reclaims the space" promise was false for retry duplicates (r12
    # ADVICE) — they'd survive every compact forever. Safe under the probe's
    # existence semantics; distinct src_batch tags stay distinct rows.
    index = index.dropDuplicates()
    # _write_table, not a bare write: an all-tombstoned index compacts to
    # ZERO rows, and a bare empty partitionBy write would leave the new
    # generation unreadable — bricking the index at the pointer flip.
    _write_table(index, _gen_dir(path, "fingerprints", gen + 1), "fp_bucket")
    # Carry the (unchanged) parameters into the new generation so every
    # generation owns its meta — the flip publishes both atomically.
    _write_meta(spark, path, gen + 1, **_read_meta(spark, path))
    _set_gen(path, gen + 1)
    # Post-flip cleanup; the old generation and its (now out-of-scope)
    # tombstones are dead weight, not correctness state.
    for tbl in ("fingerprints", "fp_tombstones", "meta"):
        _drop_stale_gens(path, tbl, gen + 1)
    return gen + 1


# ---------------------------------------------------------------------------
# Near-dup: persisted MinHash signatures + banded LSH buckets
# ---------------------------------------------------------------------------


def _signature_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_perm: int,
    shingle_n: int,
    seed: int,
) -> DataFrame:
    """(doc_id, sig array<long>) — same permutation family and aggregate
    formulation as ``dedup.minhash_signatures`` (explode + codegen'd
    independently-seeded min aggregates; see minhash_min_aggs for why the
    family must be k independent hashes, found while validating THIS
    module's agreement estimator)."""
    exploded = shingle_rows(_ensure_parallelism(df), text_col, id_col, shingle_n)
    aggs = minhash_min_aggs(num_perm, seed)
    return (
        exploded.groupBy("doc_id")
        .agg(*aggs)
        .select("doc_id", F.array(*[f"__m{i}" for i in range(num_perm)]).alias("sig"))
    )


def _band_rows(sig: DataFrame, num_perm: int, bands: int, n_buckets: int) -> DataFrame:
    """(doc_id, band, bsig, lsh_bucket) — one row per band, bucketed by a
    stable hash of (band, bsig) for partition pruning at probe time."""
    rows = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            F.hash(*[F.element_at("sig", i * rows + j + 1) for j in range(rows)]).alias(
                "bsig"
            ),
        )
        for i in range(bands)
    ]
    return (
        sig.select("doc_id", F.explode(F.array(*band_cols)).alias("b"))
        .select("doc_id", F.col("b.band").alias("band"), F.col("b.bsig").alias("bsig"))
        .withColumn(
            "lsh_bucket",
            F.pmod(F.xxhash64(F.col("band"), F.col("bsig")), F.lit(n_buckets)),
        )
    )


def minhash_index_build(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    seed: int = 42,
    n_buckets: int = _DEFAULT_BUCKETS,
) -> str:
    """Build the near-dup index over a corpus: a ``sigs`` table (doc_id +
    num_perm minima — the compact verification record) and a ``bands`` table
    (banded LSH bucket rows, PARTITIONED BY a stable hash bucket of
    (band, bsig) so a probe's isin filter prunes at the parquet layer).
    All parameters land in the meta table; append/probe read them back."""
    if bands <= 0 or num_perm <= 0 or num_perm % bands != 0:
        raise ValueError(f"num_perm ({num_perm}) must be a positive multiple of bands ({bands})")
    croot = os.path.join(path, "clusters")
    rebuild = os.path.exists(os.path.join(path, "GENERATION")) or os.path.isdir(
        os.path.join(path, "sigs")
    )
    new_gen = _current_gen(path) + 1 if rebuild else 0
    sig = _signature_rows(df, text_col, id_col, num_perm, shingle_n, seed)
    # The band explode re-reads sig; localCheckpoint would pin it to this
    # session, but an index build is a one-shot batch job — write sigs
    # first, then derive bands FROM THE WRITTEN TABLE so the expensive
    # shingle+aggregate pipeline runs exactly once.
    sig.write.mode("overwrite").parquet(_gen_dir(path, "sigs", new_gen))
    stored = df.sparkSession.read.parquet(_gen_dir(path, "sigs", new_gen))
    # _write_table, not a bare partitioned write: a corpus where no document
    # clears shingle_n tokens yields ZERO band rows, and an empty bare
    # partitionBy write emits no readable files — the first probe would die
    # with UNABLE_TO_INFER_SCHEMA (the fingerprint build / compact guard).
    _write_table(
        _band_rows(stored, num_perm, bands, n_buckets),
        _gen_dir(path, "bands", new_gen),
        "lsh_bucket",
    )
    # A REBUILD over a live path lands in a NEW generation and flips the
    # pointer (see fingerprint_index_build — the old life's data and its
    # generation-scoped tombstones stay in scope until one atomic flip).
    # The previous life's cluster layer dies with it: the new generation
    # has no base table, so label reads and cluster appends FAIL LOUDLY
    # until minhash_cluster_bootstrap runs — never silently serve the old
    # corpus's labels.
    _write_meta(
        df.sparkSession,
        path,
        new_gen,  # generation-scoped: the flip publishes data + meta atomically
        num_perm=num_perm,
        bands=bands,
        shingle_n=shingle_n,
        seed=seed,
        n_buckets=n_buckets,
    )
    if rebuild:
        _set_gen(path, new_gen)
    for tbl in ("sigs", "bands", "mh_tombstones", "meta"):
        _drop_stale_gens(path, tbl, new_gen)
    shutil.rmtree(_gen_dir(path, "mh_tombstones", new_gen), ignore_errors=True)
    # The WHOLE cluster layer dies with a rebuild — base AND meta AND the
    # merge ledger. Leaving clusters/meta behind would make
    # resolve_min_agree silently serve the OLD corpus's frozen cut (frozen
    # against the old num_perm) to minhash_index_dedup and the streaming
    # sink; resolve_min_agree also double-checks the base table is alive
    # for the current generation, covering a crash landing right here.
    shutil.rmtree(croot, ignore_errors=True)
    return path


def minhash_index_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Append a new batch's signatures + band rows into an existing index,
    computed with the STORED parameter family (meta table) — the caller
    cannot accidentally mix permutation families. Append-only: bucket
    mapping is a pure function of (band, bsig), so existing files are never
    rewritten."""
    m = _read_meta(spark, path)
    # localCheckpoint: the signature pipeline (shingle + num_perm aggregates)
    # is the dominant cost and feeds BOTH writes — materialize it once at the
    # first write instead of re-executing the lazy plan for the band write.
    # (Reading the batch's rows back from the sigs table instead would break
    # on re-ingested doc_ids — the join would pick up old AND new records.)
    sig = _signature_rows(
        df, text_col, id_col, m["num_perm"], m["shingle_n"], m["seed"]
    ).localCheckpoint(eager=False)
    # WRITE ORDER is the torn-append guard (two parquet appends can't be
    # atomic together): bands FIRST, sigs second. A crash between them
    # leaves band rows whose doc has no stored signature — which the probe
    # DETECTS and raises on (candidate-without-signature). The opposite
    # order would leave signatures with no band rows: those docs are never
    # generated as candidates, so their near-dups would be missed SILENTLY
    # forever — undetectable. Recovery from a detected tear: re-run the
    # same append (both writes are append-only and the probe dedups
    # candidate pairs, so duplicated band rows are harmless).
    gen = _current_gen(path)
    bands = _band_rows(sig, m["num_perm"], m["bands"], m["n_buckets"])
    if "src_batch" in spark.read.parquet(_gen_dir(path, "sigs", gen)).columns:
        # Stream-initialized index (streaming/dedup_stream.py): every file
        # must carry the tag column (same rationale as
        # fingerprint_index_append). NULL = "not written by any stream
        # batch" — always kept by the probe's null-safe exclusion.
        none = F.lit(None).cast("string")
        bands = bands.withColumn("src_batch", none).select(
            "doc_id", "band", "bsig", "src_batch", "lsh_bucket"
        )
        sig = sig.withColumn("src_batch", none).select("doc_id", "sig", "src_batch")
    bands.write.mode("append").partitionBy("lsh_bucket").parquet(
        _gen_dir(path, "bands", gen)
    )
    sig.write.mode("append").parquet(_gen_dir(path, "sigs", gen))
    return path


def minhash_index_probe(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    prune: bool = True,
    exclude_src_batch: str | None = None,
) -> DataFrame:
    """Near-dup detection of an incoming batch against the PERSISTED index:
    returns (doc_new, doc_hist, est_jaccard) pairs where a batch document
    LSH-collides with a historical one and the SIGNATURE-AGREEMENT estimate
    (fraction of equal minima — E[agree] = Jaccard) clears the threshold.

    Structurally incremental: historical text is unreachable from here —
    candidates come from the stored ``bands`` table and verification reads
    only the stored ``sigs`` table. That is the honest trade vs the batch
    operator (``dedup.minhash_lsh_pairs`` verifies with EXACT shingle
    Jaccard): exactness would require re-shingling history, which is
    precisely what an incremental probe must not do. With num_perm=32 the
    estimator's σ is ≤ 0.09, tightest near 0/1 — fine for a 0.5 gate whose
    candidates already passed a band collision.

    Fan-out bounds: both the stored side and the batch side of the bucket
    join are capped at ``max_bucket`` rows per (band, bsig) — same window
    trick, same rationale as ``minhash_lsh_pairs`` (degenerate signatures,
    e.g. boilerplate-only pages, would otherwise square).

    ``exclude_src_batch``: for indexes whose rows carry a ``src_batch`` tag
    column (``streaming/dedup_stream.py`` — "<run_id>#<batch_id>", unique
    per logical micro-batch across stream restarts), ignore band rows this
    micro-batch wrote itself — the SELF-EXCLUSION that makes a retried
    at-least-once micro-batch recompute identical survivors even after its
    own append landed (its first attempt's band rows would otherwise turn
    batch-internal pairs into history matches). Null-safe: untagged rows
    (batch appends into a stream index) are always kept."""
    m = _read_meta(spark, path)
    sig_new = _signature_rows(
        batch, text_col, id_col, m["num_perm"], m["shingle_n"], m["seed"]
    ).localCheckpoint(eager=False)  # consumed twice: band rows + verification
    return _probe_pairs(
        spark, path, m, sig_new, threshold, max_bucket, prune,
        exclude_src_batch=exclude_src_batch,
    )


def _probe_pairs(
    spark: SparkSession,
    path: str,
    m: dict[str, int],
    sig_new: DataFrame,
    threshold: float,
    max_bucket: int,
    prune: bool,
    fallback_sigs: DataFrame | None = None,
    exclude_src_batch: str | None = None,
) -> DataFrame:
    """minhash_index_probe's body, split out so the cluster layer can reuse
    it with an ALREADY-COMPUTED signature frame (the append flow consumes
    sig_new several times — probe pairs, batch-internal pairs, both index
    writes, base labels — and must not re-run the shingle pipeline).

    ``fallback_sigs``: optional (doc_id, sig) frame consulted when a
    candidate's STORED signature is missing before raising the torn-index
    error. The cluster append passes its own batch here so that the
    documented recovery — re-run the same append after a crash between the
    bands and sigs writes — actually completes instead of tripping over the
    crashed run's own sig-less band rows; candidates torn by some OTHER
    batch still raise."""
    gen = _current_gen(path)
    bands_new = _band_rows(sig_new, m["num_perm"], m["bands"], m["n_buckets"])
    index = spark.read.parquet(_gen_dir(path, "bands", gen))
    if exclude_src_batch is not None:
        if "src_batch" not in index.columns:
            raise ValueError(
                "exclude_src_batch requires an index whose rows carry a"
                " src_batch column (stream_minhash_index_init)"
            )
        # Candidates are generated from the bands side only, so excluding
        # there suffices; the sigs lookup never requests a doc that produced
        # no candidate rows.
        index = index.where(
            ~F.col("src_batch").eqNullSafe(F.lit(str(exclude_src_batch)))
        )
    if prune:
        # Bounded collect (≤ n_buckets ints) → parquet partition pruning.
        buckets = [
            r["lsh_bucket"] for r in bands_new.select("lsh_bucket").distinct().collect()
        ]
        index = index.where(F.col("lsh_bucket").isin(buckets))
    # Restrict the stored side to the batch's EXACT band keys BEFORE the
    # fan-out cap: at the default 64 lsh buckets any real batch covers
    # most partitions, so the coarse prune alone would leave the window
    # count running over the corpus-sized bands table on every probe — a
    # full exchange per micro-batch, against this module's probe-cost-
    # follows-the-batch contract. A semi-join on (band, bsig) keeps WHOLE
    # buckets, so the per-bucket counts the cap sees are unchanged for
    # every surviving bucket — identical output, batch-bounded window.
    index = index.join(
        F.broadcast(bands_new.select("band", "bsig").distinct()),
        ["band", "bsig"],
        "leftsemi",
    )
    index = _capped_bands(index, max_bucket)
    bands_new = _capped_bands(bands_new, max_bucket)
    cand = (
        bands_new.alias("n")
        .join(
            index.alias("h"),
            (F.col("n.band") == F.col("h.band")) & (F.col("n.bsig") == F.col("h.bsig")),
        )
        .select(
            F.col("n.doc_id").alias("doc_new"), F.col("h.doc_id").alias("doc_hist")
        )
        # A doc re-ingested verbatim collides with its own stored record;
        # keep it — "this new doc duplicates history" is the signal. But a
        # batch probed against an index that ALREADY CONTAINS it (rebuild
        # flows) would self-pair; drop identical ids.
        .where(F.col("doc_new") != F.col("doc_hist"))
        .dropDuplicates(["doc_new", "doc_hist"])
    )
    tomb = _tombstones(spark, path, "mh_tombstones", gen)
    if tomb is not None:
        # Deleted documents stop ATTRACTING matches immediately: subtract
        # tombstones from the candidate set (batch-bounded — far cheaper
        # than filtering the corpus-sized bands/sigs tables; compact does
        # the physical removal later).
        cand = cand.join(
            F.broadcast(tomb.select(F.col("doc_id").alias("doc_hist"))),
            "doc_hist",
            "left_anti",
        )
    sig_hist = spark.read.parquet(_gen_dir(path, "sigs", gen))
    # LEFT join + loud error on a candidate whose historical doc has no
    # stored signature: that state only exists after a TORN APPEND (bands
    # committed, sigs crash — see minhash_index_append's write-order note).
    # An inner join would silently drop exactly the pairs the index was
    # grown to find; raise_error keeps the plan lazy and fails the query
    # with a recovery instruction instead.
    pairs = cand.join(
        sig_new.select(F.col("doc_id").alias("doc_new"), F.col("sig").alias("__sn")),
        "doc_new",
    ).join(
        sig_hist.select(F.col("doc_id").alias("doc_hist"), F.col("sig").alias("__sh")),
        "doc_hist",
        "left",
    )
    if fallback_sigs is not None:
        pairs = pairs.join(
            F.broadcast(
                fallback_sigs.select(
                    F.col("doc_id").alias("doc_hist"), F.col("sig").alias("__sf")
                )
            ),
            "doc_hist",
            "left",
        ).withColumn("__sh", F.coalesce("__sh", "__sf")).drop("__sf")
    pairs = pairs.withColumn(
        "__sh",
        F.when(
            F.col("__sh").isNull(),
            F.raise_error(
                F.concat(
                    F.lit("minhash index is torn: historical doc "),
                    F.col("doc_hist").cast("string"),
                    F.lit(
                        " has band rows but no stored signature — a prior"
                        " append crashed between its two writes; re-run the"
                        " same append to repair"
                    ),
                )
            ).cast(sig_hist.schema["sig"].dataType),
        ).otherwise(F.col("__sh")),
    )
    agree = _agree_expr(m["num_perm"], "__sn", "__sh")
    return (
        pairs.withColumn(
            "est_jaccard", agree.cast("double") / F.lit(float(m["num_perm"]))
        )
        .where(F.col("est_jaccard") >= threshold)
        # Idempotent under the documented repair flow: "re-run the same
        # append" executed when the prior append had in fact completed both
        # writes leaves doc_ids with DUPLICATE sigs/bands rows, and the
        # joins above would emit one output row per stored copy. Collapse on
        # the output pair rather than deduping sig_hist — that would shuffle
        # the corpus-sized table, against this module's probe-cost-follows-
        # the-batch contract (r12 / ADVICE). MAX (not dropDuplicates) keeps
        # the output deterministic even when a re-ingested doc_id carries
        # DIFFERENT content across its stored copies: "best evidence of
        # duplication" wins, never whichever copy a task happened to see
        # first.
        .groupBy("doc_new", "doc_hist")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
        .select("doc_new", "doc_hist", "est_jaccard")
    )


def resolve_min_agree(
    spark: SparkSession, path: str, threshold: float, num_perm: int
) -> int:
    """ONE definition of the near-dup agreement cut for a persisted MinHash
    index. When the index has a bootstrapped cluster layer, clusters/meta
    already froze the integer minimum (minhash_cluster_bootstrap) — read
    it, so the streaming sink's survivor rule, the batch dedup helper, and
    the cluster layer's edge rule can never diverge by each re-deriving it
    from a float. The ceiling recompute is only the fallback for indexes
    without a cluster layer, where the caller's ``threshold`` argument
    defines the cut."""
    # clusters/meta is NOT generation-scoped (no GENERATION pointer is ever
    # written under the clusters root — bootstrap writes the bare table and
    # overwrites it wholesale). The base table IS scoped by the INDEX's
    # generation, so requiring it alongside meta makes this gate mean "the
    # cluster layer is ALIVE for the current corpus": a rebuild removes the
    # whole clusters root, but a crash between its pointer flip and that
    # cleanup could leave a stale meta whose frozen cut belongs to the old
    # corpus (and its old num_perm) — base missing for the new generation
    # detects exactly that and falls back to the caller's threshold.
    croot = os.path.join(path, "clusters")
    if os.path.isdir(os.path.join(croot, "meta")) and os.path.isdir(
        _gen_dir(croot, "base", _current_gen(path))
    ):
        return int(_read_meta(spark, croot)["min_agree"])
    # ceil(threshold × num_perm) as an exact integer — the float-safe form
    # minhash_cluster_bootstrap freezes.
    return max(-(-int(threshold * num_perm * 1000000) // 1000000), 1)


def minhash_index_dedup(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    max_bucket: int = 1000,
    exclude_src_batch: str | None = None,
    sig_new: DataFrame | None = None,
    _meta: dict[str, int] | None = None,
    _min_agree: int | None = None,
) -> DataFrame:
    """The APPLY half of ``minhash_index_probe`` — batch near-dup dedup
    against a persisted index, and THE survivor rule of the streaming
    NEAR-dup sink (``streaming/dedup_stream.py::neardup_stream_sink``
    delegates here, so the two call sites cannot drift): drop every batch
    doc that clears the agreement threshold against ANY historical doc
    (candidates from the STORED bands, verification from the STORED
    sigs — history is never re-shingled) or against a SMALLER-id member of
    its own batch (keep-min, the semantic_dedup_keep convention). Docs too
    short to produce a signature can never near-match and pass through.
    Returns the surviving ids (one ``id_col`` column).

    The agreement cut comes from ``resolve_min_agree`` — the frozen
    clusters/meta integer when the index has a cluster layer, the float
    ceiling of ``threshold`` otherwise — and the probe receives it as
    ``min_agree / num_perm`` (exact round-trip: agree/k ≥ a/k ⟺ agree ≥ a),
    so probe and batch-internal verification cut at the SAME count.

    ``sig_new``: optional precomputed ``_signature_rows`` frame over
    ``batch`` (the streaming sink passes its checkpointed one so the
    shingle+aggregate pipeline — the dominant cost — runs exactly once).
    ``_meta``/``_min_agree``: the sink's per-run caches of the immutable
    index parameters and the resolved cut, passed back in so a long
    stream doesn't re-read the KB-sized meta tables every micro-batch.

    At scale: one bucket-pruned band join (probe cost follows the batch),
    one batch-sized self-join, one anti-join — never a corpus scan."""
    m = _meta if _meta is not None else _read_meta(spark, path)
    min_agree = (
        _min_agree
        if _min_agree is not None
        else resolve_min_agree(spark, path, threshold, m["num_perm"])
    )
    if sig_new is None:
        sig_new = _signature_rows(
            batch, text_col, id_col, m["num_perm"], m["shingle_n"], m["seed"]
        ).localCheckpoint(eager=False)  # probe + self-candidates + verification
    hist = _probe_pairs(
        spark,
        path,
        m,
        sig_new,
        min_agree / m["num_perm"],
        max_bucket,
        prune=True,
        exclude_src_batch=exclude_src_batch,
    )
    bands_new = _band_rows(sig_new, m["num_perm"], m["bands"], m["n_buckets"])
    internal = _verified_pairs(
        _self_candidates(bands_new, max_bucket), sig_new, m["num_perm"], min_agree
    )
    dropped = (
        hist.select(F.col("doc_new").alias("doc_id"))
        .union(internal.select(F.col("doc_b").alias("doc_id")))  # doc_a < doc_b
        .distinct()
    )
    return batch.select(F.col(id_col)).join(
        dropped.select(F.col("doc_id").alias(id_col)), id_col, "left_anti"
    )


def minhash_index_delete(
    spark: SparkSession, path: str, doc_ids: DataFrame, id_col: str = "doc_id"
) -> int:
    """Tombstone documents out of the near-dup index (opt-out / takedown):
    appends doc_id tombstone rows; probes subtract them from the CANDIDATE
    set (batch-bounded — the corpus-sized sigs/bands tables are untouched
    until ``minhash_index_compact``), and the persisted cluster-label reads
    exclude them. Unlike the exact twin no index scan is needed: candidates
    carry doc ids, so a bare id list suffices. Returns the number of ids
    tombstoned.

    Cluster semantics after a delete: the doc's label row disappears from
    ``minhash_cluster_labels``; cluster ids themselves are opaque integers
    and stay stable even when the id-donating member is deleted."""
    ids = (
        doc_ids.select(F.col(id_col).cast("long").alias("doc_id"))
        .distinct()
        .localCheckpoint(eager=True)  # consumed by count + write
    )
    n = ids.count()
    if n:
        ids.write.mode("append").parquet(
            _gen_dir(path, "mh_tombstones", _current_gen(path))
        )
    return n


def minhash_index_compact(spark: SparkSession, path: str) -> int:
    """Physically drop tombstoned documents from sigs, bands, and (when the
    cluster layer exists) the base label table, rewriting each into a NEW
    GENERATION directory before flipping the shared fsync'd ``GENERATION``
    pointer — one atomic cut-over for all three tables, same crash story as
    ``fingerprint_index_compact`` (torn new generations are reclaimed by
    the next compact's sweep; the flip retires the old generation's
    tombstones with it — tombstones are generation-scoped). The merge
    ledger (``clusters/remap``) is merge-sized, not corpus-sized, and its
    ids are opaque — it is left as-is. Returns the new generation
    number."""
    gen = _current_gen(path)
    croot = os.path.join(path, "clusters")
    for tbl in ("sigs", "bands", "mh_tombstones"):
        _drop_stale_gens(path, tbl, gen)
    _drop_stale_gens(croot, "base", gen)
    tomb = _tombstones(spark, path, "mh_tombstones", gen)

    def _live(df: DataFrame) -> DataFrame:
        if tomb is not None:
            df = df.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")
        # Collapse IDENTICAL rows: a retried streaming micro-batch or the
        # documented torn-append repair re-run appends its rows twice —
        # harmless to probes (candidate dedup + max-agreement), but compact
        # is where the space comes back (the fingerprint twin's r12 ADVICE
        # promise, applied to both index families).
        return df.dropDuplicates()

    # _write_table throughout: a fully-tombstoned table compacts to zero
    # rows, and a bare empty write would leave the new generation
    # unreadable at the pointer flip.
    _write_table(
        _live(spark.read.parquet(_gen_dir(path, "sigs", gen))),
        _gen_dir(path, "sigs", gen + 1),
        None,
    )
    _write_table(
        _live(spark.read.parquet(_gen_dir(path, "bands", gen))),
        _gen_dir(path, "bands", gen + 1),
        "lsh_bucket",
    )
    if os.path.isdir(_gen_dir(croot, "base", gen)):
        _write_table(
            _live(spark.read.parquet(_gen_dir(croot, "base", gen))),
            _gen_dir(croot, "base", gen + 1),
            "c_bucket",
        )
    # Carry the (unchanged) parameter family into the new generation —
    # meta is generation-scoped, and a probe must never resolve signatures
    # against a different permutation family's parameters.
    _write_meta(spark, path, gen + 1, **_read_meta(spark, path))
    _set_gen(path, gen + 1)
    for tbl in ("sigs", "bands", "mh_tombstones", "meta"):
        _drop_stale_gens(path, tbl, gen + 1)
    _drop_stale_gens(croot, "base", gen + 1)
    return gen + 1


# ---------------------------------------------------------------------------
# Incremental cluster labels: persisted canonical ids that survive appends
# ---------------------------------------------------------------------------
#
# The missing last step of the incremental near-dup story (r11 verdict):
# minhash_index_probe yields candidate PAIRS vs history, but a production
# crawl wants a persisted (doc_id, cluster_id) table whose ids stay STABLE
# as batches append — re-running dedup_clusters over all accumulated pairs
# per batch re-does label propagation over the whole corpus.
#
# Layout under <index>/clusters/:
#   base/   (doc_id, cluster_id, c_bucket)  APPEND-ONLY — one row per doc,
#           labeled with the canonical id known AT APPEND TIME, parquet-
#           partitioned by a stable hash bucket of doc_id (probe-side label
#           lookups prune to the batch's buckets).
#   remap/  (old_id, new_id)  the tiny merge ledger: when a new doc bridges
#           two existing clusters, the losing cluster's id maps to the
#           surviving (minimum) id. PATH-COMPRESSED AT WRITE TIME: stored
#           new_ids are always canonical (a later merge of a winner rewrites
#           every ledger row pointing at it), so reads resolve in ONE
#           broadcast join — never an iterative chain. Size is bounded by
#           the number of merges ever performed, orders of magnitude below
#           corpus size; the per-batch overwrite is of this tiny table only.
#   meta/   min_agree (integer agreement threshold = ceil(threshold ×
#           num_perm) — exact, no float round-trip) + max_bucket.
#
# Why base never rewrites: the alternative (rewrite losing clusters' member
# rows in place) would need either an inverted cluster->files lookup or a
# partition-overwrite whose rows MOVE buckets when relabeled (cluster-keyed
# bucketing) — both turn rare merges into corpus-sized writes. The ledger
# keeps every merge O(|ledger|) and every read base-scan + broadcast.
#
# Label semantics match the batch operator exactly: a cluster's canonical id
# is the MINIMUM member doc_id (dedup_clusters' convention). Induction: the
# bootstrap labels by min member; a batch component's collapsed graph holds
# new doc ids + touched clusters' canonical ids (each = min of its members),
# so the component minimum IS the union component's minimum member. A test
# pins equality with a from-scratch clustering of the union corpus.
#
# Crash consistency (four writes can't be atomic together): order is
# bands -> remap -> base -> SIGS LAST, so a crash anywhere mid-sequence
# leaves band rows whose doc has no stored signature — the same torn state
# minhash_index_probe already RAISES on, extending the index layer's loud
# tear detection over the cluster tables. Recovery for ANY tear is the same
# "re-run the same append" (the probe verifies the crashed run's own band
# rows from the batch's recomputed signatures via fallback_sigs, so the
# re-run completes): duplicated bands/sigs are harmless (probe collapses
# pairs), duplicated base rows carry equal-or-mergeable labels (reads
# resolve through the ledger and take the min), and the remap rewrite is
# idempotent. minhash_cluster_bootstrap rebuilds clusters/ from bands+sigs
# outright if a table is ever lost.


def _capped_bands(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Drop rows of (band, bsig) buckets larger than ``max_bucket`` — the
    shared fan-out cap (degenerate signatures would square the bucket
    join)."""
    w = Window.partitionBy("band", "bsig")
    return (
        bands.withColumn("__n", F.count("*").over(w))
        .where(F.col("__n") <= max_bucket)
        .drop("__n")
    )


def _agree_expr(num_perm: int, a: str, b: str):
    """Signature-agreement count as num_perm codegen'd comparisons (same
    rationale as the probe: a zip_with HOF drops the stage to interpreted
    evaluation)."""
    return sum(
        (F.element_at(a, i + 1) == F.element_at(b, i + 1)).cast("int")
        for i in range(num_perm)
    )


def _verified_pairs(
    cand: DataFrame, sigs: DataFrame, num_perm: int, min_agree: int
) -> DataFrame:
    """(doc_a, doc_b) candidates -> pairs whose signature agreement clears
    the INTEGER threshold (exact comparison, no float round-trip)."""
    sa = sigs.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("__sa"))
    sb = sigs.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("__sb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(_agree_expr(num_perm, "__sa", "__sb") >= F.lit(min_agree))
        .select("doc_a", "doc_b")
    )


def _self_candidates(bands: DataFrame, max_bucket: int) -> DataFrame:
    """Within-one-table LSH candidates: equi-join on (band, bsig), ordered
    doc_a < doc_b, deduped across bands. Never a cartesian."""
    b = _capped_bands(bands, max_bucket)
    return (
        b.alias("x")
        .join(
            b.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
    )


def minhash_cluster_bootstrap(
    spark: SparkSession,
    path: str,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> str:
    """Initialize the persisted cluster-label table from the CURRENT index
    content — stored bands + sigs only, historical text is never touched.
    Every signed document gets a row: near-dup components are labeled by
    their minimum member id (dedup_clusters), everything else is its own
    singleton. The agreement threshold is frozen into clusters/meta as an
    INTEGER minimum (ceil(threshold × num_perm)) so appends can never
    drift to a different float cut."""
    from flusher_spark.operators.dedup import dedup_clusters

    m = _read_meta(spark, path)
    gen = _current_gen(path)
    min_agree = -(-int(threshold * m["num_perm"] * 1000000) // 1000000)  # ceil, float-safe
    min_agree = max(min_agree, 1)
    sigs = spark.read.parquet(_gen_dir(path, "sigs", gen))
    bands = spark.read.parquet(_gen_dir(path, "bands", gen))
    tomb = _tombstones(spark, path, "mh_tombstones", gen)
    if tomb is not None:
        # Bootstrapping between a delete and its compact: deleted docs get
        # no label row and contribute no pairs.
        t = F.broadcast(tomb.select("doc_id"))
        sigs = sigs.join(t, "doc_id", "left_anti")
        bands = bands.join(t, "doc_id", "left_anti")
    cand = _self_candidates(bands, max_bucket)
    pairs = _verified_pairs(cand, sigs, m["num_perm"], min_agree)
    comp = dedup_clusters(pairs)
    labels = (
        sigs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn(
            "c_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(m["n_buckets"]))
        )
    )
    croot = os.path.join(path, "clusters")
    # _write_table, not a bare partitioned write: bootstrapping an EMPTY
    # index (stream_minhash_index_init with no seed) yields zero label rows,
    # and an empty bare partitionBy write emits no readable files — every
    # later cluster append/labels read would die with UNABLE_TO_INFER_SCHEMA.
    _write_table(labels, _gen_dir(croot, "base", gen), "c_bucket")
    spark.createDataFrame([], "old_id long, new_id long").write.mode(
        "overwrite"
    ).parquet(os.path.join(croot, "remap"))
    _write_meta(spark, croot, min_agree=min_agree, max_bucket=max_bucket)
    return path


def minhash_cluster_append(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Ingest a batch: append its signatures + band rows into the index AND
    extend the persisted cluster labels — returning the batch's
    (doc_id, cluster_id) rows. Untouched clusters are NEVER relabeled or
    rewritten: only the batch's docs append to base, and only clusters a
    new doc actually bridges enter the merge ledger.

    The label computation collapses history to CLUSTER IDS: probe pairs map
    doc_hist -> its canonical cluster id (bucket-pruned base lookup +
    broadcast ledger resolve), batch-internal pairs come from a self-join of
    the batch's own band rows, and min-label propagation runs over that
    batch-sized graph — never over historical members. A component whose
    minimum is an existing cluster id extends that cluster; a component
    whose minimum is a new doc id (or that bridges two clusters) relabels
    the touched clusters through the ledger, leaving their base rows as-is.
    """
    from flusher_spark.operators.dedup import dedup_clusters

    m = _read_meta(spark, path)
    croot = os.path.join(path, "clusters")
    cm = _read_meta(spark, croot)
    # Consumed by: probe pairs, internal pairs, two index writes, and the
    # base-label append — eager checkpoint so the shingle+aggregate pipeline
    # (the dominant cost) runs exactly once.
    sig_new = _signature_rows(
        batch, text_col, id_col, m["num_perm"], m["shingle_n"], m["seed"]
    ).localCheckpoint(eager=True)
    threshold = cm["min_agree"] / m["num_perm"]  # exact: agree/k >= a/k <=> agree >= a
    # fallback_sigs=sig_new: after a crash anywhere in THIS append's write
    # sequence, the recovery re-run's probe meets the crashed run's own
    # sig-less band rows — verifying those candidates from the batch's
    # recomputed signatures (identical by construction) lets the recovery
    # complete; tears left by OTHER batches still raise.
    pairs_hist = _probe_pairs(
        spark, path, m, sig_new, threshold, cm["max_bucket"], prune=True,
        fallback_sigs=sig_new,
    )
    bands_new = _band_rows(sig_new, m["num_perm"], m["bands"], m["n_buckets"])
    pairs_int = _verified_pairs(
        _self_candidates(bands_new, cm["max_bucket"]),
        sig_new,
        m["num_perm"],
        cm["min_agree"],
    )
    # doc_hist -> canonical cluster id. Base lookup is bucket-pruned (the
    # batch's historical matches cover few doc_id buckets; bounded collect
    # of <= n_buckets ints) and the hist side is broadcast; the ledger is
    # tiny by construction, broadcast too. A doc_hist with NO base row can
    # only come from a torn append's own re-run (its index rows landed, its
    # base row didn't) — treating it as a singleton labeled by its own id
    # reproduces exactly the internal-pair handling of that same batch.
    gen = _current_gen(path)
    hist = pairs_hist.select(
        "doc_new", F.col("doc_hist").alias("doc_id")
    ).localCheckpoint(eager=True)  # consumed by bucket collect + join
    base = spark.read.parquet(_gen_dir(croot, "base", gen))
    hbuckets = [
        r["b"]
        for r in hist.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(m["n_buckets"])).alias("b")
        )
        .distinct()
        .collect()
    ]
    remap = spark.read.parquet(os.path.join(croot, "remap"))
    # ONE pass over the bucket-pruned base: its batch-matched rows are
    # batch-bounded, so checkpoint them and derive the orphan set by
    # anti-joining hist against THOSE ids (both sides batch-sized). An
    # anti-join against base itself would have to broadcast or shuffle the
    # corpus-sized label table on every append — at the default 64 buckets
    # any real batch covers all buckets, so the prune would not save it
    # (r12 review).
    matched = (
        base.where(F.col("c_bucket").isin(hbuckets))
        .join(F.broadcast(hist), "doc_id")
        .select("doc_new", "doc_id", "cluster_id")
        .localCheckpoint(eager=True)
    )
    hist_cid = (
        matched.unionByName(
            # torn-re-run orphans: index rows without base rows
            hist.join(
                F.broadcast(matched.select("doc_id").distinct()),
                "doc_id",
                "left_anti",
            ).select("doc_new", "doc_id", F.col("doc_id").alias("cluster_id"))
        )
        .alias("h")
        .join(
            F.broadcast(remap).alias("r"),
            F.col("h.cluster_id") == F.col("r.old_id"),
            "left",
        )
        .select(
            "doc_new", F.coalesce("r.new_id", "h.cluster_id").alias("cid")
        )
    )
    edges = pairs_int.unionByName(
        hist_cid.select(F.col("doc_new").alias("doc_a"), F.col("cid").alias("doc_b"))
    )
    comp = dedup_clusters(edges)
    lab_new = (
        sig_new.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
        )
        .withColumn("c_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(m["n_buckets"])))
        .localCheckpoint(eager=True)  # returned to the caller after the writes
    )
    # Touched clusters that lost their id -> ledger entries. Targets are
    # canonical by construction: the component minimum either IS an existing
    # canonical id or a brand-new doc id.
    remap_new = (
        hist_cid.select(F.col("cid").alias("doc_id"))
        .distinct()
        .join(comp, "doc_id")
        .where(F.col("cluster_id") != F.col("doc_id"))
        .select(
            F.col("doc_id").alias("old_id"), F.col("cluster_id").alias("new_id")
        )
        .localCheckpoint(eager=True)  # consumed by the ledger rewrite below
    )
    # Write order: bands -> remap -> base -> SIGS LAST. sigs-last extends
    # minhash_index_append's tear detector over the cluster tables too: a
    # crash anywhere before the final write leaves band rows whose doc has
    # no stored signature, which a later probe RAISES on (candidate-
    # without-signature) instead of serving silently-split labels. The
    # premature-remap window (ledger updated, bridging doc's base row not
    # yet written) merges the touched clusters a re-run early — the benign
    # direction; the old sigs-second order had the opposite window: a
    # crash after sigs left docs in the index but permanently absent from
    # the labels table, with nothing anywhere to notice (r12 review).
    # Recovery for every tear stays "re-run the same append" — the probe's
    # fallback_sigs covers the crashed run's own band rows.
    # Stream-initialized index: every appended file must carry the
    # src_batch tag column (exactly minhash_index_append's guard — a
    # tag-less file in the bands/sigs dirs could make a non-mergeSchema
    # read infer a schema without the column, killing the streaming sink's
    # self-exclusion or letting a compact strip the tag for good).
    bands_w, sig_w = bands_new, sig_new
    if "src_batch" in spark.read.parquet(_gen_dir(path, "sigs", gen)).columns:
        none = F.lit(None).cast("string")
        bands_w = bands_new.withColumn("src_batch", none).select(
            "doc_id", "band", "bsig", "src_batch", "lsh_bucket"
        )
        sig_w = sig_new.withColumn("src_batch", none).select(
            "doc_id", "sig", "src_batch"
        )
    bands_w.write.mode("append").partitionBy("lsh_bucket").parquet(
        _gen_dir(path, "bands", gen)
    )
    if remap_new.limit(1).count():
        # Path compression at write time: a ledger row whose target just
        # lost its id follows it, so stored new_ids stay canonical and reads
        # never chain. The whole table is rewritten — it is merge-ledger
        # sized, not corpus sized. localCheckpoint first: Spark cannot
        # overwrite a parquet path its own lazy plan still reads from.
        updated = (
            remap.alias("r")
            .join(
                remap_new.alias("n2"),
                F.col("r.new_id") == F.col("n2.old_id"),
                "left",
            )
            .select(
                F.col("r.old_id"),
                F.coalesce("n2.new_id", "r.new_id").alias("new_id"),
            )
            .unionByName(remap_new)
            .localCheckpoint(eager=True)
        )
        updated.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(croot, "remap")
        )
    lab_new.write.mode("append").partitionBy("c_bucket").parquet(
        _gen_dir(croot, "base", gen)
    )
    sig_w.write.mode("append").parquet(_gen_dir(path, "sigs", gen))
    return lab_new.select("doc_id", "cluster_id")


def minhash_cluster_labels(spark: SparkSession, path: str) -> DataFrame:
    """The full (doc_id, cluster_id) table with every merge resolved: base
    rows pass through the broadcast ledger; duplicate base rows (torn-append
    re-runs) collapse to their minimum resolved label — the canonical-id
    convention applied to the duplicate itself. Tombstoned documents
    (``minhash_index_delete``) are excluded."""
    croot = os.path.join(path, "clusters")
    gen = _current_gen(path)
    base = spark.read.parquet(_gen_dir(croot, "base", gen))
    tomb = _tombstones(spark, path, "mh_tombstones", gen)
    if tomb is not None:
        base = base.join(F.broadcast(tomb.select("doc_id")), "doc_id", "left_anti")
    remap = spark.read.parquet(os.path.join(croot, "remap"))
    return (
        base.alias("b")
        .join(
            F.broadcast(remap).alias("r"),
            F.col("b.cluster_id") == F.col("r.old_id"),
            "left",
        )
        .select(
            "doc_id", F.coalesce("r.new_id", "b.cluster_id").alias("cluster_id")
        )
        .groupBy("doc_id")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )
