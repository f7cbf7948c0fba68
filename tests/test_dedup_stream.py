"""Streaming incremental dedup over the persisted fingerprint index
(streaming/dedup_stream.py).

Load-bearing contracts:
- cross-batch dedup: a micro-batch dedups against every PRIOR batch's
  survivors and duplicates, including within the same stream run;
- retry idempotency WITHOUT a ledger: re-running a micro-batch after its
  index append already landed recomputes the identical survivor set
  (self-exclusion on src_batch), and the duplicated index rows are harmless
  to later batches;
- interop: the stream-built index answers batch probes and supports the
  delete/compact lifecycle unchanged.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from flusher_spark.operators import dedup_index as DI
from flusher_spark.streaming.dedup_stream import (
    dedup_stream_sink,
    run_stream_dedup,
    stream_fingerprint_index_init,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _sink_rows(spark, sink):
    return {
        (r["batch_id"], r["doc_id"], r["n_copies"])
        for r in spark.read.parquet(sink).collect()
    }


class TestDedupStreamSink:
    """Direct foreachBatch-function tests (deterministic batch ids)."""

    def test_cross_batch_dedup_and_internal_collapse(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_fingerprint_index_init(spark, idx)
        fn = dedup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, "aaa"), (2, "bbb")]), 0)
        # 3 duplicates batch-0's survivor; 4/5 are an internal dup pair
        fn(_docs(spark, [(3, "aaa"), (4, "ccc"), (5, "ccc")]), 1)
        # 6 duplicates a batch-1 SURVIVOR: proves survivors were indexed
        fn(_docs(spark, [(6, "ccc")]), 2)
        assert _sink_rows(spark, sink) == {(0, 1, 1), (0, 2, 1), (1, 4, 2)}

    def test_retry_recomputes_identical_survivors(self, spark, tmp_path):
        """The at-least-once case: the same (df, batch_id) runs again AFTER
        its first attempt fully landed (survivors written AND fingerprints
        appended). Self-exclusion must yield the identical survivor set —
        not the empty set a naive probe would produce."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_fingerprint_index_init(spark, idx)
        fn = dedup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, "aaa")]), 0)
        b1 = _docs(spark, [(2, "bbb"), (3, "aaa")])  # 3 dups history
        fn(b1, 1)
        first = _sink_rows(spark, sink)
        assert first == {(0, 1, 1), (1, 2, 1)}
        fn(b1, 1)  # retry
        assert _sink_rows(spark, sink) == first
        # the duplicated index rows must not double-block or unblock later
        # batches: 4 dups batch-1's survivor, 5 is new
        fn(_docs(spark, [(4, "bbb"), (5, "ddd")]), 2)
        assert _sink_rows(spark, sink) == first | {(2, 5, 1)}

    def test_seed_and_batch_interop(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_fingerprint_index_init(
            spark, idx, seed_df=_docs(spark, [(100, "legacy corpus doc")])
        )
        fn = dedup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, "legacy corpus doc"), (2, "new doc")]), 0)
        assert _sink_rows(spark, sink) == {(0, 2, 1)}
        # batch probe (no exclusion) answers from the stream-built index
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(
                spark, idx, _docs(spark, [(10, "new doc"), (11, "never seen")])
            ).collect()
        }
        assert got == {11}
        # the delete/compact lifecycle works unchanged; src_batch survives
        DI.fingerprint_index_delete(spark, idx, _docs(spark, [(100, "x")]).select("doc_id"))
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(
                spark, idx, _docs(spark, [(12, "legacy corpus doc")])
            ).collect()
        }
        assert got == {12}  # seed doc tombstoned: fingerprint unblocked
        assert DI.fingerprint_index_compact(spark, idx) == 1
        live = spark.read.parquet(os.path.join(idx, "fingerprints_g1"))
        assert "src_batch" in live.columns
        # survivors-only indexing: doc 1 (a dup of the seed) never landed
        assert {r["doc_id"] for r in live.collect()} == {2}
        # and the stream keeps running against the compacted generation
        fn(_docs(spark, [(20, "new doc"), (21, "post compact")]), 1)
        assert (1, 21, 1) in _sink_rows(spark, sink)
        assert not any(b == 1 and d == 20 for b, d, _ in _sink_rows(spark, sink))


class TestDedupStreamEndToEnd:
    def test_file_stream_availablenow(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_fingerprint_index_init(spark, idx)
        # one parquet file per intended micro-batch, mtimes strictly ordered
        # (the file source processes oldest-first)
        batches = [
            [(1, "aaa"), (2, "bbb")],
            [(3, "aaa"), (4, "ccc")],
            [(5, "ccc"), (6, "ddd")],
        ]
        now = time.time()
        for i, rows in enumerate(batches):
            # the file source reads FLAT files, not parquet directories:
            # stage each batch and move its part file into the source dir
            staged = str(tmp_path / f"stage{i}")
            _docs(spark, rows).coalesce(1).write.parquet(staged)
            part = next(n for n in os.listdir(staged) if n.endswith(".parquet"))
            dst = str(src / f"b{i}.parquet")
            os.rename(os.path.join(staged, part), dst)
            os.utime(dst, (now + i, now + i))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_stream_dedup(stream, idx, sink, str(tmp_path / "ckpt"))
        q.awaitTermination()
        # batch-id assignment is the file source's business; assert the
        # batch-independent contract — the global survivor set
        survivors = {(d, n) for _, d, n in _sink_rows(spark, sink)}
        assert survivors == {(1, 1), (2, 1), (4, 1), (6, 1)}
        # restart the stream with a NEW checkpoint but the same index: a
        # re-sent duplicate is still caught (the index is the state, not
        # the state store)
        src2 = tmp_path / "src2"
        src2.mkdir()
        staged2 = str(tmp_path / "stage_restart")
        _docs(spark, [(7, "ddd"), (8, "eee")]).coalesce(1).write.parquet(staged2)
        part2 = next(n for n in os.listdir(staged2) if n.endswith(".parquet"))
        os.rename(os.path.join(staged2, part2), str(src2 / "b0.parquet"))
        stream2 = (
            spark.readStream.schema("doc_id long, text string").parquet(str(src2))
        )
        q2 = run_stream_dedup(stream2, idx, str(tmp_path / "out2"), str(tmp_path / "ckpt2"))
        q2.awaitTermination()
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got == {8}

    def test_fresh_run_reused_batch_ids_still_dedup(self, spark, tmp_path):
        """r12 review: batch ids are only unique per checkpoint — a stream
        restarted with a FRESH checkpoint against the same index re-counts
        from 0, and a bare batch-id self-exclusion would wrongly exclude
        the previous run's batch-0 rows and leak their duplicates. The
        run-scoped tag must keep them visible."""
        idx = str(tmp_path / "idx")
        stream_fingerprint_index_init(spark, idx)
        fn_a = dedup_stream_sink(idx, str(tmp_path / "outA"), "runA")
        fn_a(_docs(spark, [(1, "aaa")]), 0)
        fn_b = dedup_stream_sink(idx, str(tmp_path / "outB"), "runB")
        fn_b(_docs(spark, [(7, "aaa"), (8, "fresh")]), 0)  # same batch id!
        got = {
            (r["doc_id"], r["n_copies"])
            for r in spark.read.parquet(str(tmp_path / "outB")).collect()
        }
        assert got == {(8, 1)}  # 7 blocked by runA's batch-0 row
        # and runA's sink partition was not clobbered by runB's batch 0
        got_a = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "outA")).collect()}
        assert got_a == {1}

    def test_batch_append_interop_keeps_tag_column(self, spark, tmp_path):
        """r12 review: a BATCH fingerprint_index_append into a stream
        index must backfill the src_batch column — otherwise schema
        inference could drop the tag column (killing self-exclusion) or a
        compact could strip it for good."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_fingerprint_index_init(spark, idx)
        fn = dedup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, "aaa")]), 0)
        DI.fingerprint_index_append(spark, idx, _docs(spark, [(2, "bbb")]))
        cols = spark.read.parquet(os.path.join(idx, "fingerprints")).columns
        assert "src_batch" in cols
        # the stream keeps working and the batch-appended row blocks
        fn(_docs(spark, [(3, "bbb"), (4, "ccc")]), 1)
        got = {(b, d) for b, d, _ in _sink_rows(spark, sink)}
        assert got == {(0, 1), (1, 4)}
        # compact preserves the tag column end-to-end
        assert DI.fingerprint_index_compact(spark, idx) == 1
        live = spark.read.parquet(os.path.join(idx, "fingerprints_g1"))
        assert "src_batch" in live.columns
        fn(_docs(spark, [(5, "aaa"), (6, "ddd")]), 2)
        got = {(b, d) for b, d, _ in _sink_rows(spark, sink)}
        assert got == {(0, 1), (1, 4), (2, 6)}


class TestInitLifecycle:
    def test_empty_seed_does_not_brick_index(self, spark, tmp_path):
        """r12 review: a seed_df with zero fingerprint rows (empty, or
        all-NULL text) used to emit no data files — the first probe died
        with UNABLE_TO_INFER_SCHEMA."""
        idx = str(tmp_path / "idx")
        stream_fingerprint_index_init(
            spark, idx, seed_df=_docs(spark, [(1, None), (2, None)])
        )
        fn = dedup_stream_sink(idx, str(tmp_path / "out"), "runA")
        fn(_docs(spark, [(10, "alive")]), 0)
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
        assert got == {10}

    def test_reinit_over_compacted_index_resets(self, spark, tmp_path):
        """r12 review: re-initializing a LIVE (possibly compacted) index
        must follow the rebuild lifecycle — the old flow wrote a dead
        gen-0 directory that probes never read, and the overwritten meta
        could pair a new n_buckets with the old generation's bucketing
        (silently leaking duplicates through the pruned probe)."""
        idx = str(tmp_path / "idx")
        sink1 = str(tmp_path / "out1")
        stream_fingerprint_index_init(spark, idx)
        fn = dedup_stream_sink(idx, sink1, "runA")
        fn(_docs(spark, [(1, "aaa")]), 0)
        DI.fingerprint_index_compact(spark, idx)  # generation 1
        # re-init with a DIFFERENT bucket count and a fresh seed
        stream_fingerprint_index_init(
            spark, idx, n_buckets=8, seed_df=_docs(spark, [(50, "bbb")])
        )
        fn2 = dedup_stream_sink(idx, str(tmp_path / "out2"), "runB")
        # 'aaa' belongs to the PREVIOUS life: it must survive again;
        # 'bbb' is seeded history: it must be blocked
        fn2(_docs(spark, [(60, "aaa"), (61, "bbb")]), 0)
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got == {60}

    def test_remote_checkpoint_requires_explicit_run_id(self, spark, tmp_path):
        import pytest as _pytest

        from flusher_spark.streaming.dedup_stream import run_stream_dedup as rsd

        src = tmp_path / "src"
        src.mkdir()
        stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
        with _pytest.raises(ValueError, match="remote URI"):
            rsd(stream, str(tmp_path / "idx"), str(tmp_path / "out"), "s3://bucket/ckpt")


# --------------------------------------------------------------------------
# Streaming NEAR-dup (MinHash twin) — r13
# --------------------------------------------------------------------------

from flusher_spark.streaming.dedup_stream import (  # noqa: E402
    neardup_stream_sink,
    run_stream_neardup,
    stream_minhash_index_init,
)

# ≥ shingle_n tokens each; identical texts agree 32/32 (est 1.0), disjoint
# vocabularies cannot clear the 0.5 gate (≥16 of 32 seeded minima equal).
T1 = "the quick brown fox jumps over the lazy dog"
T2 = "pack my box with five dozen liquor jugs today"
T3 = "sphinx of black quartz judge my vow tonight"
T4 = "how vexingly quick daft zebras jump around here"
T5 = "waltz bad nymph for quick jigs vex friends"
T6 = "crazy frederick bought many very exquisite opal jewels"


def _nd_rows(spark, sink):
    return {
        (r["batch_id"], r["doc_id"]) for r in spark.read.parquet(sink).collect()
    }


class TestNeardupStreamSink:
    """Direct foreachBatch-function tests (deterministic batch ids)."""

    def test_cross_batch_neardup_and_internal_collapse(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx)
        fn = neardup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, T1), (2, T2)]), 0)
        # 3 near-matches batch-0's survivor 1; 4/5 are an internal pair
        # (keep-min: 4 survives)
        fn(_docs(spark, [(3, T1), (4, T3), (5, T3)]), 1)
        # 6 matches a batch-1 SURVIVOR: proves survivors' sigs were indexed
        fn(_docs(spark, [(6, T3), (7, T4)]), 2)
        assert _nd_rows(spark, sink) == {(0, 1), (0, 2), (1, 4), (2, 7)}

    def test_retry_recomputes_identical_survivors(self, spark, tmp_path):
        """At-least-once: the same (df, batch_id) runs again AFTER its
        first attempt fully landed (survivors written AND sigs+bands
        appended). Self-exclusion must yield the identical survivor set —
        without it, the retry's batch-internal docs would 'match history'
        (their own first-attempt rows) and emit zero survivors."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx)
        fn = neardup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, T1)]), 0)
        b1 = _docs(spark, [(2, T2), (3, T1)])  # 3 near-dups history
        fn(b1, 1)
        first = _nd_rows(spark, sink)
        assert first == {(0, 1), (1, 2)}
        fn(b1, 1)  # retry
        assert _nd_rows(spark, sink) == first
        # duplicated index rows are harmless to later batches
        fn(_docs(spark, [(4, T2), (5, T5)]), 2)
        assert _nd_rows(spark, sink) == first | {(2, 5)}

    def test_unsigned_docs_pass_through(self, spark, tmp_path):
        """NULL-text and too-short docs produce no signature, can never
        near-match, and must SURVIVE (the exact sink's NULL-is-unique
        policy, near-dup form) without landing in the index."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx)
        fn = neardup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, None), (2, "two tokens"), (3, T1)]), 0)
        assert _nd_rows(spark, sink) == {(0, 1), (0, 2), (0, 3)}
        sigs = spark.read.parquet(os.path.join(idx, "sigs"))
        assert {r["doc_id"] for r in sigs.collect()} == {3}

    def test_fresh_run_reused_batch_ids_still_dedup(self, spark, tmp_path):
        """Batch ids restart at 0 on a fresh checkpoint — the run-scoped
        tag must keep the previous run's batch-0 rows visible."""
        idx = str(tmp_path / "idx")
        stream_minhash_index_init(spark, idx)
        fn_a = neardup_stream_sink(idx, str(tmp_path / "outA"), "runA")
        fn_a(_docs(spark, [(1, T1)]), 0)
        fn_b = neardup_stream_sink(idx, str(tmp_path / "outB"), "runB")
        fn_b(_docs(spark, [(7, T1), (8, T6)]), 0)  # same batch id!
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "outB")).collect()}
        assert got == {8}  # 7 blocked by runA's batch-0 rows
        got_a = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "outA")).collect()}
        assert got_a == {1}

    def test_delete_compact_interop(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx, seed_df=_docs(spark, [(100, T1)]))
        fn = neardup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, T1), (2, T2)]), 0)  # 1 near-dups the seed
        assert _nd_rows(spark, sink) == {(0, 2)}
        # batch probe (no exclusion) answers from the stream-built index
        pairs = DI.minhash_index_probe(spark, idx, _docs(spark, [(10, T2)]))
        assert {r["doc_hist"] for r in pairs.collect()} == {2}
        # tombstone the seed: it stops attracting immediately
        DI.minhash_index_delete(spark, idx, _docs(spark, [(100, "x")]).select("doc_id"))
        fn(_docs(spark, [(3, T1), (4, T5)]), 1)  # T1 no longer blocked
        assert _nd_rows(spark, sink) == {(0, 2), (1, 3), (1, 4)}
        # compact flips the generation; tag column survives; stream continues
        assert DI.minhash_index_compact(spark, idx) == 1
        sigs = spark.read.parquet(os.path.join(idx, "sigs_g1"))
        assert "src_batch" in sigs.columns
        assert {r["doc_id"] for r in sigs.collect()} == {2, 3, 4}
        fn(_docs(spark, [(5, T5), (6, T6)]), 2)  # 5 near-dups survivor 4
        assert _nd_rows(spark, sink) == {(0, 2), (1, 3), (1, 4), (2, 6)}

    def test_batch_append_interop_keeps_tag_column(self, spark, tmp_path):
        """A BATCH minhash_index_append into a stream index must backfill
        src_batch on BOTH tables (sigs + bands) — otherwise schema
        inference could drop the tag column and kill self-exclusion."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx)
        fn = neardup_stream_sink(idx, sink, "runA")
        fn(_docs(spark, [(1, T1)]), 0)
        DI.minhash_index_append(spark, idx, _docs(spark, [(2, T2)]))
        for tbl in ("sigs", "bands"):
            assert "src_batch" in spark.read.parquet(os.path.join(idx, tbl)).columns
        # the batch-appended doc blocks its near-dups in the stream
        fn(_docs(spark, [(3, T2), (4, T4)]), 1)
        assert _nd_rows(spark, sink) == {(0, 1), (1, 4)}


class TestNeardupStreamEndToEnd:
    def test_file_stream_availablenow_and_restart(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        stream_minhash_index_init(spark, idx)
        batches = [
            [(1, T1), (2, T2)],
            [(3, T1), (4, T3)],  # 3 near-dups batch-0
            [(5, T3), (6, T4)],  # 5 near-dups batch-1's survivor
        ]
        now = time.time()
        for i, rows in enumerate(batches):
            staged = str(tmp_path / f"stage{i}")
            _docs(spark, rows).coalesce(1).write.parquet(staged)
            part = next(n for n in os.listdir(staged) if n.endswith(".parquet"))
            dst = str(src / f"b{i}.parquet")
            os.rename(os.path.join(staged, part), dst)
            os.utime(dst, (now + i, now + i))
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_stream_neardup(stream, idx, sink, str(tmp_path / "ckpt"))
        q.awaitTermination()
        survivors = {d for _, d in _nd_rows(spark, sink)}
        assert survivors == {1, 2, 4, 6}
        # restart with a NEW checkpoint, same index: re-sent near-dup caught
        src2 = tmp_path / "src2"
        src2.mkdir()
        staged2 = str(tmp_path / "stage_restart")
        _docs(spark, [(7, T4), (8, T5)]).coalesce(1).write.parquet(staged2)
        part2 = next(n for n in os.listdir(staged2) if n.endswith(".parquet"))
        os.rename(os.path.join(staged2, part2), str(src2 / "b0.parquet"))
        stream2 = spark.readStream.schema("doc_id long, text string").parquet(str(src2))
        q2 = run_stream_neardup(
            stream2, idx, str(tmp_path / "out2"), str(tmp_path / "ckpt2")
        )
        q2.awaitTermination()
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got == {8}


# --------------------------------------------------------------------------
# Streaming SEMANTIC dedup (IVF twin) — r14
# --------------------------------------------------------------------------

from flusher_spark.operators import similarity as S  # noqa: E402
from flusher_spark.streaming.dedup_stream import (  # noqa: E402
    run_stream_semantic,
    semantic_stream_sink,
    stream_ivf_index_init,
)

# 4-dim unit-ish vectors: identical vectors agree at cosine 1.0, orthogonal
# ones at 0.0 — far on either side of the 0.95 test threshold. n_lists=2 with
# n_probe=2 probes EVERY list, so the IVF approximation can never miss a pair
# in these tests and every assertion is deterministic.
V1 = [1.0, 0.0, 0.0, 0.0]
V2 = [0.0, 1.0, 0.0, 0.0]
V3 = [0.0, 0.0, 1.0, 0.0]
V4 = [0.0, 0.0, 0.0, 1.0]
V3B = [0.0, 0.01, 1.0, 0.0]  # cosine(V3, V3B) ≈ 0.99995 ≥ 0.95
V5 = [1.0, 1.0, 0.0, 0.0]  # cosine(V1, V5) ≈ 0.707 < 0.95


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _sem_init(spark, path, seed_rows=None):
    """Index over the 4-dim test space: 2 lists, trained on the axes."""
    train = _vecs(spark, [(900, V1), (901, V2), (902, V3), (903, V4)])
    seed = _vecs(spark, seed_rows) if seed_rows is not None else None
    return stream_ivf_index_init(
        spark, path, n_lists=2, n_iter=1, seed_df=seed, train_df=train
    )


def _sem_sink(idx, sink, run_id):
    return semantic_stream_sink(idx, sink, run_id, threshold=0.95, n_probe=2)


def _sem_rows(spark, sink):
    return {
        (r["batch_id"], r["vec_id"]) for r in spark.read.parquet(sink).collect()
    }


class TestSemanticStreamSink:
    """Direct foreachBatch-function tests (deterministic batch ids)."""

    def test_cross_batch_semantic_and_internal_collapse(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        fn = _sem_sink(idx, sink, "runA")
        fn(_vecs(spark, [(1, V1), (2, V2)]), 0)
        # 3 near-matches batch-0's survivor 1; 4/5 are an internal pair
        # (keep-min: 4 survives)
        fn(_vecs(spark, [(3, V1), (4, V3), (5, V3B)]), 1)
        # 6 matches a batch-1 SURVIVOR: proves survivors' vectors were
        # indexed; 7 is below threshold vs everything
        fn(_vecs(spark, [(6, V3), (7, V5)]), 2)
        assert _sem_rows(spark, sink) == {(0, 1), (0, 2), (1, 4), (2, 7)}

    def test_retry_recomputes_identical_survivors(self, spark, tmp_path):
        """At-least-once: the same (df, batch_id) runs again AFTER its
        first attempt fully landed (survivors written AND vectors
        appended). Self-exclusion must yield the identical survivor set —
        without it, the retry's docs would 'match history' (their own
        first-attempt rows) and emit zero survivors."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        fn = _sem_sink(idx, sink, "runA")
        fn(_vecs(spark, [(1, V1)]), 0)
        b1 = _vecs(spark, [(2, V2), (3, V1)])  # 3 near-dups history
        fn(b1, 1)
        first = _sem_rows(spark, sink)
        assert first == {(0, 1), (1, 2)}
        fn(b1, 1)  # retry
        assert _sem_rows(spark, sink) == first
        # duplicated index rows are harmless to later batches
        fn(_vecs(spark, [(4, V2), (5, V4)]), 2)
        assert _sem_rows(spark, sink) == first | {(2, 5)}

    def test_null_embeddings_pass_through(self, spark, tmp_path):
        """NULL embeddings can never clear the threshold: they SURVIVE
        (the unsigned-doc policy of the text sinks) without landing in
        the index."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        fn = _sem_sink(idx, sink, "runA")
        fn(_vecs(spark, [(1, None), (2, V1)]), 0)
        assert _sem_rows(spark, sink) == {(0, 1), (0, 2)}
        stored = spark.read.parquet(os.path.join(idx, "vectors"))
        assert {r["vec_id"] for r in stored.collect()} == {2}

    def test_fresh_run_reused_batch_ids_still_dedup(self, spark, tmp_path):
        """Batch ids restart at 0 on a fresh checkpoint — the run-scoped
        tag must keep the previous run's batch-0 rows visible."""
        idx = str(tmp_path / "idx")
        _sem_init(spark, idx)
        fn_a = _sem_sink(idx, str(tmp_path / "outA"), "runA")
        fn_a(_vecs(spark, [(1, V1)]), 0)
        fn_b = _sem_sink(idx, str(tmp_path / "outB"), "runB")
        fn_b(_vecs(spark, [(7, V1), (8, V4)]), 0)  # same batch id!
        got = {r["vec_id"] for r in spark.read.parquet(str(tmp_path / "outB")).collect()}
        assert got == {8}  # 7 blocked by runA's batch-0 rows
        got_a = {r["vec_id"] for r in spark.read.parquet(str(tmp_path / "outA")).collect()}
        assert got_a == {1}

    def test_delete_compact_interop(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx, seed_rows=[(100, V1)])
        fn = _sem_sink(idx, sink, "runA")
        fn(_vecs(spark, [(1, V1), (2, V2)]), 0)  # 1 near-dups the seed
        assert _sem_rows(spark, sink) == {(0, 2)}
        # batch query (ivf_query_index) answers from the stream-built index
        hits = S.ivf_query_index(
            spark, idx, _vecs(spark, [(10, V2)]), k=1, n_probe=2
        )
        assert {r["vec_id"] for r in hits.collect()} == {2}
        # tombstone the seed: it stops attracting immediately
        S.ivf_delete_index(spark, idx, _vecs(spark, [(100, V1)]).select("vec_id"))
        fn(_vecs(spark, [(3, V1), (4, V3)]), 1)  # V1 no longer blocked
        assert _sem_rows(spark, sink) == {(0, 2), (1, 3), (1, 4)}
        # compact flips the generation; tag column survives; retry
        # duplicates collapse physically; stream continues
        assert S.ivf_compact_index(spark, idx) == 1
        live = spark.read.parquet(os.path.join(idx, "vectors_g1"))
        assert "src_batch" in live.columns
        assert {r["vec_id"] for r in live.collect()} == {2, 3, 4}
        fn(_vecs(spark, [(5, V3), (6, V5)]), 2)  # 5 near-dups survivor 4
        assert _sem_rows(spark, sink) == {(0, 2), (1, 3), (1, 4), (2, 6)}

    def test_compact_collapses_retry_duplicates(self, spark, tmp_path):
        """ivf_compact_index must physically collapse the identical rows a
        retried micro-batch appended twice (the fingerprint_index_compact
        discipline) — without it they'd survive every compact forever."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        fn = _sem_sink(idx, sink, "runA")
        b0 = _vecs(spark, [(1, V1), (2, V2)])
        fn(b0, 0)
        fn(b0, 0)  # retry: appends the identical survivor rows again
        stored = spark.read.parquet(os.path.join(idx, "vectors"))
        assert stored.count() == 4  # duplicated, self-excluded, harmless
        S.ivf_compact_index(spark, idx)
        live = spark.read.parquet(os.path.join(idx, "vectors_g1"))
        assert live.count() == 2  # physically collapsed
        assert {r["vec_id"] for r in live.collect()} == {1, 2}

    def test_batch_append_interop_keeps_tag_column(self, spark, tmp_path):
        """A BATCH ivf_append_index into a stream index must backfill
        src_batch — otherwise schema inference could drop the tag column
        and kill self-exclusion."""
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        fn = _sem_sink(idx, sink, "runA")
        fn(_vecs(spark, [(1, V1)]), 0)
        S.ivf_append_index(spark, idx, _vecs(spark, [(2, V2)]))
        assert "src_batch" in spark.read.parquet(os.path.join(idx, "vectors")).columns
        # the batch-appended vector blocks its near-dups in the stream
        fn(_vecs(spark, [(3, V2), (4, V3)]), 1)
        assert _sem_rows(spark, sink) == {(0, 1), (1, 4)}

    def test_init_requires_training_vectors(self, spark, tmp_path):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="train"):
            stream_ivf_index_init(spark, str(tmp_path / "idx"))

    def test_untagged_index_rejected(self, spark, tmp_path):
        """A sink pointed at a BATCH-built index (no src_batch column)
        must fail loudly, not silently skip self-exclusion."""
        import pytest as _pytest

        idx = str(tmp_path / "idx")
        S.ivf_build_index(_vecs(spark, [(1, V1), (2, V2)]), idx, n_lists=2)
        fn = _sem_sink(idx, str(tmp_path / "out"), "runA")
        with _pytest.raises(ValueError, match="src_batch"):
            fn(_vecs(spark, [(3, V3)]), 0)


class TestSemanticStreamEndToEnd:
    def test_file_stream_availablenow_and_restart(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        idx = str(tmp_path / "idx")
        sink = str(tmp_path / "out")
        _sem_init(spark, idx)
        batches = [
            [(1, V1), (2, V2)],
            [(3, V1), (4, V3)],  # 3 near-dups batch-0
            [(5, V3), (6, V4)],  # 5 near-dups batch-1's survivor
        ]
        now = time.time()
        for i, rows in enumerate(batches):
            staged = str(tmp_path / f"stage{i}")
            _vecs(spark, rows).coalesce(1).write.parquet(staged)
            part = next(n for n in os.listdir(staged) if n.endswith(".parquet"))
            dst = str(src / f"b{i}.parquet")
            os.rename(os.path.join(staged, part), dst)
            os.utime(dst, (now + i, now + i))
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
        )
        q = run_stream_semantic(
            stream, idx, sink, str(tmp_path / "ckpt"), threshold=0.95, n_probe=2
        )
        q.awaitTermination()
        survivors = {d for _, d in _sem_rows(spark, sink)}
        assert survivors == {1, 2, 4, 6}
        # restart with a NEW checkpoint, same index: re-sent near-dup caught
        src2 = tmp_path / "src2"
        src2.mkdir()
        staged2 = str(tmp_path / "stage_restart")
        _vecs(spark, [(7, V4), (8, V5)]).coalesce(1).write.parquet(staged2)
        part2 = next(n for n in os.listdir(staged2) if n.endswith(".parquet"))
        os.rename(os.path.join(staged2, part2), str(src2 / "b0.parquet"))
        stream2 = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .parquet(str(src2))
        )
        q2 = run_stream_semantic(
            stream2, idx, str(tmp_path / "out2"), str(tmp_path / "ckpt2"),
            threshold=0.95, n_probe=2,
        )
        q2.awaitTermination()
        got = {r["vec_id"] for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got == {8}


class TestThresholdUnification:
    def test_sink_cut_frozen_by_cluster_meta(self, spark, tmp_path):
        """r13 verdict item 5: when the index has a bootstrapped cluster
        layer, the sink reads the FROZEN integer agreement cut from
        clusters/meta — a sink-vs-cluster threshold divergence is
        impossible by construction. Proven behaviorally: measure the real
        agreement of a partial-overlap pair, freeze the cluster cut ABOVE
        it, hand the sink a threshold BELOW it — if the sink honored its
        own argument the doc would drop; honoring the frozen cut it must
        SURVIVE."""
        # A partial-overlap pair whose MEASURED agreement is strictly
        # between 0 and 1 AND which LSH-collides in at least one band: the
        # hash family is seeded, so search a few overlap levels and take
        # the first that qualifies (deterministic per codebase).
        toks = [f"w{i}" for i in range(24)]
        ta = " ".join(toks)
        idx = str(tmp_path / "idx")
        stream_minhash_index_init(spark, idx, seed_df=_docs(spark, [(1, ta)]))
        a = None
        for n_repl in (1, 2, 3, 4, 6, 8):
            tb = " ".join(toks[:-n_repl] + [f"x{i}" for i in range(n_repl)])
            probe = DI.minhash_index_probe(
                spark, idx, _docs(spark, [(2, tb)]), threshold=0.0
            ).collect()
            if len(probe) == 1 and 0.0 < probe[0]["est_jaccard"] < 1.0:
                a = probe[0]["est_jaccard"]
                break
        assert a is not None, "no overlap level produced a measurable pair"
        m = DI._read_meta(spark, idx)
        # freeze the cluster cut just ABOVE the measured agreement
        frozen_thr = min(a + 1.5 / m["num_perm"], 1.0)
        DI.minhash_cluster_bootstrap(spark, idx, threshold=frozen_thr)
        frozen = DI._read_meta(spark, os.path.join(idx, "clusters"))["min_agree"]
        assert frozen > round(a * m["num_perm"])
        # sink argument BELOW the measured agreement: must be ignored
        fn = neardup_stream_sink(idx, str(tmp_path / "out"), "runA", threshold=a / 2)
        fn(_docs(spark, [(2, tb)]), 0)
        got = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
        assert got == {2}  # survived: the frozen cut governed
        # control: an identical index WITHOUT a cluster layer uses the
        # argument (fallback path) and drops the doc
        idx2 = str(tmp_path / "idx2")
        stream_minhash_index_init(spark, idx2, seed_df=_docs(spark, [(1, ta)]))
        fn2 = neardup_stream_sink(idx2, str(tmp_path / "out2"), "runA", threshold=a / 2)
        fn2(_docs(spark, [(2, tb)]), 0)
        got2 = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out2")).collect()}
        assert got2 == set()  # dropped: the argument governed

    def test_batch_helper_matches_stream_sink(self, spark, tmp_path):
        """minhash_index_dedup (the batch survivor rule) computes the
        IDENTICAL set the streaming sink writes for the same index+batch —
        the reference-equality guard that keeps the two survivor-rule
        call sites from drifting."""
        idx = str(tmp_path / "idx")
        stream_minhash_index_init(
            spark, idx, seed_df=_docs(spark, [(100, T1), (101, T2)])
        )
        batch = _docs(
            spark,
            [(1, T1), (2, T3), (3, T3), (4, T4), (5, None), (6, "too short")],
        )
        # helper first: it is read-only, the sink appends
        helper = {r["doc_id"] for r in DI.minhash_index_dedup(spark, idx, batch).collect()}
        fn = neardup_stream_sink(idx, str(tmp_path / "out"), "runA")
        fn(batch, 0)
        sink = {r["doc_id"] for r in spark.read.parquet(str(tmp_path / "out")).collect()}
        assert helper == sink == {2, 4, 5, 6}
