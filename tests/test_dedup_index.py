"""Incremental dedup against a persisted fingerprint index
(operators/dedup_index.py).

The load-bearing contracts:
- probe correctness vs a recompute-everything twin (exact) and a
  hand-checked synthetic corpus (minhash);
- the probe NEVER rescans historical text — asserted on the executed plan's
  input files, not just by API shape;
- append-only growth: a second batch's fingerprints join the layout without
  rewriting any existing file, and later probes see both generations;
- parameter integrity: probe/append read the permutation family from the
  index meta, so an index built with one family answers with that family.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from flusher_spark.operators import dedup as D
from flusher_spark.operators import dedup_index as DI

from tests.conftest import SF_DIR


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


HIST = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "  The   QUICK brown fox jumps over the lazy dog  "),  # dup of 1 (normalized)
    (4, None),
]
BATCH = [
    (10, "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),  # dup of hist 1
    (11, "sphinx of black quartz judge my vow"),  # new
    (12, "sphinx of black quartz judge my vow"),  # batch-internal dup of 11
    (13, None),  # NULL text: unique by policy
    (14, None),  # NULL text: unique by policy
]


class TestFingerprintIndex:
    def test_probe_matches_recompute_twin(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        got = {
            (r["doc_id"], r["n_copies"])
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        # hist dup 10 is gone; 11/12 collapse to min id 11 with 2 copies;
        # NULL-text docs each survive alone.
        assert got == {(11, 2), (13, 1), (14, 1)}

    def test_probe_never_reads_historical_text(self, spark, tmp_path):
        hist_dir = str(tmp_path / "hist")
        batch_dir = str(tmp_path / "batch")
        _docs(spark, HIST).write.parquet(hist_dir)
        _docs(spark, BATCH).write.parquet(batch_dir)
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(spark.read.parquet(hist_dir), path)
        probe = DI.fingerprint_index_probe(spark, path, spark.read.parquet(batch_dir))
        files = probe.inputFiles()
        assert any(f"fpidx{os.sep}fingerprints" in f for f in files), files
        assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files

    def test_append_grows_without_rewriting(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        fp_root = os.path.join(path, "fingerprints")

        def _data_files():
            out = {}
            for root, _, names in os.walk(fp_root):
                for n in names:
                    if n.endswith(".parquet"):
                        p = os.path.join(root, n)
                        out[p] = os.stat(p).st_mtime_ns
            return out

        before = _data_files()
        survivors = [(11, "sphinx of black quartz judge my vow")]
        DI.fingerprint_index_append(spark, path, _docs(spark, survivors))
        after = _data_files()
        # Append-only: every pre-existing file still there, byte-identical
        # mtime; new files only added.
        for p, m in before.items():
            assert after.get(p) == m, f"rewritten: {p}"
        assert len(after) > len(before)
        # A third batch duplicating the appended survivor is now caught.
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(
                spark, path, _docs(spark, [(20, "Sphinx of black quartz judge my vow")])
            ).collect()
        }
        assert got == set()

    def test_prune_matches_unpruned(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path, n_buckets=8)
        batch = _docs(spark, BATCH)
        pruned = {
            tuple(r) for r in DI.fingerprint_index_probe(spark, path, batch, prune=True).collect()
        }
        full = {
            tuple(r) for r in DI.fingerprint_index_probe(spark, path, batch, prune=False).collect()
        }
        assert pruned == full


# Synthetic near-dup corpus: batch doc 10 is IDENTICAL to hist 1 (sig
# agreement exactly 1.0 — every band collides, capture guaranteed); batch 11
# shares no 3-gram with history (agreement ~0); batch 12 is a heavy overlap
# of hist 2 (most shingles shared).
_BASE = " ".join(f"w{i}" for i in range(60))
_NEAR = " ".join(f"w{i}" for i in range(58)) + " x1 x2"
MH_HIST = [(1, _BASE), (2, "alpha beta gamma delta epsilon zeta eta theta " * 6)]
MH_BATCH = [
    (10, _BASE),
    (11, "completely different tokens entirely unrelated content here now " * 5),
    (12, _NEAR),
]


class TestMinhashIndex:
    def test_probe_identical_and_near_docs(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        rows = DI.minhash_index_probe(
            spark, path, _docs(spark, MH_BATCH), threshold=0.5
        ).collect()
        by_pair = {(r["doc_new"], r["doc_hist"]): r["est_jaccard"] for r in rows}
        assert by_pair[(10, 1)] == 1.0  # identical text: exact signature match
        assert (12, 1) in by_pair and by_pair[(12, 1)] >= 0.5  # heavy overlap
        assert not any(n == 11 for n, _ in by_pair)  # unrelated doc: no pair

    def test_probe_never_reads_historical_text(self, spark, tmp_path):
        hist_dir = str(tmp_path / "hist")
        batch_dir = str(tmp_path / "batch")
        _docs(spark, MH_HIST).write.parquet(hist_dir)
        _docs(spark, MH_BATCH).write.parquet(batch_dir)
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(spark.read.parquet(hist_dir), path)
        probe = DI.minhash_index_probe(spark, path, spark.read.parquet(batch_dir))
        files = probe.inputFiles()
        assert any(f"mhidx{os.sep}bands" in f for f in files), files
        assert any(f"mhidx{os.sep}sigs" in f for f in files), files
        assert not any(f"{os.sep}hist{os.sep}" in f for f in files), files

    def test_append_then_probe_sees_both_generations(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        DI.minhash_index_append(spark, path, _docs(spark, [(3, _NEAR)]))
        rows = DI.minhash_index_probe(spark, path, _docs(spark, [(20, _NEAR)])).collect()
        hits = {r["doc_hist"]: r["est_jaccard"] for r in rows}
        assert hits[3] == 1.0  # identical to the APPENDED doc
        assert 1 in hits  # near-dup of the ORIGINAL build's doc

    def test_probe_uses_stored_params_not_defaults(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(
            _docs(spark, MH_HIST), path, num_perm=16, bands=4, shingle_n=2, seed=7
        )
        # A probe must answer with the STORED family: identical text still
        # agrees exactly 1.0 — possible only if the probe recomputed with
        # num_perm=16/seed=7, since signatures from the default family would
        # share no minima positions.
        rows = DI.minhash_index_probe(spark, path, _docs(spark, [(10, _BASE)])).collect()
        assert {(r["doc_new"], r["doc_hist"], r["est_jaccard"]) for r in rows} == {(10, 1, 1.0)}

    def test_estimate_tracks_exact_jaccard_on_fixture(self, spark, tmp_path):
        """Cross-check against the batch operator over the union corpus:
        every probe pair with near-certain agreement (est ≥ 0.9) must be a
        real near-dup pair under the EXACT shingle-Jaccard verification of
        dedup.minhash_lsh_pairs at a loose 0.3 gate (est 0.9 = 29/32 minima
        agree — exact J below 0.3 at that agreement is impossible on any
        corpus small enough that all bands survive the bucket cap)."""
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        hist = docs.where(F.col("doc_id") % 2 == 0)
        batch = docs.where(F.col("doc_id") % 2 == 1)
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(hist, path)
        probe = DI.minhash_index_probe(spark, path, batch, threshold=0.9).collect()
        exact = {
            (min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
            for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()
        }
        for r in probe:
            pair = (min(r["doc_new"], r["doc_hist"]), max(r["doc_new"], r["doc_hist"]))
            assert pair in exact, (pair, r["est_jaccard"])

    def test_build_rejects_bad_band_split(self, spark, tmp_path):
        with pytest.raises(ValueError, match="multiple of bands"):
            DI.minhash_index_build(
                _docs(spark, MH_HIST), str(tmp_path / "bad"), num_perm=32, bands=5
            )

    def test_probe_idempotent_after_repair_rerun(self, spark, tmp_path):
        """The documented torn-append recovery is 're-run the same append' —
        but if the prior append had in fact COMPLETED both writes, the
        re-run leaves every doc of that batch with duplicate sigs/bands
        rows. The probe must still emit each (doc_new, doc_hist) pair once
        (r12 / ADVICE: duplicated sig_hist rows doubled the output)."""
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        batch2 = _docs(spark, [(3, _NEAR)])
        DI.minhash_index_append(spark, path, batch2)
        DI.minhash_index_append(spark, path, batch2)  # repair re-run (no-op tear)
        rows = DI.minhash_index_probe(spark, path, _docs(spark, [(20, _NEAR)])).collect()
        pairs = [(r["doc_new"], r["doc_hist"]) for r in rows]
        assert len(pairs) == len(set(pairs)), f"duplicated pairs: {pairs}"
        assert (20, 3) in set(pairs)

    def test_torn_append_detected(self, spark, tmp_path):
        """A crash between append's two writes (bands committed, sigs not)
        must fail the next probe LOUDLY, not silently drop the torn docs'
        pairs — the write order in minhash_index_append exists for this."""
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        m = DI._read_meta(spark, path)
        # Simulate the tear: band rows for a new doc land, signatures don't.
        sig = DI._signature_rows(_docs(spark, [(3, _NEAR)]), "text", "doc_id",
                                 m["num_perm"], m["shingle_n"], m["seed"])
        DI._band_rows(sig, m["num_perm"], m["bands"], m["n_buckets"]).write.mode(
            "append"
        ).partitionBy("lsh_bucket").parquet(os.path.join(path, "bands"))
        probe = DI.minhash_index_probe(spark, path, _docs(spark, [(20, _NEAR)]))
        with pytest.raises(Exception, match="torn"):
            probe.collect()


def _w(lo, hi):
    return " ".join(f"w{i}" for i in range(lo, hi))


# Three text families for the cluster tests: A and C share a token window
# (3-gram Jaccard 0.318 — BELOW the 0.5 gate, so they stay separate until a
# bridge doc overlapping both arrives); B is token-disjoint from everything.
_FAM_A = _w(0, 60)
_FAM_C = _w(30, 90)
_BRIDGE_AC = _w(5, 85)  # 3-gram Jaccard ~0.64 with BOTH A and C
_FAM_B = "alpha beta gamma delta epsilon zeta eta theta " * 6
_FAM_D = "omicron sigma tau upsilon phi chi psi omega " * 6


#: The TestMinhashClusters bootstrap corpus — built ONCE per session into a
#: master directory and copytree'd per test: every test mutates its own copy
#: (appends/deletes), but the bootstrap input and labels are identical, and
#: the build+bootstrap pair costs ~6 s of Spark jobs per test (measured r15;
#: 5 tests × 6 s was pure duplication).
_MHC_CORPUS = [
    (1, _FAM_A), (2, _FAM_A),   # cluster {1,2} -> 1
    (5, _FAM_C), (6, _FAM_C),   # cluster {5,6} -> 5
    (7, _FAM_B), (8, _FAM_B),   # cluster {7,8} -> 7
    (9, "one of a kind document with its own tokens"),
]


@pytest.fixture(scope="session")
def mhc_master(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mhc_master") / "mhc")
    DI.minhash_index_build(_docs(spark, _MHC_CORPUS), path)
    DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
    return path


class TestMinhashClusters:
    def _bootstrap(self, spark, tmp_path, master=None):
        path = str(tmp_path / "mhc")
        if master is None:
            DI.minhash_index_build(_docs(spark, _MHC_CORPUS), path)
            DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        else:
            shutil.copytree(master, path)
        return path, list(_MHC_CORPUS)

    @staticmethod
    def _labels(spark, path):
        return {
            r["doc_id"]: r["cluster_id"]
            for r in DI.minhash_cluster_labels(spark, path).collect()
        }

    @staticmethod
    def _from_scratch(spark, docs_rows, scratch):
        """The from-scratch twin: same criterion (band candidates + integer
        signature-agreement gate + min-label propagation) over the UNION
        corpus, via a fresh build+bootstrap."""
        p = str(scratch)
        DI.minhash_index_build(_docs(spark, docs_rows), p)
        DI.minhash_cluster_bootstrap(spark, p, threshold=0.5)
        return TestMinhashClusters._labels(spark, p)

    def test_bootstrap_labels_min_member(self, spark, tmp_path, mhc_master):
        path, _ = self._bootstrap(spark, tmp_path, mhc_master)
        assert self._labels(spark, path) == {
            1: 1, 2: 1, 5: 5, 6: 5, 7: 7, 8: 7, 9: 9
        }

    def test_append_extends_without_relabeling_untouched(self, spark, tmp_path, mhc_master):
        path, corpus = self._bootstrap(spark, tmp_path, mhc_master)
        base_dir = os.path.join(path, "clusters", "base")

        def _base_files():
            out = {}
            for root, _dirs, names in os.walk(base_dir):
                for n in names:
                    if n.endswith(".parquet"):
                        st = os.stat(os.path.join(root, n))
                        out[os.path.join(root, n)] = (st.st_size, st.st_mtime_ns)
            return out

        before = _base_files()
        batch1 = [(11, _FAM_A), (12, _FAM_D), (13, _FAM_D), (14, "another unique one")]
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in DI.minhash_cluster_append(spark, path, _docs(spark, batch1)).collect()
        }
        # new doc joins the existing cluster's STABLE id; new family gets a
        # new min-id cluster; the singleton labels itself
        assert got == {11: 1, 12: 12, 13: 12, 14: 14}
        after = _base_files()
        for p, stamp in before.items():
            assert after[p] == stamp, f"pre-append base file rewritten: {p}"
        labels = self._labels(spark, path)
        assert labels[5] == 5 and labels[7] == 7, "untouched clusters relabeled"
        # and the whole table equals the from-scratch twin on the union
        assert labels == self._from_scratch(
            spark, corpus + batch1, tmp_path / "scratch1"
        )

    def test_bridge_merges_clusters_through_ledger(self, spark, tmp_path, mhc_master):
        path, corpus = self._bootstrap(spark, tmp_path, mhc_master)
        batch1 = [(22, _BRIDGE_AC), (23, _FAM_B)]
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in DI.minhash_cluster_append(spark, path, _docs(spark, batch1)).collect()
        }
        assert got == {22: 1, 23: 7}
        labels = self._labels(spark, path)
        # clusters {1,2} and {5,6} merged under the surviving min id 1;
        # {7,8} extended in place; 9 untouched
        assert labels == {1: 1, 2: 1, 5: 1, 6: 1, 22: 1, 7: 7, 8: 7, 23: 7, 9: 9}
        remap = {
            (r["old_id"], r["new_id"])
            for r in spark.read.parquet(
                os.path.join(path, "clusters", "remap")
            ).collect()
        }
        assert remap == {(5, 1)}
        assert labels == self._from_scratch(
            spark, corpus + batch1, tmp_path / "scratch2"
        )

    def test_ledger_path_compression_across_appends(self, spark, tmp_path, mhc_master):
        """A merge of a prior merge's WINNER must rewrite the old ledger rows
        (stored new_ids stay canonical — reads resolve in one join, never a
        chain)."""
        path, corpus = self._bootstrap(spark, tmp_path, mhc_master)
        b1 = [(22, _BRIDGE_AC)]              # merges {5,6} into 1
        DI.minhash_cluster_append(spark, path, _docs(spark, b1))
        b2 = [(0, _FAM_A)]                   # id 0 < 1: cluster 1 relabels to 0
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in DI.minhash_cluster_append(spark, path, _docs(spark, b2)).collect()
        }
        assert got == {0: 0}
        remap = {
            (r["old_id"], r["new_id"])
            for r in spark.read.parquet(
                os.path.join(path, "clusters", "remap")
            ).collect()
        }
        assert remap == {(5, 0), (1, 0)}, "old 5->1 row must follow the winner"
        olds = {o for o, _ in remap}
        news = {n for _, n in remap}
        assert not (olds & news), "ledger must stay chain-free"
        labels = self._labels(spark, path)
        assert labels == self._from_scratch(
            spark, corpus + b1 + b2, tmp_path / "scratch3"
        )

    def test_torn_cluster_append_recovers_by_rerun(self, spark, tmp_path, mhc_master):
        """Crash right after the FIRST write of a cluster append (band rows
        committed, remap/base/sigs not): a plain probe from another batch
        must still detect the tear loudly, but re-running the SAME append —
        the documented recovery — must complete (the probe verifies the
        crashed run's own band rows from the batch's recomputed signatures)
        and converge to the from-scratch labels."""
        path, corpus = self._bootstrap(spark, tmp_path, mhc_master)
        batch = [(11, _FAM_A), (12, _FAM_D), (13, _FAM_D)]
        m = DI._read_meta(spark, path)
        sig = DI._signature_rows(
            _docs(spark, batch), "text", "doc_id",
            m["num_perm"], m["shingle_n"], m["seed"],
        )
        DI._band_rows(sig, m["num_perm"], m["bands"], m["n_buckets"]).write.mode(
            "append"
        ).partitionBy("lsh_bucket").parquet(os.path.join(path, "bands"))
        with pytest.raises(Exception, match="torn"):
            DI.minhash_index_probe(spark, path, _docs(spark, [(30, _FAM_D)])).collect()
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in DI.minhash_cluster_append(spark, path, _docs(spark, batch)).collect()
        }
        assert got == {11: 1, 12: 12, 13: 12}
        assert self._labels(spark, path) == self._from_scratch(
            spark, corpus + batch, tmp_path / "scratch_torn"
        )

    def test_append_never_reads_historical_text(self, spark, tmp_path):
        """Like the probe test: the cluster append's executed plans must not
        touch the historical corpus parquet — only index tables + the batch."""
        hist_dir = str(tmp_path / "hist")
        batch_dir = str(tmp_path / "batch")
        _docs(spark, [(1, _FAM_A), (2, _FAM_A), (5, _FAM_C)]).write.parquet(hist_dir)
        _docs(spark, [(20, _FAM_A)]).write.parquet(batch_dir)
        path = str(tmp_path / "mhc")
        DI.minhash_index_build(spark.read.parquet(hist_dir), path)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        # strongest possible assertion: remove the historical text outright;
        # every append-side read must still succeed from index tables alone
        os.rename(hist_dir, hist_dir + ".gone")
        got = DI.minhash_cluster_append(
            spark, path, spark.read.parquet(batch_dir)
        ).collect()
        assert {(r["doc_id"], r["cluster_id"]) for r in got} == {(20, 1)}


def _ids(spark, *xs):
    return spark.createDataFrame([(x,) for x in xs], "doc_id long")


class TestFingerprintLifecycle:
    """Delete (tombstones) + compact (generation rewrite) for the exact
    index: a deleted doc stops blocking immediately, a shared fingerprint
    keeps blocking while ANY holder is live, compaction changes bytes but
    never probe answers, and a torn compact leaves a readable index."""

    def test_delete_unblocks_only_when_all_holders_gone(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        # hist 1 and 3 share one normalized fingerprint (batch 10's too).
        assert DI.fingerprint_index_delete(spark, path, _ids(spark, 1)) == 1
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 not in got  # doc 3 still holds the fingerprint
        assert DI.fingerprint_index_delete(spark, path, _ids(spark, 3)) == 1
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 in got  # every holder tombstoned: fingerprint unblocked
        # unknown ids tombstone no index rows
        assert DI.fingerprint_index_delete(spark, path, _ids(spark, 999)) == 0

    def test_compact_preserves_probe_and_flips_generation(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 1, 3))
        before = {
            tuple(r)
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert DI.fingerprint_index_compact(spark, path) == 1
        assert os.path.isdir(os.path.join(path, "fingerprints_g1"))
        assert not os.path.isdir(os.path.join(path, "fingerprints"))
        assert not os.path.isdir(os.path.join(path, "fp_tombstones"))
        after = {
            tuple(r)
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert before == after
        # physical removal: only hist 2 remains (NULL-text 4 never indexed)
        live = spark.read.parquet(os.path.join(path, "fingerprints_g1"))
        assert {r["doc_id"] for r in live.collect()} == {2}
        # appends keep working and land in the live generation
        DI.fingerprint_index_append(
            spark, path, _docs(spark, [(11, "sphinx of black quartz judge my vow")])
        )
        got = DI.fingerprint_index_probe(
            spark, path, _docs(spark, [(20, "Sphinx of black quartz judge my vow")])
        ).collect()
        assert got == []
        assert DI.fingerprint_index_compact(spark, path) == 2

    def test_torn_compact_leaves_readable_index(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 1, 3))
        before = {
            tuple(r)
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        # simulate a compact that crashed after writing the new generation
        # but BEFORE flipping the pointer: a garbage g1 directory exists
        spark.createDataFrame([], "doc_id long, fingerprint string, fp_bucket long").write.partitionBy(
            "fp_bucket"
        ).parquet(os.path.join(path, "fingerprints_g1"))
        assert DI._current_gen(path) == 0  # pointer untouched by the tear
        mid = {
            tuple(r)
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert mid == before  # readers still on the intact generation
        # a re-run compact reclaims the torn directory and completes
        assert DI.fingerprint_index_compact(spark, path) == 1
        after = {
            tuple(r)
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert after == before

    def test_rebuild_resets_lifecycle(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 1, 3))
        DI.fingerprint_index_compact(spark, path)
        # a rebuild lands in a NEW generation (never an in-place overwrite:
        # the old life and its tombstones stay live until the atomic flip)
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        assert DI._current_gen(path) == 2
        assert os.path.isdir(os.path.join(path, "fingerprints_g2"))
        assert not os.path.isdir(os.path.join(path, "fingerprints_g1"))
        assert not os.path.isdir(os.path.join(path, "fingerprints"))
        assert not any(
            n.startswith("fp_tombstones") for n in os.listdir(path)
        ), os.listdir(path)
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 not in got  # the rebuilt index blocks again

    def test_rebuild_pending_tombstones_never_leak(self, spark, tmp_path):
        """r12 review: tombstones are GENERATION-SCOPED — a rebuild with
        pending (uncompacted) deletes must not let the old life's
        tombstones subtract matching rows from the rebuilt index (the old
        in-place rebuild had a crash window doing exactly that; now the
        stale tombstone directory is out of scope the moment the pointer
        flips, deleted or not)."""
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 1, 3))
        DI.fingerprint_index_build(_docs(spark, HIST), path)  # no compact
        # simulate the cleanup never running (crash right after the flip):
        # resurrect a stale gen-0 tombstone directory and assert it is
        # IGNORED by probes at the live generation
        stale = _docs(spark, [(1, "x")]).selectExpr(
            "doc_id", "'dead' as fingerprint", "0 as fp_bucket"
        )
        stale.write.partitionBy("fp_bucket").parquet(
            os.path.join(path, "fp_tombstones")
        )
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 not in got  # rebuilt rows block; stale tombstones ignored

    def test_compact_all_tombstoned_stays_readable(self, spark, tmp_path):
        """r12 review: compacting an index whose EVERY row is tombstoned
        must not flip the pointer onto an unreadable empty directory."""
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 1, 2, 3))
        assert DI.fingerprint_index_compact(spark, path) == 1
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 in got  # everything unblocked, index fully functional
        # and the empty index accepts appends + blocks from them again
        DI.fingerprint_index_append(spark, path, _docs(spark, HIST))
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert 10 not in got


class TestMinhashLifecycle:
    def test_delete_stops_attracting(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        assert DI.minhash_index_delete(spark, path, _ids(spark, 1)) == 1
        rows = DI.minhash_index_probe(
            spark, path, _docs(spark, MH_BATCH), threshold=0.5
        ).collect()
        hists = {r["doc_hist"] for r in rows}
        assert 1 not in hists  # deleted doc attracts nothing

    def test_compact_preserves_probe_and_labels(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST + [(3, _BASE)]), path)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        # cluster {1, 3} -> 1; delete 1: labels exclude it immediately
        DI.minhash_index_delete(spark, path, _ids(spark, 1))
        labels_before = {
            (r["doc_id"], r["cluster_id"])
            for r in DI.minhash_cluster_labels(spark, path).collect()
        }
        assert labels_before == {(2, 2), (3, 1)}  # 3 keeps its (opaque) id
        probe_before = {
            (r["doc_new"], r["doc_hist"])
            for r in DI.minhash_index_probe(spark, path, _docs(spark, MH_BATCH)).collect()
        }
        assert not any(h == 1 for _, h in probe_before)
        assert DI.minhash_index_compact(spark, path) == 1
        assert not os.path.isdir(os.path.join(path, "mh_tombstones"))
        assert {
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(path, "sigs_g1")).collect()
        } == {2, 3}
        assert {
            (r["doc_new"], r["doc_hist"])
            for r in DI.minhash_index_probe(spark, path, _docs(spark, MH_BATCH)).collect()
        } == probe_before
        assert {
            (r["doc_id"], r["cluster_id"])
            for r in DI.minhash_cluster_labels(spark, path).collect()
        } == labels_before
        # the cluster layer keeps working against the new generation
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in DI.minhash_cluster_append(spark, path, _docs(spark, [(10, _BASE)])).collect()
        }
        assert got == {(10, 1)}  # joins survivor 3's cluster (opaque id 1)

    def test_compact_all_tombstoned_minhash(self, spark, tmp_path):
        """r12 review: the empty-rewrite hazard, MinHash side — sigs, bands
        and the cluster base must all stay readable when everything is
        deleted."""
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        DI.minhash_index_delete(spark, path, _ids(spark, 1, 2))
        assert DI.minhash_index_compact(spark, path) == 1
        rows = DI.minhash_index_probe(spark, path, _docs(spark, MH_BATCH)).collect()
        assert rows == []  # nothing left to attract, but fully functional
        assert DI.minhash_cluster_labels(spark, path).collect() == []
        # the emptied index accepts appends and attracts from them again
        DI.minhash_index_append(spark, path, _docs(spark, [(3, _BASE)]))
        rows = DI.minhash_index_probe(spark, path, _docs(spark, [(10, _BASE)])).collect()
        assert {(r["doc_new"], r["doc_hist"]) for r in rows} == {(10, 3)}

    def test_rebuild_clears_cluster_layer_loudly(self, spark, tmp_path):
        """r12 review: a rebuild must not let minhash_cluster_labels serve
        the PREVIOUS corpus's labels — the new generation has no base
        table, so label reads fail loudly until a fresh bootstrap."""
        path = str(tmp_path / "mhidx")
        DI.minhash_index_build(_docs(spark, MH_HIST), path)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        assert DI.minhash_cluster_labels(spark, path).count() == 2
        DI.minhash_index_build(_docs(spark, [(30, _BASE), (31, _BASE)]), path)
        with pytest.raises(Exception, match="PATH_NOT_FOUND|does not exist"):
            DI.minhash_cluster_labels(spark, path).collect()
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in DI.minhash_cluster_labels(spark, path).collect()
        }
        assert got == {(30, 30), (31, 30)}  # the NEW corpus only


class TestMetaGenerationScoping:
    """r13 (r12 ADVICE): meta is generation-scoped like the data tables, so
    the pointer flip publishes data AND parameters atomically — rebuilding
    in place with a different n_buckets has no window where old data pairs
    with new meta (which would silently break the probe's bucket prune)."""

    def test_rebuild_with_new_buckets_is_atomic(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path, n_buckets=4)
        assert os.path.isdir(os.path.join(path, "meta"))  # gen 0: bare name
        DI.fingerprint_index_build(_docs(spark, HIST), path, n_buckets=16)
        # gen 1 owns its meta; the old shared table is swept after the flip
        assert os.path.isdir(os.path.join(path, "meta_g1"))
        assert not os.path.isdir(os.path.join(path, "meta"))
        assert DI._read_meta(spark, path)["n_buckets"] == 16
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert got == {11, 13, 14}

    def test_compact_carries_meta_forward(self, spark, tmp_path):
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path, n_buckets=8)
        DI.fingerprint_index_delete(spark, path, _ids(spark, 2))
        gen = DI.fingerprint_index_compact(spark, path)
        assert gen == 1
        assert os.path.isdir(os.path.join(path, f"meta_g{gen}"))
        assert not os.path.isdir(os.path.join(path, "meta"))
        assert DI._read_meta(spark, path)["n_buckets"] == 8
        # the compacted index still answers probes with the carried params
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(spark, path, _docs(spark, BATCH)).collect()
        }
        assert got == {11, 13, 14}

    def test_read_meta_falls_back_to_pre_fix_shared_meta(self, spark, tmp_path):
        """An index compacted BEFORE meta was generation-scoped has a live
        generation > 0 but only the bare shared meta table — reads must keep
        working on it unchanged."""
        import shutil

        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path, n_buckets=8)
        DI.fingerprint_index_compact(spark, path)
        shutil.move(os.path.join(path, "meta_g1"), os.path.join(path, "meta"))
        assert DI._read_meta(spark, path)["n_buckets"] == 8
        # and the next compact migrates it into the generation scheme
        gen = DI.fingerprint_index_compact(spark, path)
        assert os.path.isdir(os.path.join(path, f"meta_g{gen}"))
        assert not os.path.isdir(os.path.join(path, "meta"))

    def test_minhash_compact_carries_meta_forward(self, spark, tmp_path):
        path = str(tmp_path / "mhidx")
        docs = _docs(
            spark,
            [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five six")],
        )
        DI.minhash_index_build(docs, path, num_perm=16, bands=4)
        DI.minhash_index_delete(spark, path, _ids(spark, 2))
        gen = DI.minhash_index_compact(spark, path)
        assert os.path.isdir(os.path.join(path, f"meta_g{gen}"))
        assert not os.path.isdir(os.path.join(path, "meta"))
        m = DI._read_meta(spark, path)
        assert (m["num_perm"], m["bands"]) == (16, 4)
        # probing an identical copy of the live doc still works post-compact
        probe = DI.minhash_index_probe(
            spark, path, _docs(spark, [(10, "alpha beta gamma delta epsilon zeta")])
        )
        assert {r["doc_hist"] for r in probe.collect()} == {1}

    def test_compact_collapses_retry_duplicate_rows(self, spark, tmp_path):
        """r12 ADVICE: the docstring promise 'a compact collapses the
        duplicates physically' — a repair re-run (or a retried streaming
        micro-batch) appends identical rows twice; compact must reclaim
        them, not carry them forever."""
        path = str(tmp_path / "fpidx")
        DI.fingerprint_index_build(_docs(spark, HIST), path)
        batch = _docs(spark, [(11, "sphinx of black quartz judge my vow")])
        DI.fingerprint_index_append(spark, path, batch)
        DI.fingerprint_index_append(spark, path, batch)  # the documented repair re-run
        fp0 = spark.read.parquet(os.path.join(path, "fingerprints"))
        assert fp0.where(F.col("doc_id") == 11).count() == 2
        DI.fingerprint_index_compact(spark, path)
        fp1 = spark.read.parquet(os.path.join(path, "fingerprints_g1"))
        assert fp1.where(F.col("doc_id") == 11).count() == 1
        # existence semantics unchanged: the duplicate is still blocked
        got = {
            r["doc_id"]
            for r in DI.fingerprint_index_probe(
                spark, path, _docs(spark, [(20, "sphinx of black quartz judge my vow")])
            ).collect()
        }
        assert got == set()


class TestR14IndexReviewFixes:
    """r14 review sweep over dedup.py/dedup_index.py — each test pins one
    of the fixed findings."""

    def test_rebuild_kills_stale_cluster_meta(self, spark, tmp_path):
        """A rebuild must remove clusters/meta along with base: the old
        corpus's frozen min_agree was computed against the OLD num_perm,
        and resolve_min_agree serving it to minhash_index_dedup / the
        streaming sink after a num_perm=64 rebuild would silently cut at
        16/64 = 0.25 agreement instead of the requested 0.5."""
        path = str(tmp_path / "mh")
        DI.minhash_index_build(_docs(spark, HIST), path, num_perm=32, bands=8)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        # live cluster layer: the frozen integer wins over the caller arg
        assert DI.resolve_min_agree(spark, path, 0.9, 32) == 16
        DI.minhash_index_build(_docs(spark, HIST), path, num_perm=64, bands=8)
        assert not os.path.isdir(os.path.join(path, "clusters"))
        # cluster layer dead: caller's threshold defines the cut again
        assert DI.resolve_min_agree(spark, path, 0.5, 64) == 32

    def test_stream_init_rebuild_kills_stale_cluster_meta(self, spark, tmp_path):
        from flusher_spark.streaming.dedup_stream import stream_minhash_index_init

        path = str(tmp_path / "mhs")
        DI.minhash_index_build(_docs(spark, HIST), path, num_perm=32, bands=8)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        stream_minhash_index_init(spark, path, num_perm=64, bands=8)  # rebuild
        assert not os.path.isdir(os.path.join(path, "clusters"))
        assert DI.resolve_min_agree(spark, path, 0.5, 64) == 32

    def test_cluster_append_backfills_src_batch_tag(self, spark, tmp_path):
        """minhash_cluster_append into a STREAM-initialized index must
        backfill src_batch on its bands/sigs appends (the
        minhash_index_append guard): a tag-less file could make a
        non-mergeSchema read infer a schema without the column, killing
        the sink's self-exclusion, or let a compact strip the tag."""
        from flusher_spark.streaming.dedup_stream import stream_minhash_index_init

        path = str(tmp_path / "mhtag")
        stream_minhash_index_init(
            spark, path, seed_df=_docs(spark, [(1, _FAM_A), (2, _FAM_B)])
        )
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        DI.minhash_cluster_append(spark, path, _docs(spark, [(10, _FAM_C)]))
        # EVERY file of both tables carries the tag (per-file, not just the
        # directory-inferred union — mixed files are the hazard)
        import pyarrow.parquet as pq

        for tbl in ("sigs", "bands"):
            root = os.path.join(path, tbl)
            files = [
                os.path.join(r, n)
                for r, _d, ns in os.walk(root)
                for n in ns
                if n.endswith(".parquet")
            ]
            assert files
            for f in files:
                assert "src_batch" in pq.read_schema(f).names, (tbl, f)

    def test_build_over_signatureless_corpus_stays_readable(self, spark, tmp_path):
        """A corpus where no document clears shingle_n tokens yields ZERO
        band rows; the bands table must still be readable (the
        fingerprint-build _write_table guard) so probes return empty
        instead of dying with UNABLE_TO_INFER_SCHEMA."""
        path = str(tmp_path / "mhempty")
        DI.minhash_index_build(
            _docs(spark, [(1, "one two"), (2, None)]), path  # < shingle_n=3 tokens
        )
        probe = DI.minhash_index_probe(spark, path, _docs(spark, [(10, _FAM_A)]))
        assert probe.count() == 0
        # and the index still grows normally afterwards
        DI.minhash_index_append(spark, path, _docs(spark, [(11, _FAM_A)]))
        got = {
            (r["doc_new"], r["doc_hist"])
            for r in DI.minhash_index_probe(
                spark, path, _docs(spark, [(12, _FAM_A)])
            ).collect()
        }
        assert got == {(12, 11)}

    def test_bootstrap_empty_index_stays_readable(self, spark, tmp_path):
        """Bootstrapping a seedless stream index yields zero label rows;
        clusters/base must still be readable so the first real
        cluster_append works instead of dying on schema inference."""
        from flusher_spark.streaming.dedup_stream import stream_minhash_index_init

        path = str(tmp_path / "mhboot")
        stream_minhash_index_init(spark, path)
        DI.minhash_cluster_bootstrap(spark, path, threshold=0.5)
        assert DI.minhash_cluster_labels(spark, path).count() == 0
        got = {
            (r["doc_id"], r["cluster_id"])
            for r in DI.minhash_cluster_append(
                spark, path, _docs(spark, [(1, _FAM_A), (2, _FAM_A)])
            ).collect()
        }
        assert got == {(1, 1), (2, 1)}
        assert self_labels(spark, path) == {1: 1, 2: 1}

    def test_probe_bucket_cap_still_applies_to_stored_side(self, spark, tmp_path):
        """The r14 semi-join rewrite (stored bands restricted to the
        batch's band keys BEFORE the fan-out window) must not change cap
        semantics: a degenerate stored bucket larger than max_bucket is
        still dropped whole, and kept when the cap allows it."""
        path = str(tmp_path / "mhcap")
        clones = [(i, _FAM_A) for i in range(1, 6)]  # 5 identical docs
        DI.minhash_index_build(_docs(spark, clones), path)
        batch = _docs(spark, [(10, _FAM_A)])
        assert DI.minhash_index_probe(spark, path, batch, max_bucket=3).count() == 0
        assert (
            DI.minhash_index_probe(spark, path, batch, max_bucket=10)
            .select("doc_hist")
            .distinct()
            .count()
            == 5
        )

    def test_num_perm_must_be_positive(self, spark, tmp_path):
        from flusher_spark.streaming.dedup_stream import stream_minhash_index_init

        with pytest.raises(ValueError, match="positive multiple"):
            DI.minhash_index_build(
                _docs(spark, HIST), str(tmp_path / "a"), num_perm=0, bands=8
            )
        with pytest.raises(ValueError, match="positive multiple"):
            stream_minhash_index_init(
                spark, str(tmp_path / "b"), num_perm=-16, bands=8
            )


def self_labels(spark, path):
    return {
        r["doc_id"]: r["cluster_id"]
        for r in DI.minhash_cluster_labels(spark, path).collect()
    }
