"""Minimal snapshot-isolated table format (manifest-based, pure parquet).

The control plane (SURVEY §7) uses single-writer parquet discipline; this
module closes the remaining gap toward a transactional lake table without
any external format jars (Delta/Iceberg are absent from the environment):
the same ideas — an immutable data-file set named by an atomically-published
manifest — implemented on ~150 lines of stdlib + Spark.

Layout on disk::

    <root>/data/<commit-uuid>-*.parquet     immutable data files
    <root>/_manifests/v<N>.json             {version, parent, files:[{path,
                                             rows, key_min, key_max}], key}
    (no CURRENT pointer: the live version is the highest contiguous vN —
     readers list the directory, which is atomic per file on POSIX)

Commit protocol (optimistic concurrency): a writer prepares its data files,
writes the manifest to a temp name, then publishes with ``os.link(tmp,
v<N>.json)`` — hard-link creation fails with EEXIST if another writer won
the race, in which case the loser raises ``CommitConflict`` and can retry
on top of the new version. Readers never see a partial commit: a manifest
is visible only after its single atomic link, and the files it names were
fully written before that.

Scale design:

- Every manifest row carries the file's merge-key min/max (computed with
  one ``input_file_name``-grouped aggregate over just-written files), so
  MERGE is COPY-ON-WRITE AT FILE GRANULARITY: files whose key range cannot
  intersect the source keys are carried forward untouched — the rewrite
  cost is proportional to the touched fraction, not the table (the same
  file-skipping contract Delta/Iceberg derive from their stats).
- Snapshot reads are plain ``spark.read.parquet(file list)`` — pushdown,
  pruning, and AQE all apply unchanged.
- Time travel = reading an older manifest's file list; files are immutable
  so old versions stay consistent for free. ``vacuum`` deletes files no
  manifest references.
- This is a local-filesystem commit protocol (rename/link atomicity). An
  object store needs a commit service or conditional-put — documented
  limitation, same one Delta-on-S3 has without a lock provider.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer published this version first; re-read and retry."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str, key: str) -> None:
        self.spark = spark
        self.root = root
        self.key = key
        self._mdir = os.path.join(root, "_manifests")
        self._ddir = os.path.join(root, "data")

    # -- manifest bookkeeping -------------------------------------------------

    def versions(self) -> list[int]:
        if not os.path.isdir(self._mdir):
            return []
        vs = sorted(
            int(f[1:-5]) for f in os.listdir(self._mdir)
            if f.startswith("v") and f.endswith(".json")
        )
        return vs

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        with open(os.path.join(self._mdir, f"v{version}.json")) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> int:
        """Atomically publish the next version; raise CommitConflict if a
        concurrent writer got there first (hard-link creation is the
        exclusive primitive — EEXIST means lost race, nothing partial)."""
        os.makedirs(self._mdir, exist_ok=True)
        version = manifest["version"]
        tmp = os.path.join(self._mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        target = os.path.join(self._mdir, f"v{version}.json")
        try:
            os.link(tmp, target)
        except FileExistsError as exc:
            raise CommitConflict(f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)
        return version

    # -- data-file writing ----------------------------------------------------

    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write ``df`` as immutable parquet files under a fresh commit
        prefix and return per-file stats rows (path, rows, key min/max) —
        one aggregate over only the just-written files."""
        commit = uuid.uuid4().hex
        out = os.path.join(self._ddir, commit)
        df.write.mode("error").parquet(out)
        stats = (
            self.spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("path"))
            .agg(
                F.count("*").alias("rows"),
                F.min(self.key).alias("key_min"),
                F.max(self.key).alias("key_max"),
            )
            .collect()
        )
        return [
            {
                "path": r["path"].removeprefix("file://"),
                "rows": r["rows"],
                "key_min": r["key_min"],
                "key_max": r["key_max"],
            }
            for r in stats
        ]

    # -- public API -----------------------------------------------------------

    def create(self, df: DataFrame, batch_id: int | None = None) -> int:
        assert self.current_version() is None, "table already exists"
        files = self._write_files(df)
        manifest = {"version": 0, "parent": None, "key": self.key, "files": files}
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        return self._publish(manifest)

    def append(self, df: DataFrame) -> int:
        cur = self.current_version()
        m = self._manifest(cur)
        files = m["files"] + self._write_files(df)
        return self._publish(
            {"version": cur + 1, "parent": cur, "key": self.key, "files": files}
        )

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Read a consistent table state; ``version=None`` → latest. Time
        travel is just an older manifest's file list (files are immutable)."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        if not m["files"]:
            raise ValueError("empty table snapshot")
        return self.spark.read.parquet(*[f["path"] for f in m["files"]])

    def merge(self, source: DataFrame, batch_id: int | None = None) -> int | None:
        """Upsert MERGE on the table key (matched → replace row, unmatched →
        insert), copy-on-write at FILE granularity: only files whose
        [key_min, key_max] can contain a source key are rewritten; all
        others carry forward by reference. Source key bounds come from one
        1-row aggregate (bounded driver state).

        ``batch_id`` makes the commit IDEMPOTENT for streaming foreachBatch
        sinks (exactly-once-ish on top of Structured Streaming's at-least-
        once replay): the manifest records the id, and a replayed batch —
        same or older id than the last committed one — returns None without
        writing. Combined with the atomic manifest publish, a crash between
        data-file write and publish leaves only unreferenced files (cleaned
        by vacuum), never a partial commit."""
        cur = self.current_version()
        m = self._manifest(cur)
        if batch_id is not None:
            last = m.get("batch_id")
            if last is not None and batch_id <= last:
                return None  # replayed micro-batch: already committed
        b = source.agg(
            F.min(self.key).alias("lo"), F.max(self.key).alias("hi")
        ).collect()[0]
        lo, hi = b["lo"], b["hi"]
        touched = [
            f for f in m["files"]
            if lo is not None and not (f["key_max"] < lo or f["key_min"] > hi)
        ]
        kept = [f for f in m["files"] if f not in touched]
        new_files = list(kept)
        if touched:
            old = self.spark.read.parquet(*[f["path"] for f in touched])
            survivors = old.join(source.select(self.key), self.key, "left_anti")
            rewritten = survivors.unionByName(source)
        else:
            rewritten = source
        new_files += self._write_files(rewritten)
        manifest = {"version": cur + 1, "parent": cur, "key": self.key, "files": new_files}
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        elif "batch_id" in m:
            manifest["batch_id"] = m["batch_id"]  # batch watermark survives manual merges
        return self._publish(manifest)

    def compact(self, target_file_rows: int = 1 << 20) -> int:
        """Small-file compaction as a TRANSACTION: coalesce every file under
        ``target_file_rows`` into ~target-sized replacements and publish a
        new version whose contents are row-identical (only the file layout
        changes). Large files carry forward by reference; readers on older
        versions are untouched (their files are immutable); a concurrent
        writer conflict surfaces as CommitConflict exactly like any commit.
        This is the maintenance half every streaming sink needs — per-batch
        commits accrete small files, compaction folds them without a write
        outage."""
        cur = self.current_version()
        m = self._manifest(cur)
        small = [f for f in m["files"] if f["rows"] < target_file_rows]
        if len(small) <= 1:
            return cur
        kept = [f for f in m["files"] if f not in small]
        total = sum(f["rows"] for f in small)
        n_out = max(1, -(-total // target_file_rows))
        df = self.spark.read.parquet(*[f["path"] for f in small]).coalesce(n_out)
        files = kept + self._write_files(df)
        manifest = {"version": cur + 1, "parent": cur, "key": self.key, "files": files}
        if "batch_id" in m:
            manifest["batch_id"] = m["batch_id"]
        return self._publish(manifest)

    def vacuum(self) -> int:
        """Delete data files referenced by NO manifest. Returns the number
        removed. (Retention policy — dropping old manifests first — is the
        caller's call; files still referenced by any version are kept so
        every retained version stays readable.)"""
        referenced = set()
        for v in self.versions():
            referenced.update(f["path"] for f in self._manifest(v)["files"])
        removed = 0
        for dirpath, _dirs, names in os.walk(self._ddir):
            for name in names:
                p = os.path.join(dirpath, name)
                if name.endswith(".parquet") and p not in referenced:
                    os.unlink(p)
                    removed += 1
        return removed
