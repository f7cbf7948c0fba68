"""Minimal snapshot-isolated table format (manifest-based, pure parquet).

The control plane (SURVEY §7) uses single-writer parquet discipline; this
module closes the remaining gap toward a transactional lake table without
any external format jars (Delta/Iceberg are absent from the environment):
the same ideas — an immutable data-file set named by an atomically-published
manifest — implemented on ~200 lines of stdlib + Spark.

Layout on disk::

    <root>/data/<commit-uuid>-*.parquet     immutable data files
    <root>/_manifests/v<N>.json             {version, parent, files:[{path,
                                             rows, key_min, key_max}], key,
                                             schema, batch_id?}
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
  file-skipping contract Delta/Iceberg derive from their stats). Merge
  keys must be non-NULL (validated at write time): a NULL key has no
  position in any [key_min, key_max] interval, so it would silently break
  file pruning — the same constraint Delta places on its MERGE condition.
- The manifest records the table SCHEMA, and ``append``/``merge`` EVOLVE
  it: a source with extra columns widens the schema (old files read the
  new columns as NULL via an explicit read schema), a source with missing
  columns fills NULL. Type conflicts fail fast — silent coercion is how
  lakes corrupt. Time travel reads each version with the schema that
  version recorded, so v0 keeps its original shape after v1 evolved.
- ``merge`` handles DELETES: a boolean marker column in the source flags
  rows whose key should be removed (matched → delete, unmatched → no-op,
  Delta's ``whenMatchedDelete`` shape), in the same file-granular
  copy-on-write commit as the upserts.
- Snapshot reads are plain ``spark.read.parquet(file list)`` — pushdown,
  pruning, and AQE all apply unchanged.
- Time travel = reading an older manifest's file list; files are immutable
  so old versions stay consistent for free. ``vacuum`` deletes files no
  manifest references, but NEVER files younger than the retention window:
  a concurrent writer's staged-but-unpublished commit files are
  unreferenced by definition, and deleting them would let its later
  atomic publish succeed while pointing at deleted data (the Delta-style
  retention default exists precisely for this race).
- This is a local-filesystem commit protocol (rename/link atomicity). An
  object store needs a commit service or conditional-put — documented
  limitation, same one Delta-on-S3 has without a lock provider.
"""

from __future__ import annotations

import json
import os
import re
import threading
import time
import uuid
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


class CommitConflict(RuntimeError):
    """Another writer published this version first; re-read and retry."""


# Serializes the set-confs/write/restore-confs critical section of
# _optimized_write across threads: SQL confs are session-global, so two
# interleaved optimized writes could each snapshot the OTHER's temporary
# values as "old" and restore them permanently. Process-wide (not
# per-table) because tables may share one SparkSession.
_OPTIMIZED_WRITE_LOCK = threading.Lock()


def _stat_jsonable(v):
    """Make a key_min/key_max stat JSON-serializable. int/float/str/bool
    pass through; date/datetime become ISO strings (lexicographic order ==
    chronological order, so string comparison still prunes correctly when
    callers pass ISO bounds); anything else (Decimal, binary) records NULL
    — i.e. "stats unavailable, never prune this file" (every pruning site
    treats a NULL bound as might-intersect). An earlier str() fallback
    here was worse than the TypeError it replaced: stringified numerics
    order lexicographically ('95' > '105'), so a range scan with string
    bounds could prune files that numerically intersect and silently drop
    rows (r10 review). json.dump raising AFTER the data files were written
    stranded orphans (r9 review) — NULL avoids both failure modes."""
    import datetime

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    return None


def _ranges_disjoint(fmin, fmax, lo, hi) -> bool:
    """[fmin, fmax] vs [lo, hi] disjointness, CONSERVATIVE on incomparable
    types: stats round-trip through JSON (possibly stringified — see
    _stat_jsonable), so a bound of a different type must mean "might
    intersect" (read the file), never a TypeError."""
    try:
        return fmax < lo or fmin > hi
    except TypeError:
        return False


_VERSION_RE = re.compile(r"^v(\d+)\.json$")


def list_versions(manifest_dir: str) -> list[int]:
    """Committed version numbers in a table's ``_manifests`` directory,
    ascending. Strict ``v<digits>.json`` filename match — a stray
    ``v2.bak.json`` must be ignored, not crash the int parse."""
    if not os.path.isdir(manifest_dir):
        return []
    out = []
    for f in os.listdir(manifest_dir):
        m = _VERSION_RE.match(f)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def stored_key(root: str) -> str | None:
    """Recover the merge key recorded in a table's latest manifest (lets
    CLI read/merge/compact/vacuum omit --key on existing tables). None when
    the table has no committed version."""
    mdir = os.path.join(root, "_manifests")
    vs = list_versions(mdir)
    if not vs:
        return None
    with open(os.path.join(mdir, f"v{vs[-1]}.json")) as f:
        return json.load(f).get("key")


def stored_cluster_by(root: str) -> list[str] | None:
    """Recover the clustered layout recorded in a table's latest manifest —
    the same cross-writer config recovery as ``stored_key``: a writer that
    omits cluster_by adopts the table's recorded layout instead of silently
    destroying it (r12 review). None for unclustered or uncommitted
    tables."""
    mdir = os.path.join(root, "_manifests")
    vs = list_versions(mdir)
    if not vs:
        return None
    with open(os.path.join(mdir, f"v{vs[-1]}.json")) as f:
        return json.load(f).get("cluster_by")


class SnapshotTable:
    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key: str,
        cluster_by: list[str] | None = None,
        cluster_files: int | None = None,
        target_file_rows: int = 1 << 20,
        target_file_bytes: int = 32 << 20,
    ) -> None:
        """``cluster_by`` (optional, e.g. ``[key]``) makes every write —
        create/append/merge/compact — range-partition + sort rows by those
        columns before the files land (OPTIMIZE ZORDER's one-dimensional
        cousin; pass a precomputed ``zorder_key`` column for multi-dim).
        Files then cover disjoint narrow key ranges, so the per-file
        [key_min, key_max] stats that drive ``scan_range``/``merge`` file
        pruning get TIGHT: a range scan touches ~selectivity × files
        instead of every file (each unclustered file spans the whole key
        space). One extra range shuffle per commit, repaid on every read.
        Omitting ``cluster_by`` (None) ADOPTS the table's recorded layout;
        passing the explicit empty list ``[]`` deliberately re-layouts to
        UNCLUSTERED (commits stop recording a layout, clearing it for
        later openers).

        ``target_file_rows`` / ``target_file_bytes`` size every clustered
        commit FROM ITS DATA — the Iceberg/Delta write.target-file-size
        idea. Sizing from the data, never from session config, is
        load-bearing: an earlier default of ``spark.sql.shuffle.partitions``
        meant a production session tuned to thousands of shuffle partitions
        for its fact joins would shatter every SMALL clustered commit (the
        common case for a streaming foreachBatch sink) into thousands of
        near-empty files — the small-file problem the manifest format
        exists to avoid, with compaction then paying to undo it every
        cycle. Where the commit's row count is already known from metadata
        (merge: touched-file stats + the validation aggregate; compact:
        manifest rows) it maps to ``ceil(rows / target_file_rows)`` range
        buckets; where it isn't (create/append) the write is an AQE
        "optimized write" — range shuffle with no explicit count, adjacent
        partitions coalesced to ``target_file_bytes`` of shuffle data each
        (file count ∝ commit bytes, zero extra jobs; see _write_files).
        ``cluster_files``, if set, overrides the computed count outright
        (an explicit writer-chosen layout)."""
        self.spark = spark
        # Absolute root: manifests record ABSOLUTE file paths (from
        # input_file_name), so every path comparison against walked/joined
        # local paths must not depend on the caller's cwd.
        self.root = os.path.abspath(root)
        self.key = key
        self.cluster_by = list(cluster_by) if cluster_by else None
        self.cluster_files = cluster_files
        if target_file_rows < 1:
            raise ValueError("target_file_rows must be >= 1")
        if target_file_bytes < 1:
            raise ValueError("target_file_bytes must be >= 1")
        self.target_file_rows = target_file_rows
        self.target_file_bytes = target_file_bytes
        self._mdir = os.path.join(self.root, "_manifests")
        self._ddir = os.path.join(self.root, "data")
        # Guard against opening an existing table under a DIFFERENT merge
        # key: every file's recorded [key_min, key_max] stats are for the
        # recorded key, so pruning under another column silently
        # misclassifies touched files — merge would then keep old rows for
        # matched keys AND insert the source rows (duplicate keys, no
        # error), and the next publish would overwrite the manifest's key,
        # destroying the evidence.
        recorded = stored_key(self.root)
        if recorded is not None and recorded != key:
            raise ValueError(
                f"table at {self.root} was created with merge key "
                f"{recorded!r}, not {key!r} — file stats only prune "
                "correctly under the recorded key"
            )
        # The clustered layout is recovered like the key (r12 review): a
        # second writer that omits cluster_by — the CLI opens tables with
        # key alone — must not silently rewrite files UNCLUSTERED, with
        # whole-keyspace min/max ranges that degrade every later pruned
        # read. An explicit cluster_by wins (a deliberate re-layout), and
        # the EMPTY list is the deliberate re-layout TO UNCLUSTERED
        # (r12 ADVICE: without the sentinel, omission always adopted and
        # every commit re-recorded, so un-clustering was impossible) — its
        # commits stop recording the layout, which clears it for later
        # openers; only true omission (None) adopts the recorded one.
        if cluster_by is None:
            rec_cb = stored_cluster_by(self.root)
            if rec_cb:
                self.cluster_by = list(rec_cb)

    # -- manifest bookkeeping -------------------------------------------------

    def versions(self) -> list[int]:
        return list_versions(os.path.join(self.root, "_manifests"))

    def current_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int | None) -> dict:
        if version is None:
            raise ValueError(
                f"table at {self.root} has no committed version — create() it first"
            )
        with open(os.path.join(self._mdir, f"v{version}.json")) as f:
            return json.load(f)

    def _publish(self, manifest: dict) -> int:
        """Atomically publish the next version; raise CommitConflict if a
        concurrent writer got there first (hard-link creation is the
        exclusive primitive — EEXIST means lost race, nothing partial)."""
        os.makedirs(self._mdir, exist_ok=True)
        # Record the clustered layout with the commit (recovered in
        # __init__ via stored_cluster_by — the stored_key discipline).
        if self.cluster_by and "cluster_by" not in manifest:
            manifest["cluster_by"] = self.cluster_by
        version = manifest["version"]
        tmp = os.path.join(self._mdir, f".tmp-{uuid.uuid4().hex}.json")
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            # DURABILITY (the sinks/table.py discipline, r12 review): the
            # manifest CONTENTS must be on disk before the link makes the
            # version visible — on power loss, delayed allocation can
            # persist the link metadata while losing the data pages,
            # leaving an empty/truncated v<N>.json that bricks every
            # reader (JSONDecodeError on the highest version).
            f.flush()
            os.fsync(f.fileno())
        target = os.path.join(self._mdir, f"v{version}.json")
        try:
            os.link(tmp, target)
        except FileExistsError as exc:
            raise CommitConflict(f"version {version} already committed") from exc
        finally:
            os.unlink(tmp)
        # fsync the directory so the link itself is durable before callers
        # act on the commit (e.g. checkpoint a consumed source batch).
        dfd = os.open(self._mdir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return version

    # -- schema evolution -----------------------------------------------------

    @staticmethod
    def _type_shape(dt):
        """A type with every NESTED nullability flag normalized to True —
        the comparison shape for evolution conflicts. Top-level
        StructField.nullable was already excluded from the check, but
        nested nullability (struct inner fields, array containsNull, map
        valueContainsNull) lives INSIDE dataType: a non-nullable inner
        field (lit()/range() lineage) vs the same field inferred nullable
        (outer-join lineage) raised a spurious 'type conflict' on
        compatible data, permanently failing a streaming sink's commit
        (r12 review). The file source forces everything nullable on read
        anyway, so nullability is not a real type distinction here."""
        from pyspark.sql.types import ArrayType, MapType, StructField
        from pyspark.sql.types import StructType as ST

        shape = SnapshotTable._type_shape
        if isinstance(dt, ST):
            return ST([StructField(f.name, shape(f.dataType), True) for f in dt.fields])
        if isinstance(dt, ArrayType):
            return ArrayType(shape(dt.elementType), True)
        if isinstance(dt, MapType):
            return MapType(shape(dt.keyType), shape(dt.valueType), True)
        return dt

    @staticmethod
    def _evolved_schema(old: StructType | None, new: StructType) -> StructType:
        """Union-by-name of two schemas: old columns keep their position,
        genuinely new columns append. A name present in both with a
        DIFFERENT type raises — silent type coercion is the lake-corruption
        path this format exists to prevent. Nullability (at any nesting
        depth) is not a conflict; the old field's declaration wins."""
        if old is None:
            return new
        by_name = {f.name: f for f in new.fields}
        for f in old.fields:
            n = by_name.get(f.name)
            if n is not None and SnapshotTable._type_shape(
                n.dataType
            ) != SnapshotTable._type_shape(f.dataType):
                raise ValueError(
                    f"schema evolution type conflict on '{f.name}': "
                    f"{f.dataType.simpleString()} vs {n.dataType.simpleString()}"
                )
        merged = list(old.fields)
        have = {f.name for f in old.fields}
        merged += [f for f in new.fields if f.name not in have]
        return StructType(merged)

    def _read_schema(self, m: dict) -> StructType | None:
        return StructType.fromJson(m["schema"]) if "schema" in m else None

    def _reader(self, schema: StructType | None):
        """DataFrameReader honoring a recorded schema — ONE definition for
        the five read sites (r12 review: a copy-pasted ternary), so future
        read-behavior changes apply everywhere at once."""
        return self.spark.read.schema(schema) if schema is not None else self.spark.read

    def _conform(self, df: DataFrame, schema: StructType) -> DataFrame:
        """Project ``df`` onto ``schema``: missing columns become typed
        NULLs, column order normalizes — so every data file ever written
        for a version is readable under that version's recorded schema."""
        have = set(df.columns)
        cols = [
            F.col(f.name) if f.name in have
            else F.lit(None).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
        return df.select(*cols)

    # -- data-file writing ----------------------------------------------------

    def _optimized_write(self, df: DataFrame, out: str) -> None:
        """Execute a clustered write whose output-file sizing is delegated
        to AQE partition coalescing (Delta's "optimized write" shape): the
        range shuffle starts at ``spark.sql.shuffle.partitions`` buckets
        and AQE merges ADJACENT ones until each holds ~``target_file_bytes``
        of shuffle data — so the file count follows the commit's bytes at
        any scale, with no counting job. ``parallelismFirst`` must be off
        for the duration of the action (its default preference for
        parallelism over size would emit up-to-#cores small files on
        mid-size commits — fine for a query stage, wrong for files hitting
        disk); both confs are restored in ``finally``.

        Blast radius, honestly: the session confs are GLOBAL for the
        duration of this one write action. A process-wide lock serializes
        concurrent optimized writes (two interleaved get-then-set/restore
        pairs could otherwise restore a stale value and leave the session
        misconfigured permanently), and the lock also bounds writer-vs-
        writer interference. What it cannot scope away: an unrelated QUERY
        planned on the same SparkSession during this write sees the
        file-sized advisory and coalesces its own shuffles toward it —
        results stay correct, partitions may come out smaller for that one
        query. Sessions mixing a streaming commit sink with concurrent
        interactive queries should either set ``cluster_files`` /
        pass sized batches (both skip this path entirely) or isolate the
        sink on its own SparkSession."""
        conf = self.spark.conf
        k_par = "spark.sql.adaptive.coalescePartitions.parallelismFirst"
        k_adv = "spark.sql.adaptive.advisoryPartitionSizeInBytes"
        k_min = "spark.sql.adaptive.coalescePartitions.minPartitionSize"
        with _OPTIMIZED_WRITE_LOCK:
            old = {k: conf.get(k) for k in (k_par, k_adv, k_min)}
            try:
                conf.set(k_par, "false")
                conf.set(k_adv, str(self.target_file_bytes))
                # The 1 MiB coalescing floor would override a smaller target
                # (tests use KiB-scale targets to exercise multi-file layouts
                # on small fixtures); production targets are well above it.
                conf.set(k_min, str(min(self.target_file_bytes, 1 << 20)))
                df.write.mode("error").parquet(out)
            finally:
                for k, v in old.items():
                    conf.set(k, v)

    def _footer_stats(self, out: str) -> list[dict] | None:
        """Per-file commit stats straight from the parquet FOOTERS,
        driver-side — zero Spark jobs. The footers already carry row
        counts, per-row-group null counts, and key min/max; re-scanning
        the just-written files with a Spark aggregate to recompute them
        was one full action per commit (the Delta/Iceberg approach is
        exactly this footer read). Returns None whenever ANY footer lacks
        trustworthy stats — missing null_count/min/max, a stats type
        pyarrow can't extract (Decimal keys), an unexpected layout — and
        the caller falls back to the Spark aggregate; correctness never
        depends on this fast path. Footer min/max for long binary values
        may be TRUNCATED bounds (parquet truncate-down / increment-up),
        which is safe here: every consumer treats [key_min, key_max] as an
        over-approximation of the file's key range (pruning only — a loose
        bound only means one more file read). NULL merge keys found in the
        footers raise the same ValueError as the aggregate path. Empty
        part files (0 rows) are skipped, matching the aggregate path
        (groupBy(input_file_name) emits no row for them)."""
        try:
            import pyarrow.parquet as pq
        except ImportError:  # pragma: no cover - pyarrow ships with pyspark
            return None
        files: list[dict] = []
        nulls = 0
        try:
            for name in sorted(os.listdir(out)):
                if name.startswith((".", "_")) or not name.endswith(".parquet"):
                    continue
                path = os.path.join(out, name)
                md = pq.ParquetFile(path).metadata
                if md.num_rows == 0:
                    continue
                key_idx = None
                for i in range(md.num_columns):
                    c = md.schema.column(i)
                    if c.name == self.key and c.path == self.key:
                        key_idx = i
                        break
                if key_idx is None:
                    return None
                # TIMESTAMP keys never take the fast path: pyarrow footer
                # stats surface them as UTC-based datetimes while the Spark
                # aggregate fallback collects SESSION-timezone datetimes —
                # _stat_jsonable isoformats both, so one table's manifests
                # could mix two string representations across commits, and
                # scan_range's string comparison would then wrongly prune
                # files (silently dropped rows in non-UTC sessions — r12 /
                # ADVICE). DATE stays: date stats are timezone-free and both
                # paths emit identical ISO strings.
                kc = md.schema.column(key_idx)
                if kc.physical_type == "INT96" or str(
                    kc.logical_type
                ).upper().startswith("TIMESTAMP"):
                    return None
                kmin = kmax = None
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    st = rg.column(key_idx).statistics
                    if st is None or not st.has_null_count:
                        return None
                    nulls += st.null_count
                    if rg.num_rows == st.null_count:
                        continue  # all-NULL group: no min/max, raise below
                    if not st.has_min_max:
                        return None
                    mn, mx = st.min, st.max  # raises on unextractable types
                    kmin = mn if kmin is None or mn < kmin else kmin
                    kmax = mx if kmax is None or mx > kmax else kmax
                files.append(
                    {
                        # abspath-normalized to stay shape-identical to the
                        # aggregate path's input_file_name() form (already
                        # absolute here — __init__ abspaths self.root; this
                        # only pins the invariant locally).
                        "path": os.path.abspath(path),
                        "rows": md.num_rows,
                        "key_min": _stat_jsonable(kmin),
                        "key_max": _stat_jsonable(kmax),
                    }
                )
        except Exception:
            return None
        if nulls:
            raise ValueError(
                f"{nulls} row(s) with NULL merge key '{self.key}': NULL keys "
                "have no position in file key ranges and would break "
                "copy-on-write file pruning — filter or fill them upstream"
            )
        return files

    def _write_files(
        self,
        df: DataFrame,
        n_files: int | None = None,
        approx_rows: int | None = None,
    ) -> list[dict]:
        """Write ``df`` as immutable parquet files under a fresh commit
        prefix and return per-file stats rows (path, rows, key min/max) —
        read from the parquet FOOTERS driver-side when they carry full
        stats (_footer_stats — zero extra Spark jobs, one action saved per
        commit), else one Spark aggregate over only the just-written
        files. Rejects NULL merge keys either way: min/max ignore NULLs,
        so a NULL-keyed row would fall outside every file's
        [key_min, key_max] and break copy-on-write pruning (it could never
        be matched by a later merge).

        Clustered commits are sized from the DATA, never session config,
        by whichever source of size knowledge is free at this call site:
        an explicit ``n_files`` (compact's convergence target) or the
        table's ``cluster_files`` override wins; next, ``approx_rows``
        (merge passes touched-file stats + its validation count — commit
        metadata, zero extra compute) maps to ``ceil(rows /
        target_file_rows)`` buckets; otherwise (create/append, where no
        count exists) the commit rides an OPTIMIZED WRITE: a
        ``repartitionByRange`` with no explicit count, which AQE coalesces
        to ``target_file_bytes`` of shuffle data per partition — file
        count proportional to commit bytes, no counting job. AQE merges
        only ADJACENT range partitions, so coalesced files still cover
        disjoint key ranges and the per-file min/max stats stay tight; a
        small commit collapsing to ONE file is the desired behavior (its
        single file still carries tight bounds), not a degenerate case.
        If AQE is disabled the optimized-write path would degrade to
        exactly ``spark.sql.shuffle.partitions`` files — the
        config-coupled fragmentation this sizing exists to prevent — so it
        PERSISTS the input, counts the persisted data, and writes from the
        cache: create/append inputs are arbitrary un-checkpointed queries,
        and a bare ``df.count()`` would otherwise execute the caller's
        whole plan once for the count and again for the write (the cache
        keeps lineage, so an executor loss recomputes rather than
        fails)."""
        commit = uuid.uuid4().hex
        out = os.path.join(self._ddir, commit)
        persisted = None
        try:
            if self.cluster_by:
                n = n_files or self.cluster_files
                if n is None and approx_rows is not None:
                    n = max(1, -(-approx_rows // self.target_file_rows))
                if n is None:
                    aqe_on = (
                        str(self.spark.conf.get("spark.sql.adaptive.enabled")).lower()
                        == "true"
                        and str(
                            self.spark.conf.get(
                                "spark.sql.adaptive.coalescePartitions.enabled"
                            )
                        ).lower()
                        == "true"
                    )
                    if not aqe_on:
                        persisted = df.persist()
                        n = max(1, -(-persisted.count() // self.target_file_rows))
                        df = persisted
                if n is not None:
                    df = df.repartitionByRange(
                        n, *self.cluster_by
                    ).sortWithinPartitions(*self.cluster_by)
                    df.write.mode("error").parquet(out)
                else:
                    df = df.repartitionByRange(*self.cluster_by).sortWithinPartitions(
                        *self.cluster_by
                    )
                    self._optimized_write(df, out)
            else:
                df.write.mode("error").parquet(out)
        finally:
            if persisted is not None:
                persisted.unpersist()
        fast = self._footer_stats(out)
        if fast is not None:
            return fast
        stats = (
            self.spark.read.parquet(out)
            .groupBy(F.input_file_name().alias("path"))
            .agg(
                F.count("*").alias("rows"),
                F.count(self.key).alias("key_rows"),
                F.min(self.key).alias("key_min"),
                F.max(self.key).alias("key_max"),
            )
            .collect()
        )
        bad = sum(r["rows"] - r["key_rows"] for r in stats)
        if bad:
            raise ValueError(
                f"{bad} row(s) with NULL merge key '{self.key}': NULL keys "
                "have no position in file key ranges and would break "
                "copy-on-write file pruning — filter or fill them upstream"
            )
        return [
            {
                # input_file_name() is a URI: strip the scheme AND percent-
                # decode (a root with a space stores 'my%20tables' otherwise,
                # and spark.read on the recorded path raises PATH_NOT_FOUND —
                # Spark does not decode on read; r12 review). Literal '%' in
                # a real path arrives encoded as %25, so unquote round-trips.
                "path": unquote(r["path"].removeprefix("file://")),
                "rows": r["rows"],
                "key_min": _stat_jsonable(r["key_min"]),
                "key_max": _stat_jsonable(r["key_max"]),
            }
            for r in stats
        ]

    # -- public API -----------------------------------------------------------

    def _require_key(self, df: DataFrame) -> None:
        """Fail BEFORE any data file lands when the source lacks the key
        column: the post-write stats aggregate would raise anyway
        (unresolved column), but only after a full commit's files are on
        disk as orphans — the exact write-then-fail pattern create()'s
        existence check is ordered to avoid."""
        if self.key not in df.columns:
            raise ValueError(
                f"source has no merge-key column {self.key!r} "
                f"(columns: {df.columns})"
            )

    def create(self, df: DataFrame, batch_id: int | None = None) -> int:
        if self.current_version() is not None:
            # A real check, not an assert (stripped under -O), and BEFORE
            # the data files land — losing the publish race after writing
            # strands a full commit's files until vacuum.
            raise ValueError(f"table at {self.root} already exists")
        self._require_key(df)
        files = self._write_files(df)
        manifest = {
            "version": 0, "parent": None, "key": self.key, "files": files,
            "schema": df.schema.jsonValue(),
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        return self._publish(manifest)

    def append(self, df: DataFrame, batch_id: int | None = None) -> int | None:
        """Append-only commit (no key matching). Evolves the schema like
        merge. The manifest's ``batch_id`` replay watermark CARRIES FORWARD
        (or advances, if ``batch_id`` is given, with the same replayed-batch
        idempotence check as merge): an append interleaved into a
        streaming-fed table — e.g. a manual backfill — must not reset the
        watermark, or a replayed micro-batch after restart would commit
        twice and break the exactly-once sink contract."""
        self._require_key(df)
        cur = self.current_version()
        m = self._manifest(cur)
        last = m.get("batch_id")
        if batch_id is not None and last is not None and batch_id <= last:
            return None  # replayed micro-batch: already committed
        schema = self._evolved_schema(self._read_schema(m), df.schema)
        files = m["files"] + self._write_files(self._conform(df, schema))
        manifest = {
            "version": cur + 1, "parent": cur, "key": self.key, "files": files,
            "schema": schema.jsonValue(),
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        elif last is not None:
            manifest["batch_id"] = last  # watermark survives manual appends
        return self._publish(manifest)

    def snapshot(self, version: int | None = None) -> DataFrame:
        """Read a consistent table state; ``version=None`` → latest. Time
        travel is just an older manifest's file list (files are immutable),
        read under THAT version's recorded schema — so a version written
        before a column existed still reads in its original shape, and
        the current version reads old files' missing columns as NULL."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        schema = self._read_schema(m)
        if not m["files"]:
            # A table legitimately emptied (delete of every key) must stay
            # readable: the manifest still records the schema.
            if schema is None:
                raise ValueError("empty snapshot of a schemaless table")
            return self.spark.createDataFrame([], schema)
        paths = [f["path"] for f in m["files"]]
        return self._reader(schema).parquet(*paths)

    def rows(self, version: int | None = None) -> int:
        """Metadata-only COUNT(*): the manifest already carries exact
        per-file row counts (written with the stats aggregate), so a full
        count never needs to touch data — the Iceberg/Delta stats-based
        scan shortcut. O(files) driver work, zero executor work."""
        v = self.current_version() if version is None else version
        return sum(f["rows"] for f in self._manifest(v)["files"])

    def scan_range(self, lo, hi, version: int | None = None) -> DataFrame:
        """Stats-pruned read: only files whose [key_min, key_max] can
        intersect [lo, hi] are opened — the READ-side use of the same
        manifest stats merge prunes with (file skipping before parquet
        row-group skipping even starts; at 100 TB this is the difference
        between listing a handful of files and scanning a table). The
        range predicate is still applied on top, so results are exact
        regardless of stats granularity; files with NULL stats
        (pre-validation tables) are conservatively read."""
        v = self.current_version() if version is None else version
        m = self._manifest(v)
        # Prune with JSON-shaped bounds (the manifests' shape): a caller
        # passing raw date/datetime bounds used to TypeError into reading
        # every file (exact results — the WHERE below reapplies the raw
        # bounds — but zero pruning, r12 review).
        jlo, jhi = _stat_jsonable(lo), _stat_jsonable(hi)
        prunable = jlo is not None and jhi is not None
        files = [
            f for f in m["files"]
            if f["key_min"] is None or f["key_max"] is None
            or not prunable
            or not _ranges_disjoint(f["key_min"], f["key_max"], jlo, jhi)
        ]
        schema = self._read_schema(m)
        if not files:
            if schema is None:
                raise ValueError("empty pruned scan on a schemaless table")
            return self.spark.createDataFrame([], schema)
        return self._reader(schema).parquet(*[f["path"] for f in files]).where(
            (F.col(self.key) >= F.lit(lo)) & (F.col(self.key) <= F.lit(hi))
        )

    def merge(
        self,
        source: DataFrame,
        batch_id: int | None = None,
        delete_col: str | None = None,
    ) -> int | None:
        """MERGE on the table key, copy-on-write at FILE granularity: only
        files whose [key_min, key_max] can contain a source key are
        rewritten; all others carry forward by reference. Source key bounds
        come from one 1-row aggregate (bounded driver state). Files with
        NULL key stats (possible only in pre-validation tables) are treated
        as always-touched — correctness over pruning.

        Semantics per source row: matched → replace (upsert), unmatched →
        insert; if ``delete_col`` names a boolean column, rows where it is
        true instead DELETE their key (matched → removed, unmatched →
        no-op — Delta's ``whenMatchedDelete``), and the marker column is
        dropped from what lands in the table. The source schema (minus the
        marker) EVOLVES the table schema: new columns widen it (old files
        read NULL), missing columns fill NULL, type conflicts raise.

        ``batch_id`` makes the commit IDEMPOTENT for streaming foreachBatch
        sinks (exactly-once-ish on top of Structured Streaming's at-least-
        once replay): the manifest records the id, and a replayed batch —
        same or older id than the last committed one — returns None without
        writing. Combined with the atomic manifest publish, a crash between
        data-file write and publish leaves only unreferenced files (cleaned
        by vacuum after retention), never a partial commit."""
        self._require_key(source)
        cur = self.current_version()
        m = self._manifest(cur)
        if batch_id is not None:
            last = m.get("batch_id")
            if last is not None and batch_id <= last:
                return None  # replayed micro-batch: already committed
        # Materialize the source ONCE: merge runs several independent
        # actions over it (bounds/validation aggregate, anti-join, file
        # write), and re-evaluating a non-deterministic source between them
        # lets a key slip outside the collected pruning bounds — its file
        # stays "untouched" while the new row inserts → silent duplicate
        # keys (r9 review). Sources are micro-batch-sized by contract.
        # eager=False: the validation aggregate right below is merge's
        # FIRST action, so it is the run that materializes the checkpoint —
        # every later consumer (anti-join, write) reads the same
        # materialized partitions, the identical once-only guarantee, one
        # fewer full pass over the source than an eager checkpoint plus
        # the aggregate (r11: merge was fixed-overhead-bound, ~4 actions
        # per commit; this and the footer-stats read cut it to 2).
        source = source.localCheckpoint(eager=False)
        if delete_col is not None:
            # Delete semantics flow entirely through the all-source-keys
            # anti-join below: a marked key's victim row is removed there and
            # nothing re-inserts it — only the non-delete rows land.
            upserts = source.where(~F.coalesce(F.col(delete_col), F.lit(False))).drop(delete_col)
        else:
            upserts = source
        schema = self._evolved_schema(self._read_schema(m), upserts.schema)
        # Touched-file range spans ALL source keys (upserts AND deletes):
        # a delete must rewrite the file holding its victim row. ONE
        # aggregate over the checkpointed source yields bounds + both
        # validations (two actions here were a measured per-commit cost on
        # the streaming sink path, r9): every source key must be non-null
        # — delete rows previously bypassed the write-time NULL check and
        # silently no-opped (the anti-join matches nothing on NULL) — and
        # upsert keys must be UNIQUE: with duplicates the anti-join removes
        # the one victim row and inserts BOTH source rows (Delta raises on
        # multiple matches for the same reason). The upsert-side counts
        # ride conditional aggregates (delete rows conditioned out as
        # NULL), so no second pass over the source.
        is_upsert = (
            ~F.coalesce(F.col(delete_col), F.lit(False))
            if delete_col is not None else F.lit(True)
        )
        b = source.agg(
            F.min(self.key).alias("lo"),
            F.max(self.key).alias("hi"),
            F.count("*").alias("n"),
            F.count(self.key).alias("nk"),
            F.count(F.when(is_upsert, F.lit(1))).alias("un"),
            F.count_distinct(F.when(is_upsert, F.col(self.key))).alias("und"),
            F.count_distinct(F.when(~is_upsert, F.col(self.key))).alias("dnd"),
            F.count_distinct(F.col(self.key)).alias("ad"),
        ).collect()[0]
        if b["n"] != b["nk"]:
            raise ValueError(
                f"{b['n'] - b['nk']} source row(s) with NULL merge key "
                f"'{self.key}': a NULL key matches nothing — filter or fill "
                "them upstream"
            )
        if b["un"] != b["und"]:
            raise ValueError(
                f"merge source has {b['un'] - b['und']} duplicate upsert key(s) "
                f"on '{self.key}' — dedup (e.g. latest-per-key) before merging"
            )
        if b["und"] + b["dnd"] > b["ad"]:
            # A key appearing as BOTH an upsert and a delete in one batch is
            # ambiguous: the anti-join removes the old row and the upsert
            # re-inserts it, so the delete silently loses no matter which
            # event was "last" in the source. Delta raises on multi-action
            # matches for the same reason; callers should reduce a CDC
            # micro-batch to one final action per key before merging.
            raise ValueError(
                f"merge source has {b['und'] + b['dnd'] - b['ad']} key(s) on "
                f"'{self.key}' that appear as both an upsert and a delete — "
                "reduce to one final action per key before merging"
            )
        # Normalize the source bounds through _stat_jsonable BEFORE comparing
        # against manifest stats (r12 review): stats are stored JSON-shaped
        # (dates/datetimes as ISO strings), while collect() returns raw
        # date/datetime objects — the raw comparison TypeError'd to
        # "might intersect" on EVERY file, silently degrading copy-on-write
        # to a full-table rewrite per merge for date-keyed tables. A
        # non-empty source whose bounds are unrepresentable (Decimal/binary
        # keys → None) must touch every file — None here means "cannot
        # prune", never "nothing touched".
        lo, hi = _stat_jsonable(b["lo"]), _stat_jsonable(b["hi"])
        source_empty = b["lo"] is None and b["hi"] is None
        unprunable = not source_empty and (lo is None or hi is None)
        # An EMPTY source can match no key, so nothing is touched — checked
        # FIRST: the NULL-stat file branch used to short-circuit ahead of
        # it, so a Decimal/binary-keyed table (every file's stats are None)
        # fed an empty micro-batch rewrote the ENTIRE table and published a
        # version per empty batch (r14 review).
        touched = [
            f for f in m["files"]
            if not source_empty
            and (
                f["key_min"] is None or f["key_max"] is None
                or unprunable
                or not _ranges_disjoint(f["key_min"], f["key_max"], lo, hi)
            )
        ]
        touched_paths = {f["path"] for f in touched}
        kept = [f for f in m["files"] if f["path"] not in touched_paths]
        new_files = list(kept)
        if touched:
            old = self._reader(self._read_schema(m)).parquet(
                *[f["path"] for f in touched]
            )
            # One anti-join removes BOTH upsert victims (replaced by the
            # source row) and delete victims (replaced by nothing).
            survivors = old.join(source.select(self.key), self.key, "left_anti")
            rewritten = self._conform(survivors, schema).unionByName(
                self._conform(upserts, schema)
            )
        else:
            rewritten = self._conform(upserts, schema)
        # Clustered-commit sizing from METADATA: the rewrite is at most the
        # touched files' recorded rows plus the upserts (deletes/replaced
        # victims only shrink it), so no counting action is needed here.
        approx = sum(f["rows"] for f in touched) + b["un"]
        new_files += self._write_files(rewritten, approx_rows=approx)
        manifest = {
            "version": cur + 1, "parent": cur, "key": self.key,
            "files": new_files, "schema": schema.jsonValue(),
        }
        if batch_id is not None:
            manifest["batch_id"] = batch_id
        elif "batch_id" in m:
            manifest["batch_id"] = m["batch_id"]  # batch watermark survives manual merges
        return self._publish(manifest)

    def delete(self, keys: DataFrame, batch_id: int | None = None) -> int | None:
        """Delete by key set — sugar over ``merge`` with an all-deletes
        source (same copy-on-write commit, same idempotence contract)."""
        src = keys.select(self.key).withColumn("_op_delete", F.lit(True))
        return self.merge(src, batch_id=batch_id, delete_col="_op_delete")

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """CHANGE DATA FEED between two versions (Delta's table_changes):
        rows tagged ``_change_type`` 'insert' or 'delete'; an update
        appears as delete(old row) + insert(new row). FILE-GRANULAR by
        construction: files carried forward by reference between the two
        manifests are identical and are never read — only files present
        in exactly one manifest are diffed (``exceptAll`` both ways), so
        the cost scales with the churned fraction of the table, not its
        size (the same reason merge is copy-on-write at file
        granularity). Both sides read under their own recorded schema and
        conform to the UNION of the two versions' schemas — not the later
        one alone, because restore() can publish an older, NARROWER schema
        on top of history; conforming to it would drop the evolved columns
        from the wider side, and rows differing only there would cancel in
        exceptAll and vanish from the feed. Evolution still shows up
        honestly: an old row re-written with a new column becomes a
        delete(NULL-extended old) + insert(new)."""
        to_v = self.current_version() if to_version is None else to_version
        m_from, m_to = self._manifest(from_version), self._manifest(to_v)
        fa = {f["path"] for f in m_from["files"]}
        fb = {f["path"] for f in m_to["files"]}
        only_a, only_b = sorted(fa - fb), sorted(fb - fa)
        s_from, s_to = self._read_schema(m_from), self._read_schema(m_to)
        try:
            out_schema = (
                self._evolved_schema(s_to, s_from)
                if s_from is not None and s_to is not None
                else (s_to or s_from)
            )
        except ValueError as exc:
            # Two legitimately committed versions CAN carry the same column
            # with different types: restore() branches history, and a
            # column dropped by the restore can be re-added with a new type
            # (no conflict at either commit). One feed cannot represent
            # both types in one column without the silent coercion this
            # format forbids — fail with the cause and the workaround
            # instead of a misleading "schema evolution" error (r14
            # review).
            raise ValueError(
                f"changes({from_version}, {to_v}) spans versions whose"
                f" schemas disagree on a column's type ({exc}); this arises"
                " from a restore() branch re-adding a column with a new"
                " type — diff in two hops through the branch point instead"
            ) from exc
        if out_schema is None:  # legacy manifests predating schema recording
            probe = (
                only_b or only_a
                or [f["path"] for f in m_to["files"]]
                or [f["path"] for f in m_from["files"]]
            )
            if not probe:
                # Both versions empty AND no schema recorded anywhere: the
                # diff is empty with no row shape to infer — return the
                # change-type column alone instead of probing parquet(*[]).
                return self.spark.createDataFrame([], "_change_type string")
            out_schema = self.spark.read.parquet(*probe).schema

        def side(paths: list[str], m: dict) -> DataFrame:
            if not paths:
                return self.spark.createDataFrame([], out_schema)
            return self._conform(
                self._reader(self._read_schema(m)).parquet(*paths), out_schema
            )

        olds = side(only_a, m_from)
        news = side(only_b, m_to)
        return (
            news.exceptAll(olds).withColumn("_change_type", F.lit("insert"))
            .unionByName(olds.exceptAll(news).withColumn("_change_type", F.lit("delete")))
        )

    def restore(self, version: int) -> int:
        """Roll the table back to an earlier version AS A NEW COMMIT
        (Delta's RESTORE): publishes a manifest whose file list (and
        schema) are ``version``'s, on top of the current history. Nothing
        is deleted — every intermediate version still time-travels, the
        data files are shared by reference (files are immutable, so the
        restore costs one manifest write regardless of table size), and
        a concurrent writer race surfaces as CommitConflict like any
        commit. The batch_id replay watermark keeps the CURRENT value,
        not the restored version's: the watermark is monotone by
        contract — rolling data back must not let already-committed
        micro-batches replay into the restored state."""
        cur = self.current_version()
        m_target = self._manifest(version)
        m_cur = self._manifest(cur)
        manifest = {
            "version": cur + 1, "parent": cur, "key": self.key,
            "files": m_target["files"], "restored_from": version,
        }
        if "schema" in m_target:
            manifest["schema"] = m_target["schema"]
        if "batch_id" in m_cur:
            manifest["batch_id"] = m_cur["batch_id"]
        return self._publish(manifest)

    def compact(self, target_file_rows: int | None = None) -> int:
        """Small-file compaction as a TRANSACTION: coalesce every file under
        ``target_file_rows`` (default: the TABLE's configured
        ``target_file_rows`` — an explicit argument overrides per run; a
        hardcoded default used to classify every correctly-sized file of a
        smaller-target table as "small" and rewrite the whole table each
        maintenance cycle) into ~target-sized replacements and publish a
        new version whose contents are row-identical (only the file layout
        changes). Large files carry forward by reference; readers on older
        versions are untouched (their files are immutable); a concurrent
        writer conflict surfaces as CommitConflict exactly like any commit.
        This is the maintenance half every streaming sink needs — per-batch
        commits accrete small files, compaction folds them without a write
        outage."""
        if target_file_rows is None:
            target_file_rows = self.target_file_rows
        elif target_file_rows < 1:
            # The constructor's validation, mirrored (r14 review): 0 used
            # to reach the output-count ceiling division as a
            # ZeroDivisionError, and a negative value silently classified
            # every file as large and no-opped.
            raise ValueError("target_file_rows must be >= 1")
        cur = self.current_version()
        m = self._manifest(cur)
        small = [f for f in m["files"] if f["rows"] < target_file_rows]
        total = sum(f["rows"] for f in small)
        n_out = max(1, -(-total // target_file_rows))
        # Converge or do nothing: when the rewrite cannot REDUCE the file
        # count (e.g. two 90%-full files still need two output files), a
        # compact would rewrite the same rows into the same layout and
        # publish a new version every maintenance cycle, forever (r12
        # review; the old guard only caught len(small) <= 1).
        if len(small) <= n_out:
            return cur
        small_paths = {f["path"] for f in small}
        kept = [f for f in m["files"] if f["path"] not in small_paths]
        schema = self._read_schema(m)
        df = self._reader(schema).parquet(*[f["path"] for f in small])
        if not self.cluster_by:
            # Unclustered path: the coalesce IS the output sizing. On the
            # clustered path _write_files repartitionByRange's to n_out
            # anyway, and a pre-coalesce would only throttle the small-file
            # scan's parallelism to n_out tasks for zero layout effect.
            df = df.coalesce(n_out)
        # Pass the target through: the clustered write path re-shuffles via
        # repartitionByRange(cluster_files | shuffle.partitions), which
        # silently overrode this coalesce — a compaction that emits MORE
        # small range-bucket files than it consumed never converges (r9
        # review).
        files = kept + self._write_files(df, n_files=n_out)
        manifest = {"version": cur + 1, "parent": cur, "key": self.key, "files": files}
        if schema is not None:
            manifest["schema"] = schema.jsonValue()
        if "batch_id" in m:
            manifest["batch_id"] = m["batch_id"]
        return self._publish(manifest)

    def expire_versions(self, keep_last: int = 1) -> list[int]:
        """Time-travel RETENTION policy (Iceberg's expire_snapshots /
        Delta's logRetentionDuration): drop all but the newest
        ``keep_last`` manifests and return the expired version numbers.
        Data files referenced ONLY by expired versions become
        vacuum-eligible — expire + ``vacuum`` is the complete storage
        reclamation pair (expire alone reclaims no bytes; vacuum alone
        can't, because every historical version still pins its files).
        Expired versions stop time-travelling immediately (snapshot/
        changes/restore on them raise); the current version and its
        ``keep_last - 1`` predecessors are untouched. O(expired) driver
        metadata work, zero executor work."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1 (the current version never expires)")
        vs = self.versions()
        expired = vs[:-keep_last] if len(vs) > keep_last else []
        for v in expired:
            os.unlink(os.path.join(self._mdir, f"v{v}.json"))
        if expired:
            # Durability ordering (the _publish discipline, r14 review):
            # the unlinks must be ON DISK before a subsequent vacuum's
            # data-file deletions can persist — a power loss that kept the
            # file deletions but lost the directory-entry removals would
            # resurrect an expired manifest pointing at vacuumed files (a
            # corrupt, PATH_NOT_FOUND version instead of a clean
            # "expired" miss).
            dfd = os.open(self._mdir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        return expired

    def vacuum(self, retention_seconds: float = 24 * 3600) -> int:
        """Delete data files referenced by NO manifest AND older than the
        retention window. Returns the number removed.

        The retention window is the concurrency guard: a writer that has
        staged its data files but not yet published its manifest owns
        files that are — by definition — unreferenced; deleting them would
        let the writer's later atomic publish still succeed, producing a
        manifest that points at deleted data (a silently corrupt version).
        Files older than the window belong to crashed commits or vacated
        versions and are safe. ``retention_seconds=0`` is for tests /
        known-single-writer maintenance only. (Dropping old manifests
        first — retention policy for time travel — remains the caller's
        call; files referenced by ANY retained version are always kept.)"""
        # Reference identity is the path's LAST TWO components
        # (<commit-uuid>/<file>): manifests record absolute paths from the
        # writing process, so raw string comparison against walked paths
        # breaks whenever the two spell the root differently (relative
        # construction, symlinked mount, moved table) — and every miss here
        # reads as "unreferenced", i.e. vacuum DELETING LIVE DATA once it
        # ages past retention (r10 review). Commit dirs are uuid4-hex, so
        # the 2-component suffix is unique within a table.
        def _suffix(p: str) -> str:
            parts = p.replace("\\", "/").rstrip("/").split("/")
            return "/".join(parts[-2:])

        referenced = set()
        for v in self.versions():
            referenced.update(_suffix(f["path"]) for f in self._manifest(v)["files"])
        cutoff = time.time() - retention_seconds
        removed = 0
        for dirpath, _dirs, names in os.walk(self._ddir):
            dir_has_referenced = any(
                _suffix(os.path.join(dirpath, n)) in referenced for n in names
            )
            for name in names:
                p = os.path.join(dirpath, name)
                try:
                    if os.path.getmtime(p) > cutoff:
                        continue  # possibly a concurrent writer's staged commit
                    if name.endswith(".parquet") and _suffix(p) not in referenced:
                        os.unlink(p)
                        removed += 1
                    elif name.endswith(".parquet.crc"):
                        # Hadoop LocalFileSystem checksum sidecar: '.X.crc'
                        # next to data file X. Orphaned once X is
                        # unreferenced/gone — without this, sidecars
                        # accumulate without bound on a long-running
                        # streaming sink (r9 review).
                        target = os.path.join(dirpath, name[1:-4])
                        if _suffix(target) not in referenced:
                            os.unlink(p)
                    elif name in ("_SUCCESS", "._SUCCESS.crc") and not dir_has_referenced:
                        os.unlink(p)
                except OSError:
                    # A concurrent vacuum/writer removed it between the walk
                    # and the stat/unlink — someone else's cleanup is not
                    # this sweep's failure.
                    continue
        # Drop commit directories emptied by the sweep (bottom-up).
        for dirpath, dirs, names in os.walk(self._ddir, topdown=False):
            if dirpath != self._ddir and not dirs and not names:
                try:
                    os.rmdir(dirpath)
                except OSError:
                    pass
        # Sweep orphaned manifest temp files: a writer killed inside
        # _publish after the json.dump but before the finally-unlink leaves
        # a .tmp-<uuid>.json behind, and nothing else ever reclaims the
        # _manifests directory — a flaky restarting streaming sink would
        # accumulate them without bound (r14 review). Same retention
        # window: a younger temp may belong to a publish in flight.
        try:
            names = os.listdir(self._mdir)
        except OSError:
            names = []
        for name in names:
            if name.startswith(".tmp-") and name.endswith(".json"):
                p = os.path.join(self._mdir, name)
                try:
                    if os.path.getmtime(p) <= cutoff:
                        os.unlink(p)
                except OSError:
                    continue
        return removed
