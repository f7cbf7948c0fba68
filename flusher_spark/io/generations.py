"""Generation-pointer machinery for persisted, compactable index layouts.

ONE definition of the lifecycle primitives that every persisted index
family shares (the exact-dedup fingerprint index and the MinHash near-dup
index in ``operators/dedup_index.py``; the IVF vector index in
``operators/similarity.py``):

- ``current_gen`` / ``set_gen``: an fsync'd ``GENERATION`` pointer file
  (write tmp → fsync → atomic rename → fsync directory — the
  ``sinks/table.py`` durability discipline) names the LIVE generation of
  every table in the index; flipping it is the one atomic publish step of
  a compact or rebuild.
- ``gen_dir``: generation-0 tables keep their bare names, so every
  pre-lifecycle index keeps working unchanged; later generations get a
  ``_g<N>`` suffix.
- ``drop_stale_gens``: reclaim every generation directory except the kept
  one — self-healing for compacts that crashed after writing a new
  generation (pointer not flipped → the torn directory is rebuilt) or
  before removing the old one.
- ``write_table``: overwrite-write a (possibly partitioned) table that is
  guaranteed READABLE even at zero rows — an empty partitionBy job emits
  no data files at all, which would brick readers with
  UNABLE_TO_INFER_SCHEMA exactly when a compact is about to flip the
  pointer at the directory.

Tombstone tables are generation-scoped by the same ``gen_dir`` naming, so
the pointer flip that publishes a compacted/rebuilt generation atomically
retires the old generation's tombstones with it — no ordering window in
which stale tombstones subtract rows from a new life.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def current_gen(path: str) -> int:
    """Compaction generation from the ``GENERATION`` pointer file; absent
    (every pre-lifecycle index) means generation 0."""
    try:
        with open(os.path.join(path, "GENERATION")) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def set_gen(path: str, gen: int) -> None:
    """Atomically + DURABLY flip the generation pointer (fsync file, rename,
    fsync directory: on power loss the unlinks that follow must never
    persist ahead of the flip)."""
    target = os.path.join(path, "GENERATION")
    with open(target + ".tmp", "w") as fh:
        fh.write(str(int(gen)))
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(target + ".tmp", target)
    dfd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def gen_dir(root: str, table: str, gen: int) -> str:
    """Data directory for a table at a generation. Generation 0 keeps the
    bare name so every pre-lifecycle index (and its pinned probe plans)
    keeps working unchanged."""
    return os.path.join(root, table if gen == 0 else f"{table}_g{gen}")


def drop_stale_gens(root: str, table: str, keep: int) -> None:
    """Remove every ``<table>_g*`` directory except the kept generation —
    self-healing for lifecycles that crashed between steps."""
    try:
        names = os.listdir(root)
    except FileNotFoundError:
        return
    for n in names:
        stale = (
            n.startswith(f"{table}_g") and n != os.path.basename(gen_dir(root, table, keep))
        ) or (n == table and keep != 0)
        if stale:
            shutil.rmtree(os.path.join(root, n), ignore_errors=True)


def write_table(df: DataFrame, out: str, part_col: str | None) -> None:
    """Overwrite-write a (possibly partitioned) table, guaranteeing the
    result is READABLE even with zero rows: the guard writes one empty
    schema-bearing file (into an explicit partition directory when
    partitioned, so later appends' partition discovery still applies)."""
    w = df.write.mode("overwrite")
    (w.partitionBy(part_col) if part_col else w).parquet(out)
    for _root, _, names in os.walk(out):
        if any(n.endswith(".parquet") for n in names):
            return
    empty = df.limit(0)
    dst = out
    if part_col:
        empty = empty.drop(part_col)
        dst = os.path.join(out, f"{part_col}=0")
    empty.coalesce(1).write.mode("overwrite").parquet(dst)


def next_build_gen(path: str, probe_table: str) -> tuple[bool, int]:
    """(rebuild, new_gen) for a full index (RE)build: rebuild iff the path
    already hosts an index — a ``GENERATION`` pointer file, or the bare
    first-generation ``probe_table`` directory from a pre-lifecycle build.
    One definition of the detection the ANN builds each hand-rolled
    (r14 review)."""
    rebuild = os.path.exists(os.path.join(path, "GENERATION")) or os.path.isdir(
        os.path.join(path, probe_table)
    )
    return rebuild, (current_gen(path) + 1 if rebuild else 0)


def publish_build(
    path: str, new_gen: int, rebuild: bool, tables: tuple, tombstone_table: str
) -> None:
    """The build-publish epilogue shared by the ANN index builds
    (``ivf_build_index`` / ``pq_build_index`` / ``stream_ivf_index_init``
    — three hand-maintained copies before r14): flip the pointer for a
    rebuild (one atomic cut-over — a crash before this line leaves the old
    generation fully live, after it the new one), sweep every stale
    generation of every table, and reclaim any ``tombstone_table``
    directory of the new generation — a fresh build starts with zero
    deletions. Call AFTER every table of ``new_gen`` is written."""
    if rebuild:
        set_gen(path, new_gen)
    for tbl in (*tables, tombstone_table):
        drop_stale_gens(path, tbl, new_gen)
    shutil.rmtree(gen_dir(path, tombstone_table, new_gen), ignore_errors=True)
