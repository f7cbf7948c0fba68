"""A registrable Spark DataSource for worksheets (Python Data Source API).

SURVEY.md §4 names the one optional custom-source piece of the engine: a
Sheets DataSource with RANGE PUSHDOWN. This is it, built on Spark 4's Python
Data Source API (``pyspark.sql.datasource``) — the idiomatic way to add a
connector without JVM code:

    spark.dataSource.register(WorksheetDataSource)
    df = (spark.read.format("worksheet")
          .option("path", "/data/flush_control/jobs.csv")
          .option("cellrange", "B2:D50")
          .option("numPartitions", "8")
          .load())

Semantics mirror the reference's export path (reference export.py:35-66):
- the worksheet is an untyped string grid with a header row (row 1);
- ``cellrange`` (A1 notation, correct base-26 — the reference's column math
  is broken past Z, export.py:22-24) prunes BOTH columns and rows inside the
  reader, so only requested cells are ever parsed into rows — pushdown, not
  post-filter;
- rows split into ``numPartitions`` contiguous row-range partitions, each
  read independently on an executor (the reference fetches the whole grid on
  one thread).

The backing store is a CSV file standing in for the Sheets HTTP fetch — the
API surface (options, schema, partitions, pushdown) is the real deliverable;
a production deployment swaps ``_open`` for the authenticated fetch.
Spreadsheets cap at ~10M cells (Google's limit), so driver-side planning
metadata (header + row count) is trivially cheap at any scale the source can
legally have.
"""

from __future__ import annotations

import csv
import io
from dataclasses import dataclass

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from flusher_spark.functions.a1 import parse_a1_range
from flusher_spark.sources.sheet import resolve_view


def _open(path: str) -> io.TextIOWrapper:
    # Stand-in for the authenticated Sheets fetch; see module docstring.
    return open(path, newline="", encoding="utf-8")


def _count_records(path: str) -> int:
    """Record count without materializing cells (csv.reader streams; a raw
    line count would miscount quoted embedded newlines)."""
    with _open(path) as f:
        return sum(1 for _ in csv.reader(f))


def _read_header(path: str) -> list[str]:
    with _open(path) as f:
        return next(csv.reader(f), [])


def _read_grid(path: str) -> list[list[str]]:
    """Full grid materialization — ONLY for the writer's driver-side append
    merge, which is bounded by the sheet's own ~10M-cell ceiling. The read
    path streams (see WorksheetReader.read) and never calls this."""
    with _open(path) as f:
        return [list(r) for r in csv.reader(f)]


def _grid_width(path: str) -> int:
    """Widest record in the grid (csv.reader streams — no materialization).
    Planning needs it because a header row NARROWER than the widest data
    row still names a column per grid column: read_sheet pads the schema
    with col_<N> names (sources/sheet.py), and this reader must expose the
    SAME columns, not silently truncate the extra cells (r13 review). One
    streamed pass, bounded by the sheet's own ~10M-cell ceiling."""
    with _open(path) as f:
        return max((len(r) for r in csv.reader(f)), default=0)


@dataclass
class _RowRange(InputPartition):
    start: int  # 0-based index into the data rows (header excluded)
    end: int  # exclusive


class WorksheetReader(DataSourceReader):
    def __init__(self, options: dict, schema: T.StructType) -> None:
        self.path = options["path"]
        self.cellrange = options.get("cellrange", "")
        self.num_partitions = int(options.get("numpartitions", options.get("numPartitions", 4)))
        self.schema_names = [f.name for f in schema.fields]

    def _bounds(self, n_rows: int) -> tuple[int, int, int, int]:
        """(col_lo, col_hi, row_lo, row_hi) — 1-based inclusive, rows in
        spreadsheet coordinates (header is row 1)."""
        col_lo, col_hi, row_lo, row_hi = 1, -1, 2, n_rows
        if self.cellrange:
            rng = parse_a1_range(self.cellrange)
            col_lo, col_hi = rng.col_start, rng.col_end
            if rng.row_start is not None:
                row_lo = max(rng.row_start, 2)  # the header is never data
            if rng.row_end is not None:
                row_hi = min(rng.row_end, n_rows)
        return col_lo, col_hi, row_lo, row_hi

    def partitions(self) -> list[_RowRange]:
        # Planning pass: only the row COUNT is needed (cells aren't shipped
        # or even materialized — csv.reader streams).
        n_rows = _count_records(self.path)
        _, _, row_lo, row_hi = self._bounds(n_rows)
        data_start, data_end = row_lo - 2, row_hi - 1  # 0-based data-row idx
        total = max(data_end - data_start, 0)
        n = max(min(self.num_partitions, total), 1)
        step = (total + n - 1) // n if total else 1
        return [
            _RowRange(data_start + i * step, min(data_start + (i + 1) * step, data_end))
            for i in range(n)
            if data_start + i * step < data_end or (i == 0 and total == 0)
        ]

    def read(self, partition: _RowRange):
        import itertools

        # Stream only this task's row range: skip the header + preceding
        # records via islice, never materializing the grid (a previous
        # version parsed the WHOLE file per partition, making an N-way read
        # N+1 full parses). Column bounds don't depend on the row count.
        col_lo, col_hi, _, _ = self._bounds(0)
        width = len(self.schema_names)
        with _open(self.path) as f:
            reader = csv.reader(f)
            for r in itertools.islice(reader, partition.start + 1, partition.end + 1):
                cells = r[col_lo - 1 : (col_hi if col_hi != -1 else len(r))]
                padded = [str(c) if c is not None else "" for c in cells] + [""] * (width - len(cells))
                yield tuple(padded[:width])


class WorksheetDataSource(DataSource):
    """format("worksheet"): untyped worksheet scan with A1 range pushdown."""

    _layout: tuple[list, int] | None = None  # per-instance (header, width) cache

    @classmethod
    def name(cls) -> str:
        return "worksheet"

    def schema(self) -> T.StructType:
        # Planning reads the header record plus one streamed width pass —
        # the grid can be WIDER than its header row, and those columns must
        # surface as col_<N> exactly like read_sheet's padding (r13 review:
        # capping at len(header) silently dropped the extra cells). The
        # view resolution itself (clamp, loud past-last-column guard,
        # padding, col_<N> naming) is sheet.resolve_view — ONE definition
        # with read_sheet (r14 review). The (header, width) pair is cached
        # per instance: Spark may call schema() several times during
        # planning, and each uncached call re-streamed the whole file
        # twice.
        if self._layout is None:
            path = self.options["path"]
            header = _read_header(path)
            self._layout = (header, max(len(header), _grid_width(path)))
        header, width = self._layout
        _lo, _hi, names = resolve_view(header, width, self.options.get("cellrange", ""))
        return T.StructType([T.StructField(n, T.StringType(), True) for n in names])

    def reader(self, schema: T.StructType) -> WorksheetReader:
        return WorksheetReader(dict(self.options), schema)

    def writer(self, schema: T.StructType, overwrite: bool) -> "WorksheetWriter":
        return WorksheetWriter(dict(self.options), schema, overwrite)


@dataclass
class _ShardCommit(WriterCommitMessage):
    """Per-task commit message: WHERE the shard landed, never the data —
    messages travel to the driver, so they must stay O(1)."""

    partition_id: int
    shard_path: str
    n_rows: int


class WorksheetWriter(DataSourceWriter):
    """Write-back half of the worksheet source (the reference only READS
    sheets; a pipeline that publishes results to a sheet needs the reverse
    direction). Standard two-phase commit protocol:

    - each task streams its partition into a uniquely-named staged CSV shard
      and returns an O(1) commit message (path + partition id + count);
      failed/speculative attempts leave orphan shards that never reach
      commit, so retries are safe;
    - ``commit`` (driver) deterministically orders shards by partition id —
      a worksheet is an ORDERED grid, and task completion order is not
      deterministic, so the driver must impose the dataframe's partition
      order — merges them under the header row (overwrite replaces the
      grid; append extends it), writes the result to a temp file, and
      renames atomically: readers never observe a half-written sheet;
    - ``abort`` removes the staging directory.

    Grids cap at ~10M cells (the Sheets limit), so the driver-side merge is
    bounded by the destination's own ceiling, not by cluster data volume."""

    def __init__(self, options: dict, schema: T.StructType, overwrite: bool) -> None:
        import uuid

        self.path = options["path"]
        # Per-JOB staging directory: the writer object is constructed once on
        # the driver and pickled to every task, so this UUID is shared by all
        # shards of one job but distinct across jobs. Two concurrent writes
        # to the same sheet therefore never share staging — one job's
        # commit/abort rmtree cannot delete the other's in-flight shards.
        # (The final os.replace still serializes the PUBLISH; last commit
        # wins, which is the sheet-grid semantic.)
        self.stage_dir = f"{self.path}.__stage__{uuid.uuid4().hex}"
        self.field_names = schema.fieldNames()
        self.overwrite = overwrite

    def write(self, iterator):
        import os
        import uuid

        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(self.stage_dir, exist_ok=True)
        shard = os.path.join(self.stage_dir, f"{pid:05d}-{uuid.uuid4().hex}.csv")
        n = 0
        with open(shard, "w", newline="", encoding="utf-8") as f:
            w = csv.writer(f)
            for row in iterator:
                w.writerow(["" if v is None else str(v) for v in row])
                n += 1
        return _ShardCommit(pid, shard, n)

    def commit(self, messages):
        import fcntl
        import os
        import shutil

        rows: list[list[str]] = []
        for m in sorted(messages, key=lambda m: (m.partition_id, m.shard_path)):
            with open(m.shard_path, newline="", encoding="utf-8") as f:
                rows.extend(list(r) for r in csv.reader(f))
        # The read-merge-publish below must be one critical section: two
        # concurrent APPEND committers each read the pre-existing grid and
        # publish base+own rows, so without the lock the later os.replace
        # DISCARDED the earlier job's acknowledged rows (r13 review —
        # "last publish wins" is a sheet semantic for overwrite, silent
        # data loss for append). flock on a sidecar, never the sheet
        # itself: os.replace swaps the sheet's inode, which would strand
        # the lock on the old one.
        # PORTABILITY BOUND: flock is LOCAL-FILESYSTEM-ONLY (advisory,
        # single-host; no-op or unreliable on NFS/object stores). That is
        # the right tool for this source — a worksheet is a ≤10M-cell
        # spreadsheet (Google's own limit), driver-committed on one host.
        # On an object store there is no atomic read-merge-publish to
        # protect: either serialize appends outside the engine
        # (single-writer discipline per sheet) or use the snapshot table
        # format (io/snapshots.py), whose commit protocol is designed for
        # that world.
        with open(f"{self.path}.__lock__", "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            # A zero-byte existing file is an UNINITIALIZED sheet, not a
            # sheet with header [] — without the size check an append onto
            # a pre-created/truncated file failed the schema-mismatch guard
            # forever (r14 review).
            if (
                self.overwrite
                or not os.path.exists(self.path)
                or os.path.getsize(self.path) == 0
            ):
                grid = [list(self.field_names), *rows]
            else:
                grid = _read_grid(self.path)
                rows = self._align_to_header(
                    [str(h) for h in (grid[0] if grid else [])], rows
                )
                grid = grid + rows
            # The temp file lives INSIDE this job's staging directory: a
            # shared '<path>.__tmp__' let two concurrent committers
            # truncate each other mid-write (r11 review), and a sibling
            # '<stage>.__tmp__' orphaned the partial file when a crash hit
            # between its write and the publish — abort() removes the
            # staging dir only (r13 review). os.replace publishes
            # atomically: readers never observe a half-written sheet.
            tmp = os.path.join(self.stage_dir, "__publish__.csv")
            os.makedirs(self.stage_dir, exist_ok=True)  # zero-task writes
            with open(tmp, "w", newline="", encoding="utf-8") as f:
                csv.writer(f).writerows(grid)
            os.replace(tmp, self.path)
        shutil.rmtree(self.stage_dir, ignore_errors=True)

    def _align_to_header(
        self, header: list[str], rows: list[list[str]]
    ) -> list[list[str]]:
        """Append-mode column alignment: the existing sheet's header is the
        layout contract. Same names in a different order → reorder this
        job's columns to match; different column SETS → loud error. Without
        this, appending df.select(b, a) to a sheet written as (a, b) landed
        values under the wrong headers with no error anywhere (r13 review),
        and downstream cast_with_schema silently NULLed the misfits."""
        fields = list(self.field_names)
        if header == fields:
            return rows
        if sorted(header) != sorted(fields):
            raise ValueError(
                f"append schema {fields} does not match the existing sheet"
                f" header {header} — write mode='overwrite' to replace the"
                " layout"
            )
        idx = [fields.index(h) for h in header]
        return [[r[i] if i < len(r) else "" for i in idx] for r in rows]

    def abort(self, messages):
        import shutil

        shutil.rmtree(self.stage_dir, ignore_errors=True)
