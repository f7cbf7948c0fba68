"""Command-line entry point: ``python -m flusher_spark`` (or the
``bin/flusher-spark`` spark-submit wrapper — reference TODO.md:2's ``bin/``
executables, re-expressed for a Spark deployment).

Subcommands
-----------
- ``list``                      — catalog entries (name + first doc line)
- ``query NAME``                — run a catalog entry; show or write results
- ``oracle NAME``               — print the entry's DuckDB oracle SQL
- ``schedule``                  — run the control-plane polling scheduler
                                  against a local lake/store root, with sheet
                                  documents loaded from a directory of CSVs
                                  (``<dir>/<document>/<sheet>.csv``)
- ``snapshot``                  — manage a snapshot-isolated lake table
                                  (io/snapshots.py): create/merge/read
                                  (time travel via --version)/versions/
                                  compact/vacuum

The scheduler wiring mirrors the reference's manager loop (reference
manager.py:208-214: poll, find due jobs, run, record) with the engine's
Scheduler; a real deployment swaps the CSV-backed SheetSource for the HTTP
transport seam in sources/connector.py.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="flusher-spark")
    p.add_argument("--cpus", type=int, default=None, help="local[N] cores (default: all)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog entries")

    q = sub.add_parser("query", help="run a catalog entry")
    q.add_argument("name")
    q.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    q.add_argument("--show", type=int, default=20, help="rows to print (0 = count only)")
    q.add_argument("--output", default=None, help="write results here instead of printing")
    q.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    q.add_argument(
        "--explain", action="store_true",
        help="print the formatted physical plan instead of executing",
    )

    o = sub.add_parser("oracle", help="print an entry's DuckDB oracle SQL")
    o.add_argument("name")

    j = sub.add_parser("job", help="manage control-table jobs")
    jsub = j.add_subparsers(dest="job_cmd", required=True)
    ja = jsub.add_parser("add", help="create or replace a job row")
    ja.add_argument("--root", required=True)
    ja.add_argument("--job-id", type=int, required=True)
    ja.add_argument("--document", required=True)
    ja.add_argument("--sheet", default="")
    ja.add_argument("--cellrange", default="")
    ja.add_argument("--target-system", default="", help="'warehouse' loads a lake table; empty exports CSV")
    ja.add_argument("--destination", default="")
    ja.add_argument("--incremental", action="store_true")
    ja.add_argument("--refresh-now", action="store_true")
    ja.add_argument("--refresh-interval", default="", help="e.g. '2 hours' (sec/week/month rejected)")
    jl = jsub.add_parser("list", help="print the control table")
    jl.add_argument("--root", required=True)

    s = sub.add_parser("schedule", help="run the polling scheduler")
    s.add_argument("--root", required=True, help="control store + lake + export root dir")
    s.add_argument("--sheets", required=True, help="dir of <document>/<sheet>.csv inputs")
    s.add_argument("--poll-seconds", type=float, default=1.0)
    s.add_argument("--max-ticks", type=int, default=None, help="stop after N ticks (default: run forever)")
    s.add_argument("--concurrency", type=int, default=1, help="cross-job parallelism per tick")

    t = sub.add_parser("snapshot", help="manage a snapshot-isolated table (io/snapshots.py)")
    tsub = t.add_subparsers(dest="snap_cmd", required=True)
    for name, extra in (
        ("create", ("--from-parquet",)),
        ("merge", ("--from-parquet",)),
        ("read", ("--version", "--show")),
        ("versions", ()),
        ("restore", ("--version",)),
        ("changes", ("--show",)),
        ("compact", ()),
        ("vacuum", ()),
    ):
        sp = tsub.add_parser(name)
        sp.add_argument("--table", required=True, help="snapshot table root directory")
        sp.add_argument("--key", default="", help="merge key column (required for create)")
        if "--from-parquet" in extra:
            sp.add_argument("--from-parquet", required=True, help="source parquet path")
        if "--version" in extra:
            sp.add_argument("--version", type=int, default=None, help="time-travel version")
        if "--show" in extra:
            sp.add_argument("--show", type=int, default=20)
        if name == "vacuum":
            sp.add_argument(
                "--retention-seconds", type=float, default=24 * 3600,
                help="protect unreferenced files younger than this "
                     "(concurrent-writer staged commits); 0 = single-writer",
            )
        if name == "changes":
            sp.add_argument("--from-version", type=int, default=None,
                            help="base version of the change feed (required)")
            sp.add_argument("--to-version", type=int, default=None,
                            help="end version (default: current)")
    return p


def _load_sheets(sheets_dir: str):
    from flusher_spark.sources.sheet import SheetGrid, SheetSource

    documents: dict[str, dict[str, SheetGrid]] = {}
    for doc in sorted(os.listdir(sheets_dir)):
        doc_dir = os.path.join(sheets_dir, doc)
        if not os.path.isdir(doc_dir):
            continue
        sheets = {}
        for fn in sorted(os.listdir(doc_dir)):
            if not fn.endswith(".csv"):
                continue
            name = fn[: -len(".csv")]
            with open(os.path.join(doc_dir, fn), newline="") as fh:
                sheets[name] = SheetGrid.from_csv(name, fh.read())
        if sheets:
            documents[doc] = sheets
    return SheetSource(documents)




def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)

    from flusher_spark.plans.catalog import registry

    if args.cmd == "list":
        for name, e in registry().items():
            first = e.doc.splitlines()[0] if e.doc else ""
            kind = "oracle" if e.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {first}")
        return 0

    if args.cmd == "oracle":
        entry = registry().get(args.name)
        if entry is None:
            print(f"unknown entry: {args.name}", file=sys.stderr)
            return 2
        if entry.oracle is None:
            print(f"{args.name} is rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        print(entry.oracle.strip())
        return 0

    from flusher_spark.session import get_session

    spark = get_session("flusher_spark_cli", cpus=args.cpus)

    if args.cmd == "query":
        entry = registry().get(args.name)
        if entry is None:
            print(f"unknown entry: {args.name}", file=sys.stderr)
            return 2
        df = entry.fn(spark, args.sf_dir)
        if args.explain:
            df.explain("formatted")
            return 0
        if args.output:
            writer = df.write.mode("overwrite")
            if args.format == "csv":
                writer.option("header", True).csv(args.output)
            else:
                writer.parquet(args.output)
            print(f"wrote {args.output}")
        elif args.show:
            df.show(args.show, truncate=False)
        else:
            print(df.count())
        return 0

    if args.cmd == "job":
        from flusher_spark.control.model import Job
        from flusher_spark.control.store import JobStore

        store = JobStore(spark, os.path.join(args.root, "control"))
        if args.job_cmd == "add":
            store.put(
                Job(
                    args.job_id,
                    args.document,
                    args.sheet,
                    cellrange=args.cellrange,
                    target_system=args.target_system,
                    destination=args.destination,
                    incremental=args.incremental,
                    refresh_now=args.refresh_now,
                    refresh_interval=args.refresh_interval,
                )
            )
            print(f"job {args.job_id} stored")
        else:
            for job in store.jobs():
                print(job)
        return 0

    if args.cmd == "snapshot":
        from flusher_spark.io.snapshots import SnapshotTable, stored_key

        key = args.key or stored_key(args.table)
        if not key:
            print("--key is required (no existing manifest to read it from)", file=sys.stderr)
            return 2
        t = SnapshotTable(spark, args.table, key)
        if args.snap_cmd == "create":
            v = t.create(spark.read.parquet(args.from_parquet))
            print(f"created version {v}")
        elif args.snap_cmd == "merge":
            v = t.merge(spark.read.parquet(args.from_parquet))
            print(f"committed version {v}")
        elif args.snap_cmd == "read":
            t.snapshot(args.version).show(args.show, truncate=False)
        elif args.snap_cmd == "versions":
            for v in t.versions():
                m = t._manifest(v)
                rows = sum(f["rows"] for f in m["files"])
                print(f"v{v}: {len(m['files'])} files, {rows} rows"
                      + (f", batch_id={m['batch_id']}" if "batch_id" in m else ""))
        elif args.snap_cmd == "restore":
            if args.version is None:
                print("--version is required for restore", file=sys.stderr)
                return 2
            print(f"restored to v{args.version} as version {t.restore(args.version)}")
        elif args.snap_cmd == "changes":
            if args.from_version is None:
                print("--from-version is required for changes", file=sys.stderr)
                return 2
            t.changes(args.from_version, args.to_version).show(args.show, truncate=False)
        elif args.snap_cmd == "compact":
            print(f"current version {t.compact()}")
        elif args.snap_cmd == "vacuum":
            n = t.vacuum(retention_seconds=args.retention_seconds)
            print(f"removed {n} unreferenced files")
        return 0

    if args.cmd == "schedule":
        from flusher_spark.control.scheduler import Scheduler
        from flusher_spark.control.store import JobStore
        from flusher_spark.sinks.table import Warehouse

        store = JobStore(spark, os.path.join(args.root, "control"))
        source = _load_sheets(args.sheets)
        wh = Warehouse(spark, os.path.join(args.root, "lake"))
        sched = Scheduler(
            spark,
            store,
            source,
            wh,
            os.path.join(args.root, "exports"),
            max_concurrency=args.concurrency,
        )
        sched.run_loop(poll_seconds=args.poll_seconds, max_ticks=args.max_ticks)
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
