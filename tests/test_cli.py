"""CLI surface (flusher_spark/__main__.py + bin/flusher-spark): the
packaged entry points over the same engine the tests drive directly —
reference TODO.md:2's bin/ executables, re-expressed for Spark."""

from __future__ import annotations

import os

from flusher_spark.__main__ import main

SF = "/root/testdata/sf0.001"


def test_cli_list_names_every_catalog_entry(capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    from flusher_spark.plans.catalog import registry

    for name in registry():
        assert name in out


def test_cli_oracle_prints_sql_and_flags_rows_only(capsys):
    assert main(["oracle", "q1_pricing_summary"]) == 0
    assert "SELECT" in capsys.readouterr().out.upper()
    assert main(["oracle", "dedup_minhash_lsh"]) == 1  # rows-only
    assert main(["oracle", "nope_never"]) == 2


def test_cli_query_writes_parquet(spark, tmp_path, capsys):
    out_dir = str(tmp_path / "out")
    assert main(["query", "count_rows", "--sf-dir", SF, "--output", out_dir]) == 0
    files = os.listdir(out_dir)
    assert any(f.endswith(".parquet") for f in files)
    assert spark.read.parquet(out_dir).collect()[0]["n"] == 6000


def test_cli_job_and_schedule_end_to_end(spark, tmp_path, capsys):
    sheets = tmp_path / "sheets" / "doc1"
    sheets.mkdir(parents=True)
    (sheets / "inventory.csv").write_text("name,qty\nwidget,3\ngadget,5\n")
    root = str(tmp_path / "run")
    assert main([
        "job", "add", "--root", root, "--job-id", "1", "--document", "doc1",
        "--sheet", "inventory", "--target-system", "warehouse",
        "--destination", "inv", "--refresh-now",
    ]) == 0
    assert main([
        "schedule", "--root", root, "--sheets", str(tmp_path / "sheets"),
        "--max-ticks", "1", "--poll-seconds", "0.01",
    ]) == 0
    loaded = spark.read.parquet(os.path.join(root, "lake", "g_sheets", "inv"))
    assert {tuple(r) for r in loaded.select("name", "qty").collect()} == {
        ("widget", 3), ("gadget", 5),
    }
    assert main(["job", "list", "--root", root]) == 0
    assert "Success" in capsys.readouterr().out


def test_cli_snapshot_lifecycle(spark, tmp_path, capsys):
    """create -> merge -> time-travel read -> versions -> compact -> vacuum
    through the CLI, with the merge key recovered from the manifest after
    create (no --key repetition)."""
    base = str(tmp_path / "base.parquet")
    upd = str(tmp_path / "upd.parquet")
    spark.range(0, 10).selectExpr("id AS k", "id * 2 AS v").write.parquet(base)
    spark.range(5, 12).selectExpr("id AS k", "id * 100 AS v").write.parquet(upd)
    table = str(tmp_path / "snaptab")
    assert main(["snapshot", "create", "--table", table, "--key", "k",
                 "--from-parquet", base]) == 0
    assert main(["snapshot", "merge", "--table", table, "--from-parquet", upd]) == 0
    assert main(["snapshot", "read", "--table", table, "--version", "0", "--show", "0"]) == 0
    assert main(["snapshot", "versions", "--table", table]) == 0
    out = capsys.readouterr().out
    assert "created version 0" in out and "committed version 1" in out
    assert "v0:" in out and "v1:" in out
    # contents: v1 = keys 0..11, updated 5..9 + inserted 10..11
    from flusher_spark.io.snapshots import SnapshotTable

    t = SnapshotTable(spark, table, "k")
    rows = {r["k"]: r["v"] for r in t.snapshot().collect()}
    assert rows[4] == 8 and rows[5] == 500 and rows[11] == 1100 and len(rows) == 12
    assert main(["snapshot", "compact", "--table", table]) == 0
    assert main(["snapshot", "vacuum", "--table", table]) == 0
    assert {r["k"]: r["v"] for r in t.snapshot().collect()} == rows
    # change data feed v0 -> v1 through the CLI
    assert main(["snapshot", "changes", "--table", table,
                 "--from-version", "0", "--show", "30"]) == 0
    out = capsys.readouterr().out
    assert "insert" in out and "delete" in out
    # restore to v0 as a new commit; contents revert, history intact
    assert main(["snapshot", "restore", "--table", table, "--version", "0"]) == 0
    assert t.snapshot().count() == 10
    assert {r["k"]: r["v"] for r in t.snapshot(1).collect()} == rows


def test_cli_query_explain_prints_plan(spark, capsys):
    assert main(["query", "count_rows", "--sf-dir", "/root/testdata/sf0.001",
                 "--explain"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
