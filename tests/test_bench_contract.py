"""The driver contract for bench.py: prints exactly ONE JSON line on stdout
with the agreed keys — guarded here so stray prints or logging can never
break the per-round BENCH_r{N}.json recording."""

from __future__ import annotations

import json
import os
import subprocess
import sys

from tests.conftest import SF_DIR


def test_bench_emits_one_json_line():
    # SPARK_GRAFT_BENCH_OUT="" — this is a smoke run at sf0.001; without the
    # empty override it would overwrite bench_results/latest.json (the
    # committed sf0.1 round snapshot) on every pytest invocation.
    # SPARK_GRAFT_ONLY + REPEATS=1: the contract under test is the OUTPUT
    # SHAPE (one JSON line, keys, value = sum of queries) — it is the same
    # code path for 3 queries as for 141, while the full headline set at
    # warmup+3 reps cost 375 s of every suite run (measured r15; the
    # full set's per-query execution is covered by tools/check_oracle.py
    # and test_plans' catalog walk). The subset deliberately spans three
    # table families (lineitem, events, documents).
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=SF_DIR,
        SPARK_GRAFT_CPUS="8",
        SPARK_GRAFT_BENCH_OUT="",
        SPARK_GRAFT_ONLY="q6_revenue_filter,events_tumbling_hourly,text_quality_score",
        SPARK_GRAFT_REPEATS="1",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    # check=True would bury the captured stderr inside an unraised
    # CalledProcessError — assert explicitly so a failing bench shows WHY.
    assert proc.returncode == 0, (
        f"bench.py exited {proc.returncode}; stderr tail:\n{proc.stderr[-2000:]}"
    )
    out = proc.stdout
    lines = [ln for ln in out.splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench stdout must be ONE line, got {len(lines)}: {lines[:3]}"
    payload = json.loads(lines[0])
    assert payload["unit"] == "sec" and payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float)) and payload["value"] > 0
    assert set(payload["queries"]) == {
        "q6_revenue_filter", "events_tumbling_hourly", "text_quality_score",
    }
    assert all(v >= 0 for v in payload["queries"].values())
    assert abs(sum(payload["queries"].values()) - payload["value"]) < 0.01 * len(payload["queries"])
