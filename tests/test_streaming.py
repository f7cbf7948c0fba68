"""Structured Streaming: windowed aggs over a file-based micro-batch stream.
Batch twins from plans/relational.py are the oracle: a bounded stream in
'complete' mode must produce exactly the batch answer. A separate append-mode
test shows watermarking dropping late data."""

from __future__ import annotations

import os
import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from flusher_spark.io.tables import load_table
from flusher_spark.streaming.windows import (
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_events,
    tumbling_window_agg,
)

US = 1_000_000


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    """sf0.001 events split into 3 parquet files (3 micro-batches), raw ns
    ts — exactly the on-disk layout of the driver fixture."""
    src = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    src = src.sort_values("ts").reset_index(drop=True)
    d = tmp_path_factory.mktemp("events_stream")
    n = len(src)
    for i, part in enumerate([src[: n // 3], src[n // 3 : 2 * n // 3], src[2 * n // 3 :]]):
        path = os.path.join(d, f"{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(part, preserve_index=False), path)
        os.utime(path, (time.time() + i, time.time() + i))
    return str(d)


def _batch_events(spark):
    return load_table(spark, "/root/testdata/sf0.001", "events")


def test_normalize_event_ts_all_encodings(spark):
    """Every encoding the testdata generator has shipped — INT64-ns as
    bigint, timestamp_ntz, and canonical timestamp — normalizes to the same
    session-tz TIMESTAMP instant."""
    from pyspark.sql import functions as F

    from flusher_spark.io.tables import normalize_event_ts

    us = 1_704_067_200_000_000  # 2024-01-01T00:00:00 in µs
    as_ns = spark.createDataFrame([(us * 1000,)], "ts long")
    as_ntz = spark.range(1).select(F.timestamp_micros(F.lit(us)).cast("timestamp_ntz").alias("ts"))
    as_ts = spark.range(1).select(F.timestamp_micros(F.lit(us)).alias("ts"))
    outs = [normalize_event_ts(df) for df in (as_ns, as_ntz, as_ts)]
    for out in outs:
        assert dict(out.dtypes)["ts"] == "timestamp"
        assert out.select(F.unix_micros("ts")).first()[0] == us


def _canon(df):
    pdf = df.toPandas()
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def test_tumbling_stream_matches_batch(spark, stream_dir):
    stream = tumbling_window_agg(stream_events(spark, stream_dir))
    q = run_stream_to_memory(stream, "tumb", output_mode="complete")
    try:
        got = spark.sql("SELECT * FROM tumb")
        expected = (
            _batch_events(spark)
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        )
        pd.testing.assert_frame_equal(_canon(got), _canon(expected))
    finally:
        q.stop()


def test_sliding_stream_matches_batch(spark, stream_dir):
    stream = sliding_window_agg(stream_events(spark, stream_dir))
    q = run_stream_to_memory(stream, "slide", output_mode="complete")
    try:
        got = spark.sql("SELECT * FROM slide")
        expected = (
            _batch_events(spark)
            .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
        )
        pd.testing.assert_frame_equal(_canon(got), _canon(expected))
    finally:
        q.stop()


def test_session_stream_counts(spark, stream_dir):
    stream = session_window_agg(stream_events(spark, stream_dir))
    q = run_stream_to_memory(stream, "sess", output_mode="complete")
    try:
        got = spark.sql("SELECT user_id, COUNT(*) AS n_sessions FROM sess GROUP BY user_id")
        # Oracle: the batch sessionization query (oracle-checked itself).
        from flusher_spark.plans.catalog import registry

        expected = registry()["events_sessionize_30m"].fn(spark, "/root/testdata/sf0.001")
        pd.testing.assert_frame_equal(_canon(got), _canon(expected))
    finally:
        q.stop()


def test_watermark_drops_late_data(spark, tmp_path):
    """Append mode + watermark: an event arriving after the watermark passed
    its window is dropped (late-data policy)."""
    d = tmp_path / "late"
    d.mkdir()
    base = int(pd.Timestamp("2024-01-01").timestamp()) * US * 1000  # ns

    def write(name, rows, mtime):
        t = pa.Table.from_pylist(
            [
                {"event_id": i, "ts": base + int(off * 3600 * US * 1000), "user_id": 1,
                 "event_type": "view", "value": 1.0, "props": "{}"}
                for i, off in rows
            ],
            schema=pa.schema(
                [("event_id", pa.int64()), ("ts", pa.int64()), ("user_id", pa.int64()),
                 ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string())]
            ),
        )
        path = str(d / name)
        pq.write_table(t, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    # Batch 1: events in hour 0 and hour 1, plus a sentinel at hour 10 that
    # advances the watermark (10h - 2h = 8h) past both windows.
    write("00.parquet", [(1, 0.0), (2, 0.5), (3, 1.5), (4, 10.0)], now)

    stream = tumbling_window_agg(stream_events(spark, str(d)), window="1 hour", watermark="2 hours")
    q = stream.writeStream.outputMode("append").format("memory").queryName("late_t").start()
    try:
        q.processAllAvailable()  # batch 1 done; watermark now 8h
        # Batch 2: a LATE event back in hour 0 — behind the watermark → dropped.
        # Written only after batch 1 committed so it cannot ride along in it.
        write("01.parquet", [(5, 0.25)], now + 5)
        q.processAllAvailable()
        rows = {r["window_start"].hour: r["n"] for r in spark.sql("SELECT * FROM late_t").collect()}
        # Hour-0 window was finalized with 2 events; the late 5th never counted.
        assert rows[0] == 2 and rows[1] == 1
    finally:
        q.stop()


# -- custom stateful operators (applyInPandasWithState) ----------------------


def test_running_user_totals_converges_to_batch(spark, stream_dir):
    from flusher_spark.streaming.stateful import running_user_totals

    stream = running_user_totals(stream_events(spark, stream_dir))
    q = stream.writeStream.outputMode("update").format("memory").queryName("tot").start()
    try:
        q.processAllAvailable()
        # update mode emits one row per user per active batch; the LAST row
        # per user is their lifetime total -> compare against batch groupBy.
        pdf = spark.sql("SELECT * FROM tot").toPandas()
        last = pdf.groupby("user_id").last()  # memory sink preserves batch order
        expected = (
            _batch_events(spark)
            .groupBy("user_id")
            .agg(
                F.count("*").alias("n_events"),
                F.sum("value").alias("sum_value"),
                F.max("value").alias("max_value"),
            )
            .toPandas()
            .set_index("user_id")
        )
        assert sorted(last.index) == sorted(expected.index)
        for uid in expected.index:
            assert last.loc[uid, "n_events"] == expected.loc[uid, "n_events"]
            assert abs(last.loc[uid, "sum_value"] - expected.loc[uid, "sum_value"]) < 1e-6
            assert last.loc[uid, "max_value"] == expected.loc[uid, "max_value"]
    finally:
        q.stop()


def test_streaming_dedup_first_seen_drops_replays(spark, tmp_path):
    from flusher_spark.streaming.stateful import streaming_dedup_first_seen

    d = tmp_path / "replay"
    d.mkdir()
    US_ = 1_000_000

    def write(name, ids, mtime):
        t = pa.Table.from_pylist(
            [
                {"event_id": i, "ts": 1704067200 * US_ * 1000, "user_id": 1,
                 "event_type": "view", "value": float(i), "props": "{}"}
                for i in ids
            ],
            schema=pa.schema(
                [("event_id", pa.int64()), ("ts", pa.int64()), ("user_id", pa.int64()),
                 ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string())]
            ),
        )
        path = str(d / name)
        pq.write_table(t, path)
        os.utime(path, (mtime, mtime))

    now = time.time()
    write("00.parquet", [1, 2, 3, 2], now)  # in-batch replay of 2
    stream = streaming_dedup_first_seen(stream_events(spark, str(d)))
    q = stream.writeStream.outputMode("update").format("memory").queryName("ded").start()
    try:
        q.processAllAvailable()
        write("01.parquet", [3, 4, 1], now + 5)  # cross-batch replays of 3 and 1
        q.processAllAvailable()
        rows = sorted(r["event_id"] for r in spark.sql("SELECT * FROM ded").collect())
        assert rows == [1, 2, 3, 4], rows
    finally:
        q.stop()


def test_streaming_dedup_in_batch_winner_is_deterministic(spark, tmp_path):
    """When one micro-batch replays a key with DIFFERENT payloads, post-
    shuffle row order is arbitrary — the admitted row must be the
    deterministic (lexicographically smallest) one, not task-order luck."""
    from flusher_spark.streaming.stateful import streaming_dedup_first_seen

    d = tmp_path / "winner"
    d.mkdir()
    US_ = 1_000_000
    rows = [
        {"event_id": 7, "ts": 1704067200 * US_ * 1000, "user_id": 9,
         "event_type": "view", "value": 99.0, "props": "{}"},
        {"event_id": 7, "ts": 1704067200 * US_ * 1000, "user_id": 1,
         "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    t = pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [("event_id", pa.int64()), ("ts", pa.int64()), ("user_id", pa.int64()),
             ("event_type", pa.string()), ("value", pa.float64()), ("props", pa.string())]
        ),
    )
    pq.write_table(t, str(d / "00.parquet"))
    stream = streaming_dedup_first_seen(stream_events(spark, str(d)))
    q = stream.writeStream.outputMode("update").format("memory").queryName("win").start()
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM win").collect()
        assert len(got) == 1
        assert (got[0]["user_id"], got[0]["value"]) == (1, 2.0)
    finally:
        q.stop()


# -- transformWithStateInPandas twins ----------------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None
        self._set = False

    def exists(self):
        return self._set

    def get(self):
        return self._v

    def update(self, v):
        self._v, self._set = tuple(v), True

    def clear(self):
        self._v, self._set = None, False


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())


def _drive_processor(proc_cls, batches_per_key):
    """Run a StatefulProcessor's lifecycle by hand: one processor+handle per
    key (what one state-store partition does), handleInputRows once per
    micro-batch, collecting emissions. Pure-Python — covers the state
    transitions the protobuf-dependent runner would execute."""
    out = []
    for key, batches in batches_per_key.items():
        proc = proc_cls()
        proc.init(_FakeHandle())
        for pdf in batches:
            out.extend(df for df in proc.handleInputRows((key,), iter([pdf]), None) or [])
        proc.close()
    return out


def test_tws_running_totals_matches_applyinpandas_logic():
    """The TWS processor and the applyInPandasWithState twin must walk the
    same state trajectory: same per-batch emissions, same lifetime totals."""
    import pandas as pd

    from flusher_spark.streaming.stateful import RunningTotalsProcessor

    batches = {
        7: [pd.DataFrame({"value": [1.0, 2.0]}), pd.DataFrame({"value": [10.0]})],
        8: [pd.DataFrame({"value": [5.0]})],
    }
    rows = pd.concat(_drive_processor(RunningTotalsProcessor, batches))
    by_user = rows.groupby("user_id").last()
    assert by_user.loc[7, "n_events"] == 3
    assert by_user.loc[7, "sum_value"] == 13.0
    assert by_user.loc[7, "max_value"] == 10.0
    assert by_user.loc[8, "n_events"] == 1
    # per-batch emission: user 7 emitted twice (once per active batch)
    assert (rows["user_id"] == 7).sum() == 2


def test_tws_first_seen_matches_applyinpandas_logic():
    import pandas as pd

    from flusher_spark.streaming.stateful import FirstSeenProcessor

    def ev(ids):
        return pd.DataFrame(
            {
                "event_id": ids,
                "user_id": [1] * len(ids),
                "event_type": ["view"] * len(ids),
                "value": [float(i) for i in ids],
            }
        )

    # key 3 replayed across batches, key 2 replayed in-batch
    batches = {
        2: [ev([2, 2])],
        3: [ev([3]), ev([3])],
        4: [ev([4])],
    }
    rows = pd.concat(_drive_processor(FirstSeenProcessor, batches))
    assert sorted(rows["event_id"]) == [2, 3, 4]


def test_tws_end_to_end_if_available(spark, stream_dir):
    """Live transformWithStateInPandas run — skipped where google.protobuf
    (the TWS state-server dependency) is not installed."""
    import pytest as _pytest

    from flusher_spark.streaming.stateful import running_user_totals_tws, tws_available

    if not tws_available():
        _pytest.skip("google.protobuf absent: transformWithStateInPandas runner cannot start")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", "")
    try:
        stream = running_user_totals_tws(stream_events(spark, stream_dir))
        q = stream.writeStream.outputMode("update").format("memory").queryName("tws_tot").start()
        try:
            q.processAllAvailable()
            pdf = spark.sql("SELECT * FROM tws_tot").toPandas()
            last = pdf.groupby("user_id").last()
            expected = (
                _batch_events(spark)
                .groupBy("user_id")
                .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
                .toPandas()
                .set_index("user_id")
            )
            assert sorted(last.index) == sorted(expected.index)
            for uid in expected.index:
                assert last.loc[uid, "n_events"] == expected.loc[uid, "n_events"]
        finally:
            q.stop()
    finally:
        # Restore the UNSET state too: session.py never sets this conf, so
        # prev is empty and a bare `if prev: set(prev)` would leak the
        # RocksDB provider to every streaming query started afterwards.
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


# -- streaming joins ---------------------------------------------------------


def test_stream_static_enrichment_matches_batch(spark, stream_dir):
    from flusher_spark.streaming.joins import enrich_with_dim

    dim = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = enrich_with_dim(stream_events(spark, stream_dir), dim)
    q = run_stream_to_memory(stream, "enr", output_mode="append")
    try:
        got = spark.sql("SELECT event_id, c_mktsegment FROM enr")
        expected = _batch_events(spark).join(dim, "user_id", "left").select(
            "event_id", "c_mktsegment"
        )
        pd.testing.assert_frame_equal(_canon(got), _canon(expected))
    finally:
        q.stop()


def test_stream_stream_join_matches_batch_range_join(spark, stream_dir):
    from flusher_spark.streaming.joins import join_purchases_to_views

    stream = join_purchases_to_views(stream_events(spark, stream_dir), max_gap="1 hour")
    q = run_stream_to_memory(stream, "ssj", output_mode="append")
    try:
        got = {
            (r["purchase_id"], r["view_id"])
            for r in spark.sql("SELECT purchase_id, view_id FROM ssj").collect()
        }
        e = _batch_events(spark)
        p = e.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
        )
        v = e.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"), F.col("user_id").alias("vuid"), F.col("ts").alias("vts")
        )
        expected = {
            (r["purchase_id"], r["view_id"])
            for r in p.join(
                v,
                (p.user_id == v.vuid)
                & (v.vts <= p.pts)
                & (v.vts >= p.pts - F.expr("INTERVAL 1 HOUR")),
            ).collect()
        }
        # The bounded stream emits exactly the batch pairs (nothing dropped:
        # all data arrives before the final watermark advance).
        assert got == expected and expected
    finally:
        q.stop()


def test_left_outer_stream_join_nulls_wait_for_watermark(spark, stream_dir, tmp_path):
    """The left-outer semantics that distinguish it from the inner join:
    (a) WITHOUT a watermark-advancing flush, match-less purchases near the
    stream's end stay stranded in state (their NULL rows never emit on a
    bounded stream); (b) WITH a far-future sentinel row on both sides, the
    full batch LEFT JOIN row set emits — inner pairs identical, plus exactly
    one NULL row per match-less purchase."""
    import glob
    import shutil
    import time as _time

    from flusher_spark.streaming.joins import join_purchases_to_views_left

    # (a) bounded run, no flush: strictly fewer rows than the batch answer.
    stream = join_purchases_to_views_left(stream_events(spark, stream_dir), max_gap="1 hour")
    q = run_stream_to_memory(stream, "ssl_noflush", output_mode="append")
    try:
        n_noflush = spark.table("ssl_noflush").where(F.col("user_id") >= 0).count()
    finally:
        q.stop()

    # (b) same files + sentinel purchase/view for user -1, 10 h past the end.
    d2 = tmp_path / "with_sentinel"
    d2.mkdir()
    # Copy with explicit increasing mtimes: the file source replays in mtime
    # order, and shutil.copy would stamp all three copies "now" — an
    # arbitrary tie-break can replay them out of event-time order and the
    # watermark then DROPS late rows (observed as an order-dependent flake).
    base = _time.time()
    for i, f in enumerate(sorted(glob.glob(os.path.join(stream_dir, "*.parquet")))):
        dst = d2 / os.path.basename(f)
        shutil.copy(f, dst)
        os.utime(str(dst), (base + i, base + i))
    e = _batch_events(spark)
    # The sentinel must use the SAME on-disk ts encoding as the fixture
    # (raw INT64 ns here — the stream reader fixes its schema from the
    # first footer, and a timestamp[us] sentinel would read as garbage and
    # never advance the watermark).
    raw0 = pq.read_table(os.path.join(stream_dir, sorted(os.listdir(stream_dir))[0]))
    far_ns = int(
        e.agg((F.max(F.unix_micros(F.col("ts"))) + 36_000_000_000).alias("us")).first()["us"]
    ) * 1000
    sent_tbl = pa.table(
        {
            "event_id": pa.array([-1, -2], pa.int64()),
            "ts": pa.array([far_ns, far_ns], raw0.schema.field("ts").type),
            "user_id": pa.array([-1, -1], pa.int64()),
            "event_type": pa.array(["purchase", "view"]),
            "value": pa.array([0.0, 0.0], pa.float64()),
            "props": pa.array(["{}", "{}"]),
        }
    ).select(raw0.schema.names)
    pq.write_table(sent_tbl, str(d2 / "99.parquet"))
    os.utime(str(d2 / "99.parquet"), (_time.time() + 99, _time.time() + 99))

    stream = join_purchases_to_views_left(stream_events(spark, str(d2)), max_gap="1 hour")
    q = run_stream_to_memory(stream, "ssl_flush", output_mode="append")
    try:
        got = spark.table("ssl_flush").where(F.col("user_id") >= 0)
        p = e.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
        )
        v = e.where(F.col("event_type") == "view").select(
            F.col("event_id").alias("view_id"), F.col("user_id").alias("vuid"),
            F.col("ts").alias("vts"),
        )
        expected = p.join(
            v,
            (p.user_id == v.vuid) & (v.vts <= p.pts) & (v.vts >= p.pts - F.expr("INTERVAL 1 HOUR")),
            "left",
        )
        exp_rows = {
            (r["purchase_id"], r["view_id"]) for r in expected.collect()
        }
        got_rows = {(r["purchase_id"], r["view_id"]) for r in got.collect()}
        assert got_rows == exp_rows and exp_rows
        n_nulls = sum(1 for _, vid in got_rows if vid is None)
        assert n_nulls > 0, "fixture should contain match-less purchases"
        # The flush is what surfaced the stranded NULL rows.
        assert len(got_rows) > n_noflush
    finally:
        q.stop()


def test_snapshot_table_exactly_once_stream_sink(spark, stream_dir, tmp_path):
    """foreachBatch → SnapshotTable.merge(batch_id=...) is the exactly-once
    lake sink: each micro-batch commits one atomic snapshot version carrying
    its batch id, and a REPLAYED batch (Structured Streaming's at-least-once
    restart semantics) is a no-op — version and contents unchanged. Final
    state must equal the batch per-user argmax, proving the merge chain is
    batch-split independent."""
    from pyspark.sql import Window

    from flusher_spark.io.snapshots import SnapshotTable
    from flusher_spark.streaming.windows import stream_events

    t = SnapshotTable(spark, str(tmp_path / "snap"), "user_id")
    seen: list[tuple[int, object]] = []

    def latest_per_user(df):
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("user_id", "event_id", "value", "ts")
        )

    def handle(bdf, bid):
        latest = latest_per_user(bdf)
        if t.current_version() is None:
            t.create(latest, batch_id=bid)
        else:
            t.merge(latest, batch_id=bid)
        seen.append((bid, bdf))

    q = (
        stream_events(spark, str(stream_dir))
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert len(seen) >= 2, "expected multiple micro-batches (maxFilesPerTrigger=1)"
    v = t.current_version()
    before = {(r["user_id"], r["event_id"]) for r in t.snapshot().collect()}

    # replay the last micro-batch (same id): must be a no-op commit
    last_bid, last_df = seen[-1]
    assert t.merge(latest_per_user(last_df), batch_id=last_bid) is None
    assert t.current_version() == v
    assert {(r["user_id"], r["event_id"]) for r in t.snapshot().collect()} == before

    # batch-split independence: final snapshot == whole-input argmax
    whole = spark.read.parquet(str(stream_dir))
    from flusher_spark.io.tables import normalize_event_ts

    expected = {
        (r["user_id"], r["event_id"])
        for r in latest_per_user(normalize_event_ts(whole)).collect()
    }
    assert before == expected


def test_dynamic_gap_session_window_streams_like_batch(spark, stream_dir, tmp_path):
    """Native session_window with a DYNAMIC per-event gap must produce the
    same final sessions when executed as a bounded stream (complete mode)
    as in batch — the streaming twin of events_sessionize_dynamic_gap."""
    from flusher_spark.streaming.windows import stream_events

    gap = F.when(F.col("event_type") == "purchase", F.lit("1 hour")).otherwise(
        F.lit("30 minutes")
    )

    def sessions(df):
        return df.groupBy("user_id", F.session_window("ts", gap).alias("sw")).agg(
            F.count("*").alias("n_events")
        ).select("user_id", F.unix_micros("sw.start").alias("start_us"), "n_events")

    stream = sessions(stream_events(spark, str(stream_dir)))
    q = (
        stream.writeStream.format("memory")
        .queryName("dyn_sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["user_id"], r["start_us"]): r["n_events"]
            for r in spark.table("dyn_sess").collect()
        }
    finally:
        q.stop()
    from flusher_spark.io.tables import normalize_event_ts

    batch = {
        (r["user_id"], r["start_us"]): r["n_events"]
        for r in sessions(
            normalize_event_ts(spark.read.parquet(str(stream_dir)))
        ).collect()
    }
    assert streamed == batch


def test_right_outer_stream_join_matches_batch(spark):
    """The right join's view-side NULLs point forward in time (a claiming
    purchase may arrive max_gap later), so with the sentinel flush the
    bounded stream must emit the exact batch RIGHT JOIN row set —
    including at least one never-claimed view with NULL purchase cols."""
    from flusher_spark.plans.relational import events_stream_stream_right_join

    sf = "/root/testdata/sf0.001"
    got = {
        (r["purchase_id"], r["view_id"])
        for r in events_stream_stream_right_join(spark, sf).collect()
    }
    e = _batch_events(spark)
    p = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("pts")
    )
    v = e.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), F.col("user_id").alias("vuid"),
        F.col("ts").alias("vts"),
    )
    expected = {
        (r["purchase_id"], r["view_id"])
        for r in p.join(
            v,
            (p.user_id == v.vuid) & (v.vts <= p.pts)
            & (v.vts >= p.pts - F.expr("INTERVAL 1 HOUR")),
            "right",
        ).collect()
    }
    assert got == expected
    assert any(pid is None for pid, _ in got), "fixture should have unclaimed views"


def test_tws_running_totals_all_null_user_emits_null_aggregates():
    """r12 review: a user whose events all carry NULL value used to emit
    max_value=-Infinity / sum_value=0.0 (the -inf seed + skipna sum),
    where the batch groupBy twin (F.max/F.sum) yields NULL. The state now
    tracks the non-NULL count and both twins emit NULL aggregates until a
    real value arrives."""
    import math

    import pandas as pd

    from flusher_spark.streaming.stateful import RunningTotalsProcessor

    batches = {
        7: [pd.DataFrame({"value": [None, None]})],
        8: [pd.DataFrame({"value": [None]}), pd.DataFrame({"value": [4.0]})],
    }
    rows = pd.concat(_drive_processor(RunningTotalsProcessor, batches))
    by_user = rows.groupby("user_id").last()
    assert by_user.loc[7, "n_events"] == 2  # NULLs still count as events
    assert pd.isna(by_user.loc[7, "sum_value"])
    assert pd.isna(by_user.loc[7, "max_value"])
    assert not math.isinf(float(by_user.loc[8, "max_value"]))
    assert by_user.loc[8, "n_events"] == 2  # the NULL event + the real one
    assert by_user.loc[8, "sum_value"] == 4.0
    assert by_user.loc[8, "max_value"] == 4.0


def test_pick_first_row_non_orderable_payload():
    """r14: the deterministic in-batch winner used pandas sort_values over
    ALL columns, which crashes on array (numpy 'truth value is ambiguous')
    and map (dict '<' unsupported) payload columns — breaking the
    full-schema pass-through contract. The canonical total order must
    handle them and stay permutation-invariant."""
    import numpy as np
    import pandas as pd

    from flusher_spark.streaming.stateful import _pick_first_row

    f = pd.DataFrame(
        {
            "k": [1, 1],
            "emb": [np.array([3.0, 4.0]), np.array([1.0, 2.0])],
            "props": [{"b": 1}, {"a": 2}],
        }
    )
    row = _pick_first_row([f])
    assert list(row["emb"].iloc[0]) == [1.0, 2.0]
    rev = f.iloc[::-1].reset_index(drop=True)
    row2 = _pick_first_row([rev])
    assert list(row2["emb"].iloc[0]) == [1.0, 2.0]  # order-invariant winner


def test_stream_events_empty_source_dir(spark, tmp_path):
    """r14: starting the stream before the producer writes its first file
    (the normal deployment order) used to crash the batch schema probe
    with UNABLE_TO_INFER_SCHEMA; it must fall back to the canonical
    timestamp encoding."""
    from flusher_spark.streaming.windows import stream_events

    src = tmp_path / "empty_src"
    src.mkdir()
    df = stream_events(spark, str(src))
    assert df.isStreaming
    assert "ts" in df.columns
