"""Structured Streaming operators over the events stream.

The reference's only 'stream' is a 1-second polling loop
(manager.py:208-209); these are the real streaming extension (SURVEY.md §7
step 5): watermarked tumbling/sliding/session windows over event time. The
same aggregation expressions back the batch twins in plans/relational.py
(events_tumbling_hourly etc.), so batch results are the oracle for streaming
tests.

Late data: ``withWatermark`` bounds state; events later than the watermark
are dropped in append mode — asserted in tests/test_streaming.py with a
rate-controlled file source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flusher_spark.io.tables import normalize_event_ts
from flusher_spark.session import configure


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def stream_events(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-based micro-batch stream of events (one parquet per trigger —
    in production this is the Kafka/queue reader; the transformations are
    identical).

    A streaming source needs its schema up front, but the driver's testdata
    generator has shipped ``ts`` as both INT64-ns (→ ``bigint``) and
    timestamp[us] (→ ``timestamp_ntz``). One batch footer read resolves the
    on-disk encoding; ``normalize_event_ts`` then canonicalizes either to
    session-tz ``timestamp`` so every window/watermark downstream is
    encoding-agnostic. The probe freezes whatever encoding it sees — a
    streaming source's schema is fixed at start by design, so a producer
    that switches encodings mid-run needs a stream restart either way.
    """
    configure(spark)
    try:
        on_disk = spark.read.parquet(path).schema["ts"].dataType
    except Exception:
        # Stream started before the producer wrote its first file — the
        # normal deployment order (the directory exists, no parquet yet):
        # nothing to probe (UNABLE_TO_INFER_SCHEMA), so assume the
        # canonical timestamp encoding instead of crashing at startup
        # (r14 review). normalize_event_ts handles it identically.
        on_disk = T.TimestampType()
    raw = (
        spark.readStream.schema(_events_schema(on_disk))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
    return normalize_event_ts(raw)


def tumbling_window_agg(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Watermarked tumbling-window counts/sums per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "2 hours",
    slide: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked sliding windows (each event lands in window/slide panes)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_window_agg(events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours") -> DataFrame:
    """Session windows: per-user activity bursts separated by ``gap`` of
    inactivity — the streaming twin of events_sessionize_30m."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def run_stream_to_memory(df: DataFrame, name: str, output_mode: str = "append"):
    """Drive a bounded file stream to completion synchronously (test/dev
    helper): memory sink + processAllAvailable. A failing micro-batch stops
    the query before re-raising — otherwise the orphaned handle keeps its
    queryName registered and the next run with the same name refuses to
    start."""
    q = df.writeStream.outputMode(output_mode).format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    except Exception:
        q.stop()
        raise
    return q
