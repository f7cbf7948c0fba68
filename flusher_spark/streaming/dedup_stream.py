"""Streaming incremental dedup: a foreachBatch sink over the persisted
fingerprint index (operators/dedup_index.py).

The continuous form of the crawl pattern the batch index serves: documents
arrive as a stream, every micro-batch dedups against EVERYTHING ingested
before it (across all prior batches and stream restarts — the index is the
state, not the state store), survivors land in a per-batch parquet
partition, and the SURVIVORS' fingerprints join the index for the batches
that follow (non-survivors add nothing: duplicates of history are already
blocked by the historical row, batch-internal duplicate groups collapse
into their one survivor). State size is one md5 row per unique FINGERPRINT
ever seen — strictly smaller than per-document, and the same
sliver-of-corpus footprint as the batch index, and unlike
``dropDuplicates``/``streaming_dedup_first_seen`` it survives checkpoint
deletion and is shared with batch probes (``fingerprint_index_probe`` and
the delete/compact lifecycle work on this index unchanged).

EXACTLY-ONCE STORY — foreachBatch is at-least-once, so a crashed micro-batch
re-runs with the same batch_id after its side effects may have partially
landed. Every index row written by the stream carries a ``src_batch``
column, and the probe excludes rows tagged with the CURRENT batch id
(self-exclusion, ``fingerprint_index_probe(exclude_src_batch=...)``). That
makes each attempt a deterministic function of the index-minus-self:

- retry after the survivor write, before the index append: recomputes the
  identical survivor set (index unchanged from its perspective) and
  overwrites the batch's sink partition with identical bytes;
- retry after the index append: the probe IGNORES the first attempt's own
  fingerprints — still the identical survivor set — and the second append
  merely duplicates rows that are (a) self-excluded for this batch id and
  (b) harmless to later batches (the anti-join tests existence, not count;
  a compact collapses the duplicates physically).

No applied-batch ledger is needed, and no ordering between the survivor
write and the index append matters for correctness; the survivor write goes
first anyway so the sink never trails the index.

At scale: each micro-batch costs one bucket-pruned anti-join against the
fingerprint table (probe cost follows the batch, not the corpus) plus one
bucket-partitioned append. The sink is parquet partitioned by batch_id, so
downstream consumers can incrementally pick up exactly the new partitions.

No counterpart in the reference (danielerapati/flusher): its pipeline is a
Sheets-to-warehouse job runner; streaming corpus dedup is part of the
LLM-pipeline extension surface (SURVEY.md §2.C).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from flusher_spark.operators.dedup_index import (
    _current_gen,
    _fingerprint_rows,
    _gen_dir,
    _read_meta,
    _write_meta,
    fingerprint_index_probe,
)

#: Matches operators/dedup_index's default — see its sizing note.
_DEFAULT_BUCKETS = 64


def stream_fingerprint_index_init(
    spark: SparkSession,
    path: str,
    n_buckets: int = _DEFAULT_BUCKETS,
    seed_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Create a fingerprint index whose rows carry a ``src_batch`` column —
    the self-exclusion tag the streaming sink's retry idempotency rests on.
    ``seed_df`` optionally pre-loads an existing corpus (tagged -1, a real
    batch id is never negative) so the stream dedups against history from
    its very first micro-batch. Layout-compatible with the batch index:
    probes, deletes, and compacts from ``operators/dedup_index`` work on it
    unchanged (the extra column rides along)."""
    if seed_df is not None:
        _fingerprint_rows(seed_df, text_col, id_col, n_buckets).withColumn(
            "src_batch", F.lit(-1).cast("long")
        ).select("doc_id", "fingerprint", "src_batch", "fp_bucket").write.mode(
            "overwrite"
        ).partitionBy("fp_bucket").parquet(os.path.join(path, "fingerprints"))
    else:
        # A zero-row partitionBy write emits NO data files, leaving an
        # unreadable table; write one empty schema-bearing file into an
        # explicit partition directory instead (readable immediately,
        # partition discovery still applies once real appends land).
        spark.createDataFrame(
            [], "doc_id long, fingerprint string, src_batch long"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "fingerprints", "fp_bucket=0")
        )
    _write_meta(spark, path, n_buckets=n_buckets)
    return path


def dedup_stream_sink(
    index_path: str,
    sink_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, int], None]:
    """The foreachBatch function: probe the micro-batch against the index
    (self-excluding this batch id — see module docstring), write survivors
    to ``<sink_path>/batch_id=<id>/`` (overwrite: retries rewrite identical
    bytes), then append the SURVIVORS' tagged fingerprints to the index.

    The sink is readable as one partitioned parquet table
    (``spark.read.parquet(sink_path)`` with a ``batch_id`` partition
    column); survivors have the probe's (doc_id, fingerprint, n_copies)
    shape."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        part = os.path.join(sink_path, f"batch_id={int(batch_id)}")
        fingerprint_index_probe(
            spark,
            index_path,
            batch_df,
            text_col=text_col,
            id_col=id_col,
            exclude_src_batch=int(batch_id),
        ).write.mode("overwrite").parquet(part)
        # Index only the SURVIVORS' fingerprints, derived from the sink
        # partition just written (one read instead of recomputing the md5
        # pipeline, and the index can never diverge from what the sink
        # published). Non-survivors add nothing: a dup of history is
        # already blocked by the historical row, and a batch-internal dup
        # group collapsed into its one survivor row. NULL fingerprints
        # (NULL-text docs) stay out of the index — the build-side policy.
        n_buckets = _read_meta(spark, index_path)["n_buckets"]
        (
            spark.read.parquet(part)
            .where(F.col("fingerprint").isNotNull())
            .select(
                "doc_id",
                "fingerprint",
                F.lit(int(batch_id)).cast("long").alias("src_batch"),
                F.pmod(F.xxhash64("fingerprint"), F.lit(n_buckets)).alias("fp_bucket"),
            )
            .write.mode("append")
            .partitionBy("fp_bucket")
            .parquet(_gen_dir(index_path, "fingerprints", _current_gen(index_path)))
        )

    return _sink


def run_stream_dedup(
    stream_df: DataFrame,
    index_path: str,
    sink_path: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Wire a document stream through the dedup sink with an availableNow
    trigger (drain everything queued, then stop — the batch-ingest form;
    drop the trigger for a continuous deployment). Returns the started
    StreamingQuery; callers await ``q.awaitTermination()``."""
    return (
        stream_df.writeStream.foreachBatch(dedup_stream_sink(index_path, sink_path, text_col, id_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
