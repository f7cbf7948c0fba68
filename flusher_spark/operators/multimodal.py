"""Multimodal columns: opaque binary payloads with typed metadata.

Design (FIXTURES-free: the driver tables carry no real media, so payloads
are derived deterministically in tests):

- One row per asset: ``payload: binary`` + ``meta: struct<kind,string;
  width,int; height,int; sample_rate,int; n_frames,int>`` + provenance ids.
- Decode / feature-extract / resize / frame-sample run as ``mapInPandas``
  (Arrow-batched, partition-parallel — the only layer where Python is
  justified, because media codecs are native libraries anyway).
- The actual codec calls are STUBBED: this container has no image/audio
  libraries, so ``decode_image``/``decode_audio`` raise NotImplementedError
  unless ``fake=True``, which substitutes a deterministic synthetic decode
  (byte-hash-seeded) — making the Spark-side plumbing (schema, batching,
  partitioning, UDF signatures) fully real and testable.

Scale notes: payloads stay in executor memory one Arrow batch at a time
(spark.sql.execution.arrow.maxRecordsPerBatch bounds batch bytes); metadata
filters (kind/width/sample_rate) are plain columns, so pruning and predicate
pushdown work before any Python runs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = "asset_id long, kind string, n_bytes long, sha256 string, feature array<float>"


def _fake_decode(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode+embed: bytes → sha256 →
    fixed-dim floats in [0,1). CLEARLY A STUB — replace with PIL/librosa
    decode + model inference where those libraries exist."""
    h = hashlib.sha256(payload).digest()
    return [h[i] / 255.0 for i in range(dim)]


def extract_features(df: DataFrame, fake: bool = True, dim: int = 8) -> DataFrame:
    """Decode + feature-extract each asset via Arrow-batched mapInPandas."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode needs PIL/librosa/ffmpeg — not in this container"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "feature": payloads.map(lambda b: _fake_decode(b, dim)),
                }
            )

    return df.mapInPandas(op, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 64, fake: bool = True) -> DataFrame:
    """'Video' frame sampling stub: emit one row per sampled chunk of the
    payload (a real implementation samples decoded frames; the fan-out shape
    — one input row → n output rows inside mapInPandas — is the real part)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame decode needs ffmpeg")
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"] or b""
                for frame_no, off in enumerate(range(0, len(payload), every_n_bytes)):
                    chunk = payload[off : off + every_n_bytes]
                    out.append(
                        {
                            "asset_id": row["asset_id"],
                            "frame_no": frame_no,
                            "frame_sha256": hashlib.sha256(chunk).hexdigest(),
                            "frame_bytes": len(chunk),
                        }
                    )
            yield pd.DataFrame(out, columns=["asset_id", "frame_no", "frame_sha256", "frame_bytes"])

    return df.mapInPandas(op, "asset_id long, frame_no int, frame_sha256 string, frame_bytes int")


def filter_by_meta(df: DataFrame, kind: str | None = None, min_width: int | None = None) -> DataFrame:
    """Metadata predicates are plain columns — they prune BEFORE any decode
    UDF runs (the point of keeping meta typed next to the opaque payload)."""
    out = df
    if kind:
        out = out.where(F.col("kind") == kind)
    if min_width is not None:
        out = out.where(F.col("meta.width") >= min_width)
    return out


def resize(df: DataFrame, width: int, height: int, fake: bool = True) -> DataFrame:
    """Resize stub: real codecs (PIL) are absent in this container, so the
    transform is a deterministic fake — payload re-hashed to the target
    'pixel count', meta updated — while the Spark plumbing (mapInPandas
    batch shape, schema evolution of the meta struct) is real. A production
    deployment replaces the body with PIL.Image.resize."""

    target = ASSET_SCHEMA.simpleString()[len("struct<") : -1]  # reuse asset schema

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real image resize needs PIL — not in this container")
            out = pdf.copy()
            out["payload"] = out["payload"].map(
                lambda b: hashlib.sha256(bytes(b or b"")).digest() * max(1, (width * height) // 32)
            )
            out["meta"] = out["meta"].map(
                lambda m: {**(dict(m) if m is not None else {}), "width": width, "height": height}
            )
            yield out

    return df.mapInPandas(op, ASSET_SCHEMA)
