"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The training-data-pipeline view of media (round requirement): media payloads
travel as `binary` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas kernels over mapInPandas.
The image/audio libraries are not in this container, so the DECODE step is
stubbed — `QS_FAKE_DECODE=1` (default here) swaps in a deterministic fake
decoder keyed by the payload hash so the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested end-to-end;
with real libs you implement `_decode_real` and flip the env.

Media table schema:
  media_ref string, mime string, payload binary,
  meta struct<width int, height int, duration_ms int, sample_rate int>

Scale notes: payloads dominate bytes -> the table should be bucketed by
media_ref hash at write time (same layout story as the docs table); kernels
bound per-batch memory via Arrow maxRecordsPerBatch; feature vectors are
fixed-size float arrays so downstream ANN (textops.ann_*) applies directly.
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)

EMBED_DIM = 32


def fake_decode_enabled() -> bool:
    return os.environ.get("QS_FAKE_DECODE", "1") == "1"


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    raise NotImplementedError(
        "real media decode requires PIL/av/soundfile — not in this container; "
        "set QS_FAKE_DECODE=1 for the deterministic stub"
    )


def _decode_fake(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic 'pixels': a uint8 array seeded by the payload digest —
    stable across processes/partitions, so every downstream op is testable."""
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(int.from_bytes(digest[:8], "big"))
    n = 64 if mime.startswith("image/") else 256
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def _decode(payload: bytes, mime: str) -> np.ndarray:
    return _decode_fake(payload, mime) if fake_decode_enabled() else _decode_real(payload, mime)


# ---------------------------------------------------------------- corpus


def synth_media_df(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "mime": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                mime = ["image/png", "image/jpeg", "audio/wav", "video/mp4"][i % 4]
                payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 13)
                rows["media_ref"].append(f"media://synth/{i}")
                rows["mime"].append(mime)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": 64 + (i % 32) * 16 if mime.startswith(("image", "video")) else None,
                        "height": 64 + (i % 24) * 16 if mime.startswith(("image", "video")) else None,
                        "duration_ms": 1000 + (i % 100) * 250 if mime.startswith(("audio", "video")) else None,
                        "sample_rate": 16000 if mime.startswith("audio") else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(n, numPartitions=max(8, n // 512)).mapInPandas(gen, MEDIA_SCHEMA)


# ---------------------------------------------------------------- kernels

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """decode -> fixed-dim feature vector (histogram-of-decoded-values — the
    stub stand-in for a vision/audio encoder), one Arrow batch at a time."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "mime": [], "n_bytes": [], "embedding": []}
            for ref, mime, payload in zip(pdf["media_ref"], pdf["mime"], pdf["payload"]):
                decoded = _decode(bytes(payload), mime)
                hist, _ = np.histogram(decoded, bins=EMBED_DIM, range=(0, 256))
                vec = (hist / max(len(decoded), 1)).astype(np.float32)
                out["media_ref"].append(ref)
                out["mime"].append(mime)
                out["n_bytes"].append(len(payload))
                out["embedding"].append(vec.tolist())
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, _FEATURE_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("scale", T.DoubleType()),
    ]
)


def plan_resize(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving, longest side -> max_side) — pure
    column math on typed metadata, no decode needed: metadata-only passes
    must NOT touch payload bytes (column pruning keeps the scan light)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return media.filter(w.isNotNull()).select(
        "media_ref",
        w.alias("width"),
        h.alias("height"),
        F.round(w * scale).cast("int").alias("out_width"),
        F.round(h * scale).cast("int").alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per sampled timestamp.  Frame 'decode'
    is the stub (digest of payload+ts); the plumbing — per-video fan-out
    inside the kernel, bounded by duration metadata — is the real shape."""
    video = media.filter(F.col("mime").startswith("video/"))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_ref": [], "frame_idx": [], "ts_ms": [], "frame_digest": []}
            for ref, payload, meta in zip(pdf["media_ref"], pdf["payload"], pdf["meta"]):
                dur = meta["duration_ms"] or 0
                for k, ts in enumerate(range(0, int(dur), every_ms)):
                    digest = hashlib.sha256(bytes(payload) + str(ts).encode()).hexdigest()[:16]
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(k)
                    out["ts_ms"].append(ts)
                    out["frame_digest"].append(digest)
            yield pd.DataFrame(out)

    return video.mapInPandas(kernel, _FRAME_SCHEMA)
