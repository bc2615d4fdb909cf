"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The training-data-pipeline view of media (round requirement): media payloads
travel as `binary` columns with typed metadata; decode / feature-extract /
resize / frame-sample run as Arrow-batched pandas kernels over mapInPandas.
Decode is REAL for formats the stdlib can parse — WAV (wave module, 16-bit
PCM) and 24-bit BMP (struct) — so the decode->featurize path is exercised on
true containers end-to-end.  Codec-bound formats (jpeg/png/mp4) need PIL/av,
which this container lacks: they use a deterministic digest-seeded stub
(`QS_FAKE_DECODE=1`, the default) keyed by the payload hash, keeping the
Spark-side plumbing (schema, partitioning, UDF signature, batch shape)
identical; with real libs you extend `_decode_real` and flip the env.

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


def decode_wav(payload: bytes) -> np.ndarray:
    """REAL WAV decode (stdlib wave + numpy — no external codec needed):
    PCM frames -> uint8 amplitude stream (16-bit samples mapped to their
    high byte, biased to unsigned, so the histogram featurizer sees true
    signal shape)."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        raw = w.readframes(w.getnframes())
        width = w.getsampwidth()
    if width == 1:
        return np.frombuffer(raw, dtype=np.uint8)
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2")
        return ((s.astype(np.int32) >> 8) + 128).astype(np.uint8)
    raise NotImplementedError(f"wav sample width {width}")


def decode_bmp(payload: bytes) -> np.ndarray:
    """REAL BMP decode (pure struct parsing): 24-bit uncompressed pixels ->
    flat uint8 BGR stream (row padding stripped)."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"bmp bpp={bpp} compression={comp}")
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3  # rows pad to 4-byte boundaries
    rows = [
        np.frombuffer(payload, dtype=np.uint8, count=row_bytes, offset=pixel_off + r * stride)
        for r in range(abs(height))
    ]
    return np.concatenate(rows) if rows else np.zeros(0, dtype=np.uint8)


def _decode_real(payload: bytes, mime: str) -> np.ndarray:
    """Real decoders for container formats parseable with the stdlib; the
    codec-dependent formats (jpeg/png/mp4) need PIL/av, which this container
    lacks — those fall back to the deterministic stub (or raise when
    QS_FAKE_DECODE=0)."""
    if mime == "audio/wav":
        return decode_wav(payload)
    if mime == "image/bmp":
        return decode_bmp(payload)
    raise NotImplementedError(
        f"real decode of {mime} requires PIL/av — not in this container; "
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
    """Dispatch: real decode wherever a stdlib parser exists (wav/bmp —
    ALWAYS real, the flag doesn't fake what can be decoded honestly);
    codec-bound formats use the stub unless QS_FAKE_DECODE=0."""
    if mime in ("audio/wav", "image/bmp"):
        return _decode_real(payload, mime)
    return _decode_fake(payload, mime) if fake_decode_enabled() else _decode_real(payload, mime)


# ---------------------------------------------------------------- corpus


def _synth_wav(i: int, sample_rate: int = 16000) -> tuple[bytes, int]:
    """Deterministic REAL WAV container: 16-bit PCM sine-ish signal whose
    frequency/length derive from i.  Returns (payload, duration_ms)."""
    import io
    import wave

    n_samples = sample_rate // 8 + (i % 7) * 256  # ~125-240 ms
    t = np.arange(n_samples, dtype=np.float64)
    freq = 110.0 * (1 + i % 12)
    sig = (np.sin(2 * np.pi * freq * t / sample_rate) * 12000).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(sig.tobytes())
    return buf.getvalue(), int(n_samples * 1000 / sample_rate)


def _synth_bmp(i: int) -> tuple[bytes, int, int]:
    """Deterministic REAL 24-bit BMP: gradient pixels keyed by i.
    Returns (payload, width, height)."""
    import struct

    width, height = 16 + (i % 5) * 4, 4 + (i % 6)
    row_bytes = width * 3
    stride = (row_bytes + 3) & ~3
    px = bytearray()
    for r in range(height):
        row = bytes(
            ((r * 31 + c * 7 + i) % 256) for c in range(row_bytes)
        )
        px += row + b"\x00" * (stride - row_bytes)
    size = 14 + 40 + len(px)
    header = b"BM" + struct.pack("<IHHI", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(px), 2835, 2835, 0, 0)
    return header + info + bytes(px), width, height


def synth_media_df(spark: SparkSession, n: int) -> DataFrame:
    """Deterministic synthetic media table.  wav/bmp payloads are REAL
    containers (decoded by the real stdlib parsers); png/mp4 are seeded
    opaque bytes exercising the stub path."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "mime": [], "payload": [], "meta": []}
            for i in pdf["id"]:
                i = int(i)
                mime = ["image/png", "image/bmp", "audio/wav", "video/mp4"][i % 4]
                width = height = duration_ms = sample_rate = None
                if mime == "audio/wav":
                    payload, duration_ms = _synth_wav(i)
                    sample_rate = 16000
                elif mime == "image/bmp":
                    payload, width, height = _synth_bmp(i)
                else:
                    payload = hashlib.sha256(f"media{i}".encode()).digest() * (4 + i % 13)
                    if mime.startswith(("image", "video")):
                        width = 64 + (i % 32) * 16
                        height = 64 + (i % 24) * 16
                    if mime.startswith(("audio", "video")):
                        duration_ms = 1000 + (i % 100) * 250
                rows["media_ref"].append(f"media://synth/{i}")
                rows["mime"].append(mime)
                rows["payload"].append(payload)
                rows["meta"].append(
                    {
                        "width": width,
                        "height": height,
                        "duration_ms": duration_ms,
                        "sample_rate": sample_rate,
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
