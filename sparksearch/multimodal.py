"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data corpus carries image/audio/video alongside text. The
Spark-native pattern: payloads are `binary` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched `mapInPandas` stages so bytes never round-trip through
driver or per-row Python.

The heavy media codecs (PIL/ffmpeg/torchaudio) are NOT in this
environment, so the decode kernels are stubbed two ways:
  - `decode_stub="deterministic"` (default): a seeded fake decoder that
    derives plausible metadata (dimensions, duration, channels) from a
    hash of the payload — so the full Spark plumbing (schema, batching,
    partitioning, joins on metadata) is real and testable;
  - `decode_stub="raise"`: NotImplementedError at first batch — the
    production wiring point where a real codec import goes.

Everything upstream/downstream of the kernel (manifest schema, content
hashing, size stats, batch shapes) is exact and production-grade.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "media_manifest",
    "decode_metadata",
    "sample_frames",
]

#: canonical multimodal row: key + kind + payload + source metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),    # image|audio|video|html
    T.StructField("payload", T.BinaryType(), False),
    T.StructField("meta", T.StructType([
        T.StructField("source_url", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
    ]), True),
])

_DECODED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("kind", T.StringType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("sha1", T.StringType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.IntegerType(), True),
    T.StructField("channels", T.IntegerType(), True),
])


def media_manifest(pages: DataFrame) -> DataFrame:
    """Pages → multimodal rows: the html payload as the binary column
    (the corpus's real binary payload), JVM-side only."""
    return pages.select(
        F.col("url").alias("media_id"),
        F.lit("html").alias("kind"),
        F.col("html").alias("payload"),
        F.struct(F.col("url").alias("source_url"),
                 F.lit("text/html").alias("content_type")).alias("meta"))


def decode_metadata(media: DataFrame,
                    decode_stub: str = "deterministic") -> DataFrame:
    """Decode payloads → typed metadata. Arrow-batched; exact fields
    (n_bytes, sha1) are real, media dimensions come from the stub."""

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if decode_stub == "raise":
                    raise NotImplementedError(
                        "media codec not available in this environment; "
                        "plug PIL/ffmpeg decode here")
                h = hashlib.sha1(payload).hexdigest()
                seed = int(h[:8], 16)
                width = height = duration = channels = None
                if r.kind == "image":
                    width, height = 64 + seed % 1920, 64 + (seed >> 8) % 1080
                elif r.kind == "audio":
                    duration, channels = 1000 + seed % 600_000, 1 + seed % 2
                elif r.kind == "video":
                    width, height = 160 + seed % 1760, 90 + (seed >> 8) % 990
                    duration = 1000 + seed % 3_600_000
                rows.append((r.media_id, r.kind, len(payload), h,
                             width, height, duration, channels))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _DECODED_SCHEMA])

    return (media.select("media_id", "kind", "payload")
            .mapInPandas(kernel, schema=_DECODED_SCHEMA))


_FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("frame_idx", T.IntegerType(), False),
    T.StructField("offset_ms", T.IntegerType(), False),
    T.StructField("frame_sha1", T.StringType(), False),
])


def sample_frames(decoded: DataFrame, media: DataFrame,
                  every_ms: int = 10_000) -> DataFrame:
    """Frame sampling plan + stub extraction: one row per sampled frame at
    a fixed stride. The *plan* (offsets from metadata) is exact JVM-side
    arithmetic; the frame hash is the stubbed extract kernel."""
    plan = (decoded.where(F.col("duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.floor((F.col("duration_ms") - 1) / every_ms)
                        .cast("int")))
                    .alias("frame_idx"))
            .select("media_id",
                    F.col("frame_idx").cast("int").alias("frame_idx"),
                    (F.col("frame_idx") * every_ms).cast("int")
                    .alias("offset_ms")))
    joined = plan.join(media.select("media_id", "payload"), "media_id")

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                h = hashlib.sha1(
                    bytes(r.payload) + int(r.offset_ms).to_bytes(8, "big")
                ).hexdigest()
                rows.append((r.media_id, int(r.frame_idx),
                             int(r.offset_ms), h))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _FRAME_SCHEMA])

    return joined.mapInPandas(kernel, schema=_FRAME_SCHEMA)
