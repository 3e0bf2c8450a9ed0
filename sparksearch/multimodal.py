"""Multimodal columns: opaque binary payloads + typed metadata.

A 100 TB training-data corpus carries image/audio/video alongside text. The
Spark-native pattern: payloads are `binary` columns with a typed metadata
struct; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched `mapInPandas` stages so bytes never round-trip through
driver or per-row Python.

The heavy media codecs (PIL/ffmpeg/torchaudio) are NOT in this
environment.  The metadata decode has three modes:
  - `decode_stub="headers"`: REAL container-header parsing (pure bytes:
    PNG/GIF/JPEG/BMP/WAV/WebP via `sniff_media`) — width/height/
    duration/channels are exact for those containers, no codec library;
  - `decode_stub="deterministic"` (default): a seeded fake decoder that
    derives plausible metadata (dimensions, duration, channels) from a
    hash of the payload — so the full Spark plumbing (schema, batching,
    partitioning, joins on metadata) is real and testable;
  - `decode_stub="raise"`: NotImplementedError at first batch — the
    production wiring point where a full pixel/sample decoder goes.

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
    "sniff_media",
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


def sniff_media(payload: bytes) -> tuple | None:
    """REAL container-header parsing, pure bytes — no codec library:
    (width, height, duration_ms, channels) from PNG IHDR, GIF logical
    screen, JPEG SOFn, BMP InfoHeader, WAV fmt/data chunks, WebP VP8X.
    Returns None when the magic is unknown (full pixel/sample decode
    still needs PIL/ffmpeg — this covers the metadata fields)."""
    import struct
    p = payload
    if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24:
        w, h = struct.unpack(">II", p[16:24])
        return (w, h, None, None)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
        w, h = struct.unpack("<HH", p[6:10])
        return (w, h, None, None)
    if p[:2] == b"\xff\xd8":                       # JPEG: walk segments
        i = 2
        while i + 9 < len(p):
            if p[i] != 0xFF:
                i += 1
                continue
            marker = p[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seglen = struct.unpack(">H", p[i + 2:i + 4])[0]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                          0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                h, w = struct.unpack(">HH", p[i + 5:i + 9])
                return (w, h, None, None)
            i += 2 + seglen
        return None
    if p[:2] == b"BM" and len(p) >= 26:
        w, h = struct.unpack("<ii", p[18:26])
        return (w, abs(h), None, None)
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        i, channels, byte_rate, data_size = 12, None, None, None
        while i + 8 <= len(p):
            cid = p[i:i + 4]
            sz = struct.unpack("<I", p[i + 4:i + 8])[0]
            if cid == b"fmt " and i + 16 <= len(p):
                channels = struct.unpack("<H", p[i + 10:i + 12])[0]
                byte_rate = struct.unpack("<I", p[i + 16:i + 20])[0]
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)
        dur = (int(data_size * 1000 / byte_rate)
               if byte_rate and data_size is not None else None)
        return (None, None, dur, channels)
    if p[:4] == b"RIFF" and p[8:12] == b"WEBP" and p[12:16] == b"VP8X" \
            and len(p) >= 30:
        w = int.from_bytes(p[24:27], "little") + 1
        h = int.from_bytes(p[27:30], "little") + 1
        return (w, h, None, None)
    return None


def decode_metadata(media: DataFrame,
                    decode_stub: str = "deterministic") -> DataFrame:
    """Decode payloads → typed metadata. Arrow-batched; exact fields
    (n_bytes, sha1) are always real.  Modes:

    - ``"headers"``: REAL decode of the metadata fields by container-
      header parsing (PNG/GIF/JPEG/BMP/WAV/WebP — `sniff_media`);
      unknown containers yield nulls.  Pixel/sample decode still needs
      PIL/ffmpeg and stays a plug point.
    - ``"deterministic"`` (default): seeded fake dimensions from the
      payload hash — full plumbing testable without media fixtures.
    - ``"raise"``: NotImplementedError at first batch (production wiring
      point for a real full decoder).
    """

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
                width = height = duration = channels = None
                if decode_stub == "headers":
                    parsed = sniff_media(payload)
                    if parsed:
                        width, height, duration, channels = parsed
                else:
                    seed = int(h[:8], 16)
                    if r.kind == "image":
                        width, height = (64 + seed % 1920,
                                         64 + (seed >> 8) % 1080)
                    elif r.kind == "audio":
                        duration, channels = (1000 + seed % 600_000,
                                              1 + seed % 2)
                    elif r.kind == "video":
                        width, height = (160 + seed % 1760,
                                         90 + (seed >> 8) % 990)
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
