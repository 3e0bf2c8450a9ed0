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


# ---------------------------------------------------------------------------
# Real pixel / PCM kernels for the uncompressed containers (BMP BI_RGB,
# WAV PCM16) — pure bytes + struct, no codec library.  These replace the
# stub for the formats that don't need one; PNG/JPEG/GIF/WebP decode
# still routes to the decode_stub plug point (their codecs aren't in
# this environment).
# ---------------------------------------------------------------------------

def make_bmp(width: int, height: int, pixel) -> bytes:
    """24-bit BI_RGB bottom-up BMP; `pixel(x, y) -> (r, g, b)`."""
    import struct
    row_size = (width * 3 + 3) // 4 * 4
    img_size = row_size * height
    out = bytearray()
    out += b"BM" + struct.pack("<IHHI", 54 + img_size, 0, 0, 54)
    out += struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       img_size, 2835, 2835, 0, 0)
    for y in range(height - 1, -1, -1):        # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixel(x, y)
            row += bytes((b & 0xFF, g & 0xFF, r & 0xFF))   # BGR order
        row += b"\x00" * (row_size - len(row))
        out += row
    return bytes(out)


def bmp_decode(data: bytes):
    """(width, height, pixels) — pixels[y][x] = (r, g, b), top-down.
    24-bit BI_RGB only (compression raises loudly)."""
    import struct
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp, comp = struct.unpack_from("<xxH I", data, 26)
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"only 24-bit BI_RGB BMP decodes here (bpp={bpp}, "
            f"compression={comp})")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) // 4 * 4
    pixels = []
    for y in range(h):
        sy = (h - 1 - y) if bottom_up else y
        base = off + sy * row_size
        row = [(data[base + 3 * x + 2], data[base + 3 * x + 1],
                data[base + 3 * x]) for x in range(w)]
        pixels.append(row)
    return w, h, pixels


def bmp_resize(data: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resample: src = (x·w_in)//w_out — the exact
    integer rule the SQL oracle replays."""
    w, h, px = bmp_decode(data)
    return make_bmp(out_w, out_h,
                    lambda x, y: px[y * h // out_h][x * w // out_w])


def make_wav(rate: int, channels: int, samples: list) -> bytes:
    """PCM16 WAV; `samples` = interleaved int16 frames."""
    import struct
    payload = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = rate * channels * 2
    return (b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, rate,
                                    byte_rate, channels * 2, 16)
            + b"data" + struct.pack("<I", len(payload)) + payload)


def wav_decode(data: bytes):
    """(rate, channels, interleaved int16 samples) — PCM16 only."""
    import struct
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    i = 12
    rate = channels = None
    samples = []
    while i + 8 <= len(data):
        cid, size = data[i:i + 4], struct.unpack_from("<I", data, i + 4)[0]
        body = data[i + 8:i + 8 + size]
        if cid == b"fmt ":
            fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(
                    f"only PCM16 WAV decodes here (fmt={fmt}, bits={bits})")
        elif cid == b"data":
            samples = list(struct.unpack(f"<{len(body) // 2}h", body))
        i += 8 + size + (size & 1)
    return rate, channels, samples


def wav_resample(data: bytes, out_rate: int) -> bytes:
    """Nearest-frame PCM resample: out frame i ← in frame
    (i·rate_in)//rate_out, all channels together."""
    rate, ch, samples = wav_decode(data)
    n_in = len(samples) // ch
    n_out = n_in * out_rate // rate
    out = []
    for i in range(n_out):
        src = i * rate // out_rate
        out.extend(samples[src * ch:(src + 1) * ch])
    return make_wav(out_rate, ch, out)


_RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.StringType(), False),
    T.StructField("resized", T.BooleanType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("payload", T.BinaryType(), True),
])


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize stage: REAL nearest-neighbor pixel resample for BMP
    payloads; compressed containers pass through resized=false (their
    codec is the decode_stub plug point).  One Arrow mapInPandas pass —
    bytes never leave the executors."""
    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if payload[:2] == b"BM":
                    out = bmp_resize(payload, width, height)
                    rows.append((r.media_id, True, width, height, out))
                else:
                    rows.append((r.media_id, False, None, None, payload))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _RESIZED_SCHEMA])
    return (media.select("media_id", "payload")
            .mapInPandas(kernel, schema=_RESIZED_SCHEMA))


def resample_audio(media: DataFrame, rate: int) -> DataFrame:
    """Audio resample stage: REAL nearest-frame PCM16 resample for WAV
    payloads; compressed audio passes through resized=false."""
    schema = T.StructType([
        T.StructField("media_id", T.StringType(), False),
        T.StructField("resized", T.BooleanType(), False),
        T.StructField("rate", T.IntegerType(), True),
        T.StructField("payload", T.BinaryType(), True),
    ])

    def kernel(batches):
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    rows.append((r.media_id, True, rate,
                                 wav_resample(payload, rate)))
                else:
                    rows.append((r.media_id, False, None, payload))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in schema.fields])
    return (media.select("media_id", "payload")
            .mapInPandas(kernel, schema=schema))
