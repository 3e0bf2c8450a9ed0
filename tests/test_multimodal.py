"""Multimodal binary-column plumbing: manifest schema, Arrow-batched decode
(stubbed kernels), frame-sampling plan arithmetic."""

import hashlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def media(spark):
    from sparksearch.corpus import pages_from_documents
    from sparksearch.multimodal import media_manifest
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    return media_manifest(pages).persist()


def test_manifest_schema(media):
    from sparksearch.multimodal import MEDIA_SCHEMA
    got = [(f.name, f.dataType.simpleString()) for f in media.schema.fields]
    want = [(f.name, f.dataType.simpleString()) for f in MEDIA_SCHEMA.fields]
    assert got == want  # names + types (nullability is derived by Catalyst)
    assert media.count() == 500


def test_decode_exact_fields(spark, media):
    from sparksearch.multimodal import decode_metadata
    out = decode_metadata(media).collect()
    assert len(out) == 500
    raw = {r["media_id"]: bytes(r["payload"]) for r in
           media.limit(5).collect()}
    got = {r["media_id"]: r for r in out}
    for mid, payload in raw.items():
        assert got[mid]["n_bytes"] == len(payload)
        assert got[mid]["sha1"] == hashlib.sha1(payload).hexdigest()
        # html rows get no fake media dimensions
        assert got[mid]["width"] is None


def test_decode_stub_raises(spark, media):
    from sparksearch.multimodal import decode_metadata
    with pytest.raises(Exception) as ei:
        decode_metadata(media.limit(1), decode_stub="raise").collect()
    assert "NotImplementedError" in str(ei.value) \
        or isinstance(ei.value, NotImplementedError)


def test_fake_video_decode_and_frame_sampling(spark):
    from sparksearch.multimodal import decode_metadata, sample_frames
    rows = [(f"v{i}", "video", bytes([i]) * 100,
             (f"https://v/{i}", "video/mp4")) for i in range(8)]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, payload binary, "
              "meta struct<source_url:string, content_type:string>")
    dec = decode_metadata(media)
    d = dec.collect()
    assert all(r["duration_ms"] is not None and r["width"] is not None
               for r in d)
    frames = sample_frames(dec, media, every_ms=10_000).collect()
    by_id = {r["media_id"]: r["duration_ms"] for r in d}
    import math
    for mid, dur in by_id.items():
        expect = math.floor((dur - 1) / 10_000) + 1
        got = [f for f in frames if f["media_id"] == mid]
        assert len(got) == expect
        assert {f["offset_ms"] for f in got} \
            == {i * 10_000 for i in range(expect)}
        assert all(len(f["frame_sha1"]) == 40 for f in got)


# ---------------------------------------------------------------------------
# real container-header decode (decode_stub="headers")
# ---------------------------------------------------------------------------

def _png(w, h):
    import struct
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR"
            + struct.pack(">II", w, h) + b"\x08\x06\x00\x00\x00")


def _wav(seconds, channels=2, rate=8000, bps=2):
    import struct
    byte_rate = rate * channels * bps
    data = b"\x00" * (byte_rate * seconds)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16)
            + struct.pack("<HHIIHH", 1, channels, rate, byte_rate,
                          channels * bps, bps * 8)
            + b"data" + struct.pack("<I", len(data)) + data)


def test_sniff_media_containers():
    import struct

    from sparksearch.multimodal import sniff_media
    assert sniff_media(_png(640, 480)) == (640, 480, None, None)
    assert sniff_media(b"GIF89a" + struct.pack("<HH", 320, 200)) \
        == (320, 200, None, None)
    jpeg = (b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + b"\x00" * 10 + b"\xff\xc2" + struct.pack(">H", 17)
            + b"\x08" + struct.pack(">HH", 1080, 1920) + b"\x03")
    assert sniff_media(jpeg) == (1920, 1080, None, None)
    # top-down BMP stores negative height
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 800, -600)
    assert sniff_media(bmp) == (800, 600, None, None)
    assert sniff_media(_wav(2, channels=2, rate=8000)) \
        == (None, None, 2000, 2)
    assert sniff_media(b"not a media file") is None


def test_decode_metadata_headers_mode(spark):
    from sparksearch.multimodal import decode_metadata
    rows = [("img1", "image", bytearray(_png(99, 44)), None),
            ("aud1", "audio", bytearray(_wav(1, channels=1)), None),
            ("doc1", "html", bytearray(b"<html></html>"), None)]
    from sparksearch.multimodal import MEDIA_SCHEMA
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in
           decode_metadata(df, decode_stub="headers").collect()}
    assert (out["img1"]["width"], out["img1"]["height"]) == (99, 44)
    assert (out["aud1"]["duration_ms"], out["aud1"]["channels"]) == (1000, 1)
    assert out["doc1"]["width"] is None         # unknown container -> nulls
    assert out["doc1"]["n_bytes"] == 13         # exact fields still real


# ---------------------------------------------------------------------------
# real pixel / PCM kernels (BMP, WAV PCM16)
# ---------------------------------------------------------------------------

def _pix(x, y):
    return ((x * 31) % 256, (y * 13) % 256, (x + y) % 256)


def test_bmp_roundtrip_and_resize():
    from sparksearch.multimodal import bmp_decode, bmp_resize, make_bmp
    b = make_bmp(8, 6, _pix)
    w, h, px = bmp_decode(b)
    assert (w, h) == (8, 6)
    assert all(px[y][x] == _pix(x, y) for y in range(6) for x in range(8))
    assert bmp_resize(b, 8, 6) == b          # identity resize byte-exact
    w2, h2, px2 = bmp_decode(bmp_resize(b, 5, 4))
    assert (w2, h2) == (5, 4)
    for y in range(4):
        for x in range(5):
            assert px2[y][x] == _pix(x * 8 // 5, y * 6 // 4)


def test_bmp_refuses_compressed():
    import pytest
    from sparksearch.multimodal import bmp_decode, make_bmp
    data = bytearray(make_bmp(2, 2, _pix))
    data[30] = 1                              # BI_RLE8 compression flag
    with pytest.raises(NotImplementedError):
        bmp_decode(bytes(data))


def test_wav_roundtrip_and_resample():
    from sparksearch.multimodal import make_wav, wav_decode, wav_resample
    samples = [i * 100 - 3000 for i in range(160)]     # 80 stereo frames
    wv = make_wav(8000, 2, samples)
    assert wav_decode(wv) == (8000, 2, samples)
    r, ch, s = wav_decode(wav_resample(wv, 4000))
    assert (r, ch, len(s)) == (4000, 2, 160 // 2)
    assert s[:4] == samples[0:2] + samples[4:6]        # every other frame


def test_resize_images_stage(spark):
    from sparksearch.multimodal import bmp_decode, make_bmp, resize_images
    rows = [("a", make_bmp(8, 6, _pix)),
            ("b", b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)]
    df = spark.createDataFrame(rows, "media_id string, payload binary")
    out = {r["media_id"]: r for r in resize_images(df, 4, 3).collect()}
    assert out["a"]["resized"] and out["a"]["width"] == 4
    assert bmp_decode(bytes(out["a"]["payload"]))[0] == 4
    assert not out["b"]["resized"]            # compressed: plug point
    assert bytes(out["b"]["payload"]) == rows[1][1]


def test_resample_audio_stage(spark):
    from sparksearch.multimodal import make_wav, resample_audio, wav_decode
    df = spark.createDataFrame(
        [("a", make_wav(8000, 1, list(range(-40, 40))))],
        "media_id string, payload binary")
    r = resample_audio(df, 2000).collect()[0]
    assert r["resized"] and r["rate"] == 2000
    assert wav_decode(bytes(r["payload"]))[0] == 2000
