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
