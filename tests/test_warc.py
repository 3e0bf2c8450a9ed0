"""WARC source connector: writer/reader round trip, gzip members,
framing robustness, and the Spark ingest pass."""

from sparksearch.warc import (iter_warc, make_warc, warc_pages,
                              warc_to_pages)

RECS = [("https://a.example/1", "2025-01-01T00:00:01Z",
         b"<html><body>hello there</body></html>"),
        ("https://b.example/2", "2025-01-01T00:00:02Z",
         "<html><body>café \r\n bins</body></html>".encode())]


def test_roundtrip_plain_and_gzip():
    for comp in (False, True):
        out = warc_pages(make_warc(RECS, compress=comp))
        assert [(r["url"], r["html"]) for r in out] == \
            [(u, h) for u, _, h in RECS]
        assert out[0]["warc_ts"].isoformat() == "2025-01-01T00:00:01"


def test_writer_deterministic():
    assert make_warc(RECS, compress=True) == make_warc(RECS, compress=True)


def test_framing_is_content_length_not_markers():
    tricky = b"<html>WARC/1.0\r\n\r\nContent-Length: 9</html>"
    data = make_warc([("https://t.example/x",
                       "2025-01-01T00:00:03Z", tricky)])
    assert warc_pages(data)[0]["html"] == tricky


def test_non_response_records_skipped():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
            b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    data = info + make_warc(RECS[:1])
    recs = list(iter_warc(data))
    assert len(recs) == 2
    assert len(warc_pages(data)) == 1


def test_warc_to_pages_spark(spark):
    df = spark.createDataFrame(
        [(make_warc(RECS, compress=True),), (None,)], "data binary")
    rows = {r["url"]: r for r in warc_to_pages(df).collect()}
    assert set(rows) == {"https://a.example/1", "https://b.example/2"}
    assert rows["https://a.example/1"]["text"] == "hello there"
    assert bytes(rows["https://b.example/2"]["html"]) == RECS[1][2]
    assert rows["https://a.example/1"]["lang"] is None


def test_pages_to_warc_roundtrip(spark):
    import datetime
    from sparksearch.warc import pages_to_warc, warc_to_pages
    rows = [(f"https://h{i % 3}.example/p/{i:04d}",
             datetime.datetime(2025, 1, 1, 0, 0, i),
             f"<html><body>doc {i} words</body></html>".encode())
            for i in range(30)]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary")
    warcs = pages_to_warc(pages, n_files=4)
    assert warcs.count() <= 4
    back = {r["url"]: r for r in warc_to_pages(warcs).collect()}
    assert len(back) == 30
    for i, (u, ts, h) in enumerate(rows):
        assert bytes(back[u]["html"]) == h
        assert back[u]["warc_ts"] == ts
        assert back[u]["text"] == f"doc {i} words"
