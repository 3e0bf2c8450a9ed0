"""WARC source connector: Common-Crawl-style web-archive ingestion.

The north-star corpus is "Iceberg tables of Common-Crawl-style web pages
(url, warc_ts, html, text, lang)"; Common Crawl itself ships WARC files
(ISO 28500).  This module closes the loop from raw crawl archives to
that table shape:

- `make_warc` — deterministic writer (test fixtures / round-trip gates;
  gzip members with mtime=0 so bytes are reproducible);
- `iter_warc` / `warc_pages` — pure-bytes reader: records are framed by
  their Content-Length header (payload bytes are never scanned for
  markers), per-record gzip members (the Common Crawl layout: each
  record is its own gzip stream, so a file is seekable by offset) are
  inflated with stdlib zlib;
- `warc_to_pages` — the Spark ingest: ONE Arrow `mapInPandas` pass over
  a frame of WARC blobs → pages(url, warc_ts, html, text, lang) rows,
  text via the frozen html_strip extractor (extract.extract_text).
  Archive bytes never leave the executors and never shuffle; at 100 TB
  this is a map-only pass whose output feeds `build.build_index`
  directly.

The reference ingests via the `_bulk` REST API rather than WARC; this
connector is the crawl-corpus on-ramp a Common-Crawl-scale deployment
needs in front of it (SURVEY.md §2.1 sources).
"""

from __future__ import annotations

import gzip
import hashlib
import zlib
from datetime import datetime

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["make_warc", "make_http_response", "iter_warc", "warc_pages",
           "warc_to_pages", "pages_to_warc"]

_CRLF = b"\r\n"


def make_http_response(body: bytes,
                       content_type: str = "text/html; charset=UTF-8"
                       ) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: "
            + content_type.encode("ascii")
            + b"\r\nContent-Length: " + str(len(body)).encode("ascii")
            + b"\r\n\r\n" + body)


def make_warc(records, compress: bool = False) -> bytes:
    """Serialize (url, iso8601_ts, html_bytes) triples as WARC/1.0
    response records (payload = a minimal HTTP/1.1 200 response).
    Record-IDs are content-derived UUIDs so output is byte-deterministic;
    compress=True emits one gzip member per record (mtime pinned to 0),
    the Common Crawl layout."""
    out = bytearray()
    for url, ts, html in records:
        http = make_http_response(bytes(html))
        rid = hashlib.sha1(
            url.encode() + b"\x1f" + ts.encode()).hexdigest()
        uuid = (f"{rid[:8]}-{rid[8:12]}-{rid[12:16]}-{rid[16:20]}-"
                f"{rid[20:32]}")
        hdr = (b"WARC/1.0\r\n"
               b"WARC-Type: response\r\n"
               b"WARC-Record-ID: <urn:uuid:" + uuid.encode() + b">\r\n"
               b"WARC-Date: " + ts.encode("ascii") + b"\r\n"
               b"WARC-Target-URI: " + url.encode("utf-8") + b"\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               b"Content-Length: " + str(len(http)).encode() + b"\r\n"
               b"\r\n")
        rec = hdr + http + b"\r\n\r\n"
        out += gzip.compress(rec, mtime=0) if compress else rec
    return bytes(out)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenated gzip members → concatenated plain bytes."""
    out = bytearray()
    rest = data
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(rest)
        out += d.flush()
        rest = d.unused_data
    return bytes(out) + rest


def iter_warc(data: bytes):
    """Yield (warc_headers dict, payload bytes) per record.  Framing is
    the Content-Length header — payload bytes are never scanned."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    i, n = 0, len(data)
    while i < n:
        # skip inter-record CRLFs
        while data[i:i + 2] == _CRLF:
            i += 2
        if i >= n:
            break
        end = data.find(b"\r\n\r\n", i)
        if end < 0 or not data[i:i + 5] == b"WARC/":
            break
        headers: dict[str, str] = {}
        for line in data[i:end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("ascii").strip().lower()] = \
                v.decode("utf-8", errors="replace").strip()
        plen = int(headers.get("content-length", "0"))
        payload = data[end + 4:end + 4 + plen]
        yield headers, payload
        i = end + 4 + plen


def _http_body(payload: bytes) -> bytes:
    if payload[:5] in (b"HTTP/",):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4:]
    return payload


def warc_pages(data: bytes) -> list[dict]:
    """response records → [{url, warc_ts, html}] (other record types —
    warcinfo, request, metadata — are skipped like every CC consumer
    does)."""
    out = []
    for headers, payload in iter_warc(data):
        if headers.get("warc-type") != "response":
            continue
        ts = headers.get("warc-date", "")
        try:
            when = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            try:
                when = datetime.strptime(ts, "%Y-%m-%dT%H:%M:%S.%fZ")
            except ValueError:
                when = None
        out.append({"url": headers.get("warc-target-uri", ""),
                    "warc_ts": when,
                    "html": _http_body(payload)})
    return out


def pages_to_warc(pages: DataFrame, n_files: int | None = None,
                  compress: bool = True,
                  url_col: str = "url", ts_col: str = "warc_ts",
                  html_col: str = "html",
                  docs_per_archive: int = 2000) -> DataFrame:
    """The write side: pages → (data binary) WARC blobs.  Grouping is a
    hash of the url (deterministic, skew-free), records within an archive
    sorted by url so output bytes are reproducible.  One applyInPandas
    stage; pair with an external `.write` (binary files / object store)
    to export.

    `n_files=None` (default) scales the archive count with the input —
    ceil(count / docs_per_archive) — so a 100 TB caller never packs
    corpus/8-sized archives into single pandas groups; pass an explicit
    n_files to pin the layout.  WARC-Date is stamped from the timestamp's
    true epoch micros (`unix_micros`, session-timezone-independent) in
    UTC, with sub-second precision preserved when nonzero — matching the
    stricter of the two forms `iter_warc` parses."""
    import pandas as pd

    if n_files is None:
        n_files = max(1, -(-pages.count() // int(docs_per_archive)))

    def _stamp(us: int) -> str:
        t = datetime.utcfromtimestamp(us // 1_000_000)
        frac = us % 1_000_000
        base = t.strftime("%Y-%m-%dT%H:%M:%S")
        return f"{base}.{frac:06d}Z" if frac else base + "Z"

    def pack(pdf):
        pdf = pdf.sort_values(url_col)
        recs = [(u, _stamp(int(us)), bytes(h))
                for u, us, h in zip(pdf[url_col], pdf["_us"],
                                    pdf[html_col])]
        return pd.DataFrame({"data": [make_warc(recs, compress=compress)]})

    return (pages
            .withColumn("_us", F.unix_micros(F.col(ts_col)))
            .withColumn("_g", F.pmod(F.xxhash64(url_col),
                                     F.lit(int(n_files))))
            .groupBy("_g").applyInPandas(pack, "data binary"))


_PAGES_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def warc_to_pages(df: DataFrame, data_col: str = "data") -> DataFrame:
    """WARC blobs → pages(url, warc_ts, html, text, lang): one Arrow
    mapInPandas stage; text = frozen html_strip extraction, lang left
    null for a downstream `dataops.lang_id` pass.  Map-only — archive
    bytes never shuffle."""
    import pandas as pd

    from sparksearch.extract import extract_text

    def kernel(batches):
        for pdf in batches:
            rows = []
            for blob in pdf[data_col]:
                if blob is None:
                    continue
                for r in warc_pages(bytes(blob)):
                    rows.append((r["url"], r["warc_ts"], r["html"],
                                 extract_text(r["html"]), None))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _PAGES_SCHEMA.fields])

    return df.mapInPandas(kernel, schema=_PAGES_SCHEMA)
