"""Structured Streaming indexing: micro-batches become generations,
replayed batches are idempotent, queries see streamed docs."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents

    root = tmp_path_factory.mktemp("stream")
    ix_dir = str(root / "index")
    src_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    first = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    rest = pages.filter(F.crc32(F.col("url")) % 2 == 1)
    build_index(first, ix_dir, n_buckets=4, partitions=4)
    from sparksearch.segments import build_segments
    build_segments(spark, ix_dir, salt_target=64, n_chunks=1, partitions=4)
    rest.write.mode("overwrite").parquet(src_dir)
    return ix_dir, src_dir, ckpt


def test_stream_index_drain_and_idempotent(spark, stream_setup):
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    from sparksearch.streaming import indexed_batches, stream_index

    ix_dir, src_dir, ckpt = stream_setup
    q = stream_index(spark, src_dir, ix_dir, ckpt, partitions=4,
                     salt_target=64, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive

    ix = IndexReader(spark, ix_dir)
    assert ix.generations == [0, 1]
    assert ix.n_docs == 500
    assert indexed_batches(ix_dir)  # at least one batch recorded

    hits = Executor(ix).search(Match("text", "join"), k=5).collect()
    assert len(hits) == 5

    # restart over the same checkpoint: no files left → no new generation;
    # and a replayed batch id would be skipped by the state file
    q2 = stream_index(spark, src_dir, ix_dir, ckpt, partitions=4,
                      salt_target=64, available_now=True)
    q2.awaitTermination(120)
    ix2 = IndexReader(spark, ix_dir)
    assert ix2.generations == [0, 1]
    assert ix2.n_docs == 500


def _write_pages(spark, rows, path, mode="append"):
    (spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, "
              "lang string")
     .coalesce(1).write.mode(mode).parquet(path))


def test_windowed_page_stats_watermark(spark, tmp_path):
    """Append-mode windows emit once the watermark passes their end; a
    too-late row neither reopens nor changes a closed window. File sink
    (supports checkpoint recovery) so the stream restarts with state."""
    import datetime as dt
    from sparksearch.streaming import windowed_page_stats
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t = lambda m, s=0: dt.datetime(2025, 1, 1, 0, m, s)

    def drain():
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, html binary, "
                          "text string, lang string").parquet(src))
        q = (windowed_page_stats(stream, window="1 minute",
                                 watermark="2 minutes")
             .writeStream.format("parquet").option("path", sink)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.read.parquet(sink).collect()

    _write_pages(spark, [
        ("https://a/x1", t(0, 10), None, "one two", "en"),
        ("https://a/x2", t(0, 40), None, "three", "en"),
        ("https://a/x3", t(5, 0), None, "advances watermark", "en"),
    ], src, mode="overwrite")
    first = {(r["window_start"].minute, r["doc_count"]) for r in drain()}
    # watermark = 00:05 - 2 min = 00:03 > window [00:00,00:01) end -> emitted
    assert (0, 2) in first
    # a row for the already-closed 00:00 window arrives too late
    _write_pages(spark, [("https://a/x4", t(0, 50), None, "late", "en")], src)
    rows = [r for r in drain()
            if r["window_start"] == dt.datetime(2025, 1, 1, 0, 0)]
    assert rows and all(r["doc_count"] == 2 for r in rows)


def test_site_running_counts_state_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps per-site totals across micro-batches
    via the checkpoint: two drains, cumulative counts. foreachBatch sink
    (checkpoint-recoverable) appends each update to parquet."""
    import datetime as dt
    from sparksearch.streaming import site_running_counts
    src = str(tmp_path / "src2")
    ckpt = str(tmp_path / "ckpt2")
    sink = str(tmp_path / "sink2")
    t = lambda m: dt.datetime(2025, 1, 1, 0, m)

    def drain():
        stream = (spark.readStream
                  .schema("url string, warc_ts timestamp, html binary, "
                          "text string, lang string").parquet(src))
        q = (site_running_counts(stream)
             .writeStream
             .foreachBatch(lambda df, bid:
                           df.withColumn("batch", df.total_docs * 0 + bid)
                           .write.mode("append").parquet(sink))
             .outputMode("update").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        rows = spark.read.parquet(sink).collect()
        latest = {}
        for r in sorted(rows, key=lambda r: r["batch"]):
            latest[r["site"]] = r["total_docs"]
        return latest

    _write_pages(spark, [
        ("https://s1.ex/a", t(0), None, "x", "en"),
        ("https://s1.ex/b", t(1), None, "y", "en"),
        ("https://s2.ex/c", t(1), None, "z", "en"),
    ], src, mode="overwrite")
    got1 = drain()
    assert got1 == {"s1.ex": 2, "s2.ex": 1}
    _write_pages(spark, [
        ("https://s1.ex/d", t(2), None, "w", "en"),
    ], src)
    got2 = drain()
    assert got2["s1.ex"] == 3  # state carried across the restart


def test_dedup_stream_across_batches(spark, tmp_path_factory):
    """Streaming exact dedup: identical content arriving in a LATER
    micro-batch (within the watermark horizon) is dropped; state survives
    the checkpoint across availableNow drains."""
    from sparksearch.corpus import pages_from_documents
    from sparksearch.streaming import dedup_stream

    root = tmp_path_factory.mktemp("sdedup")
    src = str(root / "in")
    out = str(root / "out")
    ckpt = str(root / "ckpt")
    pages = pages_from_documents(spark, "/root/testdata/sf0.001") \
        .select("url", "warc_ts", "text", "lang") \
        .orderBy("url").limit(60).cache()
    n = pages.count()

    def drain():
        stream = (spark.readStream.schema(pages.schema).parquet(src))
        q = (dedup_stream(stream, watermark="60 minutes")
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: the 60 originals
    pages.write.mode("overwrite").parquet(src)
    drain()
    assert spark.read.parquet(out).count() == n

    # batch 2: 30 exact dupes (same text ⇒ same hash, later event time)
    # + 20 genuinely new rows (distinct urls ⇒ distinct text)
    dupes = (pages.orderBy("url").limit(30)
             .withColumn("warc_ts",
                         F.col("warc_ts") + F.expr("INTERVAL 10 SECONDS"))
             .withColumn("url", F.concat(F.col("url"), F.lit("?rep"))))
    fresh = (pages_from_documents(spark, "/root/testdata/sf0.001")
             .select("url", "warc_ts", "text", "lang")
             .orderBy(F.col("url").desc()).limit(20))
    dupes.unionByName(fresh).write.mode("overwrite").parquet(src)
    drain()
    got = spark.read.parquet(out)
    # 60 originals + 20 fresh; the 30 replays deduped against stream state
    assert got.count() == n + 20
    assert got.select("text").distinct().count() == n + 20
    pages.unpersist()


def test_percolate_stream_alerts(spark, tmp_path_factory):
    """Stored queries fire continuously against arriving pages; a second
    batch only appends its own alerts (no reprocessing)."""
    from pyspark.sql import functions as F

    from sparksearch.corpus import pages_from_documents
    from sparksearch.percolate import percolate
    from sparksearch.streaming import percolate_stream

    root = tmp_path_factory.mktemp("sperc")
    src, out, ckpt = (str(root / d) for d in ("in", "out", "ckpt"))
    pages = pages_from_documents(spark, "/root/testdata/sf0.001") \
        .select("url", "text").orderBy("url").limit(40).cache()
    queries = spark.createDataFrame(
        [(1, "term", ["join"], 1), (2, "match", ["hash", "table"], 2)],
        "qid int, kind string, terms array<string>, msm int").cache()

    def drain():
        stream = spark.readStream.schema(pages.schema).parquet(src)
        q = (percolate_stream(stream, queries)
             .writeStream.format("parquet")
             .option("path", out).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    batch1 = pages.limit(25)
    batch1.write.mode("overwrite").parquet(src)
    drain()
    got1 = {(r.url, r.qid) for r in spark.read.parquet(out).collect()}
    want1 = {(r.url, r.qid) for r in percolate(batch1, queries).collect()}
    assert got1 == want1 and got1

    batch2 = pages.subtract(batch1)
    batch2.write.mode("append").parquet(src)
    drain()
    got = {(r.url, r.qid) for r in spark.read.parquet(out).collect()}
    want = {(r.url, r.qid) for r in percolate(pages, queries).collect()}
    assert got == want and len(got) > len(got1)


def test_session_window_stats_gap_semantics(spark, tmp_path):
    """Native session_window sessions: rows within the 30-min gap merge
    into one session per site; a row past the gap opens a second session.
    Append mode emits a session only after the watermark passes its end."""
    import datetime as dt

    from sparksearch.streaming import session_window_stats
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t = lambda h, m: dt.datetime(2025, 1, 1, h, m)

    _write_pages(spark, [
        ("https://a.example/1", t(0, 0), None, "aa", "en"),
        ("https://a.example/2", t(0, 10), None, "bbb", "en"),   # same sess
        ("https://a.example/3", t(1, 0), None, "c", "en"),      # new sess
        ("https://b.example/1", t(0, 5), None, "dd", "en"),
        # far-future row advances the watermark past every session end
        ("https://z.example/9", t(9, 0), None, "zz", "en"),
    ], src, mode="overwrite")

    stream = (spark.readStream
              .schema("url string, warc_ts timestamp, html binary, "
                      "text string, lang string").parquet(src))
    q = (session_window_stats(stream, gap="30 minutes", watermark="1 hour")
         .writeStream.format("parquet").option("path", sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.read.parquet(sink).collect()
    by = {(r["site"], r["session_start"].hour, r["session_start"].minute):
          (r["n_pages"], r["chars"]) for r in rows}
    # a.example: one 2-page session [00:00, 00:40), one 1-page at 01:00
    assert by[("a.example", 0, 0)] == (2, 5)
    assert by[("a.example", 1, 0)] == (1, 1)
    assert by[("b.example", 0, 5)] == (1, 2)
    # session end = last event + gap
    a0 = [r for r in rows if r["site"] == "a.example"
          and r["session_start"].minute == 0 and r["session_start"].hour == 0]
    assert a0[0]["session_end"] == t(0, 40)
