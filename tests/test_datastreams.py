"""Data streams: backing-index naming/generations (DataStream.java),
creation gated on a data_stream-declaring v2 template
(MetadataCreateDataStreamService.java), timestamp guard riding the
indexing job, write-index protection, cross-generation search."""
import os

import pytest
from pyspark.sql import functions as F

from sparksearch import datastreams as DS
from sparksearch import templates as T


def _mk_template(path, pattern="logs*", ts="warc_ts"):
    T.put_index_template(path, "ds_tpl", {
        "index_patterns": [pattern], "priority": 5,
        "data_stream": {"timestamp_field": {"name": ts}}})


def _pages(spark, n=40, start=0):
    rows = [(f"https://x.example/p/{i:08d}",
             f"2025-01-01 00:00:{i % 60:02d}",
             f"alpha beta w{i % 7} gamma")
            for i in range(start, start + n)]
    return (spark.createDataFrame(rows, "url string, ts string, text string")
            .select("url", F.col("ts").cast("timestamp").alias("warc_ts"),
                    F.lit(None).cast("binary").alias("html"), "text",
                    F.lit("en").alias("lang")))


@pytest.fixture()
def paths(tmp_path):
    tpl = str(tmp_path / "templates.json")
    ds = str(tmp_path / "datastreams.json")
    _mk_template(tpl)
    return tpl, ds, str(tmp_path)


def test_backing_index_name():
    assert DS.backing_index_name("logs", 1) == ".ds-logs-000001"
    assert DS.backing_index_name("logs", 42) == ".ds-logs-000042"


def test_create_requires_data_stream_template(tmp_path):
    tpl = str(tmp_path / "t.json")
    ds = str(tmp_path / "d.json")
    T.put_index_template(tpl, "plain", {"index_patterns": ["logs*"]})
    with pytest.raises(ValueError, match="data_stream definition"):
        DS.create_data_stream(ds, tpl, "logs", str(tmp_path))
    with pytest.raises(ValueError, match="no matching index template"):
        DS.create_data_stream(ds, tpl, "other", str(tmp_path))


@pytest.mark.parametrize("bad", ["Logs", "lo gs", ".logs", "-logs",
                                 "_logs", "+logs", "lo*gs", ""])
def test_name_validation(paths, bad):
    tpl, ds, base = paths
    with pytest.raises(ValueError, match="invalid data stream name"):
        DS.create_data_stream(ds, tpl, bad, base)


def test_create_rollover_write_protection(paths):
    tpl, ds, base = paths
    entry = DS.create_data_stream(ds, tpl, "logs", base)
    assert entry["timestamp_field"] == "warc_ts"
    assert entry["indices"] == [".ds-logs-000001"]
    with pytest.raises(ValueError, match="already exists"):
        DS.create_data_stream(ds, tpl, "logs", base)
    nxt = DS.data_stream_rollover(ds, "logs")
    assert nxt == ".ds-logs-000002"
    # write index is protected; older generation can go
    with pytest.raises(ValueError, match="write index"):
        DS.remove_backing_index(ds, "logs", ".ds-logs-000002")
    DS.remove_backing_index(ds, "logs", ".ds-logs-000001")
    st = DS.data_stream_stats(ds, "logs")
    assert st["generation"] == 2 and st["backing_indices"] == 1


def test_write_requires_timestamp_column(paths, spark):
    tpl, ds, base = paths
    DS.create_data_stream(ds, tpl, "logs", base)
    bad = _pages(spark).drop("warc_ts")
    with pytest.raises(ValueError, match="requires timestamp field"):
        DS.data_stream_write(spark, ds, "logs", bad)


def test_null_timestamp_raises_inside_job(paths, spark):
    tpl, ds, base = paths
    DS.create_data_stream(ds, tpl, "logs", base)
    bad = _pages(spark, n=5).withColumn(
        "warc_ts", F.lit(None).cast("timestamp"))
    with pytest.raises(Exception, match="missing required timestamp"):
        DS.data_stream_write(spark, ds, "logs", bad,
                             n_buckets=2, partitions=2)


def test_write_rollover_search_spans_generations(paths, spark):
    tpl, ds, base = paths
    DS.create_data_stream(ds, tpl, "logs", base)
    r1 = DS.data_stream_write(spark, ds, "logs", _pages(spark, 30, 0),
                              n_buckets=2, partitions=2)
    assert r1 == {"write_index": ".ds-logs-000001", "n_docs": 30}
    # second batch lands in the SAME backing index (the _bulk/add path)
    r2 = DS.data_stream_write(spark, ds, "logs", _pages(spark, 10, 30),
                              n_buckets=2, partitions=2)
    assert r2 == {"write_index": ".ds-logs-000001", "n_docs": 40}
    DS.data_stream_rollover(ds, "logs")
    r3 = DS.data_stream_write(spark, ds, "logs", _pages(spark, 20, 40),
                              n_buckets=2, partitions=2)
    assert r3 == {"write_index": ".ds-logs-000002", "n_docs": 20}
    st = DS.data_stream_stats(ds, "logs")
    assert st["docs_per_index"] == {".ds-logs-000001": 40,
                                    ".ds-logs-000002": 20}
    # every doc contains 'alpha' → search spans both generations
    from sparksearch.queries import Match
    res = DS.data_stream_search(spark, ds, "logs", Match("text", "alpha"),
                                k=100).collect()
    assert len(res) == 60
    assert {r["_index"] for r in res} == {".ds-logs-000001",
                                          ".ds-logs-000002"}
    # w3 appears once per i%7==3 doc: 60/7 → 9 docs, across both indices
    res3 = DS.data_stream_search(spark, ds, "logs", Match("text", "w3"),
                                 k=100).collect()
    urls = sorted(r["url"] for r in res3)
    assert urls == [f"https://x.example/p/{i:08d}"
                    for i in range(3, 60, 7)]


def test_executors_skip_empty_write_index(paths, spark):
    tpl, ds, base = paths
    DS.create_data_stream(ds, tpl, "logs", base)
    DS.data_stream_write(spark, ds, "logs", _pages(spark, 10),
                         n_buckets=2, partitions=2)
    DS.data_stream_rollover(ds, "logs")  # empty write index slot
    exs = DS.data_stream_executors(spark, ds, "logs")
    assert sorted(exs) == [".ds-logs-000001"]
    # registry dirs live under the base dir
    entry = DS._entry(DS._load(ds), "logs")
    assert all(d.startswith(base) for d in entry["dirs"].values())
    assert os.path.isdir(entry["dirs"][".ds-logs-000001"])


def test_template_materialization_end_to_end(tmp_path, spark):
    """Template declares an analysis block (analyzer named 'default' →
    becomes the build analyzer) and index.default_pipeline (runs over
    every batch before indexing) — the full create-index path."""
    from sparksearch import ingest as I
    from sparksearch.queries import Match
    tpl = str(tmp_path / "tpl.json")
    pp = str(tmp_path / "pipelines.json")
    ds = str(tmp_path / "ds.json")
    I.put_pipeline(pp, "clean", {"processors": [
        {"gsub": {"field": "text", "pattern": "-", "replacement": " "}},
    ]})
    T.put_index_template(tpl, "ev_tpl", {
        "index_patterns": ["events*"], "priority": 7,
        "data_stream": {"timestamp_field": {"name": "warc_ts"}},
        "template": {"settings": {
            "index.default_pipeline": "clean",
            "analysis": {"analyzer": {"default": {
                "tokenizer": "whitespace",
                "filter": ["lowercase"]}}}}}})
    DS.create_data_stream(ds, tpl, "events", str(tmp_path),
                          pipelines_path=pp)
    rows = [(f"https://x.example/e/{i}", "2025-01-01 00:00:00",
             "Alpha-Beta GAMMA") for i in range(8)]
    pages = (spark.createDataFrame(rows, "url string, ts string, "
                                         "text string")
             .select("url",
                     F.col("ts").cast("timestamp").alias("warc_ts"),
                     F.lit(None).cast("binary").alias("html"), "text",
                     F.lit("en").alias("lang")))
    DS.data_stream_write(spark, ds, "events", pages,
                         n_buckets=2, partitions=2)
    # pipeline split "Alpha-Beta" into two tokens; default analyzer
    # lowercased them — so 'beta' matches as its own term
    res = DS.data_stream_search(spark, ds, "events",
                                Match("text", "beta"), k=20).collect()
    assert len(res) == 8


def test_default_pipeline_without_registry_raises(tmp_path, spark):
    tpl = str(tmp_path / "tpl.json")
    ds = str(tmp_path / "ds.json")
    T.put_index_template(tpl, "ev_tpl", {
        "index_patterns": ["events*"], "priority": 7,
        "data_stream": {"timestamp_field": {"name": "warc_ts"}},
        "template": {"settings": {"index.default_pipeline": "clean"}}})
    DS.create_data_stream(ds, tpl, "events", str(tmp_path))
    with pytest.raises(ValueError, match="pipelines_path"):
        DS.data_stream_write(spark, ds, "events",
                             _pages(spark, 4), n_buckets=2, partitions=2)


def test_two_streams_with_default_analyzers_do_not_collide(tmp_path,
                                                           spark):
    """Both templates define an analyzer named 'default'; each stream
    pins a stream-scoped copy at first write, so a later stream's
    'default' cannot leak into an earlier stream's add_generation."""
    from sparksearch.queries import Match
    tpl = str(tmp_path / "tpl.json")
    ds = str(tmp_path / "ds.json")
    # stream A: keeps case (keyword-ish whitespace, NO lowercase)
    T.put_index_template(tpl, "a_tpl", {
        "index_patterns": ["aaa*"], "priority": 5,
        "data_stream": {"timestamp_field": {"name": "warc_ts"}},
        "template": {"settings": {"analysis": {"analyzer": {
            "default": {"tokenizer": "whitespace"}}}}}})
    # stream B: lowercases
    T.put_index_template(tpl, "b_tpl", {
        "index_patterns": ["bbb*"], "priority": 5,
        "data_stream": {"timestamp_field": {"name": "warc_ts"}},
        "template": {"settings": {"analysis": {"analyzer": {
            "default": {"tokenizer": "whitespace",
                        "filter": ["lowercase"]}}}}}})
    DS.create_data_stream(ds, tpl, "aaa", str(tmp_path))
    DS.create_data_stream(ds, tpl, "bbb", str(tmp_path))

    def batch(n, start=0):
        rows = [(f"https://x.example/{start+i}", "2025-01-01 00:00:00",
                 "Mixed CASE text") for i in range(n)]
        return (spark.createDataFrame(
            rows, "url string, ts string, text string")
            .select("url", F.col("ts").cast("timestamp").alias("warc_ts"),
                    F.lit(None).cast("binary").alias("html"), "text",
                    F.lit("en").alias("lang")))

    DS.data_stream_write(spark, ds, "aaa", batch(6),
                         n_buckets=2, partitions=2)
    # B's write re-registers a DIFFERENT 'default' globally...
    DS.data_stream_write(spark, ds, "bbb", batch(6),
                         n_buckets=2, partitions=2)
    # ...then A's second batch must still use A's case-keeping analyzer
    DS.data_stream_write(spark, ds, "aaa", batch(4, start=6),
                         n_buckets=2, partitions=2)
    res_cased = DS.data_stream_search(spark, ds, "aaa",
                                      Match("text", "CASE"),
                                      k=100).collect()
    assert len(res_cased) == 10          # both A batches, case-exact
    res_lower = DS.data_stream_search(spark, ds, "bbb",
                                      Match("text", "case"),
                                      k=100).collect()
    assert len(res_lower) == 6


def test_indices_boost_resolution_and_reorder(paths, spark):
    from sparksearch.multisearch import _boost_of
    assert _boost_of("ix-a", [{"ix-*": 3.0}]) == 3.0
    assert _boost_of("ix-a", [{"ix-a": 2.0}, {"ix-*": 9.0}]) == 2.0
    assert _boost_of("other", [{"ix-*": 3.0}]) == 1.0
    assert _boost_of("x", None) == 1.0
    # end-to-end: boosting the second generation reorders the merge
    tpl, ds, base = paths
    DS.create_data_stream(ds, tpl, "logs", base)
    DS.data_stream_write(spark, ds, "logs", _pages(spark, 10, 0),
                         n_buckets=2, partitions=2)
    DS.data_stream_rollover(ds, "logs")
    DS.data_stream_write(spark, ds, "logs", _pages(spark, 10, 10),
                         n_buckets=2, partitions=2)
    from sparksearch.queries import Match
    res = DS.data_stream_search(spark, ds, "logs", Match("text", "alpha"),
                                k=5,
                                indices_boost=[{".ds-logs-000002": 5.0}])
    rows = res.collect()
    assert all(r["_index"] == ".ds-logs-000002" for r in rows)


def test_date_histogram_time_zone_shifts_boundaries(spark):
    from sparksearch.aggs import date_histogram
    df = spark.createDataFrame(
        [("2025-01-01 23:00:00",), ("2025-01-02 01:00:00",)],
        "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
    # UTC: two different days
    utc = date_histogram(df, "ts", "day").collect()
    assert [r["doc_count"] for r in utc] == [1, 1]
    # +02:00: both land in local Jan 2 (01:00 and 03:00 local) — one
    # bucket whose key is the UTC instant of the local midnight
    tz = date_histogram(df, "ts", "day", time_zone="+02:00").collect()
    assert len(tz) == 1 and tz[0]["doc_count"] == 2
    assert str(tz[0]["key"]) == "2025-01-01 22:00:00"


def test_date_histogram_min_doc_count_zero_fills_gaps(spark):
    from sparksearch.aggs import date_histogram
    df = spark.createDataFrame(
        [("2025-01-01 05:00:00",), ("2025-01-04 07:00:00",),
         ("2025-01-04 08:00:00",)],
        "ts string").select(F.col("ts").cast("timestamp").alias("ts"))
    out = date_histogram(df, "ts", "day", min_doc_count=0).collect()
    assert [(str(r["key"]), r["doc_count"]) for r in out] == [
        ("2025-01-01 00:00:00", 1), ("2025-01-02 00:00:00", 0),
        ("2025-01-03 00:00:00", 0), ("2025-01-04 00:00:00", 2)]
    # default min_doc_count=1 keeps the sparse shape
    sparse = date_histogram(df, "ts", "day").collect()
    assert len(sparse) == 2
