"""Mapper layer (mappings.py) + classic scroll (api.scroll_*) tests."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from sparksearch.mappings import apply_mappings, infer_mappings


def test_infer_mappings_dynamic_defaults(spark):
    """Dynamic mapping: string → text + .keyword(ignore_above 256),
    timestamp → date, long → long, binary → binary, double → float."""
    df = spark.createDataFrame(
        [("u", 1, 2.5, True)], "url string, n long, x double, b boolean"
    ).withColumn("ts", F.current_timestamp()) \
     .withColumn("blob", F.encode(F.col("url"), "UTF-8"))
    props = infer_mappings(df)["properties"]
    assert props["url"] == {
        "type": "text",
        "fields": {"keyword": {"type": "keyword", "ignore_above": 256}}}
    assert props["n"] == {"type": "long"}
    assert props["x"] == {"type": "float"}
    assert props["b"] == {"type": "boolean"}
    assert props["ts"] == {"type": "date"}
    assert props["blob"] == {"type": "binary"}


def test_ignore_above_and_normalizer(spark):
    df = spark.createDataFrame(
        [("A" * 10,), ("B" * 300,), (None,)], "t string")
    out = apply_mappings(df, {"properties": {"t": {
        "type": "text",
        "fields": {"keyword": {"type": "keyword", "ignore_above": 256,
                               "normalizer": "lowercase"}}}}})
    vals = [r["t.keyword"] for r in out.orderBy(F.col("t").asc_nulls_first())
            .collect()]
    assert vals == [None, "a" * 10, None]  # null in, short kept+lowered, long dropped


def test_null_value_fills_before_normalizer(spark):
    df = spark.createDataFrame([("X",), (None,)], "k string")
    out = apply_mappings(df, {"properties": {"k": {
        "type": "keyword", "null_value": "MISSING",
        "normalizer": "lowercase"}}})
    assert sorted(r["k"] for r in out.collect()) == ["missing", "x"]


def test_subfield_sees_raw_value_not_normalized(spark):
    """Multi-fields receive the ORIGINAL source value — a normalized
    in-place keyword rewrite must not leak into its own sub-fields."""
    df = spark.createDataFrame([("MiXeD",)], "k string")
    out = apply_mappings(df, {"properties": {"k": {
        "type": "keyword", "normalizer": "lowercase",
        "fields": {"raw": {"type": "keyword"}}}}})
    r = out.collect()[0]
    assert r["k"] == "mixed" and r["k.raw"] == "MiXeD"


def test_copy_to_appends_both_sources(spark):
    df = spark.createDataFrame([("en", "s1"), (None, "s2")],
                               "lang string, site string")
    out = apply_mappings(df, {"properties": {
        "lang": {"type": "keyword", "copy_to": "tags"},
        "site": {"type": "keyword", "copy_to": ["tags"]}}})
    rows = {r["site"]: r["tags"] for r in out.collect()}
    assert rows["s1"] == ["en", "s1"]
    assert rows["s2"] == ["s2"]  # NULL source contributes nothing


def test_scaled_float_lattice(spark):
    """Doc value is round(v*factor) long; queries see stored/factor."""
    df = spark.createDataFrame([(0.126,), (0.124,), (1.0,)], "q double")
    out = apply_mappings(df, {"properties": {"q": {
        "type": "scaled_float", "scaling_factor": 10}}})
    got = sorted((r["q.stored"], r["q.value"]) for r in out.collect())
    assert got == [(1, 0.1), (1, 0.1), (10, 1.0)]  # 0.126 and 0.124 collapse


def test_mapping_plan_single_scan_no_python_no_shuffle(spark):
    """Every mapped doc value is a column expression on the ONE parquet
    scan — no Python eval, no Exchange, no extra scan."""
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = apply_mappings(df, {"properties": {
        "text": {"type": "text",
                 "fields": {"keyword": {"type": "keyword",
                                        "ignore_above": 256,
                                        "normalizer": "lowercase"}}},
        "lang": {"type": "keyword", "null_value": "unknown",
                 "copy_to": "tags"}}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan
    assert plan.count("Scan parquet") == 1


def test_scroll_pit_isolation_and_drain(spark, index_sf0001, tmp_path):
    """A scroll opened before a new generation commits never sees the new
    docs; pages tile the result set without overlap; done flips on the
    short page."""
    from sparksearch.api import scroll_next, scroll_open
    from sparksearch.exec import Executor

    ex = Executor(index_sf0001)
    n_de = index_sf0001.docs.filter(F.col("lang") == "de").count()
    size = max(2, n_de // 3)
    body = {"query": {"term": {"lang": "de"}},
            "sort": [{"warc_ts": "asc"}], "size": size, "_source": False}
    rows, st = scroll_open(ex, body)
    seen = [r["docid"] for r in rows]
    guard = 0
    while not st["done"]:
        rows, st = scroll_next(spark, st)
        seen += [r["docid"] for r in rows]
        guard += 1
        assert guard < 20
    assert len(seen) == n_de
    assert len(set(seen)) == n_de  # no overlap between pages
    # sorted by warc_ts asc == docid asc for this corpus ordering
    expected = [r["docid"] for r in index_sf0001.docs
                .filter(F.col("lang") == "de")
                .orderBy("warc_ts", "docid").collect()]
    assert seen == expected


def test_scroll_rejects_from(spark, index_sf0001):
    from sparksearch.api import scroll_open
    from sparksearch.exec import Executor
    with pytest.raises(ValueError):
        scroll_open(Executor(index_sf0001),
                    {"query": {"match_all": {}}, "from": 3})


def test_rollover_conditions_and_alias_swap(spark, tmp_path):
    """_rollover: condition evaluation against the write index's meta +
    atomic alias repoint only when a condition fires."""
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.index import open_index, resolve_alias, rollover, \
        set_alias
    old = str(tmp_path / "ix_old")
    new = str(tmp_path / "ix_new")
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    build_index(pages.limit(30), old, n_buckets=4, partitions=4)
    build_index(pages.limit(10), new, n_buckets=4, partitions=4)
    reg = str(tmp_path / "aliases.json")
    set_alias(reg, "logs-write", old)

    # condition not met: alias keeps pointing at the old index
    r = rollover(reg, "logs-write", new, max_docs=1000)
    assert not r["rolled_over"] and resolve_alias(reg, "logs-write") == old
    assert r["conditions"] == {"[max_docs: 1000]": False}

    # met: swapped atomically, readers through the alias see the new one
    r = rollover(reg, "logs-write", new, max_docs=10, max_age_s=10**9)
    assert r["rolled_over"]
    assert r["conditions"]["[max_docs: 10]"] is True
    assert r["conditions"]["[max_age: 1000000000s]"] is False
    assert resolve_alias(reg, "logs-write") == new
    assert open_index(spark, "logs-write", reg).n_docs == 10

    # no conditions = unconditional rollover (REST default)
    set_alias(reg, "logs-write", old)
    assert rollover(reg, "logs-write", new)["rolled_over"]


def test_reshard_rank_identical(spark, tmp_path):
    """_split/_shrink analogue: re-bucketing 4→8 leaves every query
    result rank- and score-identical; the new layout prunes on the new
    bucket count."""
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader, reshard
    from sparksearch.queries import Match
    src = str(tmp_path / "ix4")
    dst = str(tmp_path / "ix8")
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    build_index(pages, src, n_buckets=4, partitions=4)
    info = reshard(spark, src, dst, n_buckets=8)
    assert info["n_buckets"] == 8
    a = Executor(IndexReader(spark, src))
    b = Executor(IndexReader(spark, dst))
    q = Match("text", "hash join table")
    ra = [(r["docid"], round(r["score"], 6))
          for r in a.search(q, k=10).collect()]
    rb = [(r["docid"], round(r["score"], 6))
          for r in b.search(q, k=10).collect()]
    assert ra == rb and len(ra) == 10
    assert IndexReader(spark, dst).n_buckets == 8
