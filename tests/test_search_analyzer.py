"""Mapping-level search_analyzer: index-time and query-time analysis
split (TextFieldMapper searchAnalyzer — the canonical autocomplete
mapping: index edge_ngram, search keyword)."""

from pyspark.sql import functions as F

from sparksearch.analysis_custom import register_analyzer
from sparksearch.build import build_index
from sparksearch.exec import Executor
from sparksearch.index import IndexReader
from sparksearch.queries import Match


def _pages(spark, docs):
    return (spark.createDataFrame(docs, "url string, text string")
            .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
            .withColumn("lang", F.lit("en")))


def test_search_analyzer_autocomplete(spark, tmp_path):
    register_analyzer("an_sa_edge", {
        "tokenizer": {"type": "edge_ngram", "min_gram": 2, "max_gram": 8,
                      "token_chars": ["letter", "digit"]},
        "filter": ["lowercase"]})
    register_analyzer("an_sa_kw", {"tokenizer": "keyword",
                                   "filter": ["lowercase"]})
    docs = [("u1", "sparkling water"), ("u2", "sparse matrix"),
            ("u3", "unrelated row")]
    d = str(tmp_path / "ix_sa")
    build_index(_pages(spark, docs), d, analyzer="an_sa_edge",
                search_analyzer="an_sa_kw")
    ix = IndexReader(spark, d)
    assert ix.analyzer == "an_sa_edge"
    assert ix.search_analyzer == "an_sa_kw"
    ex = Executor(ix)
    # default Match analysis goes through the SEARCH analyzer: "Spar"
    # becomes the single keyword term "spar", which hits indexed
    # edge-ngram prefixes — no per-query analyzer override needed
    hits = ex.search(Match("text", "Spar"), k=10).collect()
    assert sorted(r.url for r in hits) == ["u1", "u2"]
    # an explicit per-query analyzer still wins over the mapping
    hits2 = ex.search(Match("text", "Spar", analyzer="an_sa_edge"),
                      k=10).collect()
    assert {r.url for r in hits2} == {"u1", "u2"}  # sp/spa/spar grams


def test_search_analyzer_persisted_and_defaulted(spark, tmp_path):
    register_analyzer("an_sa_edge2", {
        "tokenizer": {"type": "edge_ngram", "min_gram": 2, "max_gram": 6,
                      "token_chars": ["letter"]},
        "filter": ["lowercase"]})
    d = str(tmp_path / "ix_sa2")
    build_index(_pages(spark, [("u1", "hello world")]), d,
                analyzer="an_sa_edge2")
    ix = IndexReader(spark, d)
    # no search_analyzer in the mapping -> falls back to the index one
    assert ix.search_analyzer == "an_sa_edge2"
    assert "search_analyzer" not in ix.meta
