"""Structural tests for the round-2 additions: match_bool_prefix,
variable_width_histogram, scripted_metric. Value-level parity with the
reference semantics is gated by the DuckDB contract entries
(contract_misc2.py); these check the semantics shape on the shared
sf0.001 index."""

import pytest
from pyspark.sql import functions as F

from sparksearch.exec import Executor
from sparksearch.queries import Match, MatchBoolPrefix


@pytest.fixture(scope="module")
def ex(index_sf0001):
    return Executor(index_sf0001)


def _doc_terms(index, docids):
    rows = (index.postings.where(F.col("docid").isin(list(docids)))
            .select("docid", "term").collect())
    out = {}
    for r in rows:
        out.setdefault(r["docid"], set()).add(r["term"])
    return out


def test_match_bool_prefix_or_semantics(ex, index_sf0001):
    hits = ex.search(MatchBoolPrefix("text", "hash jo"), k=20,
                     fetch=False).collect()
    assert hits, "should match docs with 'hash' or a 'jo*' term"
    terms = _doc_terms(index_sf0001, [r["docid"] for r in hits])
    for r in hits:
        ts = terms[r["docid"]]
        assert "hash" in ts or any(t.startswith("jo") for t in ts)
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_match_bool_prefix_and_requires_all(ex, index_sf0001):
    hits = ex.search(MatchBoolPrefix("text", "hash jo", operator="and"),
                     k=50, fetch=False).collect()
    terms = _doc_terms(index_sf0001, [r["docid"] for r in hits])
    for r in hits:
        ts = terms[r["docid"]]
        assert "hash" in ts and any(t.startswith("jo") for t in ts)


def test_match_bool_prefix_prefix_adds_constant(ex):
    """A doc matching both clauses scores exactly match('hash') + 1.0."""
    base = {r["docid"]: r["score"] for r in
            ex.search(Match("text", "hash"), k=1000, fetch=False).collect()}
    both = ex.search(MatchBoolPrefix("text", "hash jo", operator="and"),
                     k=50, fetch=False).collect()
    for r in both:
        assert r["score"] == pytest.approx(base[r["docid"]] + 1.0, rel=1e-9)


def test_variable_width_histogram_exact(spark):
    from sparksearch.aggs import variable_width_histogram
    df = spark.createDataFrame([(i, v) for i, v in
                                enumerate([1, 2, 2, 3, 10, 11, 30, 31])],
                               "id int, v int")
    rows = variable_width_histogram(df, "v", buckets=4, tie_col="id") \
        .collect()
    # 8 values / 4 buckets → rank slices [1,2][2,3][10,11][30,31]
    got = [(r["bucket"], r["min"], r["max"], r["doc_count"]) for r in rows]
    assert got == [(1, 1, 2, 2), (2, 2, 3, 2), (3, 10, 11, 2),
                   (4, 30, 31, 2)]


def test_variable_width_histogram_approx_path(spark):
    from sparksearch.aggs import variable_width_histogram
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 100).alias("v")).repartition(8)
    rows = variable_width_histogram(df, "v", buckets=5, exact=False) \
        .collect()
    assert sum(r["doc_count"] for r in rows) == 1000
    assert [r["bucket"] for r in rows] == sorted(r["bucket"] for r in rows)
    for r in rows:
        assert r["min"] <= r["avg"] <= r["max"]


def test_scripted_metric_partition_invariant(spark):
    from sparksearch.aggs import scripted_metric
    df = spark.range(1, 101).select(F.col("id").cast("double").alias("x"))
    for parts in (1, 7):
        v = scripted_metric(df.repartition(parts), F.col("x") * F.col("x"),
                            combine="sum", reduce="sum").collect()[0]["value"]
        assert v == pytest.approx(sum(i * i for i in range(1, 101)))


def test_terms_agg_sharded_error_bounds(spark):
    from pyspark.sql import functions as F

    from sparksearch.aggs import terms_agg_sharded
    rows = ([(i, "a") for i in (0, 2, 4)] + [(i, "b") for i in (6, 8)]
            + [(i, "b") for i in (1, 3, 5)] + [(7, "a")])
    df = spark.createDataFrame(rows, "id long, lang string")
    out = {r.key: r for r in terms_agg_sharded(
        df, "lang", size=10, shard_size=1,
        shard_col=(F.col("id") % 2)).collect()}
    # shard0 returns only (a,3) hiding (b,2); shard1 only (b,3) hiding
    # (a,1). A missing shard's worst case is its smallest RETURNED count
    # (3 on both shards), so each bucket's bound is 3 — ≥ the truly
    # hidden 2 and 1 (it's an upper bound, not the hidden count)
    assert out["a"].doc_count == 3
    assert out["a"].doc_count_error_upper_bound == 3
    assert out["b"].doc_count == 3
    assert out["b"].doc_count_error_upper_bound == 3
    # with shard_size covering everything, counts are exact, bounds zero
    exact = {r.key: r for r in terms_agg_sharded(
        df, "lang", size=10, shard_size=10,
        shard_col=(F.col("id") % 2)).collect()}
    assert exact["a"].doc_count == 4 and exact["b"].doc_count == 5
    assert all(r.doc_count_error_upper_bound == 0 for r in exact.values())
