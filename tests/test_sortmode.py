"""MultiValueMode sort-key reduction (sortmode.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch.sortmode import multivalue_key


def test_multivalue_modes(spark):
    df = spark.createDataFrame(
        [(1, [3, 1, 2]), (2, [4, 1, 3, 2]), (3, [7]), (4, [])],
        "id int, lens array<int>")
    out = {r["id"]: r for r in df.select(
        "id",
        multivalue_key("lens", "min").alias("mn"),
        multivalue_key("lens", "max").alias("mx"),
        multivalue_key("lens", "sum").alias("sm"),
        multivalue_key("lens", "avg").alias("av"),
        multivalue_key("lens", "median").alias("md")).collect()}
    assert (out[1]["mn"], out[1]["mx"], out[1]["sm"]) == (1, 3, 6.0)
    assert out[1]["av"] == 2.0 and out[1]["md"] == 2.0   # odd: middle
    assert out[2]["md"] == 2.5                           # even: mid-pair avg
    assert out[3]["md"] == 7.0
    assert out[4]["md"] is None and out[4]["av"] is None


def test_sort_mode_in_search_body(spark, index_sf0001):
    from sparksearch.api import search_df
    from sparksearch.exec import Executor
    docs = index_sf0001.docs.select(
        "url", F.expr("array(dl, CAST(0 AS BIGINT))").alias("vals"))
    ex = Executor(index_sf0001.with_docvalues(docs))
    body = {"query": {"match_all": {}},
            "sort": [{"vals": {"order": "desc", "mode": "max"}}],
            "size": 5, "_source": {"includes": ["dl"]}}
    rows = search_df(ex, body).collect()
    # max(vals) == dl, so this must equal a plain dl-desc sort
    want = [r["dl"] for r in index_sf0001.docs.orderBy(
        F.col("dl").desc(), F.col("docid").asc()).limit(5).collect()]
    assert [r["dl"] for r in rows] == want


def test_median_integral_rounds_like_reference(spark):
    """MultiValueMode.MEDIAN long path: even-count mid-pair average is
    Math.round()ed for integer doc values (MultiValueMode.java:241-246);
    the double path keeps the unrounded average."""
    df = spark.createDataFrame(
        [(1, [1, 2]), (2, [2, 3]), (3, [1, 2, 3, 4])],
        "id int, v array<int>")
    out = {r["id"]: r for r in df.select(
        "id",
        multivalue_key("v", "median").alias("dbl"),
        multivalue_key("v", "median", integral=True).alias("lng"))
        .collect()}
    assert out[1]["dbl"] == 1.5 and out[1]["lng"] == 2.0  # round half up
    assert out[2]["dbl"] == 2.5 and out[2]["lng"] == 3.0
    assert out[3]["dbl"] == 2.5 and out[3]["lng"] == 3.0


def test_api_sort_mode_integral_detection(spark, index_sf0001):
    """search_df threads integral=True for array<int> doc-values fields:
    median over [1,2] sorts as 2, tying with a doc whose median is
    exactly 2."""
    from sparksearch.api import search_df
    from sparksearch.exec import Executor
    docs = index_sf0001.docs.select(
        "url", F.expr("CASE WHEN docid = 0 THEN array(1, 2) "
                      "WHEN docid = 1 THEN array(2) "
                      "ELSE array(0) END").alias("iv"))
    ex = Executor(index_sf0001.with_docvalues(docs))
    body = {"query": {"match_all": {}},
            "sort": [{"iv": {"order": "desc", "mode": "median"}}],
            "size": 2, "_source": False}
    rows = search_df(ex, body).collect()
    # docid 0 median rounds 1.5 -> 2.0, tying docid 1; _doc breaks the tie
    assert [r["docid"] for r in rows] == [0, 1]
