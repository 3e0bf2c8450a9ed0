"""ip / range / _doc_count field types (fieldtypes.py)."""

import pytest


def test_cidr_bounds():
    from sparksearch.fieldtypes import cidr_bounds
    lo, hi = cidr_bounds("10.32.0.0/11")
    assert lo == 10 * 2**24 + 32 * 2**16
    assert hi == lo + 2**21 - 1
    # non-aligned host bits are masked off (strict=False)
    assert cidr_bounds("10.33.7.9/11") == (lo, hi)
    assert cidr_bounds("192.168.1.5/32") == (3232235781, 3232235781)
    # v6 CIDRs are redirected to the 16-byte path
    with pytest.raises(ValueError):
        cidr_bounds("2001:db8::/32")


def test_ip_term_and_range(spark):
    from pyspark.sql import functions as F

    from sparksearch.fieldtypes import (ip_num, ip_range_cond,
                                        ip_term_cond)
    df = spark.createDataFrame(
        [(1, "10.9.0.1"), (2, "10.10.0.1"), (3, "10.100.0.1"),
         (4, "10.40.0.9"), (5, "9.255.0.1")], "id int, ip string")
    got = {r.id for r in
           df.where(ip_term_cond(F.col("ip"), "10.32.0.0/11")).collect()}
    assert got == {4}  # only 10.40.x inside 10.32.0.0/11 (octet 32..63)
    assert [r.id for r in
            df.where(ip_term_cond(F.col("ip"), "10.10.0.1")).collect()] == [2]
    # numeric, not lexical: 9.255 < 10.9 < 10.10 < 10.40 < 10.100
    rows = (df.where(ip_range_cond(F.col("ip"), gte="10.0.0.0",
                                   lt="10.100.0.0"))
            .orderBy(ip_num(F.col("ip"))).collect())
    assert [r.id for r in rows] == [1, 2, 4]


def test_range_relations(spark):
    from pyspark.sql import functions as F

    from sparksearch.fieldtypes import range_relation_cond
    df = spark.createDataFrame(
        [(1, 0, 3), (2, 6, 10), (3, 4, 20), (4, 13, 15)],
        "id int, gte int, lte int").withColumn(
            "rng", F.struct("gte", "lte"))
    def ids(rel):
        return {r.id for r in
                df.where(range_relation_cond(F.col("rng"), 5, 12,
                                             rel)).collect()}
    assert ids("intersects") == {2, 3}
    assert ids("within") == {2}
    assert ids("contains") == {3}
    with pytest.raises(ValueError):
        range_relation_cond(F.col("rng"), 5, 12, "overlaps")


def test_terms_agg_doc_count(spark):
    from sparksearch.fieldtypes import terms_agg_doc_count
    df = spark.createDataFrame(
        [("a", 5), ("a", None), ("b", 2)],
        "k string, _doc_count int")
    rows = terms_agg_doc_count(df, "k").collect()
    assert [(r.key, r.doc_count) for r in rows] == [("a", 6), ("b", 2)]
    # column absent -> plain row counts
    rows = terms_agg_doc_count(df.drop("_doc_count"), "k").collect()
    assert [(r.key, r.doc_count) for r in rows] == [("a", 2), ("b", 1)]


def test_sessionize_gaps_and_islands(spark):
    import datetime as dt

    from sparksearch.dataops import session_stats, sessionize
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (40-min gap splits), sizes 2 and 1
        (1, base), (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=50)),
        # user 2: one session of 3 (gaps < 30 min)
        (2, base), (2, base + dt.timedelta(minutes=29)),
        (2, base + dt.timedelta(minutes=58)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    s = {(r.user_id, r.ts.minute): r.session_id
         for r in sessionize(df).collect()}
    assert s[(1, 0)] == 1 and s[(1, 10)] == 1 and s[(1, 50)] == 2
    assert s[(2, 0)] == s[(2, 29)] == s[(2, 58)] == 1
    st = {r.user_id: (r.n_sessions, r.n_events, r.max_session_events)
          for r in session_stats(df).collect()}
    assert st == {1: (2, 3, 2), 2: (1, 3, 3)}


def test_chunk_documents(spark):
    from sparksearch.dataops import chunk_documents
    df = spark.createDataFrame(
        [(1, "a" * 250), (2, "xy"), (3, "")], "doc_id int, text string")
    rows = chunk_documents(df, size=100, overlap=20).collect()
    by = {}
    for r in rows:
        by.setdefault(r.doc_id, []).append(
            (r.chunk_id, r.chunk_start, len(r.chunk_text)))
    # stride 80: starts 0,80,160,240 -> lengths 100,100,90,10
    assert by[1] == [(0, 0, 100), (1, 80, 100), (2, 160, 90),
                     (3, 240, 10)]
    assert by[2] == [(0, 0, 2)]
    assert 3 not in by  # empty doc yields no chunks
    import pytest
    with pytest.raises(ValueError):
        chunk_documents(df, size=10, overlap=10)
