"""Time-partitioned index layout (data-stream/ILM analogue) + can_match
directory pruning."""

import re

import pytest

from sparksearch.queries import Bool, Match, Range


@pytest.fixture(scope="module")
def tp_engine(spark, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader

    out = str(tmp_path_factory.mktemp("ixtp") / "ix")
    build_index(pages_from_documents(spark, "/root/testdata/sf0.001"),
                out, n_buckets=4, partitions=4, time_partition="minute")
    ix = IndexReader(spark, out)
    return ix, Executor(ix)


def _partition_filters(df) -> list[str]:
    # FileScan metadata strings truncate at spark.sql.maxMetadataStringLength
    # (default 100 chars) — with a long-lived session's longer expression IDs
    # the pday literals fall past the cutoff, so widen it for the assertion
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.maxMetadataStringLength", "100")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    return re.findall(r"PartitionFilters: \[[^\]]*", plan)


def test_layout_and_meta(tp_engine):
    ix, _ = tp_engine
    assert ix.time_partition == "minute"
    assert "pday" in ix.postings.columns and "pday" in ix.docs.columns


def test_time_bounded_bool_prunes_both_scans(tp_engine):
    _, ex = tp_engine
    q = Bool(must=[Match("text", "join")],
             filter=[Range("warc_ts", gte="2025-01-01 00:02:00",
                           lt="2025-01-01 00:04:00")])
    pf = _partition_filters(ex._plan(q, scored=True))
    pruned = [f for f in pf if "pday" in f and "2025-01-01-00-02" in f]
    # postings scan AND docs scan both carry the pday window
    assert len(pruned) >= 2, pf


def test_results_match_unpartitioned(spark, tp_engine, index_sf0001):
    from sparksearch.exec import Executor
    _, ex = tp_engine
    base = Executor(index_sf0001)
    q = Bool(must=[Match("text", "join")],
             filter=[Range("warc_ts", gte="2025-01-01 00:02:00",
                           lt="2025-01-01 00:04:00")])
    a = [(r.docid, round(r.score, 6))
         for r in ex.search(q, k=10, fetch=False).collect()]
    b = [(r.docid, round(r.score, 6))
         for r in base.search(q, k=10, fetch=False).collect()]
    assert a == b and len(a) > 0


def test_unbounded_query_unaffected(tp_engine):
    _, ex = tp_engine
    r = ex.search(Match("text", "join"), k=5, fetch=False).collect()
    assert len(r) == 5


def test_unparsable_bound_skips_pruning_not_results(tp_engine):
    """A bound the day-truncation can't parse must not break the query —
    pruning is skipped, row filters still apply."""
    _, ex = tp_engine
    q = Bool(must=[Match("text", "join")],
             filter=[Range("dl", gte=10)])   # non-time range: no window
    assert ex._time_window_of(list(q.filter)) is None
    assert len(ex.search(q, k=3, fetch=False).collect()) == 3


def test_bad_granularity_rejected(spark):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    with pytest.raises(ValueError):
        build_index(pages_from_documents(spark, "/root/testdata/sf0.001"),
                    "/tmp/never_written", time_partition="week")
