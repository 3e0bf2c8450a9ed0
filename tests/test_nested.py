"""Nested (block-join) queries and parent/child join-field queries."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from sparksearch.exec import Executor
from sparksearch.nested import nested_cond, nested_filter
from sparksearch.queries import Bool, Nested, Range, Term
from sparksearch.relations import has_child, has_parent, parent_id


def _authors_df(spark):
    # the classic nested example: docs with an authors array — doc 1 has
    # (alice, 30) and (bob, 45); only a FLATTENED field would match
    # "name=alice AND age=45" on it
    return spark.createDataFrame([
        Row(url="d1", authors=[Row(name="alice", age=30),
                               Row(name="bob", age=45)]),
        Row(url="d2", authors=[Row(name="alice", age=45)]),
        Row(url="d3", authors=[Row(name="carol", age=45)]),
        Row(url="d4", authors=[]),
    ])


def test_nested_binds_clauses_to_one_element(spark):
    docs = _authors_df(spark)
    q = Nested("authors", Bool(must=[Term("authors.name", "alice"),
                                     Term("authors.age", 45)]))
    got = sorted(r["url"] for r in nested_filter(docs, q).collect())
    assert got == ["d2"]  # d1 matches flattened, NOT nested
    # the flattened-object contrast: independent exists per clause
    flat = docs.filter(
        nested_cond("authors", Term("authors.name", "alice"))
        & nested_cond("authors", Term("authors.age", 45)))
    assert sorted(r["url"] for r in flat.collect()) == ["d1", "d2"]


def test_nested_range_should_and_must_not(spark):
    docs = _authors_df(spark)
    q = Nested("authors", Bool(
        must=[Range("authors.age", gte=40, lte=50)],
        must_not=[Term("authors.name", "carol")],
        should=[Term("authors.name", "alice"), Term("authors.name", "bob")],
        minimum_should_match=1))
    got = sorted(r["url"] for r in nested_filter(docs, q).collect())
    assert got == ["d1", "d2"]


def test_nested_through_executor_filter_path(spark, index_sf0001):
    # attach a sections sidecar and run Nested through the real engine's
    # docvalue filter path (standalone + fused inside a bool)
    docs = index_sf0001.docs.select("docid", "url", "dl")
    side = docs.select(
        "url",
        F.expr("array(struct('h' AS kind, dl AS weight), "
               "struct('p' AS kind, CAST(2 * dl AS BIGINT) AS weight))")
        .alias("blocks"))
    ix = index_sf0001.with_docvalues(side, on="url")
    ex = Executor(ix)
    thr = int(docs.agg(F.expr("percentile(dl, 0.9)")).collect()[0][0])
    q = Nested("blocks", Bool(must=[Term("blocks.kind", "h"),
                                    Range("blocks.weight", gt=thr)]))
    hits = ex.search(q, k=1000, fetch=False)
    want = docs.filter(F.col("dl") > thr).count()
    assert hits.count() == want > 0
    # fused inside a bool filter alongside a plain docvalue clause
    hits2 = ex.search(Bool(filter=[q, Range("dl", gt=thr)]), k=1000,
                      fetch=False)
    assert hits2.count() == want
    # kind='p' elements carry 2*dl, so kind='h' must NOT see them
    q_wrong_elem = Nested("blocks", Bool(must=[
        Term("blocks.kind", "h"),
        Term("blocks.weight", int(2 * thr))]))
    only_h = ex.search(q_wrong_elem, k=1000, fetch=False).count()
    q_flat_would = Nested("blocks", Term("blocks.weight", int(2 * thr)))
    assert only_h <= nested_filter(ix.docs, q_flat_would).count()


def _family_df(spark):
    return spark.createDataFrame([
        Row(url="s1", join_name="site", join_parent=None, lang=None, num=1),
        Row(url="s2", join_name="site", join_parent=None, lang=None, num=2),
        Row(url="s3", join_name="site", join_parent=None, lang=None, num=3),
        Row(url="p1", join_name="page", join_parent="s1", lang="de", num=0),
        Row(url="p2", join_name="page", join_parent="s1", lang="de", num=0),
        Row(url="p3", join_name="page", join_parent="s1", lang="en", num=0),
        Row(url="p4", join_name="page", join_parent="s2", lang="de", num=0),
        Row(url="p5", join_name="page", join_parent="s3", lang="en", num=0),
    ])


def test_has_child_bounds_and_count(spark):
    fam = _family_df(spark)
    got = {r["url"]: r["child_count"] for r in has_child(
        fam, "site", "page", F.col("lang") == "de").collect()}
    assert got == {"s1": 2, "s2": 1}
    only2 = has_child(fam, "site", "page", F.col("lang") == "de",
                      min_children=2).collect()
    assert [r["url"] for r in only2] == ["s1"]
    capped = has_child(fam, "site", "page", F.col("lang") == "de",
                       max_children=1).collect()
    assert [r["url"] for r in capped] == ["s2"]


def test_has_parent_and_parent_id(spark):
    fam = _family_df(spark)
    got = sorted(r["url"] for r in has_parent(
        fam, "site", "page", F.col("num") >= 2).collect())
    assert got == ["p4", "p5"]
    kids = sorted(r["url"] for r in parent_id(fam, "page", "s1").collect())
    assert kids == ["p1", "p2", "p3"]


def test_nested_rejects_scored_inner(spark):
    from sparksearch.queries import Match
    import pytest
    with pytest.raises(TypeError):
        nested_cond("authors", Match("authors.name", "alice"))


def test_msearch_wildcard_resolution_and_merge(spark, index_sf0001):
    from sparksearch.exec import Executor
    from sparksearch.multisearch import msearch_indices, resolve_indices
    from sparksearch.queries import Match
    import pytest
    exs = {"logs_a": Executor(index_sf0001),
           "logs_b": Executor(index_sf0001),
           "other": Executor(index_sf0001)}
    assert set(resolve_indices(exs, "logs_*")) == {"logs_a", "logs_b"}
    assert set(resolve_indices(exs, "other,logs_a")) == {"logs_a", "other"}
    with pytest.raises(ValueError):
        resolve_indices(exs, "nope_*")
    out = msearch_indices(exs, Match("text", "spark"), k=6,
                          expression="logs_*").collect()
    assert len(out) == 6
    # identical twin indices: merged list alternates by the (_index,
    # docid) tie-break — each docid appears once per index, a-then-b
    pairs = [(r["_index"], r["docid"]) for r in out]
    for i in range(0, 6, 2):
        assert pairs[i][1] == pairs[i + 1][1]
        assert pairs[i][0] == "logs_a" and pairs[i + 1][0] == "logs_b"


def test_dfs_msearch_equals_whole_index_scores(spark, index_sf0001,
                                               tmp_path):
    """Aggregated-stats scoring is the whole-corpus scoring: splitting
    the corpus into two indices and searching with DFS must reproduce
    the single-index top-k (same urls, same BM25 scores) — per-index
    stats (default QUERY_THEN_FETCH) must NOT."""
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.multisearch import dfs_msearch_indices, msearch_indices
    from sparksearch.queries import Match
    from sparksearch import contract as C

    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    exs = {}
    for name, cond in (("half_a", "crc32(url) % 2 = 0"),
                       ("half_b", "crc32(url) % 2 = 1")):
        out = str(tmp_path / name)
        build_index(pages.filter(F.expr(cond)), out, n_buckets=4,
                    partitions=4)
        exs[name] = Executor(IndexReader(spark, out))
    q = Match("text", "hash join table")
    rounded = lambda gx, qq, kk: C.topk_rounded(gx, qq, k=kk)  # noqa: E731
    dfs = dfs_msearch_indices(exs, q, k=8, search_fn=rounded).collect()
    whole = C.topk_rounded(Executor(index_sf0001), q, k=8).collect()
    # identical score trajectory; equal-score ties may ORDER differently
    # (whole index breaks ties by global docid, DFS by shard — exactly
    # the reference's behavior), so membership is checked against the
    # global tie-extended top list
    assert [r["score"] for r in dfs] == [r["score"] for r in whole]
    whole20 = {(r["url"], r["score"]) for r in
               C.topk_rounded(Executor(index_sf0001), q, k=20).collect()}
    assert all((r["url"], r["score"]) in whole20 for r in dfs)
    # per-index stats give different (non-comparable) scores
    plain = msearch_indices(exs, q, k=8, search_fn=rounded).collect()
    assert [(r["url"], r["score"]) for r in plain] != \
           [(r["url"], r["score"]) for r in whole]


def test_nested_score_mode_sum_counts_children(spark):
    from sparksearch.nested import inner_hits, matching_elements
    docs = _authors_df(spark)
    q = Nested("authors", Range("authors.age", gte=40), score_mode="sum")
    # matching-element count: d1 one (bob), d2 one, d3 one, d4 zero
    got = {r["url"]: r["n"] for r in docs.select(
        "url", F.size(matching_elements("authors", q.query)).alias("n"))
        .collect()}
    assert got == {"d1": 1, "d2": 1, "d3": 1, "d4": 0}
    ih = inner_hits(docs, q, size=1).collect()
    assert sorted(r["url"] for r in ih) == ["d1", "d2", "d3"]
    assert all(len(r["inner_hits"]) == 1 for r in ih)
    assert {r["url"]: r["inner_hits"][0]["name"] for r in ih} == {
        "d1": "bob", "d2": "alice", "d3": "carol"}


def test_children_agg_counts_child_docs(spark):
    """children agg: parent buckets (num odd/even) -> child doc counts;
    parent_filter narrows the stepped-down scope."""
    from sparksearch.relations import children_agg
    fam = _family_df(spark)
    got = {r.key: r.doc_count for r in children_agg(
        fam, "site", "page", (F.col("num") % 2).cast("int")).collect()}
    # odd sites s1(3 pages)+s3(1) = 4; even s2 = 1
    assert got == {1: 4, 0: 1}
    filt = {r.key: r.doc_count for r in children_agg(
        fam, "site", "page", (F.col("num") % 2).cast("int"),
        parent_filter=F.col("num") <= 2).collect()}
    assert filt == {1: 3, 0: 1}


def test_parent_agg_counts_each_parent_once(spark):
    """parent agg: a site with two 'de' pages counts ONCE in the de
    bucket (distinct-parent semantics of ChildrenToParentAggregator)."""
    from sparksearch.relations import parent_agg
    fam = _family_df(spark)
    got = {r.key: r.doc_count for r in parent_agg(
        fam, "site", "page", F.col("lang")).collect()}
    # de pages live under s1(x2) + s2 -> 2 parents; en under s1 + s3 -> 2
    assert got == {"de": 2, "en": 2}
