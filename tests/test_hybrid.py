"""RRF fusion semantics on hand-computed lists + hybrid end-to-end shape."""

import pytest


def test_rrf_fuse_hand_computed(spark):
    from sparksearch.hybrid import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "docid long, score double")
    b = spark.createDataFrame(
        [(3, 0.9), (1, 0.8), (4, 0.7)], "docid long, score double")
    got = {r["docid"]: r["score"]
           for r in rrf_fuse([a, b], rrf_k=60, top_n=10).collect()}
    # ranks: a: 1→1, 2→2, 3→3 ; b: 3→1, 1→2, 4→3
    exp = {1: 1 / 61 + 1 / 62, 2: 1 / 62, 3: 1 / 63 + 1 / 61, 4: 1 / 63}
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert got[d] == pytest.approx(round(s, 6))


def test_rrf_equal_scores_tiebreak_by_key(spark):
    from sparksearch.hybrid import rrf_fuse
    a = spark.createDataFrame(
        [(7, 1.0), (2, 1.0)], "docid long, score double")
    got = rrf_fuse([a], rrf_k=60, top_n=2).collect()
    # rank ties broken docid-asc → docid 2 ranks first
    assert got[0]["docid"] == 2 and got[1]["docid"] == 7


def test_hybrid_search_end_to_end(spark, index_sf0001):
    from sparksearch.exec import Executor
    from sparksearch.hybrid import hybrid_search
    from sparksearch.queries import Match

    ex = Executor(index_sf0001)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = hybrid_search(ex, Match("text", "join"), emb, query_vec_id=0,
                        k=5, pool=20).collect()
    assert 0 < len(out) <= 5
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    # fused scores are sums of 1/(60+r) terms — bounded by 2/61
    assert all(0 < s <= 2 / 61 + 1e-9 for s in scores)
