"""BM25 scoring goldens on the 5-doc tiny corpus (FIXTURES.md §3),
hand-checked against the Lucene BM25 formula with quantized norms."""

import math

import pytest

from sparksearch import bm25
from sparksearch.oracle import OracleIndex
from sparksearch.queries import Bool, Match, MatchPhrase

DOCS = [
    {"url": "u0", "text": "the quick brown fox"},
    {"url": "u1", "text": "the quick fox"},
    {"url": "u2", "text": "lazy dog"},
    {"url": "u3", "text": "the the the quick"},
    {"url": "u4", "text": "brown cow jumps over the lazy dog"},
]


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(DOCS)


def test_stats(idx):
    assert idx.n_docs == 5
    assert idx.doc_len == [4, 3, 2, 4, 7]
    assert idx.avgdl == 20 / 5
    assert idx.df("quick") == 3 and idx.df("fox") == 2 and idx.df("the") == 4


def test_match_or_hand_computed(idx):
    res = dict(idx.search(Match("text", "quick fox"), k=10))
    idf_quick = math.log(1 + (5 - 3 + 0.5) / 3.5)
    idf_fox = math.log(1 + (5 - 2 + 0.5) / 2.5)
    # d0: dl=4=avgdl → norm term = 1.0 → score = idf (tf=1: 2.2/(1+1.2))
    assert res[0] == pytest.approx(idf_quick + idf_fox, rel=1e-12)
    # d1: dl=3 → 1*2.2/(1+1.2*(0.25+0.75*3/4))
    tfn1 = 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / 4))
    assert res[1] == pytest.approx((idf_quick + idf_fox) * tfn1, rel=1e-12)
    # ranking: d1 > d0 > d3
    order = [d for d, _ in idx.search(Match("text", "quick fox"), k=10)]
    assert order == [1, 0, 3]


def test_match_and(idx):
    order = [d for d, _ in idx.search(Match("text", "quick fox", operator="and"), k=10)]
    assert order == [1, 0]  # d3 has no fox


def test_bool_must_not(idx):
    q = Bool(must=[Match("text", "quick")], must_not=[Match("text", "brown")])
    order = [d for d, _ in idx.search(q, k=10)]
    assert order == [1, 3]  # d0 excluded (brown); d1 dl=3 beats d3 dl=4


def test_bool_should_msm2(idx):
    q = Bool(should=[Match("text", "lazy"), Match("text", "cow")],
             minimum_should_match=2)
    order = [d for d, _ in idx.search(q, k=10)]
    assert order == [4]  # only d4 has both


def test_phrase_quick_fox(idx):
    res = idx.search(MatchPhrase("text", "quick fox"), k=10)
    assert [d for d, _ in res] == [1]
    # phrase scored as pseudo-term: idf = sum of member idfs, tf = phrase freq
    sum_idf = bm25.idf(3, 5) + bm25.idf(2, 5)
    tfn = 2.2 / (1 + 1.2 * (0.25 + 0.75 * 3 / 4))
    assert res[0][1] == pytest.approx(sum_idf * tfn, rel=1e-12)


def test_phrase_the_quick(idx):
    res = {d for d, _ in idx.search(MatchPhrase("text", "the quick"), k=10)}
    assert res == {0, 1, 3}


def test_zero_terms_none(idx):
    assert idx.search(Match("text", "absent_term"), k=10) == []
    assert idx.search(Match("text", "...!!!"), k=10) == []


def test_tf_saturation(idx):
    # d3 "the the the quick": tf(the)=3
    res = dict(idx.search(Match("text", "the"), k=10))
    idf_the = bm25.idf(4, 5)
    assert res[3] == pytest.approx(idf_the * 2.2 * 3 / (3 + 1.2 * 1.0), rel=1e-12)


def test_tie_break_docid_asc(idx):
    # d0 and d3 score identically for "quick" (same dl, same tf)
    res = idx.search(Match("text", "quick"), k=10)
    scores = dict(res)
    assert scores[0] == scores[3]
    order = [d for d, _ in res]
    assert order.index(0) < order.index(3)


def test_quantized_norms_used():
    # long docs: raw dl 100 vs 96 quantize to the same bucket → same score
    docs = [{"url": f"u{i}", "text": "needle " + "pad " * n}
            for i, n in enumerate([99, 95])]
    ix = OracleIndex(docs)
    assert ix.dl_q[0] == ix.dl_q[1] == 96.0
    res = dict(ix.search(Match("text", "needle"), k=2))
    assert res[0] == pytest.approx(res[1], rel=1e-12)


def test_msm_unsatisfiable(idx):
    q = Bool(should=[Match("text", "quick")], minimum_should_match=5)
    assert idx.search(q, k=10) == []


def test_pure_negative_scores_one(idx):
    q = Bool(must_not=[Match("text", "the")])
    res = idx.search(q, k=10)
    assert [d for d, _ in res] == [2]
    assert res[0][1] == 1.0  # implicit match_all constant score
