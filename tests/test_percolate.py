"""Percolator semantics (sv/modules/percolator/ PercolateQueryBuilder):
stored queries matched against documents, checked against hand-computed
expectations on a tiny corpus."""

import pytest


@pytest.fixture(scope="module")
def perc(spark):
    from sparksearch.percolate import percolate
    docs = spark.createDataFrame([
        ("u1", "hash join beats nested loop"),
        ("u2", "join hash order is reversed here"),
        ("u3", "merge sort and scan pipelines"),
        ("u4", "bloom filters everywhere"),
        ("u5", "merge only"),
    ], "url string, text string")
    queries = spark.createDataFrame([
        ("q_and", "match_and", ["hash", "join"], None),
        ("q_or", "match_or", ["merge", "sort", "scan"], 2),
        ("q_phrase", "phrase", ["hash", "join"], None),
        ("q_term", "term", ["bloom"], None),
        ("q_phrase1", "phrase", ["merge"], None),
    ], "qid string, kind string, terms array<string>, msm int")
    rows = percolate(docs, queries).collect()
    return {(r["url"], r["qid"]) for r in rows}


def test_match_and(perc):
    assert ("u1", "q_and") in perc and ("u2", "q_and") in perc
    assert ("u3", "q_and") not in perc


def test_match_or_msm(perc):
    assert ("u3", "q_or") in perc        # merge+sort+scan
    assert ("u5", "q_or") not in perc    # only merge (1 < msm 2)


def test_phrase_positional(perc):
    assert ("u1", "q_phrase") in perc    # "hash join" consecutive
    assert ("u2", "q_phrase") not in perc  # "join hash" — wrong order


def test_term_and_single_phrase(perc):
    assert ("u4", "q_term") in perc
    assert ("u5", "q_phrase1") in perc   # 1-term phrase = membership


def test_percolate_bool_kind(spark):
    """Stored bool queries: must (all present) + must_not (none present)
    + should (>= msm); missing should list is vacuously satisfied."""
    from sparksearch.percolate import percolate
    docs = spark.createDataFrame(
        [("u1", "spark joins hash tables fast"),
         ("u2", "spark scans slow disks"),
         ("u3", "hash tables only")],
        "url string, text string")
    queries = spark.createDataFrame(
        [("b1", "bool", ["fast", "slow"], 1, ["spark"], ["error"]),
         ("b2", "bool", [], None, ["hash", "tables"], None),
         ("b3", "bool", [], None, ["spark"], ["slow"]),
         ("t1", "term", ["disks"], None, None, None)],
        "qid string, kind string, terms array<string>, msm int, "
        "must array<string>, must_not array<string>")
    got = {(r["url"], r["qid"])
           for r in percolate(docs, queries).collect()}
    assert got == {
        ("u1", "b1"),            # must spark + should fast
        ("u2", "b1"),            # must spark + should slow
        ("u1", "b2"), ("u3", "b2"),   # hash AND tables present
        ("u1", "b3"),            # spark present, slow absent
        ("u2", "t1"),            # legacy kinds unaffected by new columns
    }
