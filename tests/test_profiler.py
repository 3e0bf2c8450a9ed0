"""Query profile tree (ProfileResult analogue)."""

import pytest

from sparksearch.profiler import profile_rows, rewrite_tree
from sparksearch.queries import (Bool, Match, MatchPhrase, MoreLikeThis,
                                 Term)


def test_match_single_term_collapses_to_termquery():
    """Lucene rewrites a one-term match to a bare TermQuery — the
    profile must show the rewritten form, not the builder."""
    t = rewrite_tree(Match("text", "spark"))
    assert t == {"type": "TermQuery", "description": "text:spark",
                 "children": []}


def test_match_and_msm_descriptions():
    assert rewrite_tree(Match("text", "a b", operator="and"))[
        "description"] == "+text:a +text:b"
    assert rewrite_tree(Match("text", "a b c",
                              minimum_should_match=2))[
        "description"] == "(text:a text:b text:c)~2"


def test_bool_prefixes_and_preorder():
    q = Bool(must=[Match("text", "x")], must_not=[Term("lang", "de")],
             filter=[MatchPhrase("text", "a b")])
    rows = profile_rows(q)
    assert rows[0][2] == "BooleanQuery"
    assert rows[0][3] == '+text:x -lang:de #text:"a b"'
    assert [r[1] for r in rows] == [0, 1, 1, 1]  # root + 3 clauses


def test_unsupported_raises():
    with pytest.raises(NotImplementedError):
        rewrite_tree(MoreLikeThis("text", like_text="x"))


def test_analyzer_drives_rewrite():
    """english analyzer stems/stops the rewritten terms."""
    t = rewrite_tree(Match("text", "the running"), analyzer="english")
    assert t["description"] == "text:run"
