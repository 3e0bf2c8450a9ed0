"""JSON query-DSL parser + search-template rendering (driver-side only)."""

import pytest

from sparksearch.dsl import from_dsl, render_template
from sparksearch.queries import (
    Bool, Boosting, ConstantScore, DisMax, Exists, Fuzzy, Ids, Intervals,
    Match, MatchAll, MatchBoolPrefix, MatchPhrase, MatchPhrasePrefix,
    MoreLikeThis, MultiMatch, Prefix, Range, Regexp, SpanNear, Term, Terms,
    Wildcard,
)


def test_match_short_and_full_forms():
    assert from_dsl({"match": {"text": "hash join"}}) == \
        Match("text", "hash join")
    q = from_dsl({"match": {"text": {
        "query": "hash join", "operator": "and",
        "minimum_should_match": "75%", "fuzziness": "AUTO"}}})
    assert q == Match("text", "hash join", operator="and",
                      minimum_should_match="75%", fuzziness="AUTO")


def test_leaf_queries():
    assert from_dsl({"match_all": {}}) == MatchAll()
    assert from_dsl({"term": {"lang": "en"}}) == Term("lang", "en")
    assert from_dsl({"term": {"lang": {"value": "en"}}}) == Term("lang", "en")
    assert from_dsl({"terms": {"lang": ["en", "fr"]}}) == \
        Terms("lang", ("en", "fr"))
    assert from_dsl({"range": {"dl": {"gte": 10, "lt": 50}}}) == \
        Range("dl", gte=10, lt=50)
    assert from_dsl({"exists": {"field": "lang"}}) == Exists("lang")
    assert from_dsl({"ids": {"values": ["a", "b"]}}) == Ids(("a", "b"))
    assert from_dsl({"prefix": {"url": {"value": "https://x"}}}) == \
        Prefix("url", "https://x")
    assert from_dsl({"wildcard": {"text": {"value": "ha*h"}}}) == \
        Wildcard("text", "ha*h")
    assert from_dsl({"regexp": {"text": "ha.h"}}) == Regexp("text", "ha.h")
    assert from_dsl({"fuzzy": {"text": {"value": "hsah", "fuzziness": 1}}}) \
        == Fuzzy("text", "hsah", fuzziness=1)
    assert from_dsl({"match_phrase": {"text": {"query": "a b", "slop": 2}}}) \
        == MatchPhrase("text", "a b", slop=2)
    assert from_dsl({"match_phrase_prefix": {"text": "fast qu"}}) == \
        MatchPhrasePrefix("text", "fast qu")
    assert from_dsl({"match_bool_prefix": {"text": {
        "query": "fast qu", "operator": "and"}}}) == \
        MatchBoolPrefix("text", "fast qu", operator="and")


def test_compound_queries():
    q = from_dsl({"bool": {
        "must": [{"match": {"text": "join"}}],
        "should": {"match": {"text": "fast"}},
        "must_not": [{"match": {"text": "error"}}],
        "filter": [{"term": {"lang": "en"}}],
        "minimum_should_match": 0,
    }})
    assert isinstance(q, Bool)
    assert q.must == [Match("text", "join")]
    assert q.should == [Match("text", "fast")]
    assert q.must_not == [Match("text", "error")]
    assert q.filter == [Term("lang", "en")]

    dm = from_dsl({"dis_max": {"tie_breaker": 0.3, "queries": [
        {"match": {"text": "a"}}, {"term": {"lang": "en"}}]}})
    assert isinstance(dm, DisMax) and dm.tie_breaker == 0.3
    cs = from_dsl({"constant_score": {
        "filter": {"term": {"lang": "en"}}, "boost": 2.0}})
    assert cs == ConstantScore(Term("lang", "en"), boost=2.0)
    bo = from_dsl({"boosting": {
        "positive": {"match": {"text": "a"}},
        "negative": {"match": {"text": "b"}}, "negative_boost": 0.2}})
    assert isinstance(bo, Boosting) and bo.negative_boost == 0.2
    mm = from_dsl({"multi_match": {
        "query": "hash join", "fields": ["text", "url"],
        "type": "cross_fields", "operator": "and"}})
    assert isinstance(mm, MultiMatch) and mm.type == "cross_fields"
    mlt = from_dsl({"more_like_this": {
        "fields": ["text"], "like": "fast hash join", "max_query_terms": 5}})
    assert isinstance(mlt, MoreLikeThis) and mlt.max_query_terms == 5


def test_positional_queries():
    sn = from_dsl({"span_near": {
        "clauses": [{"span_term": {"text": "hash"}},
                    {"span_term": {"text": {"value": "join"}}}],
        "slop": 1, "in_order": False}})
    assert sn == SpanNear("text", ("hash", "join"), slop=1, in_order=False)
    iv = from_dsl({"intervals": {"text": {
        "match": {"query": "hash join", "max_gaps": 2, "ordered": True}}}})
    assert iv == Intervals("text", "hash join", max_gaps=2, ordered=True)


def test_unknown_type_raises():
    with pytest.raises(ValueError, match="unsupported query type"):
        from_dsl({"knn": {"field": "v"}})
    with pytest.raises(ValueError, match="one query type"):
        from_dsl({"match": {}, "term": {}})


def test_template_substitution_types():
    body = render_template(
        {"query": {"match": {"text": {"query": "{{q}}"}}},
         "size": "{{size}}", "note": "q={{q}}!"},
        {"q": "hash join", "size": 10})
    assert body["query"]["match"]["text"]["query"] == "hash join"
    assert body["size"] == 10          # exact-placeholder keeps int type
    assert body["note"] == "q=hash join!"
    assert render_template("{{missing}}", {}) == ""


def test_template_sections():
    tpl = {"bool": {
        "must": [{"match": {"text": "{{q}}"}}],
        "{{#use_filter}}": {"filter": [{"term": {"lang": "{{lang}}"}}]},
        "{{^use_filter}}": {"minimum_should_match": 1},
    }}
    on = render_template(tpl, {"q": "a", "use_filter": True, "lang": "en"})
    assert on["bool"]["filter"] == [{"term": {"lang": "en"}}]
    assert "minimum_should_match" not in on["bool"]
    off = render_template(tpl, {"q": "a", "use_filter": False})
    assert "filter" not in off["bool"]
    assert off["bool"]["minimum_should_match"] == 1


def test_template_then_parse_round_trip():
    tpl = {"match": {"text": {"query": "{{q}}", "operator": "{{op}}"}}}
    q = from_dsl(render_template(tpl, {"q": "hash join", "op": "and"}))
    assert q == Match("text", "hash join", operator="and")


def test_wrapper_query():
    import base64
    import json
    inner = {"match": {"text": {"query": "hash join", "operator": "and"}}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    assert from_dsl({"wrapper": {"query": b64}}) == \
        Match("text", "hash join", operator="and")


def test_span_family_and_terms_set():
    from sparksearch.queries import SpanFirst, SpanNot, SpanOr, TermsSet
    sf = from_dsl({"span_first": {
        "match": {"span_term": {"text": "join"}}, "end": 3}})
    assert sf == SpanFirst("text", ("join",), end=3)
    sf2 = from_dsl({"span_first": {
        "match": {"span_near": {
            "clauses": [{"span_term": {"text": "hash"}},
                        {"span_term": {"text": "join"}}], "slop": 1}},
        "end": 10}})
    assert sf2 == SpanFirst("text", ("hash", "join"), end=10, slop=1)
    so = from_dsl({"span_or": {"clauses": [
        {"span_term": {"text": "fast"}}, {"span_term": {"text": "slow"}}]}})
    assert so == SpanOr("text", ("fast", "slow"))
    sn = from_dsl({"span_not": {
        "include": {"span_term": {"text": "join"}},
        "exclude": {"span_term": {"text": "hash"}}, "pre": 1, "post": 2}})
    assert sn == SpanNot("text", "join", "hash", pre=1, post=2)
    ts = from_dsl({"terms_set": {"text": {
        "terms": ["join", "fast", "slow"], "required": 2}}})
    assert ts == TermsSet("text", ("join", "fast", "slow"), required=2)


def test_span_within_containing():
    from sparksearch.queries import SpanWithin
    body = {
        "little": {"span_term": {"text": "fast"}},
        "big": {"span_near": {
            "clauses": [{"span_term": {"text": "hash"}},
                        {"span_term": {"text": "join"}}], "slop": 3}},
    }
    w = from_dsl({"span_within": body})
    assert w == SpanWithin("text", "fast", ("hash", "join"), big_slop=3,
                           mode="within")
    c = from_dsl({"span_containing": body})
    assert c.mode == "containing"


def test_boost_wraps_in_function_score():
    from sparksearch.queries import FunctionScore, WeightFunction
    q = from_dsl({"match": {"text": {"query": "hash", "boost": 2.5}}})
    assert isinstance(q, FunctionScore)
    assert q.query == Match("text", "hash")
    assert q.functions == [WeightFunction(2.5)] and q.boost_mode == "multiply"
    dm = from_dsl({"dis_max": {"queries": [{"match": {"text": "a"}}],
                               "boost": 3.0}})
    assert isinstance(dm, FunctionScore) and dm.functions == [
        WeightFunction(3.0)]
    # constant_score's boost is its own score, never double-applied
    from sparksearch.queries import ConstantScore, Term
    cs = from_dsl({"constant_score": {
        "filter": {"term": {"lang": "en"}}, "boost": 2.0}})
    assert cs == ConstantScore(Term("lang", "en"), boost=2.0)
    # boost=1 stays unwrapped
    assert from_dsl({"match": {"text": {"query": "hash", "boost": 1.0}}}) \
        == Match("text", "hash")
    # distance_feature's boost is part of its decay formula — no wrapper
    from sparksearch.queries import DistanceFeature
    df = from_dsl({"distance_feature": {
        "field": "warc_ts", "origin": "2025-01-01 00:02:00",
        "pivot": "100s", "boost": 2.0}})
    assert df == DistanceFeature("warc_ts", origin="2025-01-01 00:02:00",
                                 pivot="100s", boost=2.0)


def test_round2e_leaves():
    """common / query_string / simple_query_string / span_term / span_multi
    DSL routing (SearchModule registrations)."""
    from sparksearch.queries import CommonTerms, SpanMulti
    ct = from_dsl({"common": {"text": {
        "query": "dup join the", "cutoff_frequency": 0.5,
        "low_freq_operator": "and"}}})
    assert ct == CommonTerms("text", "dup join the", cutoff_frequency=0.5,
                             low_freq_operator="and")
    # short form: value is the query text
    assert from_dsl({"common": {"text": "a b"}}) == CommonTerms("text", "a b")
    qs = from_dsl({"query_string": {"query": "hash AND join"}})
    assert isinstance(qs, Bool) and len(qs.must) == 2
    sqs = from_dsl({"simple_query_string": {
        "query": "hash + join", "fields": ["text^2"]}})
    assert isinstance(sqs, Bool)
    st = from_dsl({"span_term": {"text": {"value": "hash"}}})
    assert st == SpanNear("text", ("hash",), slop=0, in_order=True)
    sm = from_dsl({"span_multi": {
        "match": {"prefix": {"text": {"value": "ha"}}}}})
    assert isinstance(sm, SpanMulti) and sm.field_name == "text"


def test_validate_query():
    from sparksearch.dsl import validate_query
    ok, expl = validate_query({"match": {"text": "hash join"}})
    # explain returns the rewritten-query toString (profiler form)
    assert ok and expl == "text:hash text:join"
    bad, msg = validate_query({"knn": {"field": "v"}})
    assert not bad and "unsupported query type" in msg
    bad2, msg2 = validate_query({"match": {}})
    assert not bad2 and "parse error" in msg2


def test_nested_default_score_mode_is_avg():
    """NestedQueryBuilder.fromXContent defaults ScoreMode.Avg
    (NestedQueryBuilder.java:209): a bodied nested query without an
    explicit score_mode scores 1.0 per matching parent in this engine's
    constant-scoring model, not filter-context 0.0."""
    from sparksearch.dsl import from_dsl
    q = from_dsl({"nested": {"path": "sections",
                             "query": {"term": {"sections.first": "a"}}}})
    assert q.score_mode == "avg"
    q2 = from_dsl({"nested": {"path": "sections", "score_mode": "none",
                              "query": {"term": {"sections.first": "a"}}}})
    assert q2.score_mode == "none"


def test_wrapper_query_forms():
    """wrapper: base64, raw-JSON string, and bytes forms all rewrite to
    the wrapped query; junk is rejected loudly."""
    import base64
    import json

    import pytest

    from sparksearch.dsl import from_dsl
    from sparksearch.queries import Term
    inner = {"term": {"lang": "de"}}
    want = Term("lang", "de")
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    assert from_dsl({"wrapper": {"query": b64}}) == want
    assert from_dsl({"wrapper": {"query": json.dumps(inner)}}) == want
    assert from_dsl({"wrapper": {"query": json.dumps(inner).encode()}}) \
        == want
    with pytest.raises(ValueError, match="neither JSON nor base64"):
        from_dsl({"wrapper": {"query": "!!not-base64!!"}})


def test_intervals_filter_parsing_and_kinds():
    """filter blocks parse on match/any_of/all_of; unknown kinds fail
    at plan time, negated-empty filters are vacuous."""
    from sparksearch.dsl import from_dsl
    from sparksearch.queries import (IntervalsAllOf, IntervalsFiltered,
                                     IntervalsMatch)
    q = from_dsl({"intervals": {"text": {"match": {
        "query": "a b", "filter": {"overlapping": {
            "match": {"query": "c"}}}}}}})
    assert isinstance(q.source, IntervalsFiltered)
    assert q.source.kind == "overlapping"
    assert isinstance(q.source.source, IntervalsMatch)
    q2 = from_dsl({"intervals": {"text": {"all_of": {
        "intervals": [{"match": {"query": "a"}}],
        "filter": {"not_contained_by": {"match": {"query": "b"}}}}}}})
    assert isinstance(q2.source, IntervalsFiltered)
    assert isinstance(q2.source.source, IntervalsAllOf)
