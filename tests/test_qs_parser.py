"""query_string parser unit tests (no Spark)."""

from sparksearch.qs_parser import parse_query_string
from sparksearch.queries import Bool, Match, MatchPhrase, Term


def test_default_or():
    q = parse_query_string("hash join")
    assert isinstance(q, Bool)
    assert [c.text for c in q.should] == ["hash", "join"]
    assert not q.must and not q.must_not


def test_and_binds():
    q = parse_query_string("hash AND join")
    assert isinstance(q, Bool)
    assert [c.text for c in q.must] == ["hash", "join"]
    assert not q.should


def test_modifiers():
    q = parse_query_string("+hash join -error")
    assert [c.text for c in q.must] == ["hash"]
    assert [c.text for c in q.should] == ["join"]
    assert [c.text for c in q.must_not] == ["error"]


def test_not_keyword():
    q = parse_query_string("join NOT error")
    assert [c.text for c in q.should] == ["join"]
    assert [c.text for c in q.must_not] == ["error"]


def test_phrase():
    q = parse_query_string('"table scan"')
    assert isinstance(q, MatchPhrase)
    assert q.text == "table scan"


def test_field_term():
    q = parse_query_string("lang:en join")
    assert isinstance(q.should[0], Term)
    assert q.should[0].field_name == "lang"
    assert q.should[0].value == "en"
    assert isinstance(q.should[1], Match)


def test_grouping_or():
    q = parse_query_string('(hash AND join) OR "table scan"')
    assert isinstance(q, Bool)
    assert len(q.should) == 2
    inner, phrase = q.should
    assert [c.text for c in inner.must] == ["hash", "join"]
    assert isinstance(phrase, MatchPhrase)
    assert q.minimum_should_match == 1


def test_single_term():
    q = parse_query_string("join")
    assert isinstance(q, Match)
    assert q.text == "join"


def test_multiterm_atoms():
    from sparksearch.qs_parser import parse_query_string as p
    from sparksearch.queries import (Fuzzy, Prefix, Regexp, Term,
                                     TextPrefix, Wildcard)
    assert p("jo*") == TextPrefix("text", "jo")
    assert p("text:jo*") == TextPrefix("text", "jo")
    assert p("ha*h") == Wildcard("text", "ha*h")
    assert p("h?sh") == Wildcard("text", "h?sh")
    assert p("fuzzy~1") == Fuzzy("text", "fuzzy", fuzziness=1)
    assert p("term~") == Fuzzy("text", "term", fuzziness=1)  # AUTO: 4 chars
    assert p("ab~") == Fuzzy("text", "ab", fuzziness=0)
    assert p("/jo.n/") == Regexp("text", "jo.n")
    assert p("url:https://site1*") == Prefix("url", "https://site1")
    assert p("lang:en") == Term("lang", "en")


def test_simple_query_string_operators():
    """simple_query_string's | / + operator forms (SimpleQueryStringBuilder)
    parse to the same trees as OR / AND."""
    from sparksearch.qs_parser import parse_query_string as p
    assert p("hash | join") == p("hash OR join")
    assert p("hash && join") == p("hash AND join")
    assert p("a | b | c") == p("a OR b OR c")
