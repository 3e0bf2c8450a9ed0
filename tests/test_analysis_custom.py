"""Custom analyzer definitions: component semantics + chain assembly
(AnalysisRegistry / CustomAnalyzerProvider analogue, analysis_custom.py)."""

import pytest

from sparksearch.analysis import Token, analyze
from sparksearch.analysis_custom import (
    CustomAnalyzer,
    ensure_registered,
    get_custom,
    parse_synonyms,
    register_analysis,
    register_analyzer,
)


def _an(settings, **named):
    return CustomAnalyzer(settings, **named)


def test_char_filters():
    an = _an({"char_filter": [{"type": "mapping",
                               "mappings": ["& => and", "+ => plus"]}],
              "tokenizer": "standard", "filter": ["lowercase"]})
    assert [t.term for t in an.analyze("Fish & Chips + tax")] == \
        ["fish", "and", "chips", "plus", "tax"]
    an2 = _an({"char_filter": [{"type": "pattern_replace",
                                "pattern": r"\d+", "replacement": "N"}],
               "tokenizer": "whitespace"})
    assert [t.term for t in an2.analyze("a1 b22")] == ["aN", "bN"]
    an3 = _an({"char_filter": ["html_strip"], "tokenizer": "standard",
               "filter": ["lowercase"]})
    assert [t.term for t in an3.analyze("<b>Bold</b> move")] == \
        ["bold", "move"]


def test_tokenizers():
    assert [t.term for t in _an({"tokenizer": "keyword"}).analyze("a b")] \
        == ["a b"]
    assert [t.term for t in _an({"tokenizer": "letter"})
            .analyze("ab3cd ef")] == ["ab", "cd", "ef"]
    assert [t.term for t in _an({"tokenizer": "lowercase"})
            .analyze("AB3cd")] == ["ab", "cd"]
    assert [t.term for t in
            _an({"tokenizer": {"type": "pattern", "pattern": ","}})
            .analyze("a,b,,c")] == ["a", "b", "c"]
    assert [t.term for t in
            _an({"tokenizer": {"type": "pattern",
                               "pattern": r"'([^']+)'", "group": 1}})
            .analyze("'x' and 'y'")] == ["x", "y"]


def test_stop_filter_holes_and_config():
    an = _an({"tokenizer": "standard",
              "filter": ["lowercase",
                         {"type": "stop", "stopwords": ["the", "of"]}]})
    assert an.analyze("the best of both") == \
        [Token("best", 1), Token("both", 3)]
    # _english_ expands to the classic 33-word set
    an2 = _an({"tokenizer": "standard", "filter": ["lowercase", "stop"]})
    assert [t.term for t in an2.analyze("that was close")] == ["close"]


def test_stemmer_and_case_filters():
    an = _an({"tokenizer": "standard",
              "filter": ["lowercase", {"type": "stemmer",
                                       "language": "english"}]})
    assert [t.term for t in an.analyze("joined tables")] == ["join", "tabl"]
    up = _an({"tokenizer": "whitespace", "filter": ["uppercase"]})
    assert [t.term for t in up.analyze("ab")] == ["AB"]
    fold = _an({"tokenizer": "whitespace", "filter": ["asciifolding"]})
    assert [t.term for t in fold.analyze("café naïve")] == ["cafe", "naive"]


def test_synonym_rules():
    # equivalence: every member expands to the whole set, posIncrement 0
    an = _an({"tokenizer": "whitespace",
              "filter": [{"type": "synonym", "synonyms": ["fast, quick"]}]})
    assert an.analyze("fast car") == \
        [Token("fast", 0), Token("quick", 0), Token("car", 1)]
    # explicit: LHS replaced by RHS
    an2 = _an({"tokenizer": "whitespace",
               "filter": [{"type": "synonym",
                           "synonyms": ["u.s.a., usa => america"]}]})
    assert an2.analyze("usa wins") == [Token("america", 0), Token("wins", 1)]
    # expand=false contracts to the first member
    m = parse_synonyms(["big, large"], expand=False)
    assert m == {"big": ["big"], "large": ["big"]}
    with pytest.raises(ValueError):
        parse_synonyms(["new york, nyc"])  # multi-word rules unsupported


def test_shingle_with_filler_over_stop_holes():
    an = _an({"tokenizer": "standard",
              "filter": ["lowercase", {"type": "stop", "stopwords": ["the"]},
                         {"type": "shingle"}]})
    assert an.analyze("chips the best fish") == [
        Token("chips", 0), Token("chips _", 0), Token("_ best", 1),
        Token("best", 2), Token("best fish", 2), Token("fish", 3)]
    no_uni = _an({"tokenizer": "whitespace",
                  "filter": [{"type": "shingle", "min_shingle_size": 2,
                              "max_shingle_size": 3,
                              "output_unigrams": False}]})
    assert [t.term for t in no_uni.analyze("a b c")] == \
        ["a b", "a b c", "b c"]


def test_gram_and_misc_filters():
    edge = _an({"tokenizer": "whitespace",
                "filter": [{"type": "edge_ngram", "min_gram": 2,
                            "max_gram": 3}]})
    assert edge.analyze("hash jo") == \
        [Token("ha", 0), Token("has", 0), Token("jo", 1)]
    ng = _an({"tokenizer": "whitespace",
              "filter": [{"type": "ngram", "min_gram": 2, "max_gram": 2}]})
    assert [t.term for t in ng.analyze("abc")] == ["ab", "bc"]
    ln = _an({"tokenizer": "whitespace",
              "filter": [{"type": "length", "min": 2, "max": 3}]})
    assert ln.analyze("a ab abcd abc") == [Token("ab", 1), Token("abc", 3)]
    tr = _an({"tokenizer": {"type": "pattern", "pattern": ","},
              "filter": ["trim", "lowercase"]})
    assert [t.term for t in tr.analyze("A, B , c")] == ["a", "b", "c"]
    un = _an({"tokenizer": "whitespace", "filter": ["unique"]})
    assert un.analyze("a b a") == [Token("a", 0), Token("b", 1)]
    rv = _an({"tokenizer": "whitespace",
              "filter": ["reverse", {"type": "truncate", "length": 2}]})
    assert [t.term for t in rv.analyze("abcd")] == ["dc"]


def test_registry_and_settings_block():
    names = register_analysis({
        "analyzer": {"t_web": {"type": "custom",
                               "char_filter": ["t_amp"],
                               "tokenizer": "standard",
                               "filter": ["lowercase", "t_stop"]}},
        "char_filter": {"t_amp": {"type": "mapping",
                                  "mappings": ["& => and"]}},
        "filter": {"t_stop": {"type": "stop", "stopwords": ["and"]}}})
    assert names == ["t_web"]
    # routed through analysis.analyze by name
    assert [t.term for t in analyze("Fish & Chips", "t_web")] == \
        ["fish", "chips"]
    # persisted definition round-trips through ensure_registered
    defn = get_custom("t_web").definition
    import json
    defn = json.loads(json.dumps(defn))  # meta.json round trip
    import sparksearch.analysis_custom as AC
    AC._REGISTRY.pop("t_web")
    assert get_custom("t_web") is None
    ensure_registered("t_web", defn)
    assert [t.term for t in analyze("Fish & Chips", "t_web")] == \
        ["fish", "chips"]


def test_unknown_components_raise():
    with pytest.raises(ValueError):
        _an({"tokenizer": "nope"})
    with pytest.raises(ValueError):
        _an({"tokenizer": "standard", "filter": ["nope"]})
    with pytest.raises(ValueError):
        analyze("x", "unregistered_name")


def test_analyze_batch_custom_groups_terms():
    from sparksearch.analysis import analyze_batch
    register_analyzer("t_syn", {"tokenizer": "standard",
                                "filter": ["lowercase",
                                           {"type": "synonym",
                                            "synonyms": ["merge, join"]}]})
    dls, entries = analyze_batch(["Merge the tables", "merge merge join"],
                                 "t_syn")
    # dl counts expanded tokens; entries grouped (term, tf, positions)
    assert dls == [4, 6]
    assert entries[1] == [("join", 3, [0, 1, 2]), ("merge", 3, [0, 1, 2])]
    assert ("join", 1, [0]) in entries[0] and ("merge", 1, [0]) in entries[0]


def test_multi_phrase_routing(spark, index_sf0001):
    """Stacked-token phrase routes to MultiPhrase; single slot falls back
    to the blended match; sloppy multi-phrase hard-errors."""
    from sparksearch.exec import Executor
    from sparksearch.queries import MatchPhrase

    register_analyzer("t_syn2", {"tokenizer": "standard",
                                 "filter": ["lowercase",
                                            {"type": "synonym",
                                             "synonyms": ["merge, join"]}]})
    ex = Executor(index_sf0001)
    r = ex.search(MatchPhrase("text", "merge fast", analyzer="t_syn2"),
                  k=5, fetch=False).collect()
    assert all(x.score > 0 for x in r)
    # single stacked position → SynonymQuery via blended match
    one = ex.search(MatchPhrase("text", "merge", analyzer="t_syn2"),
                    k=3, fetch=False).collect()
    assert len(one) == 3
    with pytest.raises(NotImplementedError):
        ex._plan(MatchPhrase("text", "merge fast", analyzer="t_syn2",
                             slop=1), scored=True)
