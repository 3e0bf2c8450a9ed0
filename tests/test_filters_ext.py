"""Unit tests for filters_ext.py — decompounders, scripted token
filters, delimited_payload, flatten_graph, phonetic soundex."""

import pytest

from sparksearch.analysis_custom import CustomAnalyzer


def _an(filters):
    return CustomAnalyzer({"tokenizer": "whitespace", "filter": filters})


def _pairs(a, s):
    return [(t.term, t.pos) for t in a.analyze(s)]


def _terms(a, s):
    return [t.term for t in a.analyze(s)]


def test_dictionary_decompounder_stacks_subwords():
    a = _an(["lowercase",
             {"type": "dictionary_decompounder",
              "word_list": ["dampf", "schiff", "fahrt"]}])
    assert _pairs(a, "Dampfschiff x") == [
        ("dampfschiff", 0), ("dampf", 0), ("schiff", 0), ("x", 1)]


def test_dictionary_decompounder_only_longest_match():
    a = _an(["lowercase",
             {"type": "dictionary_decompounder",
              "word_list": ["dona", "donau", "dampf"],
              "only_longest_match": True}])
    # at offset 0 both dona and donau match; only donau survives
    assert _terms(a, "Donaudampf") == ["donaudampf", "donau", "dampf"]


def test_dictionary_decompounder_min_word_size_guard():
    a = _an([{"type": "dictionary_decompounder", "word_list": ["ab"],
              "min_word_size": 5}])
    assert _terms(a, "abab") == ["abab"]  # token shorter than min_word


def test_hyphenation_decompounder_full_partition_only():
    a = _an(["lowercase",
             {"type": "hyphenation_decompounder",
              "word_list": ["dampf", "schiff", "fahrt"]}])
    # partitions cleanly -> subwords; 'dampfx' does not -> untouched
    assert _terms(a, "Dampfschifffahrt dampfx") == [
        "dampfschifffahrt", "dampf", "schiff", "fahrt", "dampfx"]


def test_condition_applies_subchain_to_matching_tokens():
    a = _an([{"type": "condition", "filter": ["lowercase"],
              "script": {"source": "token.term.length() < 5"}}])
    assert _terms(a, "Hello BIG World AB") == [
        "Hello", "big", "World", "ab"]


def test_condition_position_predicate():
    a = _an([{"type": "condition", "filter": ["reverse"],
              "script": {"source": "token.position == 1"}}])
    assert _terms(a, "one two three") == ["one", "owt", "three"]


def test_predicate_token_filter_keeps_matches():
    a = _an([{"type": "predicate_token_filter",
              "script": {"source":
                         'token.term.contains("a") && token.position > 0'}}])
    assert _pairs(a, "apple banana cat dog") == [
        ("banana", 1), ("cat", 2)]


def test_predicate_params():
    a = _an([{"type": "predicate_token_filter",
              "script": {"source": "token.term.length() >= params.n",
                         "params": {"n": 4}}}])
    assert _terms(a, "ab abcd abcde") == ["abcd", "abcde"]


def test_predicate_rejects_dangerous_source():
    with pytest.raises(ValueError):
        _an([{"type": "predicate_token_filter",
              "script": {"source": "__import__('os')"}}])


def test_delimited_payload_strips_payload():
    a = _an([{"type": "delimited_payload", "delimiter": "|"}])
    assert _terms(a, "the|0 brown|10 fox") == ["the", "brown", "fox"]


def test_flatten_graph_identity():
    a = _an(["flatten_graph"])
    assert _pairs(a, "a b") == [("a", 0), ("b", 1)]


def test_soundex_canonical_vectors():
    a = _an([{"type": "phonetic", "encoder": "soundex"}])
    # commons-codec Soundex test vectors incl. H/W transparency
    assert _terms(a, "Robert Rupert Ashcraft Ashcroft Tymczak Pfister") \
        == ["R163", "R163", "A261", "A261", "T522", "P236"]


def test_soundex_replace_false_stacks():
    a = _an([{"type": "phonetic", "encoder": "soundex", "replace": False}])
    assert _pairs(a, "Robert") == [("Robert", 0), ("R163", 0)]


def test_phonetic_unknown_encoder_raises():
    with pytest.raises(NotImplementedError):
        _an([{"type": "phonetic", "encoder": "caverphone"}])


def test_decompound_search_recall(spark, tmp_path):
    """Compound-word recall end-to-end: a German-style compound doc is
    found by its parts when indexed with the decompounder."""
    from pyspark.sql import functions as F
    from sparksearch.analysis_custom import register_analyzer
    from sparksearch.build import build_index
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    register_analyzer("an_compound", {
        "tokenizer": "whitespace",
        "filter": ["lowercase",
                   {"type": "dictionary_decompounder",
                    "word_list": ["dampf", "schiff", "fahrt"]}]})
    docs = [("u1", "Dampfschifffahrt heute"), ("u2", "schiff ahoi"),
            ("u3", "nichts relevantes")]
    df = (spark.createDataFrame(docs, "url string, text string")
          .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
          .withColumn("lang", F.lit("de")))
    d = str(tmp_path / "ix_comp")
    build_index(df, d, analyzer="an_compound")
    ex = Executor(IndexReader(spark, d))
    hits = ex.search(Match("text", "schiff"), k=10).collect()
    assert sorted(r.url for r in hits) == ["u1", "u2"]


def test_metaphone_commons_codec_vectors():
    """commons-codec MetaphoneTest vectors (the analysis-phonetic
    plugin's default encoder)."""
    from sparksearch.filters_ext import _metaphone as m
    vectors = {
        "howl": "HL", "testing": "TSTN", "The": "0", "quick": "KK",
        "brown": "BRN", "fox": "FKS", "jumped": "JMPT", "over": "OFR",
        "lazy": "LS", "dogs": "TKS",
        "knight": "NT", "wright": "RT", "why": "",
        "aero": "ER", "xavier": "SFR", "dumb": "TM", "thumb": "0M",
        "science": "SNS", "judge": "JJ",
        "SCHEDULE": "SKTL", "SCHEMATIC": "SKMT",
        "CHARACTER": "KRKT", "TEACH": "TX",
    }
    for w, want in vectors.items():
        assert m(w) == want, (w, want, m(w))


def test_metaphone_filter_registered():
    a = _an([{"type": "phonetic", "encoder": "metaphone"}])
    assert _terms(a, "testing dogs") == ["TSTN", "TKS"]


def test_double_metaphone_still_refuses():
    import pytest as _pt
    with _pt.raises(NotImplementedError):
        _an([{"type": "phonetic", "encoder": "double_metaphone"}])("x")
