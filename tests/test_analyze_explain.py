"""_analyze?explain=true detail stages (TransportAnalyzeAction.detailAnalyze,
DetailAnalyzeResponse; anonymous naming per AnalysisRegistry.java:156)."""
from sparksearch.analysis_custom import (CustomAnalyzer, analyze_explain,
                                         register_analyzer, get_custom)


def _an(name, settings):
    an = get_custom(name)
    return an if an is not None else register_analyzer(name, settings)


def test_detail_stages_and_names():
    an = CustomAnalyzer({
        "char_filter": [{"type": "pattern_replace", "pattern": "-",
                         "replacement": " "}],
        "tokenizer": "whitespace",
        "filter": ["lowercase",
                   {"type": "stop", "stopwords": ["the"]},
                   "porter_stem"]})
    d = an.analyze_detail("The Quick-Running foxes")
    assert d["custom_analyzer"] is True
    assert d["charfilters"] == [{
        "name": "__anonymous__pattern_replace",
        "filtered_text": ["The Quick Running foxes"]}]
    assert d["tokenizer"]["name"] == "whitespace"
    assert [(t.term, t.pos) for t in d["tokenizer"]["tokens"]] == [
        ("The", 0), ("Quick", 1), ("Running", 2), ("foxes", 3)]
    names = [tf["name"] for tf in d["tokenfilters"]]
    assert names == ["lowercase", "__anonymous__stop", "porter_stem"]
    # stop stage drops 'the' but keeps original positions
    assert [(t.term, t.pos) for t in d["tokenfilters"][1]["tokens"]] == [
        ("quick", 1), ("running", 2), ("foxes", 3)]
    # final stage equals analyze()
    assert d["tokenfilters"][-1]["tokens"] == an.analyze(
        "The Quick-Running foxes")


def test_detail_no_charfilter_no_filter():
    an = CustomAnalyzer({"tokenizer": "whitespace"})
    d = an.analyze_detail("a b")
    assert d["charfilters"] == [] and d["tokenfilters"] == []
    assert [t.term for t in d["tokenizer"]["tokens"]] == ["a", "b"]


def test_analyze_explain_prebuilt_branch():
    d = analyze_explain("standard", "Quick foxes")
    assert d["custom_analyzer"] is False
    assert d["analyzer"]["name"] == "standard"
    assert [t.term for t in d["analyzer"]["tokens"]] == ["quick", "foxes"]


def test_analyze_explain_registered_custom():
    _an("ae_reg", {"tokenizer": "whitespace", "filter": ["lowercase"]})
    d = analyze_explain("ae_reg", "A B")
    assert d["custom_analyzer"] is True
    assert [t.term for t in d["tokenfilters"][0]["tokens"]] == ["a", "b"]


def test_referenced_named_filter_keeps_its_name():
    an = CustomAnalyzer(
        {"tokenizer": "whitespace", "filter": ["my_stop"]},
        named_filters={"my_stop": {"type": "stop", "stopwords": ["x"]}})
    d = an.analyze_detail("x y")
    assert d["tokenfilters"][0]["name"] == "my_stop"
    assert [t.term for t in d["tokenfilters"][0]["tokens"]] == ["y"]


def test_analyze_unchanged_by_refactor():
    # the shared _tokenize path: glue-dependent cjk_bigram still correct
    an = CustomAnalyzer({"tokenizer": "standard",
                         "filter": ["cjk_bigram"]})
    out = [t.term for t in an.analyze("東京 都")]
    # whitespace between runs: no bigram across the gap
    assert "京都" not in out and "東京" in out
