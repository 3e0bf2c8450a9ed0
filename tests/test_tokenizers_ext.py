"""Unit tests for the extended tokenizer registry (tokenizers_ext.py) —
goldens hand-derived from the documented Lucene tokenizer semantics."""

from sparksearch.analysis_custom import CustomAnalyzer


def _an(tk, **cfg):
    spec = tk if not cfg else dict(type=tk, **cfg)
    return CustomAnalyzer({"tokenizer": spec})


def _terms(a, s):
    return [t.term for t in a.analyze(s)]


def _pairs(a, s):
    return [(t.term, t.pos) for t in a.analyze(s)]


def test_ngram_default_order():
    # offset-major, then gram length: the documented Lucene order
    assert _terms(_an("ngram"), "abc") == ["a", "ab", "b", "bc", "c"]


def test_ngram_token_chars_runs():
    a = _an("ngram", min_gram=2, max_gram=3,
            token_chars=["letter", "digit"])
    assert _terms(a, "ab cd3!x") == ["ab", "cd", "cd3", "d3"]


def test_ngram_custom_token_chars():
    a = _an("ngram", min_gram=2, max_gram=2,
            token_chars=["letter", "custom"], custom_token_chars="+")
    assert _terms(a, "a+b c") == ["a+", "+b"]


def test_ngram_invalid_grams():
    import pytest
    with pytest.raises(ValueError):
        _an("ngram", min_gram=3, max_gram=2)


def test_edge_ngram_prefixes_per_run():
    a = _an("edge_ngram", min_gram=1, max_gram=3, token_chars=["letter"])
    assert _terms(a, "Quick Fox") == ["Q", "Qu", "Qui", "F", "Fo", "Fox"]


def test_edge_ngram_short_run_clips():
    a = _an("edge_ngram", min_gram=2, max_gram=5, token_chars=["letter"])
    assert _terms(a, "ab xyz") == ["ab", "xy", "xyz"]


def test_char_group_split_chars_and_classes():
    a = _an("char_group", tokenize_on_chars=["whitespace", "-"])
    assert _terms(a, "a-b cd-e") == ["a", "b", "cd", "e"]


def test_char_group_max_token_length_splits():
    a = _an("char_group", tokenize_on_chars=["whitespace"],
            max_token_length=3)
    assert _terms(a, "abcdefg hi") == ["abc", "def", "g", "hi"]


def test_path_hierarchy_prefix_stack_at_pos0():
    assert _pairs(_an("path_hierarchy"), "/usr/local/bin") == [
        ("/usr", 0), ("/usr/local", 0), ("/usr/local/bin", 0)]


def test_path_hierarchy_reverse_replacement_skip():
    a = _an("path_hierarchy", delimiter="/", replacement="-",
            reverse=True)
    assert _terms(a, "a/b/c") == ["c", "b-c", "a-b-c"]
    a2 = _an("path_hierarchy", skip=1)
    assert _terms(a2, "one/two/three") == ["one/two", "one/two/three"]


def test_simple_pattern_emits_matches():
    a = _an("simple_pattern", pattern="[0-9]{3}")
    assert _terms(a, "fd-786-335-514-x") == ["786", "335", "514"]


def test_simple_pattern_split():
    a = _an("simple_pattern_split", pattern="_+")
    assert _terms(a, "an_underscored__phrase") == [
        "an", "underscored", "phrase"]


def test_uax_url_email_keeps_spans_whole():
    a = _an("uax_url_email")
    assert _terms(a, "visit https://example.com/a?b=1, mail bob@ex.co.uk") \
        == ["visit", "https://example.com/a?b=1", "mail", "bob@ex.co.uk"]


def test_classic_grammar():
    a = _an("classic")
    assert _terms(a, "I.B.M. AT&T O'Neil's www.foo.bar 12.3") == [
        "I.B.M.", "AT&T", "O'Neil's", "www.foo.bar", "12.3"]


def test_classic_plus_classic_filter_strips():
    a = CustomAnalyzer({"tokenizer": "classic",
                        "filter": ["classic", "lowercase"]})
    assert _terms(a, "I.B.M. John's") == ["ibm", "john"]


def test_edge_ngram_index_and_search(spark, tmp_path):
    """edge_ngram index analyzer + keyword search analyzer: the classic
    autocomplete shape — a prefix query term hits via indexed prefixes."""
    from pyspark.sql import functions as F
    from sparksearch.analysis_custom import register_analyzer
    from sparksearch.build import build_index
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    register_analyzer("an_autocomplete", {
        "tokenizer": {"type": "edge_ngram", "min_gram": 2, "max_gram": 8,
                      "token_chars": ["letter", "digit"]},
        "filter": ["lowercase"]})
    register_analyzer("an_kw_lower", {"tokenizer": "keyword",
                                      "filter": ["lowercase"]})
    docs = [("u1", "sparkling water"), ("u2", "sparse matrix"),
            ("u3", "unrelated row")]
    df = (spark.createDataFrame(docs, "url string, text string")
          .withColumn("warc_ts", F.to_timestamp(F.lit("2024-01-01")))
          .withColumn("lang", F.lit("en")))
    d = str(tmp_path / "ix_edge")
    build_index(df, d, analyzer="an_autocomplete")
    ex = Executor(IndexReader(spark, d))
    hits = ex.search(Match("text", "spar", analyzer="an_kw_lower"),
                     k=10).collect()
    assert sorted(r.url for r in hits) == ["u1", "u2"]


# ---------------------------------------------------------------------------
# icu_tokenizer (analysis-icu)
# ---------------------------------------------------------------------------

def test_icu_uax29_word_break():
    from sparksearch.tokenizers_ext import icu_tokenizer
    t = icu_tokenizer({})
    assert t("don't stop 3.14 1,000 e.g. test") == \
        ["don't", "stop", "3.14", "1,000", "e.g", "test"]
    assert t("can't-stop won't") == ["can't", "stop", "won't"]
    assert t("A_B_3 under_score __ plain") == \
        ["A_B_3", "under_score", "plain"]
    assert t("café résumé") == ["café", "résumé"]


def test_icu_hebrew_quote_rules():
    from sparksearch.tokenizers_ext import icu_tokenizer
    t = icu_tokenizer({})
    # WB7a: Hebrew letter + single quote keeps the quote
    assert t("קוטג' שלום") == ["קוטג'", "שלום"]
    # WB7b/c: Hebrew letters join through a double quote
    assert t('מנכ"ל') == ['מנכ"ל']


def test_icu_katakana_chain_and_han_fallback():
    from sparksearch.tokenizers_ext import icu_tokenizer
    t = icu_tokenizer({})
    assert t("ログイン画面です") == ["ログイン", "画", "面", "で", "す"]
    assert t("１２３ ｶﾀｶﾅ") == ["１２３", "ｶﾀｶﾅ"]


def test_icu_dictionary_break_engine():
    from sparksearch.tokenizers_ext import icu_tokenizer
    td = icu_tokenizer({"dictionary": ["สวัสดี", "ครับ", "画面"]})
    assert td("สวัสดีครับ hello") == ["สวัสดี", "ครับ", "hello"]
    assert td("ログイン画面です") == ["ログイン", "画面", "で", "す"]
    # no dictionary: SE-Asian run stays whole (documented fallback)
    t = icu_tokenizer({})
    assert t("สวัสดีครับ") == ["สวัสดีครับ"]


def test_icu_in_custom_analyzer():
    from sparksearch.analysis_custom import CustomAnalyzer
    a = CustomAnalyzer({
        "tokenizer": {"type": "icu_tokenizer",
                      "dictionary": ["画面"]},
        "filter": ["lowercase"]})
    assert [t.term for t in a.analyze("Don't LOGIN 画面")] == \
        ["don't", "login", "画面"]


def test_thai_tokenizer_dictionary_and_uax29():
    from sparksearch.tokenizers_ext import TOKENIZERS_EXT
    tok = TOKENIZERS_EXT["thai"](
        {"dictionary": ["สวัสดี", "ครับ", "ภาษา", "ไทย"]})
    assert tok("สวัสดีครับ hello ภาษาไทย123") == \
        ["สวัสดี", "ครับ", "hello", "ภาษา", "ไทย", "123"]
    # unknown Thai span falls back per the documented gap handling
    assert "hello" in tok("hello ๆๆ")


def test_thai_tokenizer_requires_dictionary():
    import pytest
    from sparksearch.tokenizers_ext import TOKENIZERS_EXT
    with pytest.raises(ValueError):
        TOKENIZERS_EXT["thai"]({})
