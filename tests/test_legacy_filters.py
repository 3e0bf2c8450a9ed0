"""Legacy fixed-language stem filters, pattern_replace token filter,
and the Java-replacement translation helper.

Reference behavior: modules/analysis-common/.../DutchStemTokenFilterFactory
.java (SetKeywordMarkerFilter(stem_exclusion) + SnowballFilter),
PatternReplaceTokenFilterFactory.java (Java Matcher.replaceAll/$N refs),
CommonAnalysisModulePlugin.java filter registry names.
"""
import pytest

from sparksearch.analysis_custom import (_java_repl, register_analyzer,
                                         get_custom)


def _an(name, settings):
    an = get_custom(name)
    return an if an is not None else register_analyzer(name, settings)


def _terms(an, text):
    return [t.term for t in an.analyze(text)]


# ---------------------------------------------------------------------------
# _java_repl
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("java,py", [
    ("$1", "\\1"), ("$2_$1", "\\2_\\1"), ("${10}x", "\\10x"),
    ("a$12b", "a\\12b"),           # multi-digit group ref
    (r"\$1", "$1"),                # escaped dollar -> literal
    (r"\\", "\\\\"),               # escaped backslash -> one literal
    (r"\n", "n"),                  # Java: backslash-escape = literal char
    ("plain", "plain"), ("", ""),
    ("$", "$"),                    # trailing bare dollar stays literal
])
def test_java_repl(java, py):
    assert _java_repl(java) == py


def test_java_repl_roundtrip_in_sub():
    import re
    assert re.sub(r"(\d+)-(\d+)", _java_repl("$2_$1"), "3-4") == "4_3"
    assert re.sub(r"(x)", _java_repl(r"\$$1"), "x") == "$x"


# ---------------------------------------------------------------------------
# pattern_replace token filter
# ---------------------------------------------------------------------------

def test_pattern_replace_all_default():
    an = _an("lt_pr_all", {
        "tokenizer": "whitespace",
        "filter": [{"type": "pattern_replace", "pattern": "o",
                    "replacement": "0"}]})
    assert _terms(an, "foo bode") == ["f00", "b0de"]


def test_pattern_replace_first_only():
    an = _an("lt_pr_first", {
        "tokenizer": "whitespace",
        "filter": [{"type": "pattern_replace", "pattern": "o",
                    "replacement": "0", "all": False}]})
    assert _terms(an, "foo bode") == ["f0o", "b0de"]


def test_pattern_replace_emptied_token_dropped_positions_kept():
    # Documented deviation: an emptied term is dropped at assembly
    # (Lucene keeps a ""-term token) but surviving tokens keep their
    # original positions, so phrase/span gaps match the reference.
    an = _an("lt_pr_empty", {
        "tokenizer": "whitespace",
        "filter": [{"type": "pattern_replace", "pattern": r"^\d+$",
                    "replacement": ""}]})
    toks = an.analyze("abc 123 def")
    assert [(t.term, t.pos) for t in toks] == [("abc", 0), ("def", 2)]


def test_pattern_replace_group_refs():
    an = _an("lt_pr_groups", {
        "tokenizer": "whitespace",
        "filter": [{"type": "pattern_replace",
                    "pattern": r"(\d+)-(\d+)", "replacement": "$2_$1"}]})
    assert _terms(an, "10-20-30") == ["20_10-30"]


# ---------------------------------------------------------------------------
# legacy snowball-backed stem filter names
# ---------------------------------------------------------------------------

def test_dutch_stem_routes_to_snowball_dutch():
    from sparksearch.stemmers import LANGUAGE_STEMMERS
    an = _an("lt_nl", {"tokenizer": "whitespace",
                       "filter": ["lowercase", "dutch_stem"]})
    words = ["lichamelijke", "overgegaan", "koninginnen"]
    assert _terms(an, " ".join(words)) == [
        LANGUAGE_STEMMERS["dutch"](w) for w in words]


def test_french_russian_stem_route_to_snowball():
    from sparksearch.stemmers import LANGUAGE_STEMMERS
    fr = _an("lt_fr", {"tokenizer": "whitespace", "filter": ["french_stem"]})
    ru = _an("lt_ru", {"tokenizer": "whitespace", "filter": ["russian_stem"]})
    assert _terms(fr, "continuellement") == [
        LANGUAGE_STEMMERS["french"]("continuellement")]
    assert _terms(ru, "впечатление") == [
        LANGUAGE_STEMMERS["russian"]("впечатление")]


def test_stem_exclusion_protects_term():
    an = _an("lt_nl_excl", {
        "tokenizer": "whitespace",
        "filter": ["lowercase",
                   {"type": "dutch_stem",
                    "stem_exclusion": ["koninginnen"]}]})
    assert _terms(an, "koninginnen lichamelijke") == [
        "koninginnen", "licham"]


def test_keyword_marker_still_protects_legacy_stem():
    # chain-state keyword protection composes with the factory-local
    # stem_exclusion list
    an = _an("lt_nl_kw", {
        "tokenizer": "whitespace",
        "filter": [{"type": "keyword_marker", "keywords": ["overgegaan"]},
                   {"type": "dutch_stem",
                    "stem_exclusion": ["koninginnen"]}]})
    assert _terms(an, "overgegaan koninginnen lichamelijke") == [
        "overgegaan", "koninginnen", "licham"]


# ---------------------------------------------------------------------------
# registered-but-refused names raise with guidance
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name,hint", [
    ("german_stem", "light_german"),
    ("brazilian_stem", "portuguese"),
    ("kstem", "porter2"),
    ("bengali_normalization", "not re-derivable"),
    ("indic_normalization", "not re-derivable"),
])
def test_unsupported_filter_names_raise(name, hint):
    with pytest.raises(NotImplementedError, match=hint):
        register_analyzer(f"lt_bad_{name}",
                          {"tokenizer": "whitespace", "filter": [name]})


def test_java_repl_named_group_rejected():
    with pytest.raises(ValueError, match="named group"):
        _java_repl("${name}")
    assert _java_repl("${2}_${1}") == "\\2_\\1"


@pytest.mark.parametrize("name,hint", [
    ("kuromoji_tokenizer", "MeCab-IPADIC"),
    ("nori_tokenizer", "mecab-ko-dic"),
    ("smartcn_tokenizer", "HMM"),
])
def test_morphological_tokenizers_refuse_with_guidance(name, hint):
    with pytest.raises(NotImplementedError, match=hint):
        register_analyzer(f"lt_tk_{name}", {"tokenizer": name})
