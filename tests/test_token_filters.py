"""Unit tests for the round-3 analysis-common filter batch:
word_delimiter(_graph), normalization family, stemming control, token
management. Pure-Python (no Spark session) — the gate entries exercise
the same filters through the Arrow-UDF executor path."""

from sparksearch.analysis_custom import CustomAnalyzer


def _an(filters, tokenizer="whitespace"):
    return CustomAnalyzer({"tokenizer": tokenizer, "filter": filters})


def _terms(an, text):
    return [t.term for t in an.analyze(text)]


def _pairs(an, text):
    return [(t.term, t.pos) for t in an.analyze(text)]


# ---------------------------------------------------------------------------
# word_delimiter_graph
# ---------------------------------------------------------------------------

def test_wdg_defaults():
    an = _an([{"type": "word_delimiter_graph"}])
    assert _pairs(an, "Wi-Fi PowerShot500") == [
        ("Wi", 0), ("Fi", 1), ("Power", 2), ("Shot", 3), ("500", 4)]


def test_wdg_acronym_and_possessive():
    an = _an([{"type": "word_delimiter_graph"}])
    assert _terms(an, "XMLHttpRequest O'Neil's") == [
        "XML", "Http", "Request", "O", "Neil"]


def test_wdg_catenate_and_preserve():
    an = _an([{"type": "word_delimiter_graph", "catenate_words": True,
               "catenate_numbers": True, "preserve_original": True}])
    out = _pairs(an, "wi-fi 500-42")
    assert ("wi-fi", 0) in out and ("wifi", 0) in out
    assert ("wi", 0) in out and ("fi", 1) in out
    assert ("50042", 2) in out and ("500", 2) in out and ("42", 3) in out


def test_wdg_flags_off():
    an = _an([{"type": "word_delimiter_graph",
               "split_on_case_change": False,
               "split_on_numerics": False}])
    assert _terms(an, "PowerShot j2se wi-fi") == [
        "PowerShot", "j2se", "wi", "fi"]


def test_wdg_protected_words():
    an = _an([{"type": "word_delimiter_graph",
               "protected_words": ["wi-fi"]}])
    assert _terms(an, "wi-fi e-mail") == ["wi-fi", "e", "mail"]


def test_wdg_catenate_all():
    an = _an([{"type": "word_delimiter_graph",
               "generate_word_parts": False,
               "generate_number_parts": False,
               "catenate_all": True}])
    assert _pairs(an, "wi-fi-4000 next") == [
        ("wifi4000", 0), ("next", 1)]


# ---------------------------------------------------------------------------
# normalization family
# ---------------------------------------------------------------------------

def test_elision():
    an = _an([{"type": "elision", "articles": ["l", "d", "qu"]}])
    assert _terms(an, "l'avion d'été qu'il apostrophe'x") == [
        "avion", "été", "il", "apostrophe'x"]


def test_cjk_width():
    an = _an(["cjk_width"])
    assert _terms(an, "Ｔｅｓｔ１２３ ｶﾀｶﾅ ﾊﾟﾝ") == [
        "Test123", "カタカナ", "パン"]


def test_decimal_digit():
    an = _an(["decimal_digit"])
    assert _terms(an, "١٢٣ १२३") == ["123", "123"]


def test_german_normalization():
    an = _an(["german_normalization"])
    assert _terms(an, "häuser über quelle ueber fußball") == [
        "hauser", "uber", "quelle", "uber", "fussball"]


def test_arabic_normalization():
    an = _an(["arabic_normalization"])
    assert _terms(an, "الأَمْرُ آخر مدرسة") == ["الامر", "اخر", "مدرسه"]


def test_persian_normalization():
    an = _an(["persian_normalization"])
    assert _terms(an, "كتاب يك") == ["کتاب", "یک"]


def test_scandinavian_normalization():
    an = _an(["scandinavian_normalization"])
    assert _terms(an, "smoerrebroed aeble blåbær") == [
        "smørrebrød", "æble", "blåbær"]


def test_scandinavian_folding():
    an = _an(["scandinavian_folding"])
    assert _terms(an, "räksmörgås blåbær") == ["raksmorgas", "blabar"]


def test_apostrophe():
    an = _an(["apostrophe"])
    assert _terms(an, "Türkiye'nin kitap") == ["Türkiye", "kitap"]


def test_classic_filter():
    an = _an(["classic"])
    assert _terms(an, "i.b.m. John's U.S.A. regular") == [
        "ibm", "John", "USA", "regular"]


# ---------------------------------------------------------------------------
# stemming control
# ---------------------------------------------------------------------------

def test_keyword_marker_protects():
    an = _an(["lowercase",
              {"type": "keyword_marker", "keywords": ["running"]},
              {"type": "stemmer", "language": "english"}])
    assert _terms(an, "running jumping") == ["running", "jump"]


def test_keyword_marker_pattern_and_case():
    an = _an(["lowercase",
              {"type": "keyword_marker", "keywords_pattern": "run.*",
               "ignore_case": True},
              {"type": "stemmer", "language": "english"}])
    assert _terms(an, "running runs cats") == ["running", "runs", "cat"]


def test_keyword_marker_after_stemmer_no_protection():
    an = _an(["lowercase",
              {"type": "stemmer", "language": "english"},
              {"type": "keyword_marker", "keywords": ["running"]}])
    assert _terms(an, "running") == ["run"]


def test_stemmer_override():
    an = _an(["lowercase",
              {"type": "stemmer_override",
               "rules": ["running, runs => run", "mice => mouse"]},
              {"type": "stemmer", "language": "english"}])
    assert _terms(an, "running runs mice jumping") == [
        "run", "run", "mouse", "jump"]


def test_keyword_repeat_remove_duplicates():
    an = _an(["lowercase", "keyword_repeat",
              {"type": "stemmer", "language": "english"},
              "remove_duplicates"])
    assert _pairs(an, "running dog") == [
        ("running", 0), ("run", 0), ("dog", 1)]


# ---------------------------------------------------------------------------
# token management
# ---------------------------------------------------------------------------

def test_limit():
    an = _an([{"type": "limit", "max_token_count": 2}])
    assert _terms(an, "one two three") == ["one", "two"]


def test_keep():
    an = _an([{"type": "keep", "keep_words": ["fox", "dog"]}])
    assert _terms(an, "quick fox lazy dog cat") == ["fox", "dog"]


def test_keep_types():
    an = _an([{"type": "keep_types", "types": ["<NUM>"]}])
    assert _terms(an, "abc 123 4.5 xyz789") == ["123", "4.5"]
    an2 = _an([{"type": "keep_types", "types": ["<NUM>"],
                "mode": "exclude"}])
    assert _terms(an2, "abc 123 xyz") == ["abc", "xyz"]


def test_common_grams():
    an = _an([{"type": "common_grams", "common_words": ["the"]}])
    assert _pairs(an, "the quick fox") == [
        ("the", 0), ("the_quick", 0), ("quick", 1), ("fox", 2)]


def test_common_grams_query_mode():
    an = _an([{"type": "common_grams", "common_words": ["the"],
               "query_mode": True}])
    assert _terms(an, "the quick fox") == ["the_quick", "quick", "fox"]


def test_fingerprint():
    an = _an(["fingerprint"])
    assert _pairs(an, "zebra apple zebra mango") == [
        ("apple mango zebra", 0)]
    an2 = _an([{"type": "fingerprint", "max_output_size": 5}])
    assert _pairs(an2, "zebra apple") == []


def test_pattern_capture():
    an = _an([{"type": "pattern_capture",
               "patterns": [r"([a-z]+)(\d+)"]}])
    assert _pairs(an, "abc123") == [
        ("abc123", 0), ("abc", 0), ("123", 0)]


def test_multiplexer():
    an = _an([{"type": "multiplexer",
               "filters": ["lowercase", "uppercase"]}])
    assert _pairs(an, "Mixed") == [
        ("Mixed", 0), ("mixed", 0), ("MIXED", 0)]


def test_min_hash_deterministic_and_similarity():
    cfg = {"type": "min_hash", "bucket_count": 8}
    an = _an([cfg])
    a = _terms(an, "a b c d e f g h")
    b = _terms(_an([cfg]), "a b c d e f g h")
    assert a == b and len(a) == 8
    c = _terms(_an([cfg]), "a b c d e f g z")
    assert sum(1 for x in a if x in c) >= 5  # near-identical streams share
    d = _terms(_an([cfg]), "q r s t u v w x")
    assert sum(1 for x in a if x in d) <= 4  # disjoint streams mostly differ


def test_lowercase_language_variants():
    import pytest

    from sparksearch.analysis_custom import _tf_lowercase
    tr = _tf_lowercase({"language": "turkish"})
    # Turkish casing: dotted İ -> i, dotless I -> ı (DIYARBAKIR keeps
    # its dotless pattern; İSTANBUL -> istanbul)
    assert tr([("İSTANBUL", 0)]) == [("istanbul", 0)]
    assert tr([("DİYARBAKIR", 0)]) == [("diyarbakır", 0)]
    assert tr([("ISPARTA", 0)]) == [("ısparta", 0)]
    el = _tf_lowercase({"language": "greek"})
    # accent fold + final sigma
    assert el([("ΚΑΛΌΣ", 0)]) == [("καλοσ", 0)]
    assert el([("Ελλάς", 0)]) == [("ελλασ", 0)]
    assert el([("ΜΑΪΟΣ", 0)]) == [("μαιοσ", 0)]
    with pytest.raises(NotImplementedError):
        _tf_lowercase({"language": "irish"})
    # default unchanged
    assert _tf_lowercase({})([("ABC", 0)]) == [("abc", 0)]


# ---------------------------------------------------------------------------
# phonetic encoder=koelnerphonetik (ColognePhonetic)
# ---------------------------------------------------------------------------

def test_cologne_published_vectors():
    from sparksearch.filters_ext import _cologne
    # canonical published examples of the Kölner Phonetik
    assert _cologne("Müller-Lüdenscheidt") == "65752682"
    assert _cologne("Breschnew") == "17863"
    assert _cologne("Wikipedia") == "3412"
    # homophone surnames conflate
    assert _cologne("Meier") == _cologne("Mayer") == _cologne("Maier")


def test_cologne_context_rules():
    from sparksearch.filters_ext import _cologne
    assert _cologne("Phon") == "36"       # P before H -> 3
    assert _cologne("Stadt") == "822"     # d before t? no: dt->2 once... S8 T2 A0 D2 T2 -> 8 2 0 2 -> 822
    assert _cologne("Axt") == "0482"      # X not after C/K/Q -> 48


def test_cologne_filter_in_chain():
    from sparksearch.analysis_custom import register_analyzer
    an = register_analyzer("an_cologne_t", {
        "tokenizer": "standard",
        "filter": ["lowercase",
                   {"type": "phonetic", "encoder": "koelnerphonetik"}],
    })
    assert [t for t, _ in an.analyze("Meier Mayer")] == ["67", "67"]


# ---------------------------------------------------------------------------
# analysis-icu: icu_normalizer / icu_folding
# ---------------------------------------------------------------------------

def test_icu_normalizer_modes():
    from sparksearch.analysis_custom import register_analyzer
    # nfkc_cf (default): compatibility forms fold, case folds
    an = register_analyzer("an_icu_nrm", {
        "tokenizer": "whitespace",
        "filter": [{"type": "icu_normalizer"}],
    })
    # ﬁ ligature -> fi, fullwidth Ａ -> a, ß -> ss (case fold)
    assert [t for t, _ in an.analyze("ﬁsh Ａ straße")] \
        == ["fish", "a", "strasse"]
    # nfc leaves case and compatibility chars alone
    an2 = register_analyzer("an_icu_nfc", {
        "tokenizer": "whitespace",
        "filter": [{"type": "icu_normalizer", "name": "nfc"}],
    })
    decomposed = "étude"           # e + combining acute
    assert [t for t, _ in an2.analyze(decomposed)] == ["étude"]


def test_icu_folding_accents_case_width():
    from sparksearch.analysis_custom import register_analyzer
    an = register_analyzer("an_icu_fold", {
        "tokenizer": "whitespace",
        "filter": [{"type": "icu_folding"}],
    })
    assert [t for t, _ in an.analyze("Café ÉTUDE ｆｕｌｌ")] \
        == ["cafe", "etude", "full"]


def test_icu_normalizer_unknown_mode_refuses():
    import pytest

    from sparksearch.normfilters import icu_normalizer_filter
    with pytest.raises(NotImplementedError):
        icu_normalizer_filter({"name": "nfd"})
