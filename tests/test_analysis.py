"""Analyzer goldens (FIXTURES.md §2, derived from the reference's
indices.analyze/10_analyze.yml cases and the standard analyzer defaults)."""

from sparksearch.analysis import (
    ENGLISH_STOP_WORDS, analyze, analyze_values, standard_tokenize,
)
from sparksearch.porter import porter_stem


def terms(text, analyzer="standard"):
    return [t for t, _ in analyze(text, analyzer)]


def test_foo_bar():
    assert terms("Foo Bar") == ["foo", "bar"]
    assert terms("Foo Bar!") == ["foo", "bar"]


def test_tokenizer_no_lowercase():
    assert terms("Foo Bar", "standard_raw") == ["Foo", "Bar"]


def test_multi_value_positions():
    toks = analyze_values(["Foo Bar", "Baz"], "standard")
    assert [t.term for t in toks] == ["foo", "bar", "baz"]
    assert toks[0].pos == 0 and toks[1].pos == 1
    assert toks[2].pos == 2 + 100  # position_increment_gap=100


def test_stopwords_not_removed_by_default():
    assert terms("The QUICK brown-foxes, jumped… 42 times!") == [
        "the", "quick", "brown", "foxes", "jumped", "42", "times"]


def test_apostrophes_and_diacritics():
    # UAX#29: apostrophe is a mid-letter joiner; letters include diacritics;
    # № is dropped (not alphanumeric)
    assert terms("it's O'Neill's café №5") == ["it's", "o'neill's", "café", "5"]


def test_midnumlet_dot():
    assert terms("visit example.com or 3.14 now") == [
        "visit", "example.com", "or", "3.14", "now"]
    # letter.digit breaks (MidNumLet needs same class both sides)
    assert terms("a.5") == ["a", "5"]


def test_underscore_joins():
    assert terms("foo_bar baz_") == ["foo_bar", "baz_"]


def test_max_token_length_255():
    tok = "x" * 300
    out = terms(tok)
    assert out == ["x" * 255, "x" * 45]


def test_positions_dense():
    toks = analyze("one two three")
    assert [(t.term, t.pos) for t in toks] == [("one", 0), ("two", 1), ("three", 2)]


def test_english_chain():
    # lowercase + stop + porter (CommonAnalysisModulePlugin.java:542,563)
    assert terms("The quick foxes", "english") == ["quick", "fox"]


def test_stop_filter_keeps_position_holes():
    toks = analyze("the quick fox", "english")
    assert [(t.term, t.pos) for t in toks] == [("quick", 1), ("fox", 2)]


def test_stop_set_is_classic_33():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "quick" not in ENGLISH_STOP_WORDS


def test_porter_classics():
    cases = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "generalization": "gener", "jumped": "jump", "foxes": "fox",
        "quick": "quick", "argument": "argument", "adjustment": "adjust",
    }
    for w, expect in cases.items():
        assert porter_stem(w) == expect, (w, porter_stem(w), expect)


def test_empty_and_whitespace():
    assert terms("") == []
    assert terms("   \t\n ") == []
    assert standard_tokenize("...!!!") == []


def test_analyze_batch_equivalence():
    """analyze_batch (vectorized build hot path) must be byte-identical to
    per-row analyze() grouping across analyzers and adversarial inputs."""
    import pandas as pd
    from sparksearch.analysis import analyze, analyze_batch

    cases = [
        "the quick brown fox jumps over the lazy dog",
        "The QUICK brown-foxes 2.5 can't stop",
        "", None, "   ", "a", "x" * 600, ("tok " * 5) + "y" * 300 + " tail",
        "日本語 テスト 中文字符 mixed latin", "über café naïve",
        "joined tables are joining the join", "1,000.5 3.14 v2.0",
        "a.b.c d'Artagnan it's", "word " * 50,
    ]
    for an in ("standard", "english", "whitespace", "standard_raw",
               "keyword"):
        dls, entries = analyze_batch(pd.Series(cases, dtype=object), an)
        for i, t in enumerate(cases):
            toks = analyze(t or "", an)
            by: dict = {}
            for term, pos in toks:
                by.setdefault(term, []).append(pos)
            want = [(term, len(ps), ps) for term, ps in sorted(by.items())]
            got = [(t_, tf, list(ps)) for t_, tf, ps in entries[i]]
            assert dls[i] == len(toks), (an, i)
            assert got == want, (an, i, got, want)


def test_analyze_batch_random_equivalence():
    """Randomized fuzz: mixed unicode/punct corpora through both paths."""
    import random
    import pandas as pd
    from sparksearch.analysis import analyze, analyze_batch

    rng = random.Random(42)
    alphabet = ["join", "Hash", "the", "2.5", "can't", "日本", "naïve",
                "a,b", "x" * 256, "_", "—", "e.g.", "v2", ""]
    cases = [" ".join(rng.choices(alphabet, k=rng.randrange(0, 30)))
             for _ in range(200)]
    for an in ("standard", "english"):
        dls, entries = analyze_batch(pd.Series(cases, dtype=object), an)
        for i, t in enumerate(cases):
            toks = analyze(t, an)
            by: dict = {}
            for term, pos in toks:
                by.setdefault(term, []).append(pos)
            want = [(term, len(ps), ps) for term, ps in sorted(by.items())]
            got = [(t_, tf, list(ps)) for t_, tf, ps in entries[i]]
            assert dls[i] == len(toks) and got == want, (an, i)


def test_cjk_ideographs_emit_per_char():
    # Lucene StandardTokenizer: Han and Hiragana have no UAX#29 WordBreak
    # chaining class — one token per character (IDEOGRAPHIC/HIRAGANA
    # types); Katakana forms runs and breaks against Latin
    assert terms("日本語 テスト 中文") == ["日", "本", "語", "テスト", "中", "文"]
    assert terms("日本語テスト") == ["日", "本", "語", "テスト"]
    assert terms("ひらがな") == ["ひ", "ら", "が", "な"]
    assert terms("カタカナrun") == ["カタカナ", "run"]
    assert terms("mixed中latin") == ["mixed", "中", "latin"]


def test_extend_marks_attach_wb4():
    # UAX#29 WB4: Extend (Mn/Mc/Me) never breaks — Devanagari matras and
    # the nukta stay inside the word token (Lucene StandardTokenizerImpl
    # [:WordBreak=Extend:]); same for Arabic harakat and Thai vowel signs
    assert terms("लड़के लड़का") == ["लड़के", "लड़का"]
    assert terms("किताबों") == ["किताबों"]
    assert terms("الأَمْرُ") == ["الأَمْرُ"]
    assert terms("ภาษาไทย") == ["ภาษาไทย"]
    # combining acute on an ASCII base glues, digits unaffected
    assert terms("café 42") == ["café", "42"]
    # a standalone mark with no base is dropped, not a token
    assert terms("ा x") == ["x"]
