"""Goldens for the Ntais Greek stemmer (greekstem.py).

Hand-traced through the published rule tables (Ntais 2006 appendix), the
same honesty contract as tests/test_snowball2.py: each table locks the
implemented spec reading, and the pairs assert the IR property that
matters — inflected forms of one lemma conflate to one stem.  Input is
the Greek-lowercase-filter form (accents folded, final sigma -> σ).
"""

from sparksearch.greekstem import greek_stem


def _check(table):
    for word, stem in table:
        got = greek_stem(word)
        assert got == stem, f"{word!r} -> {got!r} != {stem!r}"


def test_rule0_irregular_paradigms():
    _check([
        ("γεγονοσ", "γεγον"), ("γεγονοτα", "γεγον"),
        ("γεγονοτων", "γεγον"),
        ("φωτα", "φω"), ("φωτοσ", "φω"),
        ("κρεασ", "κρε"), ("κρεατα", "κρε"),
        ("καθεστωτοσ", "καθεστ"), ("καθεστωτα", "καθεστ"),
    ])


def test_rule1_ades_family():
    # strip αδεσ/αδων, re-append αδ unless the stem is a family word
    _check([
        ("ομαδεσ", "ομαδ"), ("ομαδα", "ομαδ"),          # conflate
        ("μαμαδεσ", "μαμ"),                              # family word
        ("γιαγιαδων", "γιαγι"),
    ])


def test_rule21_bare_inflections():
    _check([
        ("υπολογιστεσ", "υπολογιστ"), ("υπολογιστησ", "υπολογιστ"),
        ("τρεχει", "τρεχ"), ("τρεχουν", "τρεχ"),
        ("αγαπη", "αγαπ"), ("καλοσ", "καλ"), ("καλη", "καλ"),
        ("ποιοτητα", "ποιοτητ"), ("ποιοτητεσ", "ποιοτητ"),
    ])


def test_rule5_rule6_noun_derivation():
    _check([
        ("παιδια", "παιδ"), ("παιδι", "παιδ"),
        ("ελληνικα", "ελλην"),                   # rule 6 strips ικα
        ("πλοια", "πλοι"),                       # vowel stem re-appends ι
    ])


def test_rule7_verb_ame_family():
    _check([
        ("αγαπησαμε", "αγαπ"),                   # ησαμε stripped whole
        ("γραψαμε", "γραψ"),                     # bare αμε, no exception
        ("ποταμε", "ποταμ"),                     # exc7: ποτ re-appends αμ
    ])


def test_rule20_mata():
    _check([
        ("ονοματα", "ονομα"), ("ονοματων", "ονομα"),
        ("ονοματοσ", "ονομα"),
    ])


def test_rule22_comparatives():
    _check([
        ("ομορφοτερη", "ομορφ"), ("ομορφη", "ομορφ"),
        ("ψηλοτεροσ", "ψηλ"), ("ψηλοσ", "ψηλ"),
    ])


def test_short_and_non_greek_untouched():
    _check([
        ("και", "και"),        # < 4 letters
        ("θα", "θα"),
        ("spark", "spark"),    # non-Greek letters pass through
        ("σπιτι2", "σπιτι2"),
    ])
