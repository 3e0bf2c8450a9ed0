"""Light / minimal language stemmers for the `stemmer` token filter.

The reference's StemmerTokenFilterFactory
(modules/analysis-common/src/main/java/org/opensearch/analysis/common/
StemmerTokenFilterFactory.java:143-260) exposes per-language variants that
route to Lucene's light/minimal stemmer family — small suffix-strip
algorithms published in Jacques Savoy, "Light Stemming Approaches for the
French, Portuguese, German and Hungarian Languages" (SAC 2006) and
"Report on CLEF-2001 Experiments".  Implemented here from the published
rule sets (NOT ports of the Lucene sources, which are not in the
reference repo — its Lucene is a jar):

- ``minimal_english``  (EnglishMinimalStemFilter): plural-only stripper.
- ``minimal_french``   (FrenchMinimalStemFilter): -x/-aux/-s/-r/-e/-é +
  double-consonant reduction, words of 6+ chars.
- ``light_german``     (GermanLightStemFilter): vowel folding + two
  suffix passes over -ern/-em/-en/-er/-es/-e/-s(after stem-final
  consonant) and superlative -est.
- ``light_spanish``    (SpanishLightStemFilter): accent folding +
  plural/gender suffixes -os/-as/-es (with -ces → -z) and final vowel.

Each stemmer is a pure ``str -> str`` function over an already-lowercased
token.  Byte-parity with Lucene is asserted for the english and french
rules (goldens in tests/test_stemmers.py); german/spanish follow the
published Savoy rules, which Lucene's light stemmers implement with the
same suffix tables.
"""

from __future__ import annotations

__all__ = [
    "minimal_english_stem", "minimal_french_stem",
    "light_german_stem", "light_spanish_stem",
    "possessive_english_stem", "LANGUAGE_STEMMERS",
]


def minimal_english_stem(s: str) -> str:
    """EnglishMinimalStemmer: drop a final 's' unless preceded by 's' or
    'u' (keeps 'glass', 'virus'); words under 3 chars untouched."""
    if len(s) < 3 or s[-1] != "s":
        return s
    if s[-2] in ("s", "u"):
        return s
    return s[:-1]


def minimal_french_stem(s: str) -> str:
    """FrenchMinimalStemmer (Savoy): for words of 6+ chars —
    'aux' -> 'al' (chevaux -> cheval), else drop final 'x'; otherwise
    strip in order a final 's', then 'r', then 'e', then 'é', then
    reduce a final double letter (pommette -> pommett -> pommet)."""
    if len(s) < 6:
        return s
    if s[-1] == "x":
        if s.endswith("aux"):
            return s[:-2] + "l"
        return s[:-1]
    if s[-1] == "s":
        s = s[:-1]
    if s[-1] == "r":
        s = s[:-1]
    if s[-1] == "e":
        s = s[:-1]
    if s[-1] == "é":  # é
        s = s[:-1]
    if len(s) > 1 and s[-1] == s[-2]:
        s = s[:-1]
    return s


_DE_FOLD = str.maketrans({
    "ä": "a", "à": "a", "á": "a", "â": "a",
    "ö": "o", "ò": "o", "ó": "o", "ô": "o",
    "ï": "i", "ì": "i", "í": "i", "î": "i",
    "ü": "u", "ù": "u", "ú": "u", "û": "u",
})

#: consonants a stem may end in before a plural 's' (Savoy's German
#: "st-ending" set)
_DE_S_ENDINGS = frozenset("bdfghklmnt")


def _de_strip(s: str, superlative: bool) -> str:
    n = len(s)
    if superlative and n > 5 and s.endswith("est"):
        return s[:-3]
    if not superlative and n > 5 and s.endswith("ern"):
        return s[:-3]
    if n > 4 and s[-2] == "e" and s[-1] in ("m", "n", "r", "s"):
        return s[:-2]
    if n > 3 and s[-1] == "e":
        return s[:-1]
    if n > 3 and s[-1] == "s" and s[-2] in _DE_S_ENDINGS:
        return s[:-1]
    return s


def light_german_stem(s: str) -> str:
    """GermanLightStemmer (Savoy UniNE light German): fold umlauts /
    accented vowels, then two suffix passes — first plural/case endings
    (-ern/-em/-en/-er/-es/-e/-s), then a second pass that also strips
    the superlative -est (häuser -> haus, kindern -> kind)."""
    s = s.translate(_DE_FOLD)
    s = _de_strip(s, superlative=False)
    return _de_strip(s, superlative=True)


_ES_FOLD = str.maketrans({
    "á": "a", "é": "e", "í": "i",
    "ó": "o", "ú": "u",
})


def light_spanish_stem(s: str) -> str:
    """SpanishLightStemmer (Savoy): for words of 5+ chars — fold accented
    vowels; strip a final 'o'/'a'/'e'; for plural 's': '-eses' -> '-es',
    '-ces' -> '-z' (luces -> luz), '-os'/'-as'/'-es' -> drop both."""
    if len(s) < 5:
        return s
    s = s.translate(_ES_FOLD)
    if s[-1] in ("o", "a", "e"):
        return s[:-1]
    if s[-1] == "s":
        if s.endswith("eses"):
            return s[:-2]
        if s.endswith("ces"):
            return s[:-3] + "z"
        if s[-2] in ("o", "a", "e"):
            return s[:-2]
    return s


def possessive_english_stem(s: str) -> str:
    """EnglishPossessiveFilter (`possessive_english`): strip a trailing
    's / 's (straight or typographic apostrophe)."""
    if len(s) >= 2 and s[-1] in ("s", "S") and s[-2] in ("'", "’",
                                                         "＇"):
        return s[:-2]
    return s


#: language -> stemmer, the subset of StemmerTokenFilterFactory's registry
#: this engine implements (english/porter route to porter.porter_stem in
#: analysis_custom._tf_stemmer)
LANGUAGE_STEMMERS = {
    "minimal_english": minimal_english_stem,
    "minimalEnglish": minimal_english_stem,
    "minimal_french": minimal_french_stem,
    "minimalFrench": minimal_french_stem,
    "light_german": light_german_stem,
    "lightGerman": light_german_stem,
    "light_spanish": light_spanish_stem,
    "lightSpanish": light_spanish_stem,
    "possessive_english": possessive_english_stem,
    "possessiveEnglish": possessive_english_stem,
}
