"""Normalization-family token filters.

Re-implements the documented Lucene semantics of the normalization
filters the reference registers in
``CommonAnalysisModulePlugin.java:249-328``:

- ``elision`` (ElisionTokenFilterFactory.java) — strip a leading
  ``article'`` prefix (French ``l'avion`` → ``avion``).
- ``cjk_width`` (CJKWidthFilterFactory) — fold fullwidth ASCII variants
  to halfwidth and halfwidth Katakana to fullwidth (with voiced-mark
  composition).
- ``decimal_digit`` (DecimalDigitFilterFactory) — any Unicode decimal
  digit to its 0-9 equivalent.
- ``arabic_normalization`` (ArabicNormalizationFilterFactory) — alef /
  yeh / teh-marbuta normalization, tatweel + harakat removal.
- ``german_normalization`` (GermanNormalizationFilterFactory) — umlaut
  folding with the U/V state machine that drops 'e' in 'ue' digraphs
  after a/o/u.
- ``persian_normalization`` (PersianNormalizationFilterFactory) — Arabic
  yeh/kaf to Farsi forms, heh variants, hamza-above removal.
- ``scandinavian_normalization`` / ``scandinavian_folding``
  (Scandinavian*FilterFactory) — interchange of æÆäÄöÖøØåÅ and the
  aa/ao/ae/oe/oo digraphs.
- ``apostrophe`` (ApostropheFilterFactory) — strip everything from the
  first apostrophe on (Turkish).
- ``classic`` (ClassicFilterFactory) — strip possessive ``'s`` and dots
  from acronyms.

All are per-term string maps: positions are untouched, empty results are
dropped by the analyzer chain.
"""

from __future__ import annotations

import unicodedata

_APOS = ("'", "’", "＇")


def _term_map(fn):
    def apply(toks):
        return [(fn(t), p) for t, p in toks]
    return apply


# ---------------------------------------------------------------------------
# elision
# ---------------------------------------------------------------------------

def elision_filter(cfg: dict):
    articles = cfg.get("articles")
    if not articles:
        # Lucene FrenchAnalyzer.DEFAULT_ARTICLES (factory requires the
        # setting; we default to the French set like the `french`
        # prebuilt analyzer does)
        articles = ["l", "m", "t", "qu", "n", "s", "j", "d", "c",
                    "jusqu", "quoiqu", "lorsqu", "puisqu"]
    case_sensitive = cfg.get("articles_case", False)
    arts = frozenset(a if case_sensitive else a.lower() for a in articles)

    def strip(t: str) -> str:
        for i, ch in enumerate(t):
            if ch in _APOS:
                pre = t[:i] if case_sensitive else t[:i].lower()
                if pre in arts:
                    return t[i + 1:]
                return t
        return t

    return _term_map(strip)


# ---------------------------------------------------------------------------
# cjk_width
# ---------------------------------------------------------------------------

#: halfwidth Katakana (U+FF66-U+FF9D) -> fullwidth, in code-point order
_HW_KATA = ("ヲァィゥェォャュョッーアイウエオカキクケコサシスセソ"
            "タチツテトナニヌネノハヒフヘホマミムメモヤユヨラリルレロワン")
#: halfwidth forms that take a voiced (dakuten) composition
_DAKUTEN = {"カ": "ガ", "キ": "ギ", "ク": "グ", "ケ": "ゲ", "コ": "ゴ",
            "サ": "ザ", "シ": "ジ", "ス": "ズ", "セ": "ゼ", "ソ": "ゾ",
            "タ": "ダ", "チ": "ヂ", "ツ": "ヅ", "テ": "デ", "ト": "ド",
            "ハ": "バ", "ヒ": "ビ", "フ": "ブ", "ヘ": "ベ", "ホ": "ボ",
            "ウ": "ヴ", "ワ": "ヷ", "ヲ": "ヺ"}
_HANDAKUTEN = {"ハ": "パ", "ヒ": "ピ", "フ": "プ", "ヘ": "ペ", "ホ": "ポ"}


def _cjk_width_term(t: str) -> str:
    out: list[str] = []
    for ch in t:
        cp = ord(ch)
        if 0xFF01 <= cp <= 0xFF5E:          # fullwidth ASCII -> halfwidth
            out.append(chr(cp - 0xFEE0))
        elif cp == 0x3000:                   # ideographic space
            out.append(" ")
        elif 0xFF66 <= cp <= 0xFF9D:         # halfwidth katakana -> full
            out.append(_HW_KATA[cp - 0xFF66])
        elif cp == 0xFF9E:                   # halfwidth dakuten: compose
            if out and out[-1] in _DAKUTEN:
                out[-1] = _DAKUTEN[out[-1]]
            else:
                out.append("゙")
        elif cp == 0xFF9F:                   # halfwidth handakuten
            if out and out[-1] in _HANDAKUTEN:
                out[-1] = _HANDAKUTEN[out[-1]]
            else:
                out.append("゚")
        else:
            out.append(ch)
    return "".join(out)


def cjk_width_filter(cfg: dict):
    return _term_map(_cjk_width_term)


# ---------------------------------------------------------------------------
# decimal_digit
# ---------------------------------------------------------------------------

def _decimal_term(t: str) -> str:
    return "".join(
        str(unicodedata.decimal(ch))
        if unicodedata.category(ch) == "Nd" else ch
        for ch in t)


def decimal_digit_filter(cfg: dict):
    return _term_map(_decimal_term)


# ---------------------------------------------------------------------------
# arabic_normalization
# ---------------------------------------------------------------------------

_AR_MAP = {
    "آ": "ا", "أ": "ا", "إ": "ا",  # alefs
    "ى": "ي",                                          # dotless ya
    "ة": "ه",                                          # teh marbuta
}
#: tatweel + harakat (FATHATAN..SUKUN)
_AR_DROP = frozenset(["ـ"] + [chr(c) for c in range(0x064B, 0x0653)])


def _arabic_norm_term(t: str) -> str:
    return "".join(_AR_MAP.get(ch, ch) for ch in t if ch not in _AR_DROP)


def arabic_normalization_filter(cfg: dict):
    return _term_map(_arabic_norm_term)


# ---------------------------------------------------------------------------
# german_normalization (GermanNormalizationFilter state machine)
# ---------------------------------------------------------------------------

def _german_norm_term(t: str) -> str:
    N, V, U = 0, 1, 2
    state = N
    out: list[str] = []
    for ch in t:
        if ch in ("a", "o"):
            state = U
            out.append(ch)
        elif ch == "u":
            state = U if state == N else V
            out.append(ch)
        elif ch == "e":
            if state == U:
                state = V
                continue            # drop the e of an ae/oe/ue digraph
            state = V
            out.append(ch)
        elif ch in ("i", "q", "y"):
            state = V
            out.append(ch)
        elif ch == "ä":
            out.append("a")
            state = V
        elif ch == "ö":
            out.append("o")
            state = V
        elif ch == "ü":
            out.append("u")
            state = V
        elif ch == "ß":
            out.append("ss")
            state = N
        else:
            state = N
            out.append(ch)
    return "".join(out)


def german_normalization_filter(cfg: dict):
    return _term_map(_german_norm_term)


# ---------------------------------------------------------------------------
# persian_normalization
# ---------------------------------------------------------------------------

_FA_MAP = {
    "ي": "ی", "ے": "ی",   # yeh / yeh barree -> farsi yeh
    "ك": "ک",                        # kaf -> keheh
    "ۀ": "ه", "ہ": "ه",    # heh variants -> heh
}


def _persian_norm_term(t: str) -> str:
    return "".join(_FA_MAP.get(ch, ch) for ch in t if ch != "ٔ")


def persian_normalization_filter(cfg: dict):
    return _term_map(_persian_norm_term)


# ---------------------------------------------------------------------------
# scandinavian normalization / folding
# ---------------------------------------------------------------------------

def _scan_pairs(t: str, table: dict) -> str:
    out: list[str] = []
    i = 0
    while i < len(t):
        pair = t[i:i + 2]
        if pair.lower() in table:
            rep = table[pair.lower()]
            out.append(rep.upper() if t[i].isupper() else rep)
            i += 2
        else:
            out.append(t[i])
            i += 1
    return "".join(out)


_SCAN_NORM_CHAR = {"ä": "æ", "Ä": "Æ",   # ä -> æ
                   "ö": "ø", "Ö": "Ø"}   # ö -> ø
_SCAN_NORM_PAIR = {"aa": "å", "ao": "å",
                   "ae": "æ", "oe": "ø", "oo": "ø"}

_SCAN_FOLD_CHAR = {"å": "a", "Å": "A", "ä": "a",
                   "Ä": "A", "æ": "a", "Æ": "A",
                   "ö": "o", "Ö": "O", "ø": "o",
                   "Ø": "O"}
_SCAN_FOLD_PAIR = {"aa": "a", "ao": "a", "ae": "a", "oe": "o", "oo": "o"}


def scandinavian_normalization_filter(cfg: dict):
    def norm(t: str) -> str:
        t = _scan_pairs(t, _SCAN_NORM_PAIR)
        return "".join(_SCAN_NORM_CHAR.get(ch, ch) for ch in t)
    return _term_map(norm)


def scandinavian_folding_filter(cfg: dict):
    def fold(t: str) -> str:
        t = _scan_pairs(t, _SCAN_FOLD_PAIR)
        return "".join(_SCAN_FOLD_CHAR.get(ch, ch) for ch in t)
    return _term_map(fold)


# ---------------------------------------------------------------------------
# apostrophe / classic
# ---------------------------------------------------------------------------

def apostrophe_filter(cfg: dict):
    def strip(t: str) -> str:
        for i, ch in enumerate(t):
            if ch in _APOS:
                return t[:i]
        return t
    return _term_map(strip)


def _classic_term(t: str) -> str:
    # acronym: single letters separated by dots ("i.b.m." / "i.b.m")
    core = t[:-1] if t.endswith(".") else t
    segs = core.split(".")
    if len(segs) > 1 and all(len(s) == 1 and s.isalpha() for s in segs):
        return "".join(segs)
    if len(t) >= 2 and t[-1] in ("s", "S") and t[-2] in _APOS:
        return t[:-2]
    return t


def classic_filter(cfg: dict):
    return _term_map(_classic_term)


# ---------------------------------------------------------------------------
# serbian_normalization (SerbianNormalizationFilter, "bald" latin output)
# ---------------------------------------------------------------------------

_SR_CYR = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "dj",
    "е": "e", "ж": "z", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "c", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "c", "џ": "dz", "ш": "s",
}
_SR_LAT = {"đ": "dj", "ž": "z", "š": "s", "č": "c", "ć": "c",
           "ǆ": "dz", "ǉ": "lj", "ǌ": "nj"}


def _serbian_norm_term(t: str) -> str:
    return "".join(_SR_CYR.get(ch) or _SR_LAT.get(ch) or ch for ch in t)


def serbian_normalization_filter(cfg: dict):
    """Cyrillic -> bald Latin transliteration + regional-diacritic fold
    (analysis-common `serbian_normalization`; the standard Serbian
    digraph mapping ђ->dj, љ->lj, њ->nj, џ->dz, ч/ћ->c, ш->s, ж->z)."""
    return _term_map(_serbian_norm_term)


# ---------------------------------------------------------------------------
# hindi_normalization (HindiNormalizer — Ramanathan & Rao normalization)
# ---------------------------------------------------------------------------

#: precomposed nukta consonants -> base consonant (the normalizer treats
#: क़/क etc. as spelling variants), plus chandrabindu -> anusvara and the
#: standalone nukta dropped
_HI_NORM = {
    "क़": "क", "ख़": "ख", "ग़": "ग", "ज़": "ज", "ड़": "ड",
    "ढ़": "ढ", "फ़": "फ", "य़": "य", "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
    "ॠ": "ऋ", "ॡ": "ऌ",
    "ँ": "ं",                      # chandrabindu -> anusvara
    "़": "",                                         # bare nukta
}


def _hindi_norm_term(t: str) -> str:
    return "".join(_HI_NORM.get(ch, ch) for ch in t)


def hindi_normalization_filter(cfg: dict):
    """Devanagari spelling-variant normalization (`hindi_normalization`,
    Lucene HindiNormalizer after Ramanathan & Rao): fold the
    nukta-consonant variants to their base consonant, drop a combining
    nukta, and normalize chandrabindu to anusvara.  The reference's
    additional rare-vowel folds beyond ॠ/ॡ are omitted (documented)."""
    return _term_map(_hindi_norm_term)


# ---------------------------------------------------------------------------
# sorani_normalization (SoraniNormalizationFilter)
# ---------------------------------------------------------------------------

_CKB_MAP = {
    "ي": "ی", "ى": "ی",            # arabic/dotless yeh -> farsi yeh
    "ك": "ک",                                  # arabic kaf -> keheh
    "ه‍": "ھ",                       # heh + joiner -> doachashmee
}
_CKB_DROP = frozenset(["ـ", "‌"]
                      + [chr(c) for c in range(0x064B, 0x0653)])


def _sorani_norm_term(t: str) -> str:
    t = t.replace("ه‌", "ە")   # final heh + ZWNJ -> ae
    return "".join(_CKB_MAP.get(ch, ch) for ch in t
                   if ch not in _CKB_DROP)


def sorani_normalization_filter(cfg: dict):
    """Sorani Kurdish orthography normalization (`sorani_normalization`):
    arabic yeh/kaf fold to farsi yeh/keheh, heh+ZWNJ becomes ae (ە),
    tatweel/ZWNJ/harakat are dropped."""
    return _term_map(_sorani_norm_term)


# ---------------------------------------------------------------------------
# concatenate_graph (ConcatenateGraphTokenFilterFactory: token_separator
# default " ", joins the whole stream into ONE token at position 0)
# ---------------------------------------------------------------------------

def concatenate_graph_filter(cfg: dict):
    sep = cfg.get("token_separator", " ")

    def cat(tokens):
        if not tokens:
            return tokens
        return [(sep.join(t for t, _ in tokens), 0)]
    return cat


# ---------------------------------------------------------------------------
# analysis-icu plugin: icu_normalizer / icu_folding
# (plugins/analysis-icu/.../IcuNormalizerTokenFilterFactory.java,
#  IcuFoldingTokenFilterFactory.java)
# ---------------------------------------------------------------------------

# Default_Ignorable_Code_Point ranges (UCD DerivedCoreProperties.txt) —
# NFKC_Casefold maps these to nothing (soft hyphen, ZWNJ/ZWJ, bidi
# controls, variation selectors, Hangul fillers, tag characters, ...)
_DEFAULT_IGNORABLE = (
    (0x00AD, 0x00AD), (0x034F, 0x034F), (0x061C, 0x061C),
    (0x115F, 0x1160), (0x17B4, 0x17B5), (0x180B, 0x180F),
    (0x200B, 0x200F), (0x202A, 0x202E), (0x2060, 0x206F),
    (0x3164, 0x3164), (0xFE00, 0xFE0F), (0xFEFF, 0xFEFF),
    (0xFFA0, 0xFFA0), (0xFFF0, 0xFFF8), (0x1BCA0, 0x1BCA3),
    (0x1D173, 0x1D17A), (0xE0000, 0xE0FFF),
)


def _strip_default_ignorable(t: str) -> str:
    return "".join(
        c for c in t
        if not any(lo <= ord(c) <= hi for lo, hi in _DEFAULT_IGNORABLE))


def icu_normalizer_filter(cfg: dict):
    """``icu_normalizer`` (analysis-icu): Unicode normalization with
    ``name`` nfc|nfkc|nfkc_cf (default nfkc_cf).  nfc/nfkc are the exact
    Unicode normal forms (unicodedata); nfkc_cf = NFKC + case fold +
    Default_Ignorable_Code_Point removal, composed per the Unicode
    NFKC_Casefold definition (UAX #31 / DerivedNormalizationProps: DI
    code points map to nothing) — semantics-exact, no ICU library needed
    for these three modes.  DI chars are stripped both before and after
    normalization (NFKC can itself emit one: U+3164 -> U+1160)."""
    import unicodedata
    name = (cfg or {}).get("name", "nfkc_cf").lower()
    if name == "nfc":
        fn = lambda t: unicodedata.normalize("NFC", t)
    elif name == "nfkc":
        fn = lambda t: unicodedata.normalize("NFKC", t)
    elif name == "nfkc_cf":
        fn = lambda t: _strip_default_ignorable(unicodedata.normalize(
            "NFKC",
            unicodedata.normalize(
                "NFKC", _strip_default_ignorable(t)).casefold()))
    else:
        raise NotImplementedError(
            f"icu_normalizer name {name!r} (nfc/nfkc/nfkc_cf supported)")
    return _term_map(fn)


def icu_folding_filter(cfg: dict):
    """``icu_folding`` (analysis-icu): accent/case/compatibility folding.
    DOCUMENTED SUBSET of ICU's UTR#30 foldings: NFKC + case fold +
    combining-mark strip — covers the diacritic/case/width foldings that
    dominate search folding; the long tail of UTR#30 script-specific
    foldings (e.g. Hangul jamo) is not reproduced."""
    import unicodedata

    def fold(t: str) -> str:
        t = unicodedata.normalize("NFKC", t).casefold()
        t = unicodedata.normalize("NFKD", t)
        return unicodedata.normalize(
            "NFC", "".join(c for c in t if not unicodedata.combining(c)))
    return _term_map(fold)
