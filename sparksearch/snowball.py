"""Snowball stemmers re-implemented from the published algorithm specs
(snowballstem.org; M.F. Porter's algorithm descriptions).  The reference
routes plain language names to Lucene's SnowballFilter
(modules/analysis-common/.../StemmerTokenFilterFactory.java:172-256:
"german" -> GermanStemmer, "russian" -> RussianStemmer); these are
from-spec re-derivations, NOT ports of the generated Snowball sources.

Implemented: german, russian.  The remaining Snowball languages
(french, dutch, ...) have substantially longer specs and stay
unimplemented — `stemmer` raises on unknown languages.
"""

from __future__ import annotations

__all__ = ["german_snowball_stem", "russian_snowball_stem"]

# ---------------------------------------------------------------------------
# German (snowballstem.org/algorithms/german/stemmer.html)
# ---------------------------------------------------------------------------

_DE_VOWELS = set("aeiouyäöü")
_DE_S_END = set("bdfghklmnrt")   # valid s-endings (step 1)
_DE_ST_END = set("bdfghklmnt")   # valid st-endings (step 2)


def _de_regions(w: str) -> tuple[int, int]:
    """R1/R2 start offsets; R1 is adjusted to start at least 3 chars in."""
    def region_after(start: int) -> int:
        i = start
        n = len(w)
        while i < n and w[i] not in _DE_VOWELS:
            i += 1                      # skip leading consonants
        while i < n and w[i] in _DE_VOWELS:
            i += 1                      # the vowel run
        # i is now at the first non-vowel after a vowel; region starts
        # after that consonant
        return min(i + 1, n)
    r1 = region_after(0)
    r1 = max(r1, 3) if len(w) >= 3 else len(w)
    r2 = region_after(r1) if r1 < len(w) else len(w)
    return r1, r2


def german_snowball_stem(word: str) -> str:
    """Snowball German: ß->ss, protect u/y between vowels, three suffix
    steps over R1/R2, then unfold umlauts.  Spec-faithful on the common
    paths (häuser->haus, kinder->kind, schönheit->schonheit)."""
    w = word.replace("ß", "ss")
    # protect u and y between vowels by uppercasing (consonant role)
    cs = list(w)
    for i in range(1, len(cs) - 1):
        if cs[i] in ("u", "y") and cs[i - 1] in _DE_VOWELS \
                and cs[i + 1] in _DE_VOWELS:
            cs[i] = cs[i].upper()
    w = "".join(cs)
    r1, r2 = _de_regions(w.lower())

    def in_r1(suflen: int) -> bool:
        return len(w) - suflen >= r1

    def in_r2(suflen: int) -> bool:
        return len(w) - suflen >= r2

    lw = w.lower()
    # step 1: em / ern / er ; e / en / es (then nisse handling) ; s
    done = False
    for suf in ("ern", "em", "er"):
        if lw.endswith(suf) and in_r1(len(suf)):
            w, lw = w[:-len(suf)], lw[:-len(suf)]
            done = True
            break
    if not done:
        for suf in ("en", "es", "e"):
            if lw.endswith(suf) and in_r1(len(suf)):
                w, lw = w[:-len(suf)], lw[:-len(suf)]
                if lw.endswith("niss"):
                    w, lw = w[:-1], lw[:-1]
                done = True
                break
    if not done and lw.endswith("s") and in_r1(1) \
            and len(lw) >= 2 and lw[-2] in _DE_S_END:
        w, lw = w[:-1], lw[:-1]

    # step 2: en / er / est ; st (valid st-ending, 3+ letters before)
    done = False
    for suf in ("est", "en", "er"):
        if lw.endswith(suf) and in_r1(len(suf)):
            w, lw = w[:-len(suf)], lw[:-len(suf)]
            done = True
            break
    if not done and lw.endswith("st") and in_r1(2) \
            and len(lw) >= 6 and lw[-3] in _DE_ST_END:
        w, lw = w[:-2], lw[:-2]

    # step 3: d-suffixes over R2
    if (lw.endswith("end") or lw.endswith("ung")) and in_r2(3):
        w, lw = w[:-3], lw[:-3]
        if lw.endswith("ig") and in_r2(2) and not lw.endswith("eig"):
            w, lw = w[:-2], lw[:-2]
    elif (lw.endswith("isch") and in_r2(4)
          and not lw.endswith("eisch")):
        w, lw = w[:-4], lw[:-4]
    elif ((lw.endswith("ig") or lw.endswith("ik")) and in_r2(2)
          and not (lw.endswith("eig") or lw.endswith("eik"))):
        w, lw = w[:-2], lw[:-2]
    elif (lw.endswith("lich") or lw.endswith("heit")) and in_r2(4):
        w, lw = w[:-4], lw[:-4]
        for pre in ("er", "en"):
            if lw.endswith(pre) and in_r1(len(pre)):
                w, lw = w[:-2], lw[:-2]
                break
    elif lw.endswith("keit") and in_r2(4):
        w, lw = w[:-4], lw[:-4]
        if lw.endswith("lich") and in_r2(4):
            w, lw = w[:-4], lw[:-4]
        elif lw.endswith("ig") and in_r2(2):
            w, lw = w[:-2], lw[:-2]

    # finally: unprotect U/Y, fold umlauts
    out = w.replace("U", "u").replace("Y", "y")
    return (out.replace("ä", "a").replace("ö", "o")
            .replace("ü", "u"))


# ---------------------------------------------------------------------------
# Russian (snowballstem.org/algorithms/russian/stemmer.html)
# ---------------------------------------------------------------------------

_RU_VOWELS = set("аеиоуыэюя")

_RU_PGERUND_1 = ("вшись", "вши", "в")            # require preceding а/я
_RU_PGERUND_2 = ("ившись", "ывшись", "ивши", "ывши", "ив", "ыв")
_RU_ADJ = ("ими", "ыми", "его", "ого", "ему", "ому",
           "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем",
           "им", "ым", "ом", "их", "ых", "ую", "юю", "ая", "яя",
           "ою", "ею")
_RU_PART_1 = ("ем", "нн", "вш", "ющ", "щ")       # require preceding а/я
_RU_PART_2 = ("ивш", "ывш", "ующ")
_RU_VERB_1 = ("ла", "на", "ете", "йте", "ли", "й", "л", "ем", "н",
              "ло", "но", "ет", "ют", "ны", "ть", "ешь", "нно")
_RU_VERB_2 = ("ила", "ыла", "ена", "ейте", "уйте", "ите", "или",
              "ыли", "ей", "уй", "ил", "ыл", "им", "ым", "ен",
              "ило", "ыло", "ено", "ят", "ует", "уют", "ит", "ыт",
              "ены", "ить", "ыть", "ишь", "ую", "ю")
_RU_NOUN = ("иями", "ями", "ами", "ией", "иям", "ием", "иях",
            "ев", "ов", "ие", "ье", "еи", "ии", "ей", "ой", "ий",
            "ям", "ем", "ам", "ом", "ах", "ях", "ию", "ью", "ия",
            "ья", "а", "е", "и", "й", "о", "у", "ы", "ь", "ю", "я")


def _ru_rv_r2(w: str) -> tuple[int, int]:
    n = len(w)
    rv = n
    for i, ch in enumerate(w):
        if ch in _RU_VOWELS:
            rv = i + 1
            break
    # R1: after first non-vowel following a vowel; R2: same inside R1
    def region_after(start: int) -> int:
        i = start
        while i < n and w[i] not in _RU_VOWELS:
            i += 1
        while i < n and w[i] in _RU_VOWELS:
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return rv, r2


def _strip_group(w: str, rv: int, plain: tuple, preceded: tuple) -> \
        tuple[str, bool]:
    """Longest match: `preceded` suffixes need a preceding а/я (which
    stays); `plain` suffixes delete unconditionally.  Only matches whose
    whole suffix lies in RV count."""
    best = None
    for suf in preceded:
        if w.endswith(suf) and len(w) - len(suf) - 1 >= 0 \
                and w[len(w) - len(suf) - 1] in ("а", "я") \
                and len(w) - len(suf) >= rv:
            if best is None or len(suf) > len(best):
                best = suf
    for suf in plain:
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            if best is None or len(suf) > len(best):
                best = suf
    if best is None:
        return w, False
    return w[: -len(best)], True


def russian_snowball_stem(word: str) -> str:
    """Snowball Russian over RV/R2: perfective gerund, else
    reflexive + (adjectival|verb|noun); then trailing-и drop,
    derivational -ост(ь) in R2, superlative -ейш(е), нн -> н, final ь."""
    w = word.replace("ё", "е")
    rv, r2 = _ru_rv_r2(w)

    w2, hit = _strip_group(w, rv, _RU_PGERUND_2, _RU_PGERUND_1)
    if hit:
        w = w2
    else:
        # reflexive
        for suf in ("ся", "сь"):
            if w.endswith(suf) and len(w) - len(suf) >= rv:
                w = w[: -len(suf)]
                break
        # adjectival (+ optional preceding participle), else verb, else noun
        w2, hit = _strip_group(w, rv, _RU_ADJ, ())
        if hit:
            w = w2
            w2, _ = _strip_group(w, rv, _RU_PART_2, _RU_PART_1)
            w = w2
        else:
            w2, hit = _strip_group(w, rv, _RU_VERB_2, _RU_VERB_1)
            if hit:
                w = w2
            else:
                w2, _ = _strip_group(w, rv, _RU_NOUN, ())
                w = w2

    if w.endswith("и") and len(w) - 1 >= rv:
        w = w[:-1]
    for suf in ("ость", "ост"):
        if w.endswith(suf) and len(w) - len(suf) >= r2:
            w = w[: -len(suf)]
            break
    for suf in ("ейше", "ейш"):
        if w.endswith(suf) and len(w) - len(suf) >= rv:
            w = w[: -len(suf)]
            break
    if w.endswith("нн"):
        w = w[:-1]
    if w.endswith("ь") and len(w) - 1 >= rv:
        w = w[:-1]
    return w
