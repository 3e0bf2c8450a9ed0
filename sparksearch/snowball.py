"""Snowball stemmers re-implemented from the published algorithm specs
(snowballstem.org; M.F. Porter's algorithm descriptions).  The reference
routes plain language names to Lucene's SnowballFilter
(modules/analysis-common/.../StemmerTokenFilterFactory.java:172-256:
"german" -> GermanStemmer, "russian" -> RussianStemmer); these are
from-spec re-derivations, NOT ports of the generated Snowball sources.

Implemented: german, russian, french, spanish, italian, portuguese,
dutch, swedish, danish, norwegian, english-porter2.  The remaining Snowball languages stay unimplemented —
`stemmer` raises on unknown languages.
"""

from __future__ import annotations

__all__ = ["german_snowball_stem", "russian_snowball_stem",
           "french_snowball_stem", "spanish_snowball_stem",
           "dutch_snowball_stem", "porter2_stem", "swedish_snowball_stem",
           "danish_snowball_stem", "norwegian_snowball_stem",
           "italian_snowball_stem", "portuguese_snowball_stem"]

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


# ---------------------------------------------------------------------------
# French (snowballstem.org/algorithms/french/stemmer.html)
# ---------------------------------------------------------------------------

_FR_VOWELS = set("aeiouyâàëéêèïîôûù")


def _fr_prelude(w: str) -> str:
    """Mark u/i between vowels and y adjacent to a vowel as consonants
    (uppercase); u after q -> U."""
    cs = list(w)
    n = len(cs)
    for i in range(n):
        c = cs[i]
        if c in ("u", "i") and 0 < i < n - 1 \
                and cs[i - 1].lower() in _FR_VOWELS \
                and cs[i + 1].lower() in _FR_VOWELS:
            cs[i] = c.upper()
        elif c == "y" and ((i > 0 and cs[i - 1].lower() in _FR_VOWELS)
                           or (i < n - 1
                               and cs[i + 1].lower() in _FR_VOWELS)):
            cs[i] = "Y"
        elif c == "u" and i > 0 and cs[i - 1] == "q":
            cs[i] = "U"
    return "".join(cs)


def _fr_is_vowel(c: str) -> bool:
    return c in _FR_VOWELS         # marked U/I/Y are consonants


def _fr_regions(w: str) -> tuple[int, int, int]:
    n = len(w)
    # RV
    if n >= 3 and _fr_is_vowel(w[0]) and _fr_is_vowel(w[1]):
        rv = 3
    elif w[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        rv = n
        for i in range(1, n):
            if _fr_is_vowel(w[i]):
                rv = i + 1
                break
    def region_after(start: int) -> int:
        i = start
        while i < n and not _fr_is_vowel(w[i]):
            i += 1
        while i < n and _fr_is_vowel(w[i]):
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return rv, r1, r2


#: step-1 suffixes, longest-first within each rule family
_FR_S1_DEL_R2 = ("ances", "iqUes", "ismes", "ables", "istes",
                 "ance", "iqUe", "isme", "able", "iste", "eux")
_FR_S1_ATEUR = ("atrices", "ateurs", "ations", "atrice", "ateur",
                "ation")
_FR_S1_I_VERB = (
    "issantes", "iraIent", "issaIent", "issants", "issante", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez",
    "issons", "irais", "irait", "irent", "iriez", "irons", "iront",
    "isses", "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i")
_FR_S2B_IONS = "ions"
_FR_S2B_ER = ("eraIent", "erions", "èrent", "erais", "erait", "eriez",
              "erons", "eront", "erai", "eras", "erez", "ées", "era",
              "iez", "ée", "és", "er", "ez", "é")
_FR_S2B_A = ("assions", "assent", "assiez", "aIent", "antes", "asses",
             "âmes", "âtes", "ante", "ants", "asse", "ais", "ait",
             "ant", "ât", "ai", "as", "a")


def french_snowball_stem(word: str) -> str:
    """Snowball French from the published spec: prelude consonant marks,
    RV/R1/R2, standard-suffix step 1, verb steps 2a/2b, residual step 4,
    undoubling and un-accenting.  From-spec re-derivation; the goldens
    in the gate are hand-derived from the same spec."""
    w = _fr_prelude(word)
    rv, r1, r2 = _fr_regions(w)

    def in_r(pos_region: int, suflen: int) -> bool:
        return len(w) - suflen >= pos_region

    def ends(s: str) -> bool:
        return w.endswith(s)

    orig = w
    step1_mdone = False      # removed one of (a|e)mment / ment(s)
    altered = False

    # ---- step 1: standard suffix removal (longest match governs) ----
    cands = []
    for s in _FR_S1_DEL_R2 + _FR_S1_ATEUR + (
            "logies", "logie", "usions", "utions", "usion", "ution",
            "ences", "ence", "ements", "ement", "ités", "ité",
            "ives", "ifs", "ive", "if", "eaux", "aux", "euses", "euse",
            "issements", "issement", "amment", "emment", "ments",
            "ment"):
        if ends(s):
            cands.append(s)
    if cands:
        suf = max(cands, key=len)
        n = len(suf)
        if suf in _FR_S1_DEL_R2:
            if in_r(r2, n):
                w = w[:-n]
        elif suf in _FR_S1_ATEUR:
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("ic"):
                    if in_r(r2, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif suf in ("logie", "logies"):
            if in_r(r2, n):
                w = w[: -n] + "log"
        elif suf in ("usion", "ution", "usions", "utions"):
            if in_r(r2, n):
                w = w[: -n] + "u"
        elif suf in ("ence", "ences"):
            if in_r(r2, n):
                w = w[: -n] + "ent"
        elif suf in ("ement", "ements"):
            if in_r(rv, n):
                w = w[:-n]
                if w.endswith("iv") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r(r2, 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r(r2, 3):
                        w = w[:-3]
                    elif in_r(r1, 3):
                        w = w[:-3] + "eux"
                elif (w.endswith("abl") or w.endswith("iqU")) \
                        and in_r(r2, 3):
                    w = w[:-3]
                elif (w.endswith("ièr") or w.endswith("Ièr")) \
                        and in_r(rv, 3):
                    w = w[:-3] + "i"
        elif suf in ("ité", "ités"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("abil"):
                    if in_r(r2, 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r(r2, 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r(r2, 2):
                    w = w[:-2]
        elif suf in ("if", "ive", "ifs", "ives"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("at") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r(r2, 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif suf == "eaux":
            w = w[:-4] + "eau"
        elif suf == "aux":
            if in_r(r1, 3):
                w = w[:-3] + "al"
        elif suf in ("euse", "euses"):
            if in_r(r2, n):
                w = w[:-n]
            elif in_r(r1, n):
                w = w[: -n] + "eux"
        elif suf in ("issement", "issements"):
            if in_r(r1, n) and len(w) > n \
                    and not _fr_is_vowel(w[-n - 1]):
                w = w[:-n]
        elif suf == "amment":
            if in_r(rv, 6):
                w = w[:-6] + "ant"
                step1_mdone = True
        elif suf == "emment":
            if in_r(rv, 6):
                w = w[:-6] + "ent"
                step1_mdone = True
        elif suf in ("ment", "ments"):
            # preceded by a vowel in RV (the vowel stays)
            if len(w) > n and _fr_is_vowel(w[-n - 1]) \
                    and in_r(rv, n + 1):
                w = w[:-n]
                step1_mdone = True
    altered = (w != orig)

    # ---- steps 2a/2b: verb suffixes ----
    if (not altered) or step1_mdone:
        before2 = w
        done2a = False
        for suf in sorted(_FR_S1_I_VERB, key=len, reverse=True):
            n = len(suf)
            # "delete if in RV and preceded by a non-vowel also in RV"
            if w.endswith(suf) and len(w) > n \
                    and not _fr_is_vowel(w[-n - 1]) \
                    and len(w) - n - 1 >= rv:
                w = w[:-n]
                done2a = True
                break
        if not done2a:
            # step 2b
            c2 = []
            for s in (_FR_S2B_ER + _FR_S2B_A + (_FR_S2B_IONS,)):
                if w.endswith(s):
                    c2.append(s)
            if c2:
                suf = max(c2, key=len)
                n = len(suf)
                if suf == "ions":
                    if in_r(r2, n):
                        w = w[:-n]
                elif suf in _FR_S2B_ER:
                    if in_r(rv, n):
                        w = w[:-n]
                else:
                    if in_r(rv, n):
                        w = w[:-n]
                        if w.endswith("e") and in_r(rv, 1):
                            w = w[:-1]
        altered = altered or (w != before2)

    # ---- step 3 or 4 ----
    if altered:
        if w.endswith("Y"):
            w = w[:-1] + "i"
        elif w.endswith("ç"):
            w = w[:-1] + "c"
    else:
        # step 4: delete final s unless preceded by a/o/u/è/s, or by an
        # i that is NOT itself preceded by the consonant-marked H
        # (spec: "not preceded by a, i (unless itself preceded by H),
        # o, u, è or s")
        if w.endswith("s") and len(w) >= 2:
            prev = w[-2]
            blocked = prev in ("a", "o", "u", "è", "s") or (
                prev == "i" and not (len(w) >= 3 and w[-3] == "H"))
            if not blocked:
                w = w[:-1]
        if w.endswith("ion") and in_r(r2, 3) and len(w) >= 4 \
                and w[-4] in ("s", "t"):
            w = w[:-3]
        else:
            for suf, rep in (("ière", "i"), ("Ière", "i"),
                             ("ier", "i"), ("Ier", "i")):
                if w.endswith(suf) and in_r(rv, len(suf)):
                    w = w[: -len(suf)] + rep
                    break
            else:
                if w.endswith("e") and in_r(rv, 1):
                    w = w[:-1]
                elif w.endswith("ë") and in_r(rv, 1) \
                        and w[-3:-1] == "gu":
                    w = w[:-1]

    # ---- step 5: undouble ----
    for dbl in ("enn", "onn", "ett", "ell", "eill"):
        if w.endswith(dbl):
            w = w[:-1]
            break

    # ---- step 6: un-accent ----
    i = len(w) - 1
    seen_cons = False
    while i >= 0:
        if _fr_is_vowel(w[i]) or w[i] in ("U", "I", "Y"):
            if w[i] in ("é", "è") and seen_cons:
                w = w[:i] + "e" + w[i + 1:]
            break
        seen_cons = True
        i -= 1

    return (w.replace("U", "u").replace("I", "i").replace("Y", "y"))


# ---------------------------------------------------------------------------
# Spanish (snowballstem.org/algorithms/spanish/stemmer.html)
# ---------------------------------------------------------------------------

_ES_VOWELS = set("aeiouáéíóúü")

_ES_PRON = ("selas", "selos", "sela", "selo", "las", "les", "los",
            "nos", "me", "se", "la", "le", "lo")
_ES_PRON_A = ("iéndo", "ándo", "ár", "ér", "ír")      # unaccent after
_ES_PRON_B = ("iendo", "ando", "ar", "er", "ir")
_ES_UNACC = {"á": "a", "é": "e", "í": "i", "ó": "o", "ú": "u"}

_ES_S1_DEL_R2 = ("amientos", "imientos", "amiento", "imiento",
                 "anzas", "ismos", "ables", "ibles", "istas", "anza",
                 "icos", "icas", "ismo", "able", "ible", "ista",
                 "osos", "osas", "ico", "ica", "oso", "osa")
_ES_S1_ADOR = ("aciones", "adoras", "adores", "ancias", "adora",
               "ación", "antes", "ancia", "ador", "ante")
_ES_S2B = ("aríamos", "eríamos", "iríamos", "iéramos", "iésemos",
           "aríais", "aremos", "eríais", "eremos", "iríais", "iremos",
           "ierais", "ieseis", "asteis", "isteis", "ábamos", "áramos",
           "ásemos", "arían", "arías", "aréis", "erían", "erías",
           "eréis", "irían", "irías", "iréis", "ieran", "iesen",
           "ieron", "iendo", "ieras", "ieses", "abais", "arais",
           "aseis", "íamos", "arán", "arás", "aría", "erán", "erás",
           "ería", "irán", "irás", "iría", "iera", "iese", "aste",
           "iste", "aban", "aran", "asen", "aron", "ando", "abas",
           "adas", "idas", "aras", "ases", "íais", "ados", "idos",
           "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré",
           "aba", "ada", "ida", "ara", "ase", "ían", "ado", "ido",
           "ías", "áis", "ía", "ad", "ed", "id", "an", "ió", "ar",
           "er", "ir", "as", "ís")
_ES_S2B_EN = ("éis", "emos", "en", "es")        # strip preceding gu's u


def _es_regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def isv(c: str) -> bool:
        return c in _ES_VOWELS
    # RV
    rv = n
    if n >= 2:
        if not isv(w[1]):
            # next vowel after position 1
            for i in range(2, n):
                if isv(w[i]):
                    rv = i + 1
                    break
        elif isv(w[0]) and isv(w[1]):
            for i in range(2, n):
                if not isv(w[i]):
                    rv = i + 1
                    break
        else:
            rv = 3 if n >= 3 else n

    def region_after(start: int) -> int:
        i = start
        while i < n and not isv(w[i]):
            i += 1
        while i < n and isv(w[i]):
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return rv, r1, r2


def spanish_snowball_stem(word: str) -> str:
    """Snowball Spanish from the published spec: attached-pronoun step 0,
    standard suffixes over R1/R2, verb suffixes over RV, residual vowel
    strip, final de-accenting."""
    w = word
    rv, r1, r2 = _es_regions(w)

    def in_r(region: int, suflen: int) -> bool:
        return len(w) - suflen >= region

    # ---- step 0: attached pronouns ----
    # delete the pronoun when the (gerund/infinitive + pronoun) pattern
    # lies in RV: (a) accented forms also un-accent, (b) plain forms
    # just delete, (c) "uyendo" keeps the u
    for pron in _ES_PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]

        def pre_in_rv(pre: str) -> bool:
            return base.endswith(pre) and len(base) - len(pre) >= rv

        if any(pre_in_rv(p) for p in _ES_PRON_A):
            w = "".join(_ES_UNACC.get(c, c) for c in base)
        elif any(pre_in_rv(p) for p in _ES_PRON_B):
            w = base
        elif pre_in_rv("yendo") and len(base) >= 6 and base[-6] == "u":
            w = base
        break

    rv, r1, r2 = _es_regions(w)
    orig = w

    # ---- step 1: standard suffixes (longest match) ----
    cands = [s for s in (_ES_S1_DEL_R2 + _ES_S1_ADOR + (
        "logías", "logía", "uciones", "ución", "encias", "encia",
        "amente", "mente", "idades", "idad", "ivas", "ivos", "iva",
        "ivo")) if w.endswith(s)]
    if cands:
        suf = max(cands, key=len)
        n = len(suf)
        if suf in _ES_S1_DEL_R2:
            if in_r(r2, n):
                w = w[:-n]
        elif suf in _ES_S1_ADOR:
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("ic") and in_r(r2, 2):
                    w = w[:-2]
        elif suf in ("logía", "logías"):
            if in_r(r2, n):
                w = w[: -n] + "log"
        elif suf in ("ución", "uciones"):
            if in_r(r2, n):
                w = w[: -n] + "u"
        elif suf in ("encia", "encias"):
            if in_r(r2, n):
                w = w[: -n] + "ente"
        elif suf == "amente":
            if in_r(r1, 6):
                w = w[:-6]
                if w.endswith("iv") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r(r2, 2):
                        w = w[:-2]
                elif (w.endswith("os") or w.endswith("ic")
                      or w.endswith("ad")) and in_r(r2, 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r(r2, 5):
                w = w[:-5]
                for pre in ("ante", "able", "ible"):
                    if w.endswith(pre) and in_r(r2, 4):
                        w = w[:-4]
                        break
        elif suf in ("idad", "idades"):
            if in_r(r2, n):
                w = w[:-n]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r(r2, len(pre)):
                        w = w[: -len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("at") and in_r(r2, 2):
                    w = w[:-2]

    # ---- steps 2a/2b: verb suffixes (only if step 1 removed nothing) --
    if w == orig:
        done2a = False
        for suf in ("yeron", "yendo", "yamos", "yais", "yan", "yen",
                    "yas", "yes", "ya", "ye", "yo", "yó"):
            n = len(suf)
            if w.endswith(suf) and in_r(rv, n) and len(w) > n \
                    and w[-n - 1] == "u":
                w = w[:-n]
                done2a = True
                break
        if not done2a:
            c2 = [s for s in (_ES_S2B + _ES_S2B_EN) if w.endswith(s)]
            if c2:
                suf = max(c2, key=len)
                n = len(suf)
                if in_r(rv, n):
                    w = w[:-n]
                    if suf in _ES_S2B_EN and w.endswith("gu"):
                        w = w[:-1]

    # ---- step 3: residual ----
    for suf in ("os", "a", "o", "á", "í", "ó"):
        if w.endswith(suf) and in_r(rv, len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if (w.endswith("e") or w.endswith("é")) and in_r(rv, 1):
            w = w[:-1]
            if w.endswith("gu") and in_r(rv, 1):
                w = w[:-1]

    return "".join(_ES_UNACC.get(c, c) for c in w)


# ---------------------------------------------------------------------------
# Dutch (snowballstem.org/algorithms/dutch/stemmer.html)
# ---------------------------------------------------------------------------

_NL_VOWELS = set("aeiouyè")
_NL_FOLD = str.maketrans({"ä": "a", "ë": "e", "ï": "i", "ö": "o",
                          "ü": "u", "á": "a", "é": "e", "í": "i",
                          "ó": "o", "ú": "u"})


def _nl_prelude(w: str) -> str:
    w = w.translate(_NL_FOLD)
    cs = list(w)
    n = len(cs)
    if n and cs[0] == "y":
        cs[0] = "Y"
    for i in range(1, n):
        if cs[i] == "y" and cs[i - 1] in _NL_VOWELS:
            cs[i] = "Y"
        elif cs[i] == "i" and cs[i - 1] in _NL_VOWELS \
                and i + 1 < n and cs[i + 1] in _NL_VOWELS:
            cs[i] = "I"
    return "".join(cs)


def _nl_regions(w: str) -> tuple[int, int]:
    n = len(w)

    def region_after(start: int) -> int:
        i = start
        while i < n and w[i] not in _NL_VOWELS:
            i += 1
        while i < n and w[i] in _NL_VOWELS:
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r1 = max(r1, 3) if n >= 3 else n
    r2 = region_after(r1) if r1 < n else n
    return r1, r2


def _nl_undouble(w: str) -> str:
    for dbl in ("kk", "dd", "tt"):
        if w.endswith(dbl):
            return w[:-1]
    return w


def dutch_snowball_stem(word: str) -> str:
    """Snowball Dutch from the published spec: accent fold + y/i
    consonant marks, suffix steps over R1/R2 with kk/dd/tt undoubling
    and the final double-vowel undoubling (CVVC -> CVC)."""
    w = _nl_prelude(word)
    r1, r2 = _nl_regions(w)

    def in_r1(nsuf: int) -> bool:
        return len(w) - nsuf >= r1

    def in_r2(nsuf: int) -> bool:
        return len(w) - nsuf >= r2

    # step 1
    if w.endswith("heden") and in_r1(5):
        w = w[:-5] + "heid"
    elif (w.endswith("ene") or w.endswith("en")):
        n = 3 if w.endswith("ene") else 2
        if in_r1(n) and len(w) > n \
                and w[-n - 1] not in _NL_VOWELS \
                and w[-n - 3:-n] != "gem":
            w = _nl_undouble(w[:-n])
    elif (w.endswith("se") or w.endswith("s")):
        n = 2 if w.endswith("se") else 1
        if in_r1(n) and len(w) > n \
                and w[-n - 1] not in _NL_VOWELS and w[-n - 1] != "j":
            w = w[:-n]

    # step 2: final e after a non-vowel in R1; flag for step 3b's "bar"
    e_removed = False
    if w.endswith("e") and in_r1(1) and len(w) >= 2 \
            and w[-2] not in _NL_VOWELS:
        w = _nl_undouble(w[:-1])
        e_removed = True

    # step 3a: heid
    if w.endswith("heid") and in_r2(4) and len(w) >= 5 and w[-5] != "c":
        w = w[:-4]
        if w.endswith("en") and in_r1(2) and len(w) > 2 \
                and w[-3] not in _NL_VOWELS and w[-5:-2] != "gem":
            w = _nl_undouble(w[:-2])

    # step 3b: d-suffixes
    if (w.endswith("end") or w.endswith("ing")) and in_r2(3):
        w = w[:-3]
        if w.endswith("ig") and in_r2(2) and len(w) >= 3 \
                and w[-3] != "e":
            w = w[:-2]
        else:
            w = _nl_undouble(w)
    elif w.endswith("ig") and in_r2(2) and len(w) >= 3 and w[-3] != "e":
        w = w[:-2]
    elif w.endswith("lijk") and in_r2(4):
        w = w[:-4]
        if w.endswith("e") and in_r1(1) and len(w) >= 2 \
                and w[-2] not in _NL_VOWELS:
            w = _nl_undouble(w[:-1])
    elif w.endswith("baar") and in_r2(4):
        w = w[:-4]
    elif w.endswith("bar") and in_r2(3) and e_removed:
        w = w[:-3]

    # step 4: undouble vowel (C V V C$ with V in aa/ee/oo/uu, C != I)
    if len(w) >= 4:
        c1, v1, v2, c2 = w[-4], w[-3], w[-2], w[-1]
        if c1 not in _NL_VOWELS and v1 == v2 \
                and v1 in ("a", "e", "o", "u") \
                and c2 not in _NL_VOWELS and c2 != "I":
            w = w[:-2] + c2

    return w.replace("Y", "y").replace("I", "i")


# ---------------------------------------------------------------------------
# English Porter2 (snowballstem.org/algorithms/english/stemmer.html)
# ---------------------------------------------------------------------------

_EN_VOWELS = set("aeiouy")
_EN_DOUBLE = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_EN_LI_END = set("cdeghkmnrt")
_EN_EXC1 = {"skis": "ski", "skies": "sky", "dying": "die",
            "lying": "lie", "tying": "tie", "idly": "idl",
            "gently": "gentl", "ugly": "ugli", "early": "earli",
            "only": "onli", "singly": "singl",
            "sky": "sky", "news": "news", "howe": "howe",
            "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
            "andes": "andes"}
_EN_EXC2 = frozenset(("inning", "outing", "canning", "herring",
                      "earring", "proceed", "exceed", "succeed"))


def _en_is_vowel(c: str) -> bool:
    return c in _EN_VOWELS and c != "Y" or c == "y"


def _en_short_syllable(w: str, i: int) -> bool:
    """True if a short syllable ends at index i (inclusive)."""
    if i < 1:
        return False
    c, v = w[i], w[i - 1]
    if c in _EN_VOWELS or c == "Y" or v not in _EN_VOWELS:
        # need vowel + non-vowel
        if not (v in _EN_VOWELS and c not in _EN_VOWELS and c != "Y"):
            return False
    if i == 1:
        return v in _EN_VOWELS and c not in _EN_VOWELS
    return (v in _EN_VOWELS and c not in _EN_VOWELS
            and c not in ("w", "x", "Y")
            and w[i - 2] not in _EN_VOWELS)


def porter2_stem(word: str) -> str:
    """Snowball English (Porter2) from the published spec — the
    reference's "porter2"/"snowball" stemmer names.  Distinct from the
    original Porter algorithm in porter.py (the "english"/"porter"
    names), e.g. generously -> generous (porter2) vs gener (porter1
    region rules), cry -> cri vs porter1's cry."""
    w = word.lower()
    if len(w) <= 2:
        return w
    if w.startswith("'"):
        w = w[1:]
    if w in _EN_EXC1:
        return _EN_EXC1[w]
    # mark consonant y
    cs = list(w)
    if cs[0] == "y":
        cs[0] = "Y"
    for i in range(1, len(cs)):
        if cs[i] == "y" and cs[i - 1] in _EN_VOWELS:
            cs[i] = "Y"
    w = "".join(cs)

    n = len(w)
    r1 = n
    for pre in ("gener", "commun", "arsen"):
        if w.startswith(pre):
            r1 = len(pre)
            break
    else:
        for i in range(1, n):
            if w[i] not in _EN_VOWELS and w[i - 1] in _EN_VOWELS:
                r1 = i + 1
                break
    r2 = n
    for i in range(r1 + 1, n):
        if w[i] not in _EN_VOWELS and w[i - 1] in _EN_VOWELS:
            r2 = i + 1
            break

    def in_r1(suflen: int) -> bool:
        return len(w) - suflen >= r1

    def in_r2(suflen: int) -> bool:
        return len(w) - suflen >= r2

    def has_vowel(upto: int) -> bool:
        return any(c in _EN_VOWELS for c in w[:upto])

    # step 0
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-3] + ("i" if len(w) > 4 else "ie")
    elif w.endswith("ss") or w.endswith("us"):
        pass
    elif w.endswith("s") and len(w) >= 3 \
            and any(c in _EN_VOWELS for c in w[:-2]):
        w = w[:-1]
    if w in _EN_EXC2:
        return w.replace("Y", "y")

    # step 1b
    done1b = False
    for suf in ("eedly", "eed"):
        if w.endswith(suf):
            if in_r1(len(suf)):
                w = w[: -len(suf)] + "ee"
            done1b = True
            break
    if not done1b:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf) and has_vowel(len(w) - len(suf)):
                w = w[: -len(suf)]
                if w.endswith(("at", "bl", "iz")):
                    w = w + "e"
                elif w.endswith(_EN_DOUBLE):
                    w = w[:-1]
                elif r1 >= len(w) and _en_short_syllable(w, len(w) - 1):
                    w = w + "e"
                break

    # step 1c
    if len(w) > 2 and w[-1] in ("y", "Y") \
            and w[-2] not in _EN_VOWELS:
        w = w[:-1] + "i"

    # step 2 (longest match, condition in R1)
    s2 = (("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
          ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
          ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
          ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
          ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
          ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
          ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
          ("bli", "ble"), ("ogi", "og"), ("li", ""))
    for suf, rep in s2:
        if w.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-3] + rep
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _EN_LI_END:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 3
    s3 = (("ational", "ate"), ("tional", "tion"), ("alize", "al"),
          ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
          ("ative", ""), ("ness", ""), ("ful", ""))
    for suf, rep in s3:
        if w.endswith(suf):
            if in_r1(len(suf)):
                if suf == "ative":
                    if in_r2(5):
                        w = w[:-5]
                else:
                    w = w[: -len(suf)] + rep
            break

    # step 4 (R2)
    s4 = ("ement", "ance", "ence", "able", "ible", "ment", "ant",
          "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
          "al", "er", "ic")
    for suf in s4:
        if w.endswith(suf):
            if in_r2(len(suf)):
                if suf == "ion":
                    if len(w) > 3 and w[-4] in ("s", "t"):
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # step 5
    if w.endswith("e") and (in_r2(1) or (
            in_r1(1) and not _en_short_syllable(w, len(w) - 2))):
        w = w[:-1]
    elif w.endswith("l") and in_r2(1) and len(w) >= 2 and w[-2] == "l":
        w = w[:-1]

    return w.replace("Y", "y")


# ---------------------------------------------------------------------------
# Swedish (snowballstem.org/algorithms/swedish/stemmer.html)
# ---------------------------------------------------------------------------

_SV_VOWELS = set("aeiouyäåö")
_SV_S_END = set("bcdfghjklmnoprtvy")
_SV_S1 = ("heterna", "hetens", "heter", "heten", "anden", "arnas",
          "ernas", "ornas", "andes", "arens", "andet", "arna", "erna",
          "orna", "ande", "arne", "aste", "aren", "ades", "erns",
          "ade", "are", "ern", "ens", "het", "ast", "ad", "en", "ar",
          "er", "or", "as", "es", "at", "a", "e")


def _sv_r1(w: str) -> int:
    n = len(w)
    for i in range(1, n):
        if w[i] not in _SV_VOWELS and w[i - 1] in _SV_VOWELS:
            return max(i + 1, 3)
    return n


def swedish_snowball_stem(word: str) -> str:
    """Snowball Swedish from the published spec: one longest-match
    suffix removal in R1 (or a valid-ending 's'), consonant-pair
    shortening, and the lig/ig/els + löst/fullt step."""
    w = word
    r1 = _sv_r1(w)

    def in_r1(nsuf: int) -> bool:
        return len(w) - nsuf >= r1

    for suf in _SV_S1:
        if w.endswith(suf) and in_r1(len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and in_r1(1) and len(w) >= 2 \
                and w[-2] in _SV_S_END:
            w = w[:-1]

    for pair in ("dd", "gd", "nn", "dt", "gt", "kt", "tt"):
        if w.endswith(pair) and in_r1(2):
            w = w[:-1]
            break

    if w.endswith("löst") and in_r1(4):
        w = w[:-1]
    elif w.endswith("fullt") and in_r1(5):
        w = w[:-1]
    else:
        for suf in ("lig", "els", "ig"):
            if w.endswith(suf) and in_r1(len(suf)):
                w = w[: -len(suf)]
                break
    return w


# ---------------------------------------------------------------------------
# Danish (snowballstem.org/algorithms/danish/stemmer.html)
# ---------------------------------------------------------------------------

_DA_VOWELS = set("aeiouyæåø")
_DA_S_END = set("abcdfghjklmnoprtvyzå")
_DA_S1 = ("erendes", "erende", "hedens", "erede", "heden", "heder",
          "endes", "ernes", "erens", "erets", "ethed", "erer", "heds",
          "enes", "eres", "eren", "ende", "erne", "ered", "eret",
          "hed", "ene", "ere", "ens", "ers", "ets", "en", "er", "es",
          "et", "e")


def _da_r1(w: str) -> int:
    n = len(w)
    for i in range(1, n):
        if w[i] not in _DA_VOWELS and w[i - 1] in _DA_VOWELS:
            return max(i + 1, 3)
    return n


def danish_snowball_stem(word: str) -> str:
    """Snowball Danish from the published spec: longest-match suffix
    removal in R1 (or valid-ending 's'), consonant cleanup (gd/dt/gt/kt),
    the igst/ig/lig/elig/els step with undoubling, and løst -> løs."""
    w = word
    r1 = _da_r1(w)

    def in_r1(nsuf: int) -> bool:
        return len(w) - nsuf >= r1

    for suf in _DA_S1:
        if w.endswith(suf) and in_r1(len(suf)):
            w = w[: -len(suf)]
            break
    else:
        if w.endswith("s") and in_r1(1) and len(w) >= 2 \
                and w[-2] in _DA_S_END:
            w = w[:-1]

    for pair in ("gd", "dt", "gt", "kt"):
        if w.endswith(pair) and in_r1(2):
            w = w[:-1]
            break

    if w.endswith("igst") and in_r1(4):
        w = w[:-2]
    did3 = False
    for suf in ("elig", "lig", "els", "ig"):
        if w.endswith(suf) and in_r1(len(suf)):
            w = w[: -len(suf)]
            did3 = True
            break
    if did3:
        for pair in ("gd", "dt", "gt", "kt"):
            if w.endswith(pair) and in_r1(2):
                w = w[:-1]
                break
    elif w.endswith("løst") and in_r1(4):
        w = w[:-1]
    # undouble a final double consonant in R1
    if len(w) >= 2 and w[-1] == w[-2] and w[-1] not in _DA_VOWELS \
            and in_r1(1):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------------
# Norwegian (snowballstem.org/algorithms/norwegian/stemmer.html)
# ---------------------------------------------------------------------------

_NO_VOWELS = set("aeiouyæåø")
_NO_S_END = set("bcdfghjlmnoprtvyz")
_NO_S1 = ("hetenes", "hetene", "hetens", "heten", "heter", "endes",
          "edes", "enes", "ende", "ande", "ane", "ene", "ede", "ens",
          "ers", "ets", "het", "ast", "en", "ar", "er", "as", "es",
          "et", "a", "e")


def _no_r1(w: str) -> int:
    n = len(w)
    for i in range(1, n):
        if w[i] not in _NO_VOWELS and w[i - 1] in _NO_VOWELS:
            return max(i + 1, 3)
    return n


def norwegian_snowball_stem(word: str) -> str:
    """Snowball Norwegian (Bokmål) from the published spec: R1 suffix
    ladder with the s-ending condition (k valid only after a
    non-vowel), erte/ert -> er, dt/vt shortening, and the
    leg/eleg/ig/lig/els/lov family step."""
    w = word
    r1 = _no_r1(w)

    def in_r1(nsuf: int) -> bool:
        return len(w) - nsuf >= r1

    matched = None
    for suf in _NO_S1:
        if w.endswith(suf) and in_r1(len(suf)):
            matched = suf
            break
    if matched:
        w = w[: -len(matched)]
    elif (w.endswith("erte") or w.endswith("ert")):
        n = 4 if w.endswith("erte") else 3
        if in_r1(n):
            w = w[:-n] + "er"
    elif w.endswith("s") and in_r1(1) and len(w) >= 2:
        prev = w[-2]
        if prev in _NO_S_END or (prev == "k" and len(w) >= 3
                                 and w[-3] not in _NO_VOWELS):
            w = w[:-1]

    for pair in ("dt", "vt"):
        if w.endswith(pair) and in_r1(2):
            w = w[:-1]
            break

    for suf in ("hetslov", "eleg", "elov", "slov", "elig",
                "leg", "lig", "eig", "els", "lov", "ig"):
        if w.endswith(suf) and in_r1(len(suf)):
            w = w[: -len(suf)]
            break
    return w


# ---------------------------------------------------------------------------
# Italian (snowballstem.org/algorithms/italian/stemmer.html)
# ---------------------------------------------------------------------------

_IT_VOWELS = set("aeiouàèìòù")
_IT_ACUTE = {"á": "à", "é": "è", "í": "ì", "ó": "ò", "ú": "ù"}
_IT_PRON = ("gliela", "gliele", "glieli", "glielo", "gliene",
            "sene", "mela", "mele", "meli", "melo", "mene",
            "tela", "tele", "teli", "telo", "tene",
            "cela", "cele", "celi", "celo", "cene",
            "vela", "vele", "veli", "velo", "vene",
            "gli", "ci", "la", "le", "li", "lo", "mi", "ne", "si",
            "ti", "vi")
_IT_S1_DEL_R2 = ("atrici", "atrice", "abili", "abile", "ibili",
                 "ibile", "anza", "anze", "iche", "ichi", "ismo",
                 "ismi", "ista", "iste", "isti", "istà", "istè",
                 "istì", "ante", "anti", "ico", "ici", "ica", "ice",
                 "oso", "osi", "osa", "ose", "mente")
_IT_S2 = ("erebbero", "irebbero", "assimo", "eranno", "erebbe",
          "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
          "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
          "arono", "avamo", "avano", "avate", "eremo", "erete",
          "erono", "evamo", "evano", "evate", "iremo", "irete",
          "irono", "ivamo", "ivano", "ivate", "ammo", "ando", "asse",
          "assi", "emmo", "enda", "ende", "endi", "endo", "erai",
          "erei", "Yamo", "iamo", "immo", "irai", "irei", "isca",
          "isce", "isci", "isco", "ano", "are", "ata", "ate", "ati",
          "ato", "ava", "avi", "avo", "erà", "ere", "erò", "ete",
          "eva", "evi", "evo", "irà", "ire", "irò", "ita", "ite",
          "iti", "ito", "iva", "ivi", "ivo", "ono", "uta", "ute",
          "uti", "uto", "ar", "ir")


def _it_prelude(w: str) -> str:
    w = "".join(_IT_ACUTE.get(c, c) for c in w)
    cs = list(w)
    n = len(cs)
    for i in range(n):
        if cs[i] in ("u", "i") and 0 < i < n - 1 \
                and cs[i - 1] in _IT_VOWELS and cs[i + 1] in _IT_VOWELS:
            cs[i] = cs[i].upper()
        elif cs[i] == "u" and i > 0 and cs[i - 1] == "q":
            cs[i] = "U"
    return "".join(cs)


def _it_regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def isv(c):
        return c in _IT_VOWELS
    if n >= 2 and isv(w[0]) and isv(w[1]):
        rv = 3
    elif n >= 2 and not isv(w[1]):
        rv = n
        for i in range(2, n):
            if isv(w[i]):
                rv = i + 1
                break
    else:
        rv = 3 if n >= 3 else n

    def region_after(start):
        i = start
        while i < n and not isv(w[i]):
            i += 1
        while i < n and isv(w[i]):
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return rv, r1, r2


def italian_snowball_stem(word: str) -> str:
    """Snowball Italian from the published spec: acute->grave prelude
    with U/I consonant marks, attached-pronoun step 0 (ando/endo delete,
    ar/er/ir replace with e), standard suffixes over R1/R2, verb
    suffixes over RV, final-vowel strip, ch/gh -> c/g."""
    w = _it_prelude(word)
    rv, r1, r2 = _it_regions(w)

    def in_r(region, nsuf):
        return len(w) - nsuf >= region

    # step 0: attached pronouns
    for pron in _IT_PRON:
        if not w.endswith(pron):
            continue
        base = w[: -len(pron)]
        for pre in ("ando", "endo"):
            if base.endswith(pre) and len(base) - len(pre) >= rv:
                w = base
                break
        else:
            for pre in ("ar", "er", "ir"):
                if base.endswith(pre) and len(base) - len(pre) >= rv:
                    w = base + "e"
                    break
        break

    orig = w
    # step 1: standard suffixes (longest match)
    cands = [s for s in (_IT_S1_DEL_R2 + (
        "azione", "azioni", "atore", "atori", "logia", "logie",
        "uzione", "uzioni", "usione", "usioni", "enza", "enze",
        "amento", "amenti", "imento", "imenti", "amente", "ità",
        "ivo", "ivi", "iva", "ive")) if w.endswith(s)]
    if cands:
        suf = max(cands, key=len)
        n = len(suf)
        if suf in _IT_S1_DEL_R2:
            if in_r(r2, n):
                w = w[:-n]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("ic") and in_r(r2, 2):
                    w = w[:-2]
        elif suf in ("logia", "logie"):
            if in_r(r2, n):
                w = w[: -n] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r(r2, n):
                w = w[: -n] + "u"
        elif suf in ("enza", "enze"):
            if in_r(r2, n):
                w = w[: -n] + "ente"
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_r(rv, n):
                w = w[:-n]
        elif suf == "amente":
            if in_r(r1, 6):
                w = w[:-6]
                if w.endswith("iv") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r(r2, 2):
                        w = w[:-2]
                elif (w.endswith("os") or w.endswith("ic")
                      or w.endswith("abil")) and in_r(
                          r2, 4 if w.endswith("abil") else 2):
                    w = w[:-4] if w.endswith("abil") else w[:-2]
        elif suf == "ità":
            if in_r(r2, 3):
                w = w[:-3]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r(r2, len(pre)):
                        w = w[: -len(pre)]
                        break
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("at") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("ic") and in_r(r2, 2):
                        w = w[:-2]

    # step 2: verb suffixes (only if step 1 removed nothing)
    if w == orig:
        for suf in _IT_S2:
            if w.endswith(suf) and in_r(rv, len(suf)):
                w = w[: -len(suf)]
                break

    # step 3a: final vowel (+ a preceding i), in RV
    if w and w[-1] in ("a", "e", "i", "o", "à", "è", "ì", "ò") \
            and in_r(rv, 1):
        w = w[:-1]
        if w and w[-1] == "i" and in_r(rv, 1):
            w = w[:-1]
    # step 3b: replace final ch/gh with c/g (suffix in RV)
    if (w.endswith("ch") or w.endswith("gh")) and in_r(rv, 2):
        w = w[:-1]

    return w.replace("U", "u").replace("I", "i")


# ---------------------------------------------------------------------------
# Portuguese (snowballstem.org/algorithms/portuguese/stemmer.html)
# ---------------------------------------------------------------------------

_PT_VOWELS = set("aeiouáéíóúâêô")
_PT_S1_DEL_R2 = ("amentos", "imentos", "amento", "imento", "ezas",
                 "icos", "icas", "ismos", "istas", "osos", "osas",
                 "eza", "ico", "ica", "ismo", "ável", "ível", "ista",
                 "oso", "osa")
_PT_S1_ADOR = ("adoras", "adores", "aça~os", "adora", "aça~o",
               "aço~es", "antes", "ância", "ador", "ante")
#: verb suffixes, re-derived from the published list; rare
#: person/tense forms missing here only under-stem (documented)
_PT_S2 = ("aríamos", "eríamos", "iríamos", "ássemos", "êssemos",
          "íssemos", "aríeis", "eríeis", "iríeis", "ásseis",
          "ésseis", "ísseis", "áramos", "éramos", "íramos",
          "ávamos", "aremos", "eremos", "iremos", "ariam",
          "eriam", "iriam", "assem", "essem", "issem", "arias",
          "erias", "irias", "ardes", "erdes", "irdes", "asses",
          "esses", "isses", "astes", "estes", "istes", "áreis",
          "éreis", "íreis", "áveis", "íamos", "armos", "ermos",
          "irmos", "aria", "eria", "iria", "asse", "esse", "isse",
          "aste", "este", "iste", "arei", "erei", "irei", "aram",
          "eram", "iram", "avam", "arem", "erem", "irem", "ando",
          "endo", "indo", "adas", "idas", "arás", "aras", "eras",
          "iras", "avas", "ares", "eres", "ires", "íeis", "ados",
          "idos", "ámos", "amos", "emos", "imos", "iras", "ada",
          "ida", "ará", "ara", "erá", "era", "irá", "ava", "iam",
          "ado", "ido", "ias", "ais", "eis", "ões", "arão", "erão",
          "irão", "ia", "ei", "am", "em", "ar", "er", "ir", "as",
          "es", "is", "eu", "iu", "ou")


def _pt_regions(w: str) -> tuple[int, int, int]:
    n = len(w)

    def isv(c):
        return c in _PT_VOWELS
    if n >= 2 and not isv(w[1]):
        rv = n
        for i in range(2, n):
            if isv(w[i]):
                rv = i + 1
                break
    elif n >= 2 and isv(w[0]) and isv(w[1]):
        rv = n
        for i in range(2, n):
            if not isv(w[i]):
                rv = i + 1
                break
    else:
        rv = 3 if n >= 3 else n

    def region_after(start):
        i = start
        while i < n and not isv(w[i]):
            i += 1
        while i < n and isv(w[i]):
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < n else n
    return rv, r1, r2


def portuguese_snowball_stem(word: str) -> str:
    """Snowball Portuguese from the published spec: nasal-vowel marking
    (ã -> a~), standard suffixes over R1/R2 with precedence chains, verb
    suffixes over RV, residual vowel strip, gu/ci + cedilla cleanup."""
    w = word.replace("ã", "a~").replace("õ", "o~")
    rv, r1, r2 = _pt_regions(w)

    def in_r(region, nsuf):
        return len(w) - nsuf >= region

    orig = w
    cands = [s for s in (_PT_S1_DEL_R2 + _PT_S1_ADOR + (
        "logias", "logia", "uça~os", "uço~es", "uça~o", "ências",
        "ência", "amente", "mente", "idades", "idade", "ivas",
        "ivos", "iva", "ivo", "iras", "ira")) if w.endswith(s)]
    if cands:
        suf = max(cands, key=len)
        n = len(suf)
        if suf in _PT_S1_DEL_R2:
            if in_r(r2, n):
                w = w[:-n]
        elif suf in _PT_S1_ADOR:
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("ic") and in_r(r2, 2):
                    w = w[:-2]
        elif suf in ("logia", "logias"):
            if in_r(r2, n):
                w = w[: -n] + "log"
        elif suf in ("uça~o", "uça~os", "uço~es"):
            if in_r(r2, n):
                w = w[: -n] + "u"
        elif suf in ("ência", "ências"):
            if in_r(r2, n):
                w = w[: -n] + "ente"
        elif suf == "amente":
            if in_r(r1, 6):
                w = w[:-6]
                if w.endswith("iv") and in_r(r2, 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r(r2, 2):
                        w = w[:-2]
                elif (w.endswith("os") or w.endswith("ic")
                      or w.endswith("ad")) and in_r(r2, 2):
                    w = w[:-2]
        elif suf == "mente":
            if in_r(r2, 5):
                w = w[:-5]
                for pre in ("ante", "avel", "ível"):
                    if w.endswith(pre) and in_r(r2, 4):
                        w = w[:-4]
                        break
        elif suf in ("idade", "idades"):
            if in_r(r2, n):
                w = w[:-n]
                for pre in ("abil", "ic", "iv"):
                    if w.endswith(pre) and in_r(r2, len(pre)):
                        w = w[: -len(pre)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r(r2, n):
                w = w[:-n]
                if w.endswith("at") and in_r(r2, 2):
                    w = w[:-2]
        elif suf in ("ira", "iras"):
            if in_r(rv, n) and len(w) > n and w[-n - 1] == "e":
                w = w[: -n] + "ir"

    did12 = w != orig
    if not did12:
        for suf in _PT_S2:
            if w.endswith(suf) and in_r(rv, len(suf)):
                w = w[: -len(suf)]
                did12 = True
                break

    if did12:
        if w.endswith("i") and in_r(rv, 1) and len(w) >= 2 \
                and w[-2] == "c":
            w = w[:-1]
    else:
        for suf in ("os", "a", "i", "o", "á", "í", "ó"):
            if w.endswith(suf) and in_r(rv, len(suf)):
                w = w[: -len(suf)]
                break

    if w and w[-1] in ("e", "é", "ê") and in_r(rv, 1):
        w = w[:-1]
        if len(w) >= 2 and ((w[-2:] == "gu" and in_r(rv, 1))
                            or (w[-2:] == "ci" and in_r(rv, 1))):
            w = w[:-1]
    elif w.endswith("ç"):
        w = w[:-1] + "c"

    return w.replace("a~", "ã").replace("o~", "õ")
