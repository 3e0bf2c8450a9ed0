"""Snowball stemmers, continuation module: Romanian, Hungarian, Finnish,
Turkish, German2 — re-implemented from the published algorithm specs
(snowballstem.org; the reference routes these language names to Lucene's
SnowballFilter — modules/analysis-common/.../StemmerTokenFilterFactory
.java:119-280: "romanian" -> RomanianStemmer, "hungarian" ->
HungarianStemmer, "finnish" -> FinnishStemmer, "turkish" ->
TurkishStemmer, "german2" -> German2Stemmer).  These are from-spec
re-derivations, NOT ports of the generated Snowball sources (the
reference's Lucene is a jar with no sources in-repo); conflation behavior
is locked by hand-derived goldens in tests/test_snowball2.py and the
contract gate, the same honesty contract as snowball.py.

Romanian diacritics: the Snowball spec is written with cedilla forms
(ş U+015F, ţ U+0163); modern Romanian text uses comma-below (ș U+0219,
ț U+021B).  Input is normalized comma→cedilla so both spellings conflate
to one stem (a documented normalization, not part of the spec).
"""

from __future__ import annotations

__all__ = ["romanian_snowball_stem", "hungarian_snowball_stem",
           "finnish_snowball_stem", "turkish_snowball_stem",
           "german2_snowball_stem"]


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------

def _standard_r1_r2(w: str, vowels: set) -> tuple[int, int]:
    """Standard R1/R2: region after the first non-vowel following a
    vowel; R2 = same definition applied within R1."""
    def region_after(start: int) -> int:
        i, n = start, len(w)
        while i < n and w[i] not in vowels:
            i += 1
        while i < n and w[i] in vowels:
            i += 1
        return min(i + 1, n)
    r1 = region_after(0)
    r2 = region_after(r1) if r1 < len(w) else len(w)
    return r1, r2


def _longest_suffix(w: str, suffixes) -> str | None:
    """The longest of `suffixes` that w ends with (None if none)."""
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# ---------------------------------------------------------------------------
# Romanian (snowballstem.org/algorithms/romanian/stemmer.html)
# ---------------------------------------------------------------------------

_RO_VOWELS = set("aăâeiîou")

_RO_STEP1 = [
    # (suffix, replacement) — longest match wins, applied in R1, repeated
    ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
    ("abilităţi", "abil"),
    ("ibilitate", "ibil"),
    ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
    ("ivităţi", "iv"),
    ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
    ("icităţi", "ic"), ("icator", "ic"), ("icatori", "ic"),
    ("iciv", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
    ("ical", "ic"), ("icala", "ic"), ("icale", "ic"), ("icali", "ic"),
    ("icală", "ic"),
    ("ativ", "at"), ("ativa", "at"), ("ative", "at"), ("ativi", "at"),
    ("ativă", "at"), ("aţiune", "at"), ("atoare", "at"), ("ator", "at"),
    ("atori", "at"), ("ătoare", "at"), ("ător", "at"), ("ători", "at"),
    ("itiv", "it"), ("itiva", "it"), ("itive", "it"), ("itivi", "it"),
    ("itivă", "it"), ("iţiune", "it"), ("itoare", "it"), ("itor", "it"),
    ("itori", "it"),
]

_RO_STEP2_DELETE = (
    "at ata ată ati ate ut uta ută uti ute it ita ită iti ite ic ica ice "
    "ici ică abil abila abile abili abilă ibil ibila ibile ibili ibilă "
    "oasa oasă oase os osi oşi ant anta ante anti antă ator atori itate "
    "itati ităi ităţi iv iva ive ivi ivă").split()

_RO_STEP3_G1 = (
    "are ere ire âre ind ând indu ându eze ească ez ezi ează esc eşti "
    "eşte ăsc ăşti ăşte am ai au eam eai ea eaţi eau iam iai ia iaţi iau "
    "ui aşi arăm arăţi ară uşi urăm urăţi ură işi irăm irăţi iră âi âşi "
    "ârăm ârăţi âră asem aseşi ase aserăm aserăţi aseră isem iseşi ise "
    "iserăm iserăţi iseră âsem âseşi âse âserăm âserăţi âseră usem useşi "
    "use userăm userăţi useră").split()

_RO_STEP3_G2 = (
    "ăm aţi em eţi im iţi âm âţi seşi serăm serăţi seră sei se sesem "
    "seseşi sese seserăm seserăţi seseră").split()


def _ro_rv(w: str) -> int:
    """RV as in the Spanish stemmer."""
    n = len(w)
    if n < 3:
        return n
    if w[1] not in _RO_VOWELS:
        i = 2
        while i < n and w[i] not in _RO_VOWELS:
            i += 1
        return min(i + 1, n)
    if w[0] in _RO_VOWELS and w[1] in _RO_VOWELS:
        i = 2
        while i < n and w[i] in _RO_VOWELS:
            i += 1
        return min(i + 1, n)
    return 3


def romanian_snowball_stem(word: str) -> str:
    """Snowball Romanian: plural/article step, combining-suffix
    reduction, standard suffixes over R2, verb suffixes over RV (only
    when no standard suffix fell), final-vowel strip."""
    w = word.replace("ș", "ş").replace("ț", "ţ")
    # prelude: i/u between vowels act as consonants
    cs = list(w)
    for i in range(1, len(cs) - 1):
        if cs[i] in "iu" and cs[i - 1] in _RO_VOWELS \
                and cs[i + 1] in _RO_VOWELS:
            cs[i] = cs[i].upper()
    w = "".join(cs)
    r1, r2 = _standard_r1_r2(w.lower(), _RO_VOWELS)
    rv = _ro_rv(w.lower())

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    def in_rv(suf: str) -> bool:
        return len(w) - len(suf) >= rv

    # step 0: removal of plurals / articles (in R1)
    s = _longest_suffix(w, [
        "ul", "ului", "aua", "ea", "ele", "elor", "ii", "iua", "iei",
        "iile", "iilor", "ilor", "ile", "atei", "aţie", "aţia"])
    if s and in_r1(s):
        if s in ("ul", "ului"):
            w = w[: -len(s)]
        elif s == "aua":
            w = w[:-3] + "a"
        elif s in ("ea", "ele", "elor"):
            w = w[: -len(s)] + "e"
        elif s in ("ii", "iua", "iei", "iile", "iilor", "ilor"):
            w = w[: -len(s)] + "i"
        elif s == "ile":
            if not w[: -3].endswith("ab"):
                w = w[:-3] + "i"
        elif s == "atei":
            w = w[:-4] + "at"
        else:                                   # aţie / aţia
            w = w[: -len(s)] + "aţi"

    # step 1: combining suffixes, repeat while a replacement lands
    removed = False
    while True:
        best = None
        for suf, rep in _RO_STEP1:
            if w.endswith(suf) and in_r1(suf) \
                    and (best is None or len(suf) > len(best[0])):
                best = (suf, rep)
        if best is None:
            break
        w = w[: -len(best[0])] + best[1]
        removed = True

    # step 2: standard suffixes in R2
    s2 = _longest_suffix(w, _RO_STEP2_DELETE + ["iune", "iuni"]
                         + "ism isme ist ista iste isti istă işti".split())
    if s2 and (s2 in ("iune", "iuni") or in_r2(s2)):
        if s2 in ("iune", "iuni"):
            if in_r2(s2) and w[: -len(s2)].endswith("ţ"):
                w = w[: -len(s2) - 1] + "t"
                removed = True
        elif s2 in ("ism", "isme", "ist", "ista", "iste", "isti",
                    "istă", "işti"):
            w = w[: -len(s2)] + "ist"
            removed = True
        else:
            w = w[: -len(s2)]
            removed = True

    # step 3: verb suffixes in RV, only when steps 1-2 removed nothing
    if not removed:
        s3 = _longest_suffix(w, _RO_STEP3_G1 + _RO_STEP3_G2)
        if s3 and in_rv(s3):
            if s3 in _RO_STEP3_G2 and (s3 not in _RO_STEP3_G1):
                w = w[: -len(s3)]
            else:
                # group 1: preceded (within RV) by consonant or u
                prev = len(w) - len(s3) - 1
                if prev >= rv and (w[prev].lower() not in _RO_VOWELS
                                   or w[prev] in "uU"):
                    w = w[: -len(s3)]

    # step 4: final vowel in RV
    s4 = _longest_suffix(w, ["ie", "a", "e", "i", "ă"])
    if s4 and in_rv(s4):
        w = w[: -len(s4)]

    return w.replace("I", "i").replace("U", "u")


# ---------------------------------------------------------------------------
# Hungarian (snowballstem.org/algorithms/hungarian/stemmer.html)
# ---------------------------------------------------------------------------

_HU_VOWELS = set("aáeéiíoóöőuúüű")
_HU_DIGRAPHS = ("dzs", "cs", "dz", "gy", "ly", "ny", "sz", "ty", "zs")
#: doubled forms (digraph doubles spelled as XXy / XXs etc.)
_HU_DOUBLES = ("bb", "cc", "ccs", "dd", "ff", "gg", "ggy", "jj", "kk",
               "ll", "lly", "mm", "nn", "nny", "pp", "rr", "ss", "ssz",
               "tt", "tty", "vv", "zz", "zzs")


def _hu_r1(w: str) -> int:
    """If the word begins with a vowel: region after the first consonant
    or digraph; if with a consonant: after the first vowel."""
    n = len(w)
    if not n:
        return 0
    if w[0] in _HU_VOWELS:
        i = 0
        while i < n and w[i] in _HU_VOWELS:
            i += 1
        if i >= n:
            return n
        for d in _HU_DIGRAPHS:
            if w.startswith(d, i):
                return min(i + len(d), n)
        return min(i + 1, n)
    i = 0
    while i < n and w[i] not in _HU_VOWELS:
        i += 1
    return min(i + 1, n)


def _hu_undouble(w: str) -> str:
    """Remove one member of a final double consonant (ccs→cs, ssz→sz,
    lly→ly, …, bb→b)."""
    for d in sorted(_HU_DOUBLES, key=len, reverse=True):
        if w.endswith(d):
            # drop the doubling consonant, keep the digraph (ccs→cs)
            return w[: -len(d)] + d[1:]
    return w


def _hu_v_end(w: str) -> str:
    """After a deletion: word-final á→a, é→e (the spec's recurring
    normalization)."""
    if w.endswith("á"):
        return w[:-1] + "a"
    if w.endswith("é"):
        return w[:-1] + "e"
    return w


_HU_CASES = (
    "ban ben ba be ra re nak nek val vel tól től ról ről ból ből hoz hez "
    "höz nál nél ig at et ot öt ért képp képpen kor ul ül vá vé onként "
    "enként anként ként en on an ön n t").split()

_HU_OWNER_SG = ("ünk unk nk juk jük uk ük em om am m od ed ad öd d ja je "
                "a e o ánk ád ám á énk éd ém é").split()

_HU_OWNER_PL = (
    "jaim jeim aim eim im jaid jeid aid eid id jai jei ai ei i jaink "
    "jeink aink eink ink jaitok jeitek aitok eitek itek jeik jaik aik "
    "eik ik áim áid ái áink áitok áik éim éid éi éink éitek éik").split()


def hungarian_snowball_stem(word: str) -> str:
    """Snowball Hungarian: instrumental case with undoubling, the long
    case-ending ladder, owned/owner suffixes, plural — every step over
    R1, with the á→a / é→e final normalization after removals."""
    w = word

    def r1ok(suf: str) -> bool:
        return len(w) - len(suf) >= _hu_r1(word)

    def dbl_before(suf: str) -> bool:
        stem = w[: -len(suf)]
        return any(stem.endswith(d) for d in _HU_DOUBLES)

    # step 1: instrumental (val/vel assimilated: -al/-el on a double)
    for suf in ("al", "el"):
        if w.endswith(suf) and r1ok(suf) and dbl_before(suf):
            w = _hu_undouble(w[:-2])
            break

    # step 2: frequent cases
    s = _longest_suffix(w, _HU_CASES)
    if s and r1ok(s):
        w = _hu_v_end(w[: -len(s)])

    # step 3: special á/é cases
    s = _longest_suffix(w, ["ánként", "án", "én"])
    if s and r1ok(s):
        w = w[: -len(s)] + ("a" if s.startswith("á") else "e")

    # step 4: other cases (-stul/-stül family)
    s = _longest_suffix(w, ["astul", "estül", "ástul", "éstül"])
    if s and r1ok(s):
        w = w[: -len(s)] + ("a" if s == "ástul"
                            else "e" if s == "éstül" else "")

    # step 5: factive -á/-é on a double consonant
    for suf in ("á", "é"):
        if w.endswith(suf) and r1ok(suf) and dbl_before(suf):
            w = _hu_undouble(w[:-1])
            break

    # step 6: owned (-é "that of")
    s = _longest_suffix(w, ["oké", "öké", "aké", "eké", "ké", "áké",
                            "éké", "é"])
    if s and r1ok(s):
        w = w[: -len(s)]
        if s == "áké":
            w += "a"
        elif s == "éké":
            w += "e"

    # step 7: singular owner suffixes
    s = _longest_suffix(w, _HU_OWNER_SG)
    if s and r1ok(s):
        w = w[: -len(s)] + ("a" if s.startswith("á")
                            else "e" if s.startswith("é") else "")

    # step 8: plural owner suffixes
    s = _longest_suffix(w, _HU_OWNER_PL)
    if s and r1ok(s):
        w = w[: -len(s)] + ("a" if s.startswith("á")
                            else "e" if s.startswith("é") else "")

    # step 9: plural
    s = _longest_suffix(w, ["ák", "ék", "ök", "ok", "ek", "ak", "k"])
    if s and r1ok(s):
        w = w[: -len(s)] + ("a" if s == "ák" else "e" if s == "ék" else "")

    return w


# ---------------------------------------------------------------------------
# Finnish (snowballstem.org/algorithms/finnish/stemmer.html)
# ---------------------------------------------------------------------------

_FI_VOWELS = set("aeiouyäö")
_FI_LV = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")   # long vowels
_FI_REST_V = "aeiouyäö"


def _fi_r1_r2(w: str) -> tuple[int, int]:
    return _standard_r1_r2(w, _FI_VOWELS)


def finnish_snowball_stem(word: str) -> str:
    """Snowball Finnish: particle / possessive / case / other-ending
    steps over R1/R2, the i-j-t plural cleanup, and the tidy step
    (long-vowel shortening, oj/uj/jo trims, final undoubling)."""
    w = word
    r1, r2 = _fi_r1_r2(w)

    def in_r1(suf: str) -> bool:
        return len(w) - len(suf) >= r1

    def in_r2(suf: str) -> bool:
        return len(w) - len(suf) >= r2

    # step 1: particles etc.
    s = _longest_suffix(w, ["kin", "kaan", "kään", "ko", "kö", "han",
                            "hän", "pa", "pä", "sti"])
    if s:
        if s == "sti":
            if in_r2(s):
                w = w[:-3]
        elif in_r1(s):
            prev = w[: -len(s)]
            if prev and (prev[-1] in "nt" or prev[-1] in _FI_VOWELS):
                w = prev

    # step 2: possessives (in R1)
    s = _longest_suffix(w, ["si", "ni", "nsa", "nsä", "mme", "nne",
                            "an", "än", "en"])
    if s and in_r1(s):
        stem = w[: -len(s)]
        if s == "si":
            if not stem.endswith("k"):
                w = stem
        elif s == "ni":
            w = stem
            if w.endswith("kse"):
                w = w[:-3] + "ksi"
        elif s in ("nsa", "nsä", "mme", "nne"):
            w = stem
        elif s == "an":
            if any(stem.endswith(p) for p in
                   ("ta", "ssa", "sta", "lla", "lta", "na")):
                w = stem
        elif s == "än":
            if any(stem.endswith(p) for p in
                   ("tä", "ssä", "stä", "llä", "ltä", "nä")):
                w = stem
        elif s == "en":
            if any(stem.endswith(p) for p in ("lle", "ine")):
                w = stem

    # step 3: cases (in R1)
    case_removed = False
    hxn = [("h" + x + "n", x) for x in _FI_REST_V]
    s = _longest_suffix(w, [h for h, _ in hxn]
                        + ["siin", "den", "tten", "seen", "tta", "ttä",
                           "ta", "tä", "ssa", "ssä", "sta", "stä",
                           "lla", "llä", "lta", "ltä", "lle", "na",
                           "nä", "ksi", "ine", "a", "ä", "n"])
    if s and in_r1(s):
        stem = w[: -len(s)]
        if s in [h for h, _ in hxn]:
            x = dict(hxn)[s]
            if stem.endswith(x):
                w = stem
                case_removed = True
        elif s in ("siin", "den", "tten"):
            # preceded by Vi (vowel + i)
            if len(stem) >= 2 and stem[-1] == "i" \
                    and stem[-2] in _FI_VOWELS:
                w = stem
                case_removed = True
        elif s == "seen":
            if any(stem.endswith(lv) for lv in _FI_LV):
                w = stem
                case_removed = True
        elif s in ("a", "ä"):
            # preceded by consonant + vowel
            if len(stem) >= 2 and stem[-1] in _FI_VOWELS \
                    and stem[-2] not in _FI_VOWELS:
                w = stem
                case_removed = True
        elif s in ("tta", "ttä"):
            if stem.endswith("e"):
                w = stem
                case_removed = True
        elif s == "n":
            w = stem
            case_removed = True
            if any(w.endswith(lv) for lv in _FI_LV) or w.endswith("ie"):
                w = w[:-1]
        else:
            w = stem
            case_removed = True

    # step 4: other endings (in R2)
    s = _longest_suffix(w, ["mpi", "mpa", "mpä", "mmi", "mma", "mmä",
                            "impi", "impa", "impä", "immi", "imma",
                            "immä", "eja", "ejä"])
    if s and in_r2(s):
        if s in ("mpi", "mpa", "mpä", "mmi", "mma", "mmä"):
            if not w[: -len(s)].endswith("po"):
                w = w[: -len(s)]
        else:
            w = w[: -len(s)]

    # step 5: plurals
    if case_removed:
        if w and w[-1] in "ij" and len(w) - 1 >= r1:
            w = w[:-1]
    else:
        if w.endswith("t") and len(w) - 1 >= r1 \
                and len(w) >= 2 and w[-2] in _FI_VOWELS:
            w = w[:-1]
            s = _longest_suffix(w, ["imma", "mma"])
            if s and in_r2(s):
                if s == "imma" or not w[: -len(s)].endswith("po"):
                    w = w[: -len(s)]

    # step 6: tidy
    if any(w.endswith(lv) for lv in _FI_LV) and len(w) - 1 >= r1:
        w = w[:-1]
    if len(w) >= 2 and w[-1] in "aäei" and w[-2] not in _FI_VOWELS \
            and len(w) - 1 >= r1:
        w = w[:-1]
    if (w.endswith("oj") or w.endswith("uj")) and len(w) - 1 >= r1:
        w = w[:-1]
    if w.endswith("jo") and len(w) - 1 >= r1:
        w = w[:-1]
    # undouble a final double consonant (even before trailing vowels)
    i = len(w) - 1
    while i >= 0 and w[i] in _FI_VOWELS:
        i -= 1
    if i >= 1 and w[i] not in _FI_VOWELS and w[i] == w[i - 1]:
        w = w[:i] + w[i + 1:]
    return w


# ---------------------------------------------------------------------------
# German2 (snowballstem.org/algorithms/german2/stemmer.html)
# ---------------------------------------------------------------------------

import re as _re

_DE2_AE = _re.compile(r"ae")
_DE2_OE = _re.compile(r"oe")
_DE2_UE = _re.compile(r"(?<!q)ue")


def german2_snowball_stem(word: str) -> str:
    """Snowball german2: identical to the german algorithm except that
    the alternative umlaut spellings ae/oe/ue are folded to ä/ö/ü in the
    prelude (ue not after q — 'quelle' keeps its u), so 'haeuser' and
    'häuser' conflate.  Delegates to the german algorithm, whose final
    unfold maps the umlauts to plain a/o/u."""
    from sparksearch.snowball import german_snowball_stem
    w = _DE2_AE.sub("ä", word)
    w = _DE2_OE.sub("ö", w)
    w = _DE2_UE.sub("ü", w)
    return german_snowball_stem(w)


# ---------------------------------------------------------------------------
# Turkish (snowballstem.org/algorithms/turkish/stemmer.html)
# ---------------------------------------------------------------------------

_TR_VOWELS = set("aeıioöuü")
_TR_BACK = set("aıou")       # take suffix vowels a / ı / u
_TR_FRONT = set("eiöü")      # take suffix vowels e / i / ü
#: fourfold high-vowel harmony: suffix vowel -> allowed preceding vowels
_TR_FOURFOLD = {"ı": "aı", "i": "ei", "u": "ou", "ü": "öü"}


def _tr_last_vowel(w: str) -> str | None:
    for c in reversed(w):
        if c in _TR_VOWELS:
            return c
    return None


def _tr_harmonic(stem: str, suffix: str) -> bool:
    """First suffix vowel must harmonize with the stem's last vowel
    (the spec's check_vowel_harmony)."""
    sv = next((c for c in suffix if c in _TR_VOWELS), None)
    if sv is None:
        return True
    lv = _tr_last_vowel(stem)
    if lv is None:
        return False
    if sv in ("a",):
        return lv in _TR_BACK
    if sv in ("e",):
        return lv in _TR_FRONT
    return lv in _TR_FOURFOLD.get(sv, "")


def _tr_forms(pattern: str) -> list[str]:
    """Expand a plain suffix pattern: A -> a/e, U/I -> ı/i/u/ü,
    D -> d/t (the spec's consonant assimilation)."""
    opts = [""]
    for ch in pattern:
        if ch == "A":
            opts = [o + v for o in opts for v in "ae"]
        elif ch in ("U", "I"):
            opts = [o + v for o in opts for v in "ıiuü"]
        elif ch == "D":
            opts = [o + c for o in opts for c in "dt"]
        else:
            opts = [o + ch for o in opts]
    return opts


#: nominal verb suffixes (stripped once, first — stem_nominal_verb_suffixes)
_TR_NOMINAL_VERB = [
    "(y)mUş", "(y)DU", "(y)sA", "(y)ken", "DUr", "cAsInA",
]
#: noun suffixes (stripped iteratively — stem_noun_suffixes + the ki chain)
_TR_NOUN = [
    "lArI", "nDAn", "DAn", "nDA", "DA", "nUn", "(y)lA", "(y)A", "nA",
    "(s)U", "(U)mUz", "(U)nUz", "(U)m", "(U)n", "lAr", "ki",
]

def _tr_candidates(pat: str) -> list[tuple[str, bool]]:
    """(form, is_buffered_form) expansions of a pattern.  A leading
    parenthesised letter is the spec's optional buffer: y/n/s buffers
    are valid only after a vowel; the (U) vowel buffer only after a
    consonant (and the bare form then requires a vowel junction)."""
    if not pat.startswith("("):
        return [(f, False) for f in _tr_forms(pat)]
    buf = pat[1: pat.index(")")]
    rest = pat[pat.index(")") + 1:]
    bufs = "ıiuü" if buf == "U" else [buf]
    return ([(b + f, True) for b in bufs for f in _tr_forms(rest)]
            + [(f, False) for f in _tr_forms(rest)])


def _tr_strip_one(w: str, patterns) -> str | None:
    """Longest valid suffix among the expanded patterns: vowel harmony
    holds, y/n/s buffers only after a vowel, vowel-initial forms only
    after a consonant.  None if nothing strips."""
    best = None
    for pat in patterns:
        for form, is_buffered in _tr_candidates(pat):
            if not w.endswith(form) or len(form) >= len(w):
                continue
            stem = w[: -len(form)]
            if not _tr_harmonic(stem, form):
                continue
            if is_buffered and form[0] not in _TR_VOWELS:
                # consonant buffer (y/n/s): junction must be a vowel
                if not stem or stem[-1] not in _TR_VOWELS:
                    continue
            elif form[0] in _TR_VOWELS:
                # vowel-initial (incl. the (U) buffer): after a consonant
                if stem and stem[-1] in _TR_VOWELS:
                    continue
            if _tr_last_vowel(stem) is None:
                continue
            if best is None or len(form) > len(best[0]):
                best = (form, stem)
    return best[1] if best else None


def turkish_snowball_stem(word: str) -> str:
    """Snowball Turkish, documented simplification: the published suffix
    inventory (nominal verb suffixes once, then the noun-suffix chain
    iterated) with the spec's vowel-harmony and buffer-letter (y/n/s
    after vowels only) validity checks, then the final-consonant
    devoicing-reversal post-pass (b→p, c→ç, d→t, ğ→k).  The generated
    Snowball automaton's exact chain ordering and the append-vowel rule
    for d/g stems are NOT reproduced — a documented narrowing; conflation
    behavior is locked by the goldens in tests/test_snowball2.py."""
    w = word
    if len(w) < 3 or _tr_last_vowel(w) is None:
        return w
    s = _tr_strip_one(w, _TR_NOMINAL_VERB)
    if s is not None:
        w = s
    for _ in range(6):
        s = _tr_strip_one(w, _TR_NOUN)
        if s is None:
            break
        w = s
    if len(w) >= 3:
        last = w[-1]
        repl = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}.get(last)
        if repl:
            w = w[:-1] + repl
    return w
