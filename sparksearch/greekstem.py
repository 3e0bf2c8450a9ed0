"""Greek stemmer — the Ntais algorithm, re-derived from the published
paper (Georgios Ntais, "Development of a Stemmer for the Greek
Language", Royal Institute of Technology / Stockholm University master
thesis, 2006 — the rule tables are in the paper's appendix; this is the
algorithm behind Lucene's ``GreekStemFilter``, which the reference's
StemmerTokenFilterFactory routes the plain language name to:
modules/analysis-common/.../StemmerTokenFilterFactory.java:196-197
``"greek" -> GreekStemFilter``).

This is a from-spec re-derivation, NOT a port of Lucene's Java (the
reference ships Lucene as a jar with no sources in-repo), the same
honesty contract as snowball.py / snowball2.py.  Conflation behavior is
locked by hand-traced goldens in tests/test_greekstem.py and the
``stem_greek`` contract-gate entry.

Input contract: the stemmer operates on the output of the Greek
lowercase filter (``{"type": "lowercase", "language": "greek"}`` —
accents/diaeresis folded, final sigma normalized to σ), exactly as the
reference chains GreekLowerCaseFilter before GreekStemFilter.

Structure (paper appendix; 23 ordered rule blocks):
- words shorter than 4 letters are never stemmed;
- rule 0 rewrites a closed class of irregular noun paradigms;
- rules 1-20 strip noun/verb derivational suffix families, each with an
  exception word-list that re-appends a shortened suffix so the family
  conflates to one stem;
- rule 21 (the "long list" of bare inflectional endings) fires only if
  no earlier rule changed the word;
- rule 22 strips comparative/superlative endings unconditionally.
"""

from __future__ import annotations

__all__ = ["greek_stem"]

_VOWELS = frozenset("αεηιουω")
_VOWELS_NO_Y = frozenset("αεηιοω")


def _ends_vowel(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS


def _ends_vowel_no_y(w: str) -> bool:
    return bool(w) and w[-1] in _VOWELS_NO_Y


def _ends_any(w: str, sufs) -> bool:
    return any(w.endswith(s) for s in sufs)


# --- rule 0: irregular paradigms (suffix -> replacement) ------------------
# longest-first so e.g. καθεστωτων wins over φωτων
_R0 = [
    ("καθεστωτων", "καθεστ"), ("καθεστωτοσ", "καθεστ"),
    ("καθεστωτα", "καθεστ"), ("καθεστωσ", "καθεστ"),
    ("γεγονοτων", "γεγον"), ("γεγονοτοσ", "γεγον"),
    ("γεγονοτα", "γεγον"), ("γεγονοσ", "γεγον"),
    ("τατογιων", "τατο"), ("τατογιου", "τατο"), ("τατογια", "τατο"),
    ("ολογιων", "ολο"), ("ολογιου", "ολο"), ("ολογια", "ολο"),
    ("κρεατων", "κρε"), ("κρεατοσ", "κρε"), ("κρεατα", "κρε"),
    ("κρεασ", "κρε"),
    ("περατων", "περ"), ("περατοσ", "περ"), ("περατα", "περ"),
    ("περατη", "περ"), ("περασ", "περ"),
    ("τερατων", "τερ"), ("τερατοσ", "τερ"), ("τερατα", "τερ"),
    ("τερασ", "τερ"),
    ("σκαγιων", "σκα"), ("σκαγιου", "σκα"), ("σκαγια", "σκα"),
    ("φαγιων", "φα"), ("φαγιου", "φα"), ("φαγια", "φα"),
    ("σογιων", "σο"), ("σογιου", "σο"), ("σογια", "σο"),
    ("φωτων", "φω"), ("φωτοσ", "φω"), ("φωτα", "φω"), ("φωσ", "φω"),
]

# --- per-rule exception sets (paper appendix tables) ----------------------
_EXC1 = ("οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι", "νταντ", "κυρ",
         "θει", "πεθερ")
_EXC2 = ("οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ", "μιλ")
_EXC3 = ("αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ", "φλ", "φρ",
         "βελ", "λουλ", "χν", "σπ", "τραγ", "φε")
_EXC4 = frozenset(("θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"))
_EXC6 = frozenset((
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"))
_EXC7 = frozenset(("αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"))
_EXC8A = frozenset(("τρ", "τσ"))
_EXC8B = frozenset((
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ",
    "βαθυγαλ", "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ",
    "καπνοβιομηχ", "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ",
    "μικροβιομηχ", "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ",
    "περηφ", "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ",
    "τετ", "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"))
_EXC9 = frozenset(("αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "πολ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ", "εμ",
                   "θαρρ", "θ"))
_EXC12A = frozenset(("π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"))
_EXC12B = frozenset(("αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"))
_EXC13 = frozenset(("διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"))
_EXC13_SUF = ("σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")
_EXC14 = frozenset(("φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"))
_EXC14_SUF = ("ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
              "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")
_EXC15A = frozenset((
    "αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ", "αμαλ",
    "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ", "δερβεν", "δροσοπ",
    "ξεφ", "νεοπ", "νομοτ", "ολοπ", "ομοτ", "προστ", "προσωποπ",
    "συμπ", "συντ", "τ", "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ",
    "αποτ", "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ", "σιδηροπ", "λ",
    "ναυ", "ουλαμ", "ουρ", "π", "τρ", "μ"))
_EXC15A_SUF = ("οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ", "λοχ",
               "σμην")
_EXC15B = frozenset(("ψοφ", "ναυλοχ"))
_EXC16 = frozenset(("ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"))
_EXC17 = frozenset(("ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"))
_EXC18 = frozenset(("ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"))
_EXC19 = frozenset(("παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"))

#: rule 21 — bare inflectional endings, applied longest-first, only when
#: no earlier rule changed the word (the paper's "long list")
_R21 = sorted((
    "α", "αγατε", "αγαν", "αει", "αμαι", "αν", "ασ", "ασαι", "αται",
    "αω", "ε", "ει", "εισ", "ειτε", "εσαι", "εσ", "εται", "ι", "ιεμαι",
    "ιεμαστε", "ιεται", "ιεσαι", "ιεστε", "ιομασταν", "ιομουν",
    "ιομουνα", "ιονταν", "ιοντουσαν", "ιοσασταν", "ιοσαστε", "ιοσουν",
    "ιοσουνα", "ιοταν", "ιουμα", "ιουμαστε", "ιουνται", "ιουνταν",
    "η", "ηδεσ", "ηδων", "ηθει", "ηθεισ", "ηθειτε", "ηθησαν", "ηθουν",
    "ηθω", "ηκατε", "ηκαν", "ησ", "ησαν", "ησατε", "ησει", "ησεσ",
    "ησουν", "ησω", "ο", "οι", "ομαι", "ομασταν", "ομουν", "ομουνα",
    "ονται", "ονταν", "οντουσαν", "οσ", "οσασταν", "οσαστε", "οσουν",
    "οσουνα", "οταν", "ου", "ουμαι", "ουμαστε", "ουν", "ουνται",
    "ουνταν", "ουσ", "ουσαν", "ουσατε", "υ", "υσ", "ω", "ων",
), key=len, reverse=True)


def _strip_first(w: str, sufs) -> tuple[str, bool]:
    """Strip the first (i.e. longest, given ordering) matching suffix."""
    for s in sufs:
        if w.endswith(s) and len(w) > len(s):
            return w[: -len(s)], True
    return w, False


def greek_stem(w: str) -> str:
    """Stem one lowercased, accent-folded, final-sigma-normalized Greek
    token (Ntais 2006; Lucene GreekStemFilter parity — reference routes
    ``"greek"`` here, StemmerTokenFilterFactory.java:196)."""
    if len(w) < 4 or not all("α" <= c <= "ω" for c in w):
        return w
    orig = w

    # rule 0 — irregular paradigms
    for suf, repl in _R0:
        if w.endswith(suf) and (len(w) > len(suf) or w == suf):
            w = w[: -len(suf)] + repl
            break

    # rule 1 — αδεσ/αδων
    w2, hit = _strip_first(w, ("αδεσ", "αδων"))
    if hit:
        w = w2 if _ends_any(w2, _EXC1) else w2 + "αδ"

    # rule 2 — εδεσ/εδων
    w2, hit = _strip_first(w, ("εδεσ", "εδων"))
    if hit:
        w = w2 + "εδ" if _ends_any(w2, _EXC2) else w2

    # rule 3 — ουδεσ/ουδων
    w2, hit = _strip_first(w, ("ουδεσ", "ουδων"))
    if hit:
        w = w2 + "ουδ" if _ends_any(w2, _EXC3) else w2

    # rule 4 — εωσ/εων
    w2, hit = _strip_first(w, ("εωσ", "εων"))
    if hit:
        w = w2 + "ε" if w2 in _EXC4 else w2

    # rule 5 — ια/ιου/ιων
    w2, hit = _strip_first(w, ("ιων", "ιου", "ια"))
    if hit:
        w = w2 + "ι" if _ends_vowel(w2) else w2

    # rule 6 — ικα/ικο/ικου/ικων
    w2, hit = _strip_first(w, ("ικων", "ικου", "ικα", "ικο"))
    if hit:
        w = w2 + "ικ" if (_ends_vowel(w2) or w2 in _EXC6) else w2

    # rule 7 — αμε verb family
    if w == "αγαμε":
        w = "αγαμ"
    w2, hit = _strip_first(w, ("ηθηκαμε", "ουσαμε", "ησαμε", "ηκαμε",
                               "αγαμε"))
    if hit:
        w = w2
    w2, hit = _strip_first(w, ("αμε",))
    if hit:
        w = w2 + "αμ" if w2 in _EXC7 else w2

    # rule 8 — ανε verb family
    w2, hit = _strip_first(w, ("ιουντανε", "ιοντανε", "ουντανε",
                               "ηθηκανε", "ουσανε", "οντανε", "ιοτανε",
                               "ησανε", "αγανε", "ηκανε", "οτανε"))
    if hit:
        w = w2 + "αγαν" if w2 in _EXC8A else w2
    w2, hit = _strip_first(w, ("ανε",))
    if hit:
        w = w2 + "αν" if (_ends_vowel_no_y(w2) or w2 in _EXC8B) else w2

    # rule 9 — ετε
    w2, hit = _strip_first(w, ("ησετε",))
    if hit:
        w = w2
    w2, hit = _strip_first(w, ("ετε",))
    if hit:
        w = (w2 + "ετ" if (_ends_vowel_no_y(w2) or w2 in _EXC9
                           or _ends_any(w2, _EXC14_SUF)) else w2)

    # rule 10 — οντασ/ωντασ
    w2, hit = _strip_first(w, ("οντασ", "ωντασ"))
    if hit:
        if w2 == "αρχ":
            w = w2 + "οντ"
        elif w2.endswith("κρε"):
            w = w2 + "ωντ"
        else:
            w = w2

    # rule 11 — ομαστε/ιομαστε
    w2, hit = _strip_first(w, ("ιομαστε", "ομαστε"))
    if hit:
        w = w2 + "ομαστ" if w2 == "ον" else w2

    # rule 12 — ιεστε/εστε
    w2, hit = _strip_first(w, ("ιεστε",))
    if hit:
        w = w2 + "ιεστ" if w2 in _EXC12A else w2
    w2, hit = _strip_first(w, ("εστε",))
    if hit:
        w = w2 + "εστ" if w2 in _EXC12B else w2

    # rule 13 — ηθηκα / ηκα verb family
    w2, hit = _strip_first(w, ("ηθηκεσ", "ηθηκα", "ηθηκε"))
    if hit:
        w = w2
    w2, hit = _strip_first(w, ("ηκεσ", "ηκα", "ηκε"))
    if hit:
        w = (w2 + "ηκ" if (w2 in _EXC13 or _ends_any(w2, _EXC13_SUF))
             else w2)

    # rule 14 — ουσα family
    w2, hit = _strip_first(w, ("ουσεσ", "ουσα", "ουσε"))
    if hit:
        w = (w2 + "ουσ" if (_ends_vowel(w2) or w2 in _EXC14
                            or _ends_any(w2, _EXC14_SUF)) else w2)

    # rule 15 — αγα family
    w2, hit = _strip_first(w, ("αγεσ", "αγα", "αγε"))
    if hit:
        keep = ((w2 in _EXC15A or _ends_any(w2, _EXC15A_SUF))
                and not (w2 in _EXC15B or w2.endswith("κολλ")))
        w = w2 + "αγ" if keep else w2

    # rule 16 — ησε/ησου/ησα
    w2, hit = _strip_first(w, ("ησου", "ησε", "ησα"))
    if hit:
        w = w2 + "ησ" if w2 in _EXC16 else w2

    # rule 17 — ηστε
    w2, hit = _strip_first(w, ("ηστε",))
    if hit:
        w = w2 + "ηστ" if w2 in _EXC17 else w2

    # rule 18 — ουνε family
    w2, hit = _strip_first(w, ("ησουνε", "ηθουνε", "ουνε"))
    if hit:
        w = w2 + "ουν" if w2 in _EXC18 else w2

    # rule 19 — ουμε family
    w2, hit = _strip_first(w, ("ησουμε", "ηθουμε", "ουμε"))
    if hit:
        w = w2 + "ουμ" if w2 in _EXC19 else w2

    # rule 20 — ματα/ματων/ματοσ -> μα
    if w.endswith(("ματων", "ματοσ")) and len(w) > 5:
        w = w[:-3]
    elif w.endswith("ματα") and len(w) > 4:
        w = w[:-2]

    # rule 21 — bare inflectional endings, only if nothing matched yet
    if w == orig:
        for s in _R21:
            if w.endswith(s) and len(w) > len(s):
                w = w[: -len(s)]
                break

    # rule 22 — comparative / superlative
    if w.endswith(("εστερ", "εστατ")) and len(w) > 5:
        w = w[:-5]
    elif w.endswith(("οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ")) \
            and len(w) > 4:
        w = w[:-4]

    return w
