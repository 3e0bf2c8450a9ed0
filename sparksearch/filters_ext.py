"""Final analysis-common filter tranche: compound-word decompounders,
scripted token filters (condition / predicate_token_filter),
delimited_payload, flatten_graph, and the phonetic plugin's soundex
encoder.

Reference registry: ``CommonAnalysisModulePlugin.java:249-330``
(DictionaryCompoundWordTokenFilterFactory,
HyphenationCompoundWordTokenFilterFactory, ScriptedConditionTokenFilter,
PredicateTokenFilterScriptFactory, DelimitedPayloadTokenFilterFactory,
FlattenGraphTokenFilterFactory) and the analysis-phonetic plugin
(PhoneticTokenFilterFactory, encoder=soundex).

Filters are ``list[(term, pos)] -> list[(term, pos)]`` callables, the
same contract as analysis_custom._TOKEN_FILTERS.
"""

from __future__ import annotations

import re


# ---------------------------------------------------------------------------
# compound-word decompounders
# ---------------------------------------------------------------------------


def dictionary_decompounder_filter(cfg: dict):
    """dictionary_decompounder (DictionaryCompoundWordTokenFilter):
    for every token >= min_word_size, any dictionary word of length
    min_subword_size..max_subword_size appearing as a substring is
    emitted at the SAME position after the original token.
    only_longest_match keeps one (the longest) subword per start
    offset. Matching is case-insensitive against the word_list, like
    Lucene's CharArraySet(ignoreCase=true) usage in the factory."""
    words = frozenset(w.lower() for w in cfg.get("word_list") or ())
    if not words:
        raise ValueError("dictionary_decompounder: word_list required")
    min_word = int(cfg.get("min_word_size", 5))
    min_sub = int(cfg.get("min_subword_size", 2))
    max_sub = int(cfg.get("max_subword_size", 15))
    longest = bool(cfg.get("only_longest_match", False))

    def subwords(term: str) -> list[str]:
        low = term.lower()
        n = len(low)
        out = []
        for i in range(n):
            best = None
            for g in range(min_sub, min(max_sub, n - i) + 1):
                cand = low[i:i + g]
                if cand in words:
                    if longest:
                        best = cand
                    else:
                        out.append(cand)
            if longest and best is not None:
                out.append(best)
        return out

    def apply(toks):
        out = []
        for t, p in toks:
            out.append((t, p))
            if len(t) >= min_word:
                out.extend((s, p) for s in subwords(t))
        return out
    return apply


def hyphenation_decompounder_filter(cfg: dict):
    """hyphenation_decompounder: the reference drives candidate
    subwords from TeX hyphenation-pattern files, then filters them
    against word_list (HyphenationCompoundWordTokenFilter). No pattern
    files ship in this environment, so candidates here are a
    left-to-right greedy partition into dictionary words (longest
    match first) — equivalent output for cleanly compounding inputs,
    documented deviation when hyphenation points would license
    overlapping candidates. no_sub_matches / no_overlapping_matches
    are accepted (the greedy partition already never overlaps)."""
    words = frozenset(w.lower() for w in cfg.get("word_list") or ())
    if not words:
        raise ValueError("hyphenation_decompounder: word_list required")
    min_word = int(cfg.get("min_word_size", 5))
    min_sub = int(cfg.get("min_subword_size", 2))
    max_sub = int(cfg.get("max_subword_size", 15))

    def partition(low: str):
        """Greedy longest-match cover; returns [] when the token does
        not fully partition into dictionary words."""
        parts, i, n = [], 0, len(low)
        while i < n:
            for g in range(min(max_sub, n - i), min_sub - 1, -1):
                if low[i:i + g] in words:
                    parts.append(low[i:i + g])
                    i += g
                    break
            else:
                return []
        return parts

    def apply(toks):
        out = []
        for t, p in toks:
            out.append((t, p))
            if len(t) >= min_word:
                parts = partition(t.lower())
                if len(parts) > 1:
                    out.extend((s, p) for s in parts)
        return out
    return apply


# ---------------------------------------------------------------------------
# scripted token filters
# ---------------------------------------------------------------------------


class _PStr(str):
    """Painless-surface string: Java CharSequence methods used by token
    scripts, layered over Python str."""

    def length(self):
        return len(self)

    def contains(self, other):
        return other in self

    def startsWith(self, other):
        return self.startswith(other)

    def endsWith(self, other):
        return self.endswith(other)

    def equals(self, other):
        return str(self) == str(other)

    def toLowerCase(self):
        return _PStr(self.lower())

    def toUpperCase(self):
        return _PStr(self.upper())


class _TokenView:
    """The ``token`` variable exposed to condition / predicate scripts
    (AnalysisPredicateScript.Token surface)."""

    __slots__ = ("term", "position")

    def __init__(self, term: str, position: int):
        self.term = _PStr(term)
        self.position = position

    def getTerm(self):
        return self.term

    def getPosition(self):
        return self.position


def _compile_token_predicate(source: str, params: dict | None):
    """Compile the painless token-predicate subset: ``token.term`` /
    ``token.position`` (or getter calls), CharSequence methods, string
    and integer literals, comparison operators, ``&&``/``||``/``!``,
    parentheses, and ``params.name`` reads. Translated to a python
    expression evaluated with empty builtins — the same trusted-config
    trust level as the rest of the analyzer definition."""
    if re.search(r"[;{}\[\]]|__|\bimport\b|\blambda\b", source):
        raise ValueError(f"unsupported token predicate: {source!r}")
    py = source
    py = re.sub(r"&&", " and ", py)
    py = re.sub(r"\|\|", " or ", py)
    # negation, but not != / !==
    py = re.sub(r"!(?![=])", " not ", py)
    py = re.sub(r"\bparams\.(\w+)", r"params['\1']", py)
    code = compile(py, "<token-predicate>", "eval")
    env_params = dict(params or {})

    def pred(term: str, pos: int) -> bool:
        return bool(eval(code, {"__builtins__": {}},
                         {"token": _TokenView(term, pos),
                          "params": env_params, "true": True,
                          "false": False}))
    return pred


def condition_filter(cfg: dict):
    """condition (ScriptedConditionTokenFilter): tokens matching the
    script are run through the wrapped ``filter`` chain; others pass
    unchanged. Sub-filters apply per-token (the wrapped chain sees a
    single-token stream), matching the reference's one-token
    re-analysis window."""
    script = (cfg.get("script") or {}).get("source", "")
    if not script:
        raise ValueError("condition: script.source required")
    pred = _compile_token_predicate(
        script, (cfg.get("script") or {}).get("params"))
    sub_specs = cfg.get("filter") or []

    def build_chain():
        from sparksearch.analysis_custom import _TOKEN_FILTERS, _resolve
        return [_resolve(s, _TOKEN_FILTERS, {}, "filter", {})
                for s in sub_specs]
    chain = build_chain()

    def apply(toks):
        out = []
        for t, p in toks:
            if pred(t, p):
                sub = [(t, p)]
                for f in chain:
                    sub = f(sub)
                out.extend(sub)
            else:
                out.append((t, p))
        return out
    return apply


def predicate_token_filter(cfg: dict):
    """predicate_token_filter (PredicateTokenFilterScriptFactory):
    keep only tokens for which the script returns true."""
    script = (cfg.get("script") or {}).get("source", "")
    if not script:
        raise ValueError("predicate_token_filter: script.source required")
    pred = _compile_token_predicate(
        script, (cfg.get("script") or {}).get("params"))
    return lambda toks: [(t, p) for t, p in toks if pred(t, p)]


# ---------------------------------------------------------------------------
# delimited_payload / flatten_graph
# ---------------------------------------------------------------------------


def delimited_payload_filter(cfg: dict):
    """delimited_payload (DelimitedPayloadTokenFilterFactory): strip
    ``term|payload`` down to the term. Payloads are not stored — the
    posting model carries (tf, positions) only; the term stream is
    what scoring and phrase matching consume, so search semantics are
    identical. Documented storage deviation."""
    delim = cfg.get("delimiter", "|")
    return lambda toks: [(t.split(delim, 1)[0], p) for t, p in toks]


def flatten_graph_filter(cfg: dict):
    """flatten_graph (FlattenGraphTokenFilterFactory): identity here —
    this chain already linearizes stacked tokens to (term, position)
    pairs with no positionLength attribute, which is exactly the
    flattened form the Lucene filter produces for indexing."""
    return lambda toks: toks


# ---------------------------------------------------------------------------
# phonetic (analysis-phonetic plugin, encoder=soundex)
# ---------------------------------------------------------------------------

_SOUNDEX_CODE = {}
for _grp, _dig in (("bfpv", "1"), ("cgjkqsxz", "2"), ("dt", "3"),
                   ("l", "4"), ("mn", "5"), ("r", "6")):
    for _c in _grp:
        _SOUNDEX_CODE[_c] = _dig


def _soundex(term: str) -> str:
    """Classic American Soundex (the commons-codec Soundex the plugin
    wraps): first letter + 3 digits, H/W transparent between same
    codes, vowels break runs."""
    letters = [c for c in term.lower() if c.isalpha()]
    if not letters:
        return ""
    first = letters[0]
    out = [first.upper()]
    prev = _SOUNDEX_CODE.get(first, "")
    for c in letters[1:]:
        code = _SOUNDEX_CODE.get(c, "")
        if c in "hw":
            continue  # transparent: prev code carries across
        if code and code != prev:
            out.append(code)
            if len(out) == 4:
                break
        prev = code
    return "".join(out).ljust(4, "0")


#: Kölner Phonetik letter→digit table is context-dependent; these are
#: the context-free entries (Postel 1969, the commons-codec
#: ColognePhonetic the plugin wraps as encoder=koelnerphonetik)
_COLOGNE_PLAIN = {
    **dict.fromkeys("aeijouyäöü", "0"),
    "b": "1", "f": "3", "v": "3", "w": "3",
    "g": "4", "k": "4", "q": "4",
    "l": "5", "m": "6", "n": "6", "r": "7", "s": "8", "z": "8",
    "ß": "8",
}


def _cologne(term: str) -> str:
    """Kölner Phonetik: context rules for C/D/T/P/X, then collapse runs
    and drop every '0' except a leading one."""
    w = [c for c in term.lower() if c.isalpha() or c == "ß"]
    digits = []
    n = len(w)
    for i, c in enumerate(w):
        nxt = w[i + 1] if i + 1 < n else ""
        prv = w[i - 1] if i > 0 else ""
        if c == "h":
            d = ""                               # h is silent
        elif c == "p":
            d = "3" if nxt == "h" else "1"
        elif c in "dt":
            d = "8" if nxt and nxt in "csz" else "2"
        elif c == "c":
            if i == 0:
                d = "4" if nxt and nxt in "ahkloqrux" else "8"
            elif prv in "sz":
                d = "8"
            else:
                d = "4" if nxt and nxt in "ahkoqux" else "8"
        elif c == "x":
            d = "8" if prv and prv in "ckq" else "48"
        else:
            d = _COLOGNE_PLAIN.get(c, "")
        digits.append(d)
    code = "".join(digits)
    # collapse consecutive duplicates, then strip non-leading zeros
    out = []
    for ch in code:
        if out and out[-1] == ch:
            continue
        out.append(ch)
    return "".join(c for i, c in enumerate(out) if c != "0" or i == 0)


_MP_VOWELS = "AEIOU"
_MP_FRONTV = "EIY"        # front vowels: C/G soften before these
_MP_VARSON = "CSPTG"      # H is silent after these


def _metaphone(term: str, max_len: int = 4) -> str:
    """Metaphone (Lawrence Philips 1990, as shipped by commons-codec
    Metaphone.java — the analysis-phonetic plugin's default encoder):
    initial-cluster folding (KN/GN/PN/AE/WR/WH/X-), C/G front-vowel
    softening, TH→0, SH/-TIA-/-TIO-→X, silent GH/GN/MB-final, 4-char
    code cap.  Verified against the published commons-codec test
    vectors (tests/test_filters_ext.py)."""
    txt = "".join(c for c in term.upper() if "A" <= c <= "Z")
    if not txt:
        return ""
    if len(txt) == 1:
        return txt
    # initial two-character transforms
    first, second = txt[0], txt[1]
    if first in "KGP" and second == "N":
        word = txt[1:]
    elif first == "A" and second == "E":
        word = txt[1:]
    elif first == "W" and second == "R":
        word = txt[1:]
    elif first == "W" and second == "H":
        word = "W" + txt[2:]
    elif first == "X":
        word = "S" + txt[1:]
    else:
        word = txt
    wdsz = len(word)
    code: list[str] = []

    def at(i: int) -> str:
        return word[i] if 0 <= i < wdsz else ""

    def is_vowel(i: int) -> bool:
        return at(i) in _MP_VOWELS

    def region(i: int, s: str) -> bool:
        return word[i:i + len(s)] == s

    n = 0
    while len(code) < max_len and n < wdsz:
        symb = word[n]
        if symb != "C" and at(n - 1) == symb:   # dedup runs except C
            n += 1
            continue
        if symb in _MP_VOWELS:
            if n == 0:
                code.append(symb)
        elif symb == "B":
            if not (at(n - 1) == "M" and n == wdsz - 1):  # silent -MB
                code.append("B")
        elif symb == "C":
            if at(n - 1) == "S" and n < wdsz - 1 and at(n + 1) in _MP_FRONTV:
                pass                            # silent in SCE/SCI/SCY
            elif region(n, "CIA"):
                code.append("X")
            elif n < wdsz - 1 and at(n + 1) in _MP_FRONTV:
                code.append("S")                # CE/CI/CY
            elif at(n - 1) == "S" and at(n + 1) == "H":
                code.append("K")                # SCH
            elif at(n + 1) == "H":
                if n == 0 and wdsz >= 3 and is_vowel(2):
                    code.append("K")            # word-initial CH+vowel
                else:
                    code.append("X")            # CH
            else:
                code.append("K")
        elif symb == "D":
            if n + 2 < wdsz and at(n + 1) == "G" and at(n + 2) in _MP_FRONTV:
                code.append("J")                # DGE/DGI/DGY
                n += 2
            else:
                code.append("T")
        elif symb == "G":
            silent = False
            if n + 1 == wdsz - 1 and at(n + 1) == "H":
                silent = True                   # terminal GH
            elif n + 1 < wdsz - 1 and at(n + 1) == "H" \
                    and not is_vowel(n + 2):
                silent = True                   # GH + consonant
            elif n > 0 and (region(n, "GN") and n + 2 == wdsz
                            or region(n, "GNED") and n + 4 == wdsz):
                silent = True                   # -GN / -GNED
            hard = at(n - 1) == "G"
            if not silent:
                if n < wdsz - 1 and at(n + 1) in _MP_FRONTV and not hard:
                    code.append("J")
                else:
                    code.append("K")
        elif symb == "H":
            if n == wdsz - 1:
                pass                            # terminal H
            elif n > 0 and at(n - 1) in _MP_VARSON:
                pass                            # silent after C,S,P,T,G
            elif is_vowel(n + 1):
                code.append("H")
        elif symb in "FJLMNR":
            code.append(symb)
        elif symb == "K":
            if at(n - 1) != "C":
                code.append("K")
        elif symb == "P":
            code.append("F" if at(n + 1) == "H" else "P")
        elif symb == "Q":
            code.append("K")
        elif symb == "S":
            if region(n, "SH") or region(n, "SIO") or region(n, "SIA"):
                code.append("X")
            else:
                code.append("S")
        elif symb == "T":
            if region(n, "TIA") or region(n, "TIO"):
                code.append("X")
            elif region(n, "TCH"):
                pass                            # silent in TCH
            elif region(n, "TH"):
                code.append("0")
            else:
                code.append("T")
        elif symb == "V":
            code.append("F")
        elif symb in "WY":
            if n < wdsz - 1 and is_vowel(n + 1):
                code.append(symb)
        elif symb == "X":
            code.append("K")
            code.append("S")
        elif symb == "Z":
            code.append("S")
        n += 1
    return "".join(code[:max_len])


_PHONETIC_ENCODERS = {
    "soundex": _soundex,
    "koelnerphonetik": _cologne,
    "cologne": _cologne,
    "metaphone": _metaphone,
}


def phonetic_filter(cfg: dict):
    """phonetic (PhoneticTokenFilterFactory): encoders soundex,
    koelnerphonetik/cologne (commons-codec ColognePhonetic, published
    Postel tables) and metaphone (commons-codec Metaphone, verified
    against its published test vectors); other encoders (caverphone,
    nysiis, double_metaphone, …) refuse loudly.  replace=true (default) substitutes the
    code; replace=false stacks the code after the original at the same
    position."""
    encoder = cfg.get("encoder", "metaphone")
    enc = _PHONETIC_ENCODERS.get(encoder)
    if enc is None:
        raise NotImplementedError(
            f"phonetic encoder {encoder!r} not implemented "
            f"(supported: {sorted(_PHONETIC_ENCODERS)})")
    replace = bool(cfg.get("replace", True))
    if replace:
        return lambda toks: [(enc(t), p) for t, p in toks]

    def apply(toks):
        out = []
        for t, p in toks:
            out.append((t, p))
            code = enc(t)
            if code and code != t:
                out.append((code, p))
        return out
    return apply


FILTERS_EXT = {
    "dictionary_decompounder": dictionary_decompounder_filter,
    "hyphenation_decompounder": hyphenation_decompounder_filter,
    "condition": condition_filter,
    "predicate_token_filter": predicate_token_filter,
    "delimited_payload": delimited_payload_filter,
    "delimited_payload_filter": delimited_payload_filter,  # legacy alias
    "flatten_graph": flatten_graph_filter,
    "phonetic": phonetic_filter,
}
