"""Analysis-common tokenizer registry beyond the core six: ngram,
edge_ngram, char_group, path_hierarchy, uax_url_email, classic,
simple_pattern, simple_pattern_split.

Reference registry: ``CommonAnalysisModulePlugin.java:330-400``
(getTokenizers) — NGramTokenizerFactory, EdgeNGramTokenizerFactory,
CharGroupTokenizerFactory, PathHierarchyTokenizerFactory,
SimplePatternTokenizerFactory, SimplePatternSplitTokenizerFactory —
plus the core UAX29URLEmailTokenizer and ClassicTokenizer exposed as
``uax_url_email`` / ``classic``.

Tokenizers are plain ``str -> list[str]`` callables (positions assigned
by emission order downstream); ``path_hierarchy`` declares
``emits_positions`` and returns ``list[(term, pos)]`` directly because
Lucene stacks every path prefix at position 0 (first token posInc 1,
the rest 0 — PathHierarchyTokenizer.java).
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

# ---------------------------------------------------------------------------
# token_chars classes (shared by ngram / edge_ngram / char_group)
# ---------------------------------------------------------------------------

#: Unicode category initial -> token_chars class name (Lucene's
#: CharMatcher.Basic classes used by NGramTokenizer tokenChars)
_CAT_CLASS = {"L": "letter", "N": "digit", "Z": "whitespace",
              "P": "punctuation", "S": "symbol"}


def _char_class(ch: str) -> str:
    if ch in ("\t", "\n", "\r", "\f", "\v", " "):
        return "whitespace"
    return _CAT_CLASS.get(unicodedata.category(ch)[0], "other")


def _make_keeper(token_chars, custom: str) -> Callable[[str], bool]:
    """Predicate: does this char belong to a token (vs being a boundary)?

    Empty token_chars keeps everything (the whole input is one run) —
    NGramTokenizerFactory.java: an empty set matches all chars.
    """
    classes = frozenset(token_chars or ())
    custom_set = frozenset(custom or "")
    if not classes:
        return lambda ch: True

    def keep(ch: str) -> bool:
        cls = _char_class(ch)
        if cls in classes:
            return True
        return "custom" in classes and ch in custom_set
    return keep


def _runs(s: str, keep: Callable[[str], bool]):
    """Maximal runs of kept chars, in order."""
    run = []
    for ch in s:
        if keep(ch):
            run.append(ch)
        elif run:
            yield "".join(run)
            run = []
    if run:
        yield "".join(run)


# ---------------------------------------------------------------------------
# ngram / edge_ngram
# ---------------------------------------------------------------------------


def ngram_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``ngram`` tokenizer (NGramTokenizerFactory.java): all grams of
    length min_gram..max_gram over each token_chars run, emitted by
    start offset then gram length — "abc" min1 max2 -> a ab b bc c."""
    mn = int(cfg.get("min_gram", 1))
    mx = int(cfg.get("max_gram", 2))
    if mn < 1 or mx < mn:
        raise ValueError("ngram: require 1 <= min_gram <= max_gram")
    keep = _make_keeper(cfg.get("token_chars"),
                        cfg.get("custom_token_chars", ""))

    def tok(s: str) -> list[str]:
        out = []
        for run in _runs(s, keep):
            n = len(run)
            for i in range(n):
                for g in range(mn, mx + 1):
                    if i + g > n:
                        break
                    out.append(run[i:i + g])
        return out
    return tok


def edge_ngram_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``edge_ngram`` tokenizer (EdgeNGramTokenizerFactory.java):
    prefixes of length min_gram..max_gram anchored at the start of each
    token_chars run — "Quick" min1 max2 -> Q Qu."""
    mn = int(cfg.get("min_gram", 1))
    mx = int(cfg.get("max_gram", 2))
    if mn < 1 or mx < mn:
        raise ValueError("edge_ngram: require 1 <= min_gram <= max_gram")
    keep = _make_keeper(cfg.get("token_chars"),
                        cfg.get("custom_token_chars", ""))

    def tok(s: str) -> list[str]:
        out = []
        for run in _runs(s, keep):
            for g in range(mn, min(mx, len(run)) + 1):
                out.append(run[:g])
        return out
    return tok


# ---------------------------------------------------------------------------
# char_group
# ---------------------------------------------------------------------------


def char_group_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``char_group`` (CharGroupTokenizerFactory.java): split on chars
    in tokenize_on_chars — entries are single chars, escapes, or the
    class names whitespace/letter/digit/punctuation/symbol. Tokens
    longer than max_token_length are split at the limit."""
    on = cfg.get("tokenize_on_chars") or []
    max_len = int(cfg.get("max_token_length", 255))
    classes = frozenset(e for e in on if len(e) > 1)
    chars = frozenset(e for e in on if len(e) == 1)
    bad = classes - {"whitespace", "letter", "digit", "punctuation",
                     "symbol"}
    if bad:
        raise ValueError(f"char_group: unknown char classes {sorted(bad)}")

    def is_break(ch: str) -> bool:
        return ch in chars or _char_class(ch) in classes

    def tok(s: str) -> list[str]:
        out = []
        for run in _runs(s, lambda ch: not is_break(ch)):
            for i in range(0, len(run), max_len):
                out.append(run[i:i + max_len])
        return out
    return tok


# ---------------------------------------------------------------------------
# path_hierarchy
# ---------------------------------------------------------------------------


def path_hierarchy_tokenizer(cfg: dict):
    """``path_hierarchy`` (PathHierarchyTokenizerFactory.java):
    "/a/b/c" -> /a, /a/b, /a/b/c — every prefix stacked at position 0
    (first token posInc 1, rest 0). reverse=true emits suffixes
    (c, b/c, a/b/c order per Lucene ReversePathHierarchyTokenizer);
    skip drops that many leading (or trailing, reversed) levels;
    ``replacement`` substitutes the delimiter in emitted tokens."""
    delim = cfg.get("delimiter", "/")
    repl = cfg.get("replacement", delim)
    reverse = bool(cfg.get("reverse", False))
    skip = int(cfg.get("skip", 0))

    def tok(s: str) -> list[tuple[str, int]]:
        if not s:
            return []
        parts = s.split(delim)
        out = []
        if not reverse:
            # prefix i = parts[0..i] joined; leading empty part keeps the
            # root delimiter ("/a" -> ["", "a"]) exactly like Lucene
            for i in range(skip, len(parts)):
                tokstr = repl.join(parts[:i + 1])
                if tokstr:
                    out.append((tokstr, 0))
        else:
            n = len(parts)
            for i in range(n - 1 - skip, -1, -1):
                tokstr = repl.join(parts[i:])
                if tokstr:
                    out.append((tokstr, 0))
        return out
    tok.emits_positions = True
    return tok


# ---------------------------------------------------------------------------
# simple_pattern / simple_pattern_split
# ---------------------------------------------------------------------------


def simple_pattern_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``simple_pattern`` (SimplePatternTokenizerFactory.java): emit
    every non-empty match of the pattern."""
    rx = re.compile(cfg.get("pattern", ""))
    return lambda s: [m for m in rx.findall(s) if m]


def simple_pattern_split_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``simple_pattern_split`` (SimplePatternSplitTokenizerFactory.java):
    split on every match of the pattern."""
    rx = re.compile(cfg.get("pattern", ""))
    return lambda s: [t for t in rx.split(s) if t]


# ---------------------------------------------------------------------------
# uax_url_email / classic
# ---------------------------------------------------------------------------

#: URL / email spans kept whole by UAX29URLEmailTokenizer (the UAX#29
#: tokenizer with the RFC 3986 / 5321 productions added). The regex
#: covers the common scheme://... and user@host.tld shapes; trailing
#: sentence punctuation is not part of the token.
_URL_RE = r"[a-zA-Z][a-zA-Z0-9+.-]*://[^\s<>\"']+[^\s<>\"'.,;:!?)\]]"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"
_URL_EMAIL_RE = re.compile(f"({_URL_RE}|{_EMAIL_RE})")


def uax_url_email_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``uax_url_email`` (UAX29URLEmailTokenizer): standard UAX#29 word
    break, except URL and email spans stay single tokens."""
    from sparksearch.analysis import standard_tokenize
    max_len = int(cfg.get("max_token_length", 255))

    def tok(s: str) -> list[str]:
        out = []
        for i, seg in enumerate(_URL_EMAIL_RE.split(s)):
            if not seg:
                continue
            if i % 2:  # captured URL/email span
                out.append(seg[:max_len])
            else:
                out.extend(standard_tokenize(seg))
        return out
    return tok


#: ClassicTokenizer productions, longest-match first:
#: NUM (digits with embedded separators), APOSTROPHE (O'Neil's),
#: ACRONYM (I.B.M.), COMPANY (AT&T, Excite@Home), HOST (www.foo.com),
#: EMAIL, ALPHANUM. ClassicTokenizer.jflex semantics.
_CLASSIC_RE = re.compile(
    r"[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\.[A-Za-z0-9-]+)+"  # EMAIL
    r"|(?:[A-Za-z]\.){2,}"                                   # ACRONYM
    r"|[A-Za-z0-9]+(?:[&@][A-Za-z0-9]+)+"                    # COMPANY
    r"|[A-Za-z0-9]+(?:\.[A-Za-z0-9]+)+"                      # HOST / NUM.
    r"|\w+(?:'\w+)*"                                         # APOSTROPHE
    r"|\d+(?:[.,/]\d+)*",                                    # NUM
    re.UNICODE)


def classic_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``classic`` tokenizer (ClassicTokenizer): English-heuristic
    grammar keeping acronyms, company names, hostnames, emails and
    apostrophe words whole. Pair with the ``classic`` token filter to
    strip acronym dots and possessive 's."""
    max_len = int(cfg.get("max_token_length", 255))
    return lambda s: [m.group(0)[:max_len] for m in _CLASSIC_RE.finditer(s)]


# ---------------------------------------------------------------------------
# icu_tokenizer (analysis-icu plugin)
# ---------------------------------------------------------------------------

#: UAX#29 word-break property subsets (the members that occur in text;
#: full property files are at unicode.org/Public/UCD/latest/ucd/auxiliary)
_WB_MIDLETTER = frozenset(":··՟״‧︓﹕：")
_WB_MIDNUM = frozenset(",;٬⁄︐︔﹐﹔，；")
_WB_MIDNUMLET = frozenset(".․﹒．")
_WB_EXTNUMLET_EXTRA = frozenset("_‿⁀︳︴＿")

_WB_AH = frozenset(("ALetter", "Hebrew"))
_WB_WORDY = frozenset(("ALetter", "Hebrew", "Numeric", "Katakana",
                       "ExtendNumLet"))


def _wb_class(ch: str) -> str:
    o = ord(ch)
    if ch in "\r\n\x0b\x0c\x85  ":
        return "NL"
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me"):
        return "Extend"
    if cat == "Cf":
        return "Format"
    if ch == "'":
        return "SQ"
    if ch == '"':
        return "DQ"
    if ch in _WB_MIDLETTER:
        return "MidLetter"
    if ch in _WB_MIDNUM:
        return "MidNum"
    if ch in _WB_MIDNUMLET:
        return "MidNumLet"
    if cat == "Nd":
        return "Numeric"
    if cat == "Pc" or ch in _WB_EXTNUMLET_EXTRA:
        return "ExtendNumLet"
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF \
            or 0xFF66 <= o <= 0xFF9F:
        return "Katakana"
    if 0x3040 <= o <= 0x309F:
        return "Hiragana"
    if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF \
            or 0xF900 <= o <= 0xFAFF or 0x20000 <= o <= 0x2FA1F:
        return "Han"
    if 0x0E00 <= o <= 0x0E7F:
        return "Thai"
    if 0x0E80 <= o <= 0x0EFF:
        return "Lao"
    if 0x1780 <= o <= 0x17FF:
        return "Khmer"
    if 0x1000 <= o <= 0x109F:
        return "Myanmar"
    if 0x0590 <= o <= 0x05FF:
        return "Hebrew"
    if ch.isalpha():
        return "ALetter"
    return "Other"


def _wb_pair_ok(prev: str, cur: str) -> bool:
    """Pairwise no-break rules WB5/8/9/10/13/13a/13b."""
    if prev in _WB_AH and (cur in _WB_AH or cur == "Numeric"):
        return True
    if prev == "Numeric" and (cur == "Numeric" or cur in _WB_AH):
        return True
    if prev == "Katakana" and cur == "Katakana":
        return True
    if cur == "ExtendNumLet" and prev in _WB_WORDY:
        return True
    if prev == "ExtendNumLet" and cur in _WB_WORDY:
        return True
    return False


def icu_tokenizer(cfg: dict) -> Callable[[str], list[str]]:
    """``icu_tokenizer`` (analysis-icu plugin, IcuTokenizerFactory →
    ICU BreakIterator word instance): UAX#29 default word-break rules —
    AHLetter chains with MidLetter/MidNumLet/Single_Quote interiors
    (WB5-7a), numeric grouping through MidNum/MidNumLet (WB8-12),
    Katakana chains (WB13), ExtendNumLet joining (WB13a/b), Extend and
    Format characters attached to the base (WB4) — hand-implemented
    from the published spec (unicode.org/reports/tr29).

    ICU's DICTIONARY-based segmentation of Han/Hiragana and
    Thai/Lao/Khmer/Myanmar runs is reproduced with a user-supplied
    ``dictionary`` word list (greedy longest-match, the
    DictionaryBreakEngine posture): ICU's bundled CJ/Thai frequency
    dictionaries don't ship here, so with no dictionary configured
    Han/Hiragana fall back to per-character tokens (the cjk_bigram
    pipeline's expected input) and SE-Asian runs stay whole — both
    documented deviations, loud in this docstring rather than silent."""
    words = sorted((w for w in (cfg.get("dictionary") or ()) if w),
                   key=len, reverse=True)

    def seg_dict(run: str, per_char: bool) -> list[str]:
        out, i, n = [], 0, len(run)
        gap = []

        def flush_gap():
            if gap:
                if per_char:
                    # grapheme-ish: combining marks attach to their base
                    clusters: list[str] = []
                    for ch in gap:
                        if clusters and _wb_class(ch) in ("Extend",
                                                          "Format"):
                            clusters[-1] += ch
                        else:
                            clusters.append(ch)
                    out.extend(clusters)
                else:
                    out.append("".join(gap))
                gap.clear()

        while i < n:
            for w in words:
                if run.startswith(w, i):
                    flush_gap()
                    out.append(w)
                    i += len(w)
                    break
            else:
                gap.append(run[i])
                i += 1
        flush_gap()
        return out

    def tok(s: str) -> list[str]:
        out: list[str] = []
        i, n = 0, len(s)
        while i < n:
            c = _wb_class(s[i])
            if c in ("Han", "Hiragana"):
                j = i
                while j < n and _wb_class(s[j]) in ("Han", "Hiragana",
                                                    "Extend", "Format"):
                    j += 1
                out.extend(seg_dict(s[i:j], per_char=True))
                i = j
                continue
            if c in ("Thai", "Lao", "Khmer", "Myanmar"):
                j = i
                while j < n and _wb_class(s[j]) in (c, "Extend", "Format"):
                    j += 1
                out.extend(seg_dict(s[i:j], per_char=False))
                i = j
                continue
            if c not in _WB_WORDY:
                i += 1
                continue
            # wordy chain
            buf = [s[i]]
            has_word = c != "ExtendNumLet"
            prev = c
            j = i + 1
            while j < n:
                cj = _wb_class(s[j])
                if cj in ("Extend", "Format"):          # WB4
                    buf.append(s[j])
                    j += 1
                    continue
                if cj in _WB_WORDY and _wb_pair_ok(prev, cj):
                    buf.append(s[j])
                    has_word = has_word or cj != "ExtendNumLet"
                    prev = cj
                    j += 1
                    continue
                if cj in ("MidLetter", "MidNum", "MidNumLet", "SQ", "DQ"):
                    k = j + 1
                    while k < n and _wb_class(s[k]) in ("Extend", "Format"):
                        k += 1
                    nxt = _wb_class(s[k]) if k < n else None
                    join = False
                    if prev in _WB_AH and nxt in _WB_AH \
                            and cj in ("MidLetter", "MidNumLet", "SQ"):
                        join = True                     # WB6/7
                    elif prev == "Numeric" and nxt == "Numeric" \
                            and cj in ("MidNum", "MidNumLet", "SQ"):
                        join = True                     # WB11/12
                    elif prev == "Hebrew" and cj == "DQ" \
                            and nxt == "Hebrew":
                        join = True                     # WB7b/7c
                    if join:
                        buf.append(s[j:k + 1])
                        prev = nxt
                        has_word = True
                        j = k + 1
                        continue
                    if prev == "Hebrew" and cj == "SQ":  # WB7a
                        buf.append(s[j])
                        j += 1
                    break
                break
            if has_word:
                out.append("".join(buf))
            i = j
        return out
    return tok


def thai_tokenizer(cfg: dict) -> "Callable[[str], list[str]]":
    """``thai`` tokenizer (ThaiTokenizerFactory -> Lucene ThaiTokenizer,
    a Thai-locale BreakIterator): Thai runs segment by dictionary
    longest-match, every other script by the UAX#29 rules — exactly the
    icu_tokenizer engine here. ICU's bundled Thai frequency dictionary
    is a binary data file that does not ship in this environment, so a
    ``dictionary`` word list is REQUIRED — a loud error beats silently
    emitting whole unsegmented Thai runs."""
    if not cfg.get("dictionary"):
        raise ValueError(
            "thai tokenizer requires a 'dictionary' word list in this "
            "environment (ICU's Thai dictionary data file is not "
            "available); supply e.g. {\"dictionary\": [...]} ")
    return icu_tokenizer(cfg)


def _morphological_unsupported(name: str, need: str):
    """Plugin tokenizers whose algorithm is a Viterbi lattice over a
    trained cost dictionary (MeCab-style) — NOT a dictionary
    longest-match, so the thai/icu dictionary-break engine here would
    be a silently-different algorithm. Refuse loudly with guidance."""
    def factory(cfg: dict):
        raise NotImplementedError(
            f"{name} tokenizer: requires the {need} trained lattice "
            f"dictionary (not available, and its Viterbi segmentation "
            f"is not re-derivable from public specs here); the "
            f"icu_tokenizer with an explicit 'dictionary' word list "
            f"gives longest-match CJK segmentation as the nearest "
            f"supported alternative")
    return factory


TOKENIZERS_EXT = {
    "kuromoji_tokenizer": _morphological_unsupported(
        "kuromoji", "MeCab-IPADIC Japanese"),
    "nori_tokenizer": _morphological_unsupported(
        "nori", "mecab-ko-dic Korean"),
    "smartcn_tokenizer": _morphological_unsupported(
        "smartcn", "Chinese HMM model"),
    "ngram": ngram_tokenizer,
    "edge_ngram": edge_ngram_tokenizer,
    "char_group": char_group_tokenizer,
    "path_hierarchy": path_hierarchy_tokenizer,
    "simple_pattern": simple_pattern_tokenizer,
    "simple_pattern_split": simple_pattern_split_tokenizer,
    "uax_url_email": uax_url_email_tokenizer,
    "classic": classic_tokenizer,
    "icu_tokenizer": icu_tokenizer,
    "thai": thai_tokenizer,
}
