"""Text analysis: char filters → tokenizer → token filters.

Reimplements the reference's analysis semantics:

- **standard analyzer** = UAX#29 word-break tokenizer + lowercase, default
  stopword set EMPTY, max_token_length=255
  (/root/reference/server/src/main/java/org/opensearch/index/analysis/StandardAnalyzerProvider.java:46-57).
- **stop filter** default = the classic 33-word English stop set
  (/root/reference/modules/analysis-common/src/main/java/org/opensearch/analysis/common/CommonAnalysisModulePlugin.java:563).
- **porter_stem** filter (CommonAnalysisModulePlugin.java:542,560) → porter.py.
- Text fields index docs+freqs+positions with a position_increment_gap of 100
  between values of a multi-valued field
  (/root/reference/server/src/main/java/org/opensearch/index/mapper/TextFieldMapper.java:130-141).
- Stop filter keeps position holes (consumed increments), so phrases never
  falsely match across a removed stopword.

The tokenizer approximates UAX#29 word-break with a compiled regex over the
classes that matter for web text (ALetter runs glued by MidLetter/MidNumLet/
apostrophe; Numeric runs glued by MidNum/MidNumLet; ExtendNumLet joins; CJK
ideographs emit one token per char). Golden cases are locked in
tests/test_analysis.py.

Scale note: tokenization runs as an Arrow-batched pandas UDF (regex over a
pandas Series — no per-row Python round trips); stop/stem run over the
*distinct term dictionary* where possible, not per occurrence.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from sparksearch.porter import porter_stem

__all__ = [
    "Token",
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "POSITION_INCREMENT_GAP",
    "standard_tokenize",
    "analyze",
    "analyze_values",
    "ANALYZERS",
]


class Token(NamedTuple):
    term: str
    pos: int


#: EnglishAnalyzer.ENGLISH_STOP_WORDS_SET — the classic 33-word list.
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was will with""".split()
)

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.DEFAULT_MAX_TOKEN_LENGTH
POSITION_INCREMENT_GAP = 100  # TextFieldMapper.java:139-141

# --- UAX#29-approximating token regex -------------------------------------
_L = r"[^\W\d_]"                       # unicode letter (ALetter approx)
_N = r"\d"                             # unicode decimal digit (Numeric)
_ENL = r"[_‿⁀⁔]"        # ExtendNumLet
_MID_L = r"[:·״‧︓﹕：]"          # MidLetter
_MID_N = r"[,;٬︐︔，；]"               # MidNum
_MID_NL = r"[.'‘’․﹒＇．]"        # MidNumLet + '

_LCHUNK = rf"{_L}+(?:(?:{_MID_L}|{_MID_NL}){_L}+)*"
_NCHUNK = rf"{_N}+(?:(?:{_MID_N}|{_MID_NL}){_N}+)*"
_CJK = r"[一-鿿㐀-䶿豈-﫿぀-ゟ]"

_TOKEN_RE = re.compile(
    rf"(?:{_LCHUNK}|{_NCHUNK}|{_ENL}+)+|{_CJK}",
    re.UNICODE,
)


def standard_tokenize(text: str) -> list[str]:
    """UAX#29-style word-break tokens (no case folding), max length 255.

    Tokens longer than MAX_TOKEN_LENGTH are split into 255-char chunks,
    matching the reference tokenizer's maxTokenLength behavior.
    """
    out: list[str] = []
    for m in _TOKEN_RE.finditer(text):
        t = m.group(0)
        if len(t) <= MAX_TOKEN_LENGTH:
            out.append(t)
        else:
            for i in range(0, len(t), MAX_TOKEN_LENGTH):
                out.append(t[i : i + MAX_TOKEN_LENGTH])
    return out


def _chain(tokens: list[Token], lowercase: bool, stop: bool, stem: bool) -> list[Token]:
    out: list[Token] = []
    for term, pos in tokens:
        if lowercase:
            term = term.lower()
        if stop and term in ENGLISH_STOP_WORDS:
            continue  # position hole preserved: pos values keep their gaps
        if stem:
            term = porter_stem(term)
        out.append(Token(term, pos))
    return out


def analyze(text: str, analyzer: str = "standard") -> list[Token]:
    """Analyze one text value → [(term, position)].

    analyzers: 'standard' (tokenize+lowercase — reference default for text
    fields), 'whitespace' (split, no case folding), 'english' (standard +
    stop + porter), 'keyword' (whole value, one token).
    """
    if analyzer == "keyword":
        return [Token(text, 0)] if text else []
    if analyzer == "whitespace":
        return [Token(t, i) for i, t in enumerate(text.split())]
    raw = [Token(t, i) for i, t in enumerate(standard_tokenize(text))]
    if analyzer == "standard":
        return _chain(raw, lowercase=True, stop=False, stem=False)
    if analyzer == "standard_raw":  # tokenizer only, no lowercase
        return raw
    if analyzer == "english":
        return _chain(raw, lowercase=True, stop=True, stem=True)
    raise ValueError(f"unknown analyzer: {analyzer}")


def analyze_values(values: list[str], analyzer: str = "standard") -> list[Token]:
    """Analyze a multi-valued field: positions jump by POSITION_INCREMENT_GAP
    between values so phrases cannot match across array elements."""
    out: list[Token] = []
    base = 0
    for v in values:
        toks = analyze(v, analyzer)
        out.extend(Token(t, base + p) for t, p in toks)
        n_raw = len(standard_tokenize(v)) if analyzer not in ("whitespace", "keyword") else len(v.split())
        base += n_raw + POSITION_INCREMENT_GAP
    return out


ANALYZERS = ("standard", "standard_raw", "whitespace", "english", "keyword")
