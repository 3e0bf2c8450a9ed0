"""Custom analyzer definitions — the index-settings ``analysis`` block.

Reimplements the reference's configurable analysis chain
(/root/reference/server/src/main/java/org/opensearch/index/analysis/AnalysisRegistry.java,
CustomAnalyzerProvider.java; component factories in
/root/reference/modules/analysis-common/src/main/java/org/opensearch/analysis/common/CommonAnalysisModulePlugin.java):
a custom analyzer is ``char_filter* → tokenizer → filter*`` where every
component is either a built-in name or an inline definition dict, exactly
like the JSON users put under ``settings.analysis``.

Supported components (reference factory cites in each function):

- char_filter: ``html_strip``, ``mapping``, ``pattern_replace``
- tokenizer: ``standard``, ``whitespace``, ``keyword``, ``letter``,
  ``lowercase``, ``pattern``
- filter: ``lowercase``, ``uppercase``, ``asciifolding``, ``stop``,
  ``stemmer`` / ``porter_stem`` / ``snowball``, ``synonym`` /
  ``synonym_graph`` (single-token rules), ``shingle``, ``edge_ngram``,
  ``ngram``, ``length``, ``trim``, ``truncate``, ``unique``, ``reverse``

Position semantics match Lucene: stop/length keep holes (consumed position
increments), synonyms emit at the SAME position as the token they expand
(posIncrement 0 — this is what makes the match path build a blended
SynonymQuery per position), shingles take the position of their first
member, edge_ngram/ngram grams keep their source token's position.

Registered analyzers are looked up by ``analysis.analyze`` when the
analyzer name is not a built-in, so every query/build path accepts them.
Scale note: custom chains run per-row *inside* Arrow batches
(``analyze_batch`` falls back from its vectorized path); the built-in
standard/english chains stay on the vectorized fast path. Custom analyzers
are the long tail, the default chain is the hot one.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

from sparksearch.porter import porter_stem

__all__ = [
    "CustomAnalyzer",
    "register_analyzer",
    "register_analysis",
    "get_custom",
    "parse_synonyms",
]

# name → CustomAnalyzer (module-level registry, mirrors AnalysisRegistry)
_REGISTRY: dict[str, "CustomAnalyzer"] = {}


def get_custom(name: str) -> "CustomAnalyzer | None":
    ca = _REGISTRY.get(name)
    if ca is None:
        # prebuilt language analyzers register lazily on first lookup
        from sparksearch.lang_analyzers import maybe_register
        ca = maybe_register(name)
    return ca


# ---------------------------------------------------------------------------
# char filters: str -> str
# ---------------------------------------------------------------------------

def _cf_html_strip(cfg: dict) -> Callable[[str], str]:
    # HtmlStripCharFilterFactory — same frozen extractor as the build path
    from sparksearch.extract import extract_text
    return extract_text


def _cf_mapping(cfg: dict) -> Callable[[str], str]:
    """``mapping`` char filter: literal "key => value" replacements,
    longest key first (MappingCharFilterFactory)."""
    pairs = []
    for rule in cfg.get("mappings", []):
        k, _, v = rule.partition("=>")
        pairs.append((k.strip(), v.strip()))
    pairs.sort(key=lambda kv: -len(kv[0]))
    if not pairs:
        return lambda s: s
    rx = re.compile("|".join(re.escape(k) for k, _ in pairs))
    table = dict(pairs)

    def apply(s: str) -> str:
        return rx.sub(lambda m: table[m.group(0)], s)
    return apply


def _java_repl(repl: str) -> str:
    """Translate a Java ``Matcher.replaceAll`` replacement into Python
    ``re.sub`` syntax: ``$1``/``${1}`` group refs become ``\\1``, an
    escaped ``\\$`` stays a literal dollar, and Python-significant
    backslashes are preserved literally (Java treats ``\\x`` as literal
    ``x``)."""
    out = []
    i, n = 0, len(repl)
    while i < n:
        c = repl[i]
        if c == "\\" and i + 1 < n:
            nxt = repl[i + 1]
            # Java: backslash escapes the next char to a literal
            out.append(nxt if nxt != "\\" else "\\\\")
            i += 2
        elif c == "$" and i + 1 < n and repl[i + 1].isdigit():
            j = i + 1
            while j < n and repl[j].isdigit():
                j += 1
            out.append("\\" + repl[i + 1:j])
            i = j
        elif c == "$" and repl[i:i + 2] == "${":
            j = repl.index("}", i)
            ref = repl[i + 2:j]
            if not ref.isdigit():
                raise ValueError(
                    f"pattern_replace: named group reference "
                    f"${{{ref}}} is not supported; use numbered $N refs")
            out.append("\\" + ref)
            i = j + 1
        elif c == "\\":
            out.append("\\\\")
            i += 1
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _cf_pattern_replace(cfg: dict) -> Callable[[str], str]:
    # PatternReplaceCharFilterFactory (Java $N group refs supported)
    rx = re.compile(cfg["pattern"])
    repl = _java_repl(cfg.get("replacement", ""))
    return lambda s: rx.sub(repl, s)


_CHAR_FILTERS = {
    "html_strip": _cf_html_strip,
    "mapping": _cf_mapping,
    "pattern_replace": _cf_pattern_replace,
}

# ---------------------------------------------------------------------------
# tokenizers: str -> list[str]
# ---------------------------------------------------------------------------

_LETTER_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _tk_standard(cfg: dict) -> Callable[[str], list[str]]:
    from sparksearch.analysis import standard_tokenize
    return standard_tokenize


def _tk_whitespace(cfg: dict) -> Callable[[str], list[str]]:
    return lambda s: s.split()


def _tk_keyword(cfg: dict) -> Callable[[str], list[str]]:
    return lambda s: [s] if s else []


def _tk_letter(cfg: dict) -> Callable[[str], list[str]]:
    return lambda s: _LETTER_RE.findall(s)


def _tk_lowercase(cfg: dict) -> Callable[[str], list[str]]:
    # LowerCaseTokenizer = letter tokenizer + lowercase in one pass
    return lambda s: [t.lower() for t in _LETTER_RE.findall(s)]


def _tk_pattern(cfg: dict) -> Callable[[str], list[str]]:
    """``pattern`` tokenizer (PatternTokenizerFactory): pattern SPLITS by
    default (group=-1); group >= 0 emits that capture group per match."""
    rx = re.compile(cfg.get("pattern", r"\W+"))
    group = int(cfg.get("group", -1))
    if group < 0:
        return lambda s: [t for t in rx.split(s) if t]
    return lambda s: [m.group(group) for m in rx.finditer(s)
                      if m.group(group)]


def _lazy_tokenizer(name: str):
    def factory(cfg: dict):
        from sparksearch.tokenizers_ext import TOKENIZERS_EXT
        return TOKENIZERS_EXT[name](cfg)
    return factory


_TOKENIZERS = {
    "standard": _tk_standard,
    "whitespace": _tk_whitespace,
    "keyword": _tk_keyword,
    "letter": _tk_letter,
    "lowercase": _tk_lowercase,
    "pattern": _tk_pattern,
    "ngram": _lazy_tokenizer("ngram"),
    "edge_ngram": _lazy_tokenizer("edge_ngram"),
    "char_group": _lazy_tokenizer("char_group"),
    "path_hierarchy": _lazy_tokenizer("path_hierarchy"),
    "simple_pattern": _lazy_tokenizer("simple_pattern"),
    "simple_pattern_split": _lazy_tokenizer("simple_pattern_split"),
    "uax_url_email": _lazy_tokenizer("uax_url_email"),
    "classic": _lazy_tokenizer("classic"),
    "icu_tokenizer": _lazy_tokenizer("icu_tokenizer"),
    "thai": _lazy_tokenizer("thai"),
    # plugin morphological tokenizers — registered refusals (Viterbi
    # lattice dictionaries unavailable; see tokenizers_ext)
    "kuromoji_tokenizer": _lazy_tokenizer("kuromoji_tokenizer"),
    "nori_tokenizer": _lazy_tokenizer("nori_tokenizer"),
    "smartcn_tokenizer": _lazy_tokenizer("smartcn_tokenizer"),
}

# ---------------------------------------------------------------------------
# token filters: list[(term, pos)] -> list[(term, pos)]
# ---------------------------------------------------------------------------

TokList = "list[tuple[str, int]]"


#: GreekLowerCaseFilter folds: accent/diaeresis strip + final sigma
_EL_FOLD = str.maketrans({
    "ά": "α", "έ": "ε", "ή": "η", "ί": "ι", "ό": "ο", "ύ": "υ",
    "ώ": "ω", "ϊ": "ι", "ΐ": "ι", "ϋ": "υ", "ΰ": "υ", "ς": "σ",
})


def _tr_lower(t: str) -> str:
    """TurkishLowerCaseFilter: İ -> i, I -> ı (dotless), I + combining
    dot-above -> i; everything else plain lowercase."""
    t = t.replace("İ", "i").replace("İ", "i").replace("I", "ı")
    return t.lower()


def _tf_lowercase(cfg: dict):
    """``lowercase`` with the reference's language variants
    (LowerCaseTokenFilterFactory.java:50-72): greek (accent fold +
    final-sigma normalization), turkish (dotted/dotless i casing).
    ``irish`` (eclipsis-aware) is unimplemented and raises."""
    lang = (cfg or {}).get("language", "")
    if lang == "greek":
        return lambda toks: [(t.lower().translate(_EL_FOLD), p)
                             for t, p in toks]
    if lang == "turkish":
        return lambda toks: [(_tr_lower(t), p) for t, p in toks]
    if lang == "irish":
        raise NotImplementedError(
            "lowercase language 'irish' (eclipsis handling) not "
            "implemented")
    return lambda toks: [(t.lower(), p) for t, p in toks]


def _tf_uppercase(cfg: dict):
    return lambda toks: [(t.upper(), p) for t, p in toks]


def _tf_asciifolding(cfg: dict):
    def fold(t: str) -> str:
        return "".join(c for c in unicodedata.normalize("NFKD", t)
                       if not unicodedata.combining(c))
    return lambda toks: [(fold(t), p) for t, p in toks]


def _tf_stop(cfg: dict):
    """``stop`` filter: configurable stopword list, ``_english_`` expands to
    the classic 33-word set; holes preserved (StopTokenFilterFactory)."""
    from sparksearch.analysis import ENGLISH_STOP_WORDS
    sw = cfg.get("stopwords", "_english_")
    if sw == "_english_":
        stopset = ENGLISH_STOP_WORDS
    else:
        stopset = frozenset(sw)
    ignore_case = bool(cfg.get("ignore_case", False))
    if ignore_case:
        stopset = frozenset(w.lower() for w in stopset)

    def apply(toks):
        return [(t, p) for t, p in toks
                if (t.lower() if ignore_case else t) not in stopset]
    return apply


def _tf_stemmer(cfg: dict, state: dict | None = None):
    """StemmerTokenFilterFactory — ``language`` selects the variant:
    english/porter/porter2/snowball route to the Porter implementation
    (porter.py); the light/minimal family (minimal_english,
    minimal_french, light_german, light_spanish) routes to the Savoy
    suffix-strip stemmers (stemmers.py). Reference registry:
    StemmerTokenFilterFactory.java:143-260.

    Keyword semantics: tokens protected by an earlier ``keyword_marker``
    or rewritten by an earlier ``stemmer_override`` are skipped
    (KeywordAttribute). When an earlier ``keyword_repeat`` is active the
    filter emits the unstemmed token alongside the stem at the same
    position (the classic index-both pattern; pair with
    ``remove_duplicates``)."""
    lang = cfg.get("language", "english")
    from sparksearch.stemmers import LANGUAGE_STEMMERS
    fn = LANGUAGE_STEMMERS.get(lang)
    if fn is None:
        low = lang.lower()
        if low in ("english", "porter"):
            fn = porter_stem          # PorterStemFilter (Lucene "english")
        elif low in ("porter2", "snowball"):
            from sparksearch.snowball import porter2_stem
            fn = porter2_stem         # Snowball English
        elif low in ("light_english", "lightenglish", "lovins", "kstem"):
            # genuinely different algorithms (KStem dictionary, Lovins) —
            # refuse loudly rather than silently approximate with Porter
            raise NotImplementedError(
                f"stemmer language {lang!r} is not implemented; nearest "
                f"supported: 'english' (Porter) or 'porter2' (Snowball)")
        else:
            raise ValueError(f"unsupported stemmer language: {lang}")
    return _keyword_aware_stem(fn, state)


def _keyword_aware_stem(fn, state: dict | None):
    """Wrap a term->stem function honoring the chain's keyword state
    captured at construction time (markers placed AFTER this filter in
    the chain do not protect it, matching attribute flow order)."""
    preds = tuple((state or {}).get("protected_preds", ()))
    repeat = bool((state or {}).get("repeat"))

    def stem1(t: str) -> str:
        for pred in preds:
            if pred(t):
                return t
        return fn(t)

    if not repeat:
        return lambda toks: [(stem1(t), p) for t, p in toks]

    def apply(toks):
        out = []
        for t, p in toks:
            s = stem1(t)
            out.append((t, p))
            if s != t:
                out.append((s, p))
        return out
    return apply


def _tf_keyword_marker(cfg: dict, state: dict | None = None):
    """keyword_marker (KeywordMarkerTokenFilterFactory): terms matching
    ``keywords`` / ``keywords_pattern`` are protected from downstream
    stemming. Identity on the token stream itself — the mark lives in
    the chain state consulted by stemmer construction."""
    kws = cfg.get("keywords") or ()
    pattern = cfg.get("keywords_pattern")
    ignore_case = bool(cfg.get("ignore_case", False))
    if state is not None:
        preds = state.setdefault("protected_preds", [])
        if kws:
            kwset = frozenset(k.lower() for k in kws) if ignore_case \
                else frozenset(kws)
            preds.append(
                (lambda t: t.lower() in kwset) if ignore_case
                else (lambda t: t in kwset))
        if pattern:
            rex = re.compile(pattern, re.IGNORECASE if ignore_case else 0)
            preds.append(lambda t: rex.fullmatch(t) is not None)
    return lambda toks: toks


def _tf_stemmer_override(cfg: dict, state: dict | None = None):
    """stemmer_override (StemmerOverrideTokenFilterFactory): ``rules``
    of the form ``token => stem`` applied verbatim; rewritten outputs
    are protected from downstream stemmers (the factory marks them as
    keywords). Protection is term-based: a surface form equal to an
    override output is also protected — acceptable for deterministic
    chains, documented here."""
    rules = cfg.get("rules") or ()
    mapping: dict[str, str] = {}
    for rule in rules:
        if "=>" not in rule:
            raise ValueError(f"invalid stemmer_override rule: {rule!r}")
        src, dst = rule.split("=>", 1)
        for s in src.split(","):
            mapping[s.strip()] = dst.strip()
    if state is not None:
        outs = frozenset(mapping.values()) | frozenset(mapping)
        state.setdefault("protected_preds", []).append(
            lambda t: t in outs)

    def apply(toks):
        return [(mapping.get(t, t), p) for t, p in toks]
    return apply


def _tf_keyword_repeat(cfg: dict, state: dict | None = None):
    """keyword_repeat (KeywordRepeatFilter): downstream stemmers emit
    the original term next to the stem at the same position; combine
    with ``remove_duplicates`` to drop the copy when the stem equals
    the original. Implemented as a chain-state flag (the duplicate is
    materialized by the stemmer itself, so non-stemmer filters in
    between see a single stream — faithful for the canonical
    keyword_repeat → stemmer → remove_duplicates chain)."""
    if state is not None:
        state["repeat"] = True
    return lambda toks: toks


def _tf_remove_duplicates(cfg: dict):
    """remove_duplicates (RemoveDuplicatesTokenFilterFactory): drop
    tokens identical in term AND position to an already-emitted one."""
    def apply(toks):
        seen = set()
        out = []
        for t, p in toks:
            if (t, p) not in seen:
                seen.add((t, p))
                out.append((t, p))
        return out
    return apply


_tf_stemmer.wants_state = True
_tf_keyword_marker.wants_state = True
_tf_stemmer_override.wants_state = True
_tf_keyword_repeat.wants_state = True


_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF),          # Han
    (0x3040, 0x309F),                            # Hiragana
    (0x30A0, 0x30FF), (0x31F0, 0x31FF),          # Katakana
    (0xAC00, 0xD7AF), (0x1100, 0x11FF),          # Hangul
)


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _tf_cjk_bigram(cfg: dict):
    """``cjk_bigram`` filter (CJKBigramFilterFactory / Lucene
    CJKBigramFilter): adjacent CJK tokens are buffered into a character
    run and re-emitted as overlapping character bigrams — the standard
    CJK search strategy (per-char Han tokens '日','本','語' become
    '日本','本語'; a whole-run Katakana token 'テスト' becomes
    'テス','スト'). A lone CJK char is emitted as a unigram only when
    ``output_unigrams`` (default false — then it passes through as
    itself, Lucene emits the single char either way). Non-CJK tokens
    pass through. Positions are renumbered sequentially (posInc=1 per
    emitted token), matching the filter's position-increment stream.
    Runs split at offset gaps ('日本語 テスト' does NOT pair 語テ) — the
    analyzer passes per-token contiguity via `glue` (offset attribute
    analogue); direct calls without glue fall back to position
    adjacency."""
    out_uni = bool(cfg.get("output_unigrams", False))

    def apply(toks, glue=None):
        out = []

        def flush(run):
            chars = "".join(t for t, _ in run)
            if len(chars) == 1:
                out.append(chars)
            else:
                if out_uni:
                    out.extend(chars)
                out.extend(chars[i:i + 2]
                           for i in range(len(chars) - 1))

        run: list = []
        last_pos = None
        for t, p in toks:
            if t and all(_is_cjk(c) for c in t):
                if run and last_pos is not None and (
                        p != last_pos + 1
                        or (glue is not None and not glue.get(p, False))):
                    flush(run)
                    run = []
                run.append((t, p))
                last_pos = p
            else:
                if run:
                    flush(run)
                    run = []
                    last_pos = None
                out.append(t)
        if run:
            flush(run)
        return [(t, i) for i, t in enumerate(out)]
    apply.wants_glue = True
    return apply


def _tf_synonym(cfg: dict):
    """``synonym`` / ``synonym_graph`` filter, Solr rule format, single-token
    rules only (SynonymTokenFilterFactory). Equivalence rules ``a, b``
    expand each member to the whole set at the same position; explicit
    rules ``a, b => c, d`` replace the LHS with the RHS terms. Multi-word
    rules raise — the flattened-graph pitfalls they carry are exactly why
    the reference recommends query-time synonym_graph, and single-token
    rules cover the query-time use."""
    mapping = parse_synonyms(cfg.get("synonyms", []),
                             expand=bool(cfg.get("expand", True)))

    def apply(toks):
        out = []
        for t, p in toks:
            repl = mapping.get(t)
            if repl is None:
                out.append((t, p))
            else:
                seen = set()
                for r in repl:
                    if r not in seen:
                        seen.add(r)
                        out.append((r, p))
        return out
    return apply


def parse_synonyms(rules: list[str], expand: bool = True) -> dict[str, list[str]]:
    """Solr synonym rules → term → emitted terms (all at posIncrement 0)."""
    mapping: dict[str, list[str]] = {}
    for rule in rules:
        if "=>" in rule:
            lhs, _, rhs = rule.partition("=>")
            targets = [w.strip() for w in rhs.split(",") if w.strip()]
            sources = [w.strip() for w in lhs.split(",") if w.strip()]
        else:
            members = [w.strip() for w in rule.split(",") if w.strip()]
            if not expand:
                # contract to the first member (SynonymMap expand=false)
                sources, targets = members, [members[0]]
            else:
                sources, targets = members, members
        for w in sources + targets:
            if " " in w:
                raise ValueError(
                    f"multi-word synonym rule not supported: {rule!r}")
        for s in sources:
            mapping[s] = list(targets)
    return mapping


def _tf_shingle(cfg: dict):
    """``shingle`` filter (ShingleTokenFilterFactory): emits word n-grams of
    [min_shingle_size, max_shingle_size] joined by token_separator; each
    shingle takes its first member's position; unigrams kept by default.
    Position holes left by an upstream stop filter are occupied by
    ``filler_token`` ('_'), matching Lucene — shingles never silently glue
    across a removed stopword."""
    mn = int(cfg.get("min_shingle_size", 2))
    mx = int(cfg.get("max_shingle_size", 2))
    sep = cfg.get("token_separator", " ")
    filler = cfg.get("filler_token", "_")
    unigrams = bool(cfg.get("output_unigrams", True))

    def apply(toks):
        # materialize holes as filler pseudo-tokens
        seq: list[tuple[str, int, bool]] = []
        prev = None
        for t, p in toks:
            if prev is not None and p > prev + 1:
                seq.extend((filler, fp, False) for fp in range(prev + 1, p))
            seq.append((t, p, True))
            prev = p
        out = []
        for i, (t, p, real) in enumerate(seq):
            if unigrams and real:
                out.append((t, p))
            for size in range(mn, mx + 1):
                window = seq[i:i + size]
                if len(window) == size and any(r for _, _, r in window):
                    out.append((sep.join(w for w, _, _ in window), p))
        return out
    return apply


def _tf_edge_ngram(cfg: dict):
    # EdgeNGramTokenFilterFactory — grams keep the source token's position
    mn = int(cfg.get("min_gram", 1))
    mx = int(cfg.get("max_gram", 2))

    def apply(toks):
        return [(t[:k], p) for t, p in toks
                for k in range(mn, min(mx, len(t)) + 1)]
    return apply


def _tf_ngram(cfg: dict):
    mn = int(cfg.get("min_gram", 1))
    mx = int(cfg.get("max_gram", 2))

    def apply(toks):
        return [(t[i:i + k], p) for t, p in toks
                for k in range(mn, mx + 1)
                for i in range(0, len(t) - k + 1)]
    return apply


def _tf_length(cfg: dict):
    mn = int(cfg.get("min", 0))
    mx = int(cfg.get("max", 2 ** 31 - 1))
    return lambda toks: [(t, p) for t, p in toks if mn <= len(t) <= mx]


def _tf_trim(cfg: dict):
    return lambda toks: [(t.strip(), p) for t, p in toks]


def _tf_truncate(cfg: dict):
    n = int(cfg.get("length", 10))
    return lambda toks: [(t[:n], p) for t, p in toks]


def _tf_unique(cfg: dict):
    only_same_pos = bool(cfg.get("only_on_same_position", False))

    def apply(toks):
        out, seen = [], set()
        for t, p in toks:
            key = (t, p) if only_same_pos else t
            if key not in seen:
                seen.add(key)
                out.append((t, p))
        return out
    return apply


def _tf_reverse(cfg: dict):
    return lambda toks: [(t[::-1], p) for t, p in toks]


def _lazy_word_delimiter(cfg: dict):
    from sparksearch.worddelim import word_delimiter_filter
    return word_delimiter_filter(cfg)


def _lazy_norm(name: str):
    def factory(cfg: dict):
        from sparksearch import normfilters
        return getattr(normfilters, f"{name}_filter")(cfg)
    return factory


def _lazy_mgmt(name: str):
    def factory(cfg: dict):
        from sparksearch import tokenmgmt
        return getattr(tokenmgmt, f"{name}_filter")(cfg)
    return factory


def _tf_pattern_replace(cfg: dict):
    """``pattern_replace`` TOKEN filter (PatternReplaceTokenFilterFactory):
    regex rewrite applied per token; ``all`` (default true) selects
    replaceAll vs replaceFirst. Java ``$N`` group refs supported.
    Documented deviation: Lucene's PatternReplaceFilter keeps a token
    whose term was rewritten to "" — this chain drops empty terms at
    assembly (an empty posting term is never useful), but the original
    POSITIONS of surviving tokens are preserved, so phrase/span
    semantics across the gap match the reference."""
    rx = re.compile(cfg["pattern"])
    repl = _java_repl(cfg.get("replacement", ""))
    count = 0 if cfg.get("all", True) else 1
    return lambda toks: [(rx.sub(repl, t, count=count), p)
                         for t, p in toks]


def _tf_legacy_snowball(language: str):
    """Fixed-language legacy stem filters — ``dutch_stem`` /
    ``french_stem`` / ``russian_stem`` are SetKeywordMarkerFilter(
    stem_exclusion) + SnowballFilter(language) in the reference
    (modules/analysis-common/.../DutchStemTokenFilterFactory.java,
    FrenchStemTokenFilterFactory.java, RussianStemTokenFilterFactory.java).
    Honors both the chain's keyword state (earlier keyword_marker /
    keyword_repeat) and the factory-local ``stem_exclusion`` list."""
    def factory(cfg: dict, state: dict | None = None):
        from sparksearch.stemmers import LANGUAGE_STEMMERS
        fn = LANGUAGE_STEMMERS[language]
        st = dict(state or {})
        preds = list(st.get("protected_preds", ()))
        excl = cfg.get("stem_exclusion") or ()
        if excl:
            exset = frozenset(excl)
            preds.append(lambda t: t in exset)
        st["protected_preds"] = preds
        return _keyword_aware_stem(fn, st)
    factory.wants_state = True
    return factory


def _tf_unsupported(name: str, why: str):
    """Registered-but-refused filter names: the reference exposes them
    but their algorithm cannot be faithfully re-derived from public
    specs available here; raise loudly with the nearest supported
    alternative rather than silently approximate."""
    def factory(cfg: dict):
        raise NotImplementedError(f"token filter {name!r}: {why}")
    return factory


_TOKEN_FILTERS = {
    "lowercase": _tf_lowercase,
    "uppercase": _tf_uppercase,
    "asciifolding": _tf_asciifolding,
    "stop": _tf_stop,
    "stemmer": _tf_stemmer,
    "porter_stem": _tf_stemmer,
    "snowball": _tf_stemmer,
    "synonym": _tf_synonym,
    "synonym_graph": _tf_synonym,
    "shingle": _tf_shingle,
    "edge_ngram": _tf_edge_ngram,
    "ngram": _tf_ngram,
    "length": _tf_length,
    "trim": _tf_trim,
    "truncate": _tf_truncate,
    "unique": _tf_unique,
    "reverse": _tf_reverse,
    "cjk_bigram": _tf_cjk_bigram,
    "word_delimiter": _lazy_word_delimiter,
    "word_delimiter_graph": _lazy_word_delimiter,
    "elision": _lazy_norm("elision"),
    "cjk_width": _lazy_norm("cjk_width"),
    "decimal_digit": _lazy_norm("decimal_digit"),
    "arabic_normalization": _lazy_norm("arabic_normalization"),
    "german_normalization": _lazy_norm("german_normalization"),
    "persian_normalization": _lazy_norm("persian_normalization"),
    "scandinavian_normalization": _lazy_norm("scandinavian_normalization"),
    "scandinavian_folding": _lazy_norm("scandinavian_folding"),
    "apostrophe": _lazy_norm("apostrophe"),
    "classic": _lazy_norm("classic"),
    "serbian_normalization": _lazy_norm("serbian_normalization"),
    "hindi_normalization": _lazy_norm("hindi_normalization"),
    "sorani_normalization": _lazy_norm("sorani_normalization"),
    "concatenate_graph": _lazy_norm("concatenate_graph"),
    "icu_normalizer": _lazy_norm("icu_normalizer"),
    "icu_folding": _lazy_norm("icu_folding"),
    # legacy fixed-language stem filter names that map onto light-family
    # stemmers this engine implements (ArabicStemFilter IS the Larkey
    # light stemmer; CzechStemmer IS the Dolamic-Savoy light stemmer)
    "arabic_stem": lambda cfg: _tf_stemmer({"language": "arabic"}),
    "czech_stem": lambda cfg: _tf_stemmer({"language": "czech"}),
    # legacy snowball-backed stem names (SnowballFilter in the reference
    # factories; stem_exclusion honored)
    "dutch_stem": _tf_legacy_snowball("dutch"),
    "french_stem": _tf_legacy_snowball("french"),
    "russian_stem": _tf_legacy_snowball("russian"),
    # registered names whose Lucene algorithm is distinct from anything
    # re-derivable here from public specs — refuse loudly with guidance
    "german_stem": _tf_unsupported(
        "german_stem",
        "Lucene GermanStemFilter implements the Caumanns algorithm, "
        "distinct from both Snowball German and the Savoy light stemmer;"
        " use {'type':'stemmer','language':'german'} (Snowball) or "
        "'light_german' (Savoy) instead"),
    "brazilian_stem": _tf_unsupported(
        "brazilian_stem",
        "Lucene BrazilianStemmer is an RSLP-derived rule set with its "
        "own tables; use {'type':'stemmer','language':'portuguese'} "
        "(Snowball) or 'light_portuguese'/'minimal_portuguese' instead"),
    "kstem": _tf_unsupported(
        "kstem",
        "KStem is a dictionary-driven stemmer (Krovetz); the dictionary "
        "is not re-derivable — use 'english' (Porter) or 'porter2' "
        "(Snowball English) instead"),
    "bengali_normalization": _tf_unsupported(
        "bengali_normalization",
        "Lucene BengaliNormalizer's rule tables are not re-derivable "
        "from public specs available here"),
    "indic_normalization": _tf_unsupported(
        "indic_normalization",
        "Lucene IndicNormalizer's script decomposition tables are not "
        "re-derivable from public specs available here"),
    "pattern_replace": _tf_pattern_replace,
    "keyword_marker": _tf_keyword_marker,
    "stemmer_override": _tf_stemmer_override,
    "keyword_repeat": _tf_keyword_repeat,
    "remove_duplicates": _tf_remove_duplicates,
    "limit": _lazy_mgmt("limit"),
    "keep": _lazy_mgmt("keep"),
    "keep_types": _lazy_mgmt("keep_types"),
    "common_grams": _lazy_mgmt("common_grams"),
    "fingerprint": _lazy_mgmt("fingerprint"),
    "pattern_capture": _lazy_mgmt("pattern_capture"),
    "multiplexer": _lazy_mgmt("multiplexer"),
    "min_hash": _lazy_mgmt("min_hash"),
}


def _lazy_ext(name: str):
    def factory(cfg: dict):
        from sparksearch.filters_ext import FILTERS_EXT
        return FILTERS_EXT[name](cfg)
    return factory


for _n in ("dictionary_decompounder", "hyphenation_decompounder",
           "condition", "predicate_token_filter", "delimited_payload",
           "delimited_payload_filter", "flatten_graph", "phonetic"):
    _TOKEN_FILTERS[_n] = _lazy_ext(_n)

# ---------------------------------------------------------------------------
# analyzer assembly
# ---------------------------------------------------------------------------


def _resolve(spec, table: dict, named: dict, kind: str,
             state: dict | None = None):
    """A component spec is a built-in name, a reference to a named
    definition in the settings block, or an inline definition dict.
    ``state`` is the per-analyzer chain state threaded into factories
    that declare ``wants_state`` (keyword_marker / stemmer_override /
    keyword_repeat coordination with stemmers, in chain order)."""
    if isinstance(spec, str):
        if spec in named:
            spec = named[spec]
        else:
            if spec not in table:
                raise ValueError(f"unknown {kind}: {spec!r}")
            fac = table[spec]
            if getattr(fac, "wants_state", False):
                return fac({}, state)
            return fac({})
    typ = spec.get("type")
    if typ not in table:
        raise ValueError(f"unknown {kind} type: {typ!r}")
    fac = table[typ]
    if getattr(fac, "wants_state", False):
        return fac(spec, state)
    return fac(spec)


def _spec_name(spec) -> str:
    """Display name of a component spec for the _analyze explain detail:
    a referenced name stays itself; an inline definition is
    ``__anonymous__<type>`` (AnalysisRegistry.java:156)."""
    if isinstance(spec, str):
        return spec
    return "__anonymous__" + str(spec.get("type"))


class CustomAnalyzer:
    """char_filter* → tokenizer → filter* (CustomAnalyzerProvider)."""

    def __init__(self, settings: dict,
                 named_filters: dict | None = None,
                 named_char_filters: dict | None = None,
                 named_tokenizers: dict | None = None):
        nf = named_filters or {}
        ncf = named_char_filters or {}
        ntk = named_tokenizers or {}
        #: JSON-serializable definition — persisted into the index's
        #: meta.json (analyzer_def) so a fresh session reading the index
        #: can re-register the analyzer (AnalysisRegistry from settings)
        self.definition = {
            "settings": {k: settings[k] for k in
                         ("char_filter", "tokenizer", "filter")
                         if k in settings},
            "named_filters": nf, "named_char_filters": ncf,
            "named_tokenizers": ntk,
        }
        self.char_filters = [
            _resolve(cf, _CHAR_FILTERS, ncf, "char_filter")
            for cf in settings.get("char_filter", [])]
        self.char_filter_names = [
            _spec_name(cf) for cf in settings.get("char_filter", [])]
        self.tokenizer = _resolve(settings.get("tokenizer", "standard"),
                                  _TOKENIZERS, ntk, "tokenizer")
        self.tokenizer_name = _spec_name(settings.get("tokenizer",
                                                      "standard"))
        chain_state: dict = {}
        self.filters = [_resolve(f, _TOKEN_FILTERS, nf, "filter",
                                 chain_state)
                        for f in settings.get("filter", [])]
        self.filter_names = [
            _spec_name(f) for f in settings.get("filter", [])]

    def _tokenize(self, s: str):
        """Run the tokenizer; returns (toks, glue) where toks is a list
        of (term, pos) and glue maps original token index → whether the
        token starts exactly where its predecessor ended in the
        char-filtered text (Lucene's offset attribute — needed by
        cjk_bigram to avoid pairing across whitespace)."""
        raw = self.tokenizer(s)
        if getattr(self.tokenizer, "emits_positions", False):
            # tokenizer returned (term, pos) pairs directly
            # (path_hierarchy stacks every prefix at position 0)
            toks = list(raw)
            raw = [t for t, _ in toks]
        else:
            toks = [(t, i) for i, t in enumerate(raw)]
        glue = None
        if any(getattr(f, "wants_glue", False) for f in self.filters):
            # Cursor-find recovers offsets because tokenizers emit
            # in-order substrings; a non-substring token (pattern
            # groups) yields glue=False.
            glue = {}
            low = s.lower()
            cur = 0
            prev_end = None
            for i, t in enumerate(raw):
                j = low.find(t.lower(), cur)
                if j < 0:
                    prev_end = None
                    continue
                glue[i] = prev_end == j
                prev_end = j + len(t)
                cur = j + len(t)
        return toks, glue

    def analyze(self, text: str):
        from sparksearch.analysis import MAX_TOKEN_LENGTH, Token
        s = text or ""
        for cf in self.char_filters:
            s = cf(s)
        toks, glue = self._tokenize(s)
        for f in self.filters:
            if getattr(f, "wants_glue", False):
                toks = f(toks, glue)
            else:
                toks = f(toks)
        return [Token(t[:MAX_TOKEN_LENGTH], p) for t, p in toks if t]

    def analyze_detail(self, text: str) -> dict:
        """``_analyze`` with ``explain: true`` — the DetailAnalyzeResponse
        shape (TransportAnalyzeAction.detailAnalyze): the char-filtered
        text after each char filter, the tokenizer's stream, then the
        stream after EACH token filter stage. Inline component specs are
        named ``__anonymous__<type>`` like AnalysisRegistry does."""
        from sparksearch.analysis import MAX_TOKEN_LENGTH, Token

        def stage(toks):
            return [Token(t[:MAX_TOKEN_LENGTH], p) for t, p in toks if t]

        s = text or ""
        charfilters = []
        for cf, nm in zip(self.char_filters, self.char_filter_names):
            s = cf(s)
            charfilters.append({"name": nm, "filtered_text": [s]})
        toks, glue = self._tokenize(s)
        detail = {
            "custom_analyzer": True,
            "charfilters": charfilters,
            "tokenizer": {"name": self.tokenizer_name,
                          "tokens": stage(toks)},
            "tokenfilters": [],
        }
        for f, nm in zip(self.filters, self.filter_names):
            toks = f(toks, glue) if getattr(f, "wants_glue", False) \
                else f(toks)
            detail["tokenfilters"].append({"name": nm,
                                           "tokens": stage(toks)})
        return detail


def analyze_explain(analyzer: str, text: str) -> dict:
    """``_analyze`` with ``explain: true``. Custom analyzers return the
    per-stage DetailAnalyzeResponse; prebuilt analyzers return the
    non-custom branch shape (TransportAnalyzeAction.detailAnalyze):
    ``{"custom_analyzer": false, "analyzer": {"name", "tokens"}}``."""
    an = get_custom(analyzer)
    if an is not None:
        return an.analyze_detail(text)
    from sparksearch.analysis import analyze
    return {"custom_analyzer": False,
            "analyzer": {"name": analyzer,
                         "tokens": analyze(text or "", analyzer)}}


def register_analyzer(name: str, settings: dict, **named) -> CustomAnalyzer:
    """Register one custom analyzer under `name` for use anywhere an
    analyzer name is accepted (Match.analyzer, build_index(analyzer=...),
    the _analyze API)."""
    an = CustomAnalyzer(settings, **named)
    _REGISTRY[name] = an
    return an


def ensure_registered(name: str, definition: dict | None) -> "CustomAnalyzer | None":
    """Re-register an analyzer from its persisted meta.json definition if
    this session hasn't seen it yet (index open path)."""
    if name in _REGISTRY:
        return _REGISTRY[name]
    if not definition:
        return None
    return register_analyzer(
        name, definition.get("settings", {}),
        named_filters=definition.get("named_filters"),
        named_char_filters=definition.get("named_char_filters"),
        named_tokenizers=definition.get("named_tokenizers"))


def register_analysis(analysis: dict) -> list[str]:
    """Register a whole index-settings ``analysis`` block: named filters /
    char_filters / tokenizers are resolvable by name from each analyzer
    definition, exactly like the reference's settings JSON."""
    nf = analysis.get("filter", {})
    ncf = analysis.get("char_filter", {})
    ntk = analysis.get("tokenizer", {})
    out = []
    for name, spec in analysis.get("analyzer", {}).items():
        if spec.get("type", "custom") != "custom":
            raise ValueError(f"analyzer {name!r}: only type=custom supported")
        register_analyzer(name, spec, named_filters=nf,
                          named_char_filters=ncf, named_tokenizers=ntk)
        out.append(name)
    return out
