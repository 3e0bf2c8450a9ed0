"""Token-management filters: limit / keep / keep_types / common_grams /
fingerprint / pattern_capture / multiplexer / min_hash.

Reference registrations: ``CommonAnalysisModulePlugin.java:259-305``
(CommonGramsTokenFilterFactory, FingerprintTokenFilterFactory,
KeepWordFilterFactory, KeepTypesFilterFactory,
LimitTokenCountFilterFactory, MinHashTokenFilterFactory,
MultiplexerTokenFilterFactory, PatternCaptureGroupTokenFilterFactory).

Token *types* are not carried through this engine's (term, pos) stream;
``keep_types`` derives the UAX#29 type from the term's content
(all-digit → ``<NUM>``, Han → ``<IDEOGRAPHIC>``, Hiragana/Katakana →
``<HIRAGANA>``/``<KATAKANA>``, Hangul → ``<HANGUL>``, else
``<ALPHANUM>``) — equivalent for the standard tokenizer, which assigns
types from the same character classes.

``min_hash`` reproduces the documented bucket semantics of Lucene's
MinHashFilter (single 64-bit hash split into ``bucket_count`` range
buckets, min kept per bucket, ``with_rotation`` filling empty buckets
from the next non-empty one) using this engine's xxhash64 — fingerprint
token BYTES therefore differ from Lucene's (which uses murmur3-128),
while the LSH property (equal streams → equal fingerprints, Jaccard
preserved in expectation) is the same.
"""

from __future__ import annotations

import re

from sparksearch.xxhash import xxhash64


def limit_filter(cfg: dict):
    max_count = int(cfg.get("max_token_count", 1))

    def apply(toks):
        # keep tokens occupying the first max_count positions (stacked
        # tokens at a kept position are all kept, like Lucene's
        # one-increment-per-position counting)
        out = []
        seen_pos: list[int] = []
        for t, p in toks:
            if p not in seen_pos:
                if len(seen_pos) >= max_count:
                    break
                seen_pos.append(p)
            out.append((t, p))
        return out
    return apply


def keep_filter(cfg: dict):
    words = cfg.get("keep_words") or ()
    lower = bool(cfg.get("keep_words_case", False))
    keep = frozenset(w.lower() for w in words) if lower \
        else frozenset(words)

    def apply(toks):
        return [(t, p) for t, p in toks
                if (t.lower() if lower else t) in keep]
    return apply


_NUM_RE = re.compile(r"[0-9]+([.,][0-9]+)*")


def _uax_type(t: str) -> str:
    if _NUM_RE.fullmatch(t):
        return "<NUM>"
    cps = [ord(c) for c in t]
    if all(0x4E00 <= c <= 0x9FFF or 0x3400 <= c <= 0x4DBF for c in cps):
        return "<IDEOGRAPHIC>"
    if all(0x3040 <= c <= 0x309F for c in cps):
        return "<HIRAGANA>"
    if all(0x30A0 <= c <= 0x30FF or 0x31F0 <= c <= 0x31FF for c in cps):
        return "<KATAKANA>"
    if all(0xAC00 <= c <= 0xD7AF or 0x1100 <= c <= 0x11FF for c in cps):
        return "<HANGUL>"
    return "<ALPHANUM>"


def keep_types_filter(cfg: dict):
    types = frozenset(cfg.get("types") or ())
    exclude = cfg.get("mode", "include") == "exclude"

    def apply(toks):
        return [(t, p) for t, p in toks
                if (_uax_type(t) in types) != exclude]
    return apply


def common_grams_filter(cfg: dict):
    """CommonGramsFilter: a token adjacent to a common word additionally
    emits the joined bigram ``a_b`` stacked at the first member's
    position; ``query_mode`` drops the unigram common words."""
    words = cfg.get("common_words") or ()
    ignore_case = bool(cfg.get("ignore_case", False))
    query_mode = bool(cfg.get("query_mode", False))
    common = frozenset(w.lower() for w in words) if ignore_case \
        else frozenset(words)

    def is_common(t: str) -> bool:
        return (t.lower() if ignore_case else t) in common

    def apply(toks):
        out = []
        for i, (t, p) in enumerate(toks):
            nxt = toks[i + 1] if i + 1 < len(toks) else None
            gram = None
            if nxt is not None and nxt[1] == p + 1 \
                    and (is_common(t) or is_common(nxt[0])):
                gram = (f"{t}_{nxt[0]}", p)
            if not (query_mode and is_common(t)):
                out.append((t, p))
            if gram is not None:
                out.append(gram)
        return out
    return apply


def fingerprint_filter(cfg: dict):
    """FingerprintTokenFilter: sort + dedupe all terms, join with
    ``separator`` into ONE token at position 0; emit nothing when the
    result exceeds ``max_output_size`` (default 255)."""
    sep = cfg.get("separator", " ")
    max_size = int(cfg.get("max_output_size", 255))

    def apply(toks):
        if not toks:
            return []
        joined = sep.join(sorted({t for t, _ in toks}))
        if len(joined) > max_size:
            return []
        return [(joined, 0)]
    return apply


def pattern_capture_filter(cfg: dict):
    """PatternCaptureGroupTokenFilter: each pattern's capture groups are
    emitted as extra tokens stacked at the source token's position;
    ``preserve_original`` keeps the source token (default true)."""
    pats = [re.compile(p) for p in (cfg.get("patterns") or ())]
    preserve = bool(cfg.get("preserve_original", True))

    def apply(toks):
        out = []
        for t, p in toks:
            caps: list[str] = []
            for rex in pats:
                for m in rex.finditer(t):
                    if m.groups():
                        caps.extend(g for g in m.groups() if g)
                    else:
                        caps.append(m.group(0))
            emitted = set()
            if preserve or not caps:
                out.append((t, p))
                emitted.add(t)
            for c in caps:
                if c not in emitted:
                    out.append((c, p))
                    emitted.add(c)
        return out
    return apply


def multiplexer_filter(cfg: dict):
    """MultiplexerTokenFilter: run each token through every branch chain
    (comma-separated filter names), stack the distinct outputs at the
    token's position. ``preserve_original`` keeps the unfiltered term
    (default true). Branch names resolve against the built-in filter
    table; identity branch is spelled ``""`` in Lucene and is implied
    here by preserve_original."""
    from sparksearch import analysis_custom as AC
    branches = []
    for spec in (cfg.get("filters") or ()):
        chain = []
        for name in str(spec).split(","):
            name = name.strip()
            if not name:
                continue
            fac = AC._TOKEN_FILTERS.get(name)
            if fac is None:
                raise ValueError(f"multiplexer: unknown filter {name!r}")
            if getattr(fac, "wants_state", False):
                chain.append(fac({}, {}))
            else:
                chain.append(fac({}))
        branches.append(chain)
    preserve = bool(cfg.get("preserve_original", True))

    def apply(toks):
        out = []
        for t, p in toks:
            emitted = set()
            if preserve:
                out.append((t, p))
                emitted.add(t)
            for chain in branches:
                cur = [(t, p)]
                for f in chain:
                    cur = f(cur)
                for ct, _ in cur:
                    if ct and ct not in emitted:
                        out.append((ct, p))
                        emitted.add(ct)
        return out
    return apply


def min_hash_filter(cfg: dict):
    bucket_count = int(cfg.get("bucket_count", 512))
    hash_set_size = int(cfg.get("hash_set_size", 1))
    with_rotation = bool(cfg.get("with_rotation", hash_set_size == 1))
    span = (1 << 64) // bucket_count

    def apply(toks):
        mins: list[list[int]] = [[] for _ in range(bucket_count)]
        for t, _ in toks:
            # xxhash64 returns Spark-compatible signed 64-bit; bucket
            # arithmetic needs the unsigned value
            h = xxhash64(t.encode("utf-8")) & 0xFFFFFFFFFFFFFFFF
            b = min(h // span, bucket_count - 1)
            heap = mins[b]
            if h not in heap:
                heap.append(h)
                heap.sort()
                del heap[hash_set_size:]
        if with_rotation:
            # fill empty buckets from the next non-empty one (wrapping)
            filled = list(mins)
            for b in range(bucket_count):
                if not filled[b]:
                    for off in range(1, bucket_count):
                        src = mins[(b + off) % bucket_count]
                        if src:
                            filled[b] = src[:1]
                            break
            mins = filled
        out = []
        for b, heap in enumerate(mins):
            for h in heap:
                out.append((f"{b:03x}:{h:016x}", 0))
        return out
    return apply
