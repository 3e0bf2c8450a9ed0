"""word_delimiter / word_delimiter_graph token filters.

Re-implements the documented Lucene ``WordDelimiterGraphFilter`` semantics
(reference registration: ``CommonAnalysisModulePlugin.java:329-330``;
option parsing: ``WordDelimiterGraphTokenFilterFactory.java:68-110``):

- a token is split into *parts* at (a) runs of non-alphanumeric delimiter
  characters (always removed), (b) lower→Upper case transitions when
  ``split_on_case_change`` (with acronym handling: ``SDCard`` → ``SD Card``),
  (c) letter↔digit transitions when ``split_on_numerics``;
- ``stem_english_possessive`` strips a trailing ``'s`` from each part;
- ``generate_word_parts`` / ``generate_number_parts`` emit the individual
  alpha / numeric parts at consecutive positions;
- ``catenate_words`` / ``catenate_numbers`` emit maximal same-type runs
  joined together, ``catenate_all`` the full join, both stacked at the
  first part's position;
- ``preserve_original`` additionally emits the unsplit token at the first
  position;
- ``protected_words`` pass through unsplit.

Positions: the filter renumbers the whole stream — an input token that
emits k individual parts advances the position counter by k (minimum 1);
stacked outputs (catenations / original) do not advance it. Input tokens
that already share a position (e.g. synonym stacks) share the output base
position and advance by the widest member.
"""

from __future__ import annotations

# the positional increments here mirror Lucene's graph filter with
# posLength flattened (index-time semantics: posLength is not indexed)


def _char_type(ch: str) -> str:
    if ch.isdigit():
        return "D"
    if ch.isalpha():
        return "U" if ch.isupper() else "L"
    return "X"  # delimiter


def split_parts(token: str, split_case: bool,
                split_num: bool) -> list[tuple[str, str]]:
    """Split one token into (part, type) pairs, type 'W' (word) or 'N'
    (number). Delimiter characters never appear in parts."""
    # first cut at delimiter boundaries
    segs: list[str] = []
    cur = []
    for ch in token:
        if _char_type(ch) == "X":
            if cur:
                segs.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if cur:
        segs.append("".join(cur))

    parts: list[tuple[str, str]] = []
    for seg in segs:
        types = [_char_type(c) for c in seg]
        # boundary positions inside seg
        cuts = [0]
        for i in range(1, len(seg)):
            a, b = types[i - 1], types[i]
            if split_num and ((a == "D") != (b == "D")):
                cuts.append(i)
            elif split_case and a in ("L", "D") and b == "U":
                cuts.append(i)
            elif (split_case and a == "U" and b == "L"
                  and i >= 2 and types[i - 2] == "U"):
                # acronym run followed by a word: SDCard -> SD | Card
                cuts.append(i - 1)
        cuts.append(len(seg))
        seen = sorted(set(cuts))
        for s, e in zip(seen, seen[1:]):
            part = seg[s:e]
            if not part:
                continue
            ptype = "N" if all(t == "D" for t in types[s:e]) else "W"
            parts.append((part, ptype))

    return parts


def _strip_possessive(token: str) -> str:
    """Strip a trailing 's / ’s (WordDelimiterIterator.stripPossessive)."""
    if len(token) >= 2 and token[-1] in ("s", "S") \
            and token[-2] in ("'", "’", "＇"):
        return token[:-2]
    return token


def word_delimiter_filter(cfg: dict):
    gen_words = cfg.get("generate_word_parts", True)
    gen_nums = cfg.get("generate_number_parts", True)
    cat_words = cfg.get("catenate_words", False)
    cat_nums = cfg.get("catenate_numbers", False)
    cat_all = cfg.get("catenate_all", False)
    split_case = cfg.get("split_on_case_change", True)
    split_num = cfg.get("split_on_numerics", True)
    preserve = cfg.get("preserve_original", False)
    possessive = cfg.get("stem_english_possessive", True)
    protected = frozenset(cfg.get("protected_words", ()) or ())

    def one(token: str) -> tuple[list[tuple[str, int]], int]:
        """-> ([(term, rel_pos)], advance)"""
        if token in protected:
            return [(token, 0)], 1
        work = _strip_possessive(token) if possessive else token
        parts = split_parts(work, split_case, split_num)
        if len(parts) == 1 and parts[0][0] == token:
            return [(token, 0)], 1
        if not parts:
            # all-delimiter token: emit nothing, absorb the position
            return ([(token, 0)], 1) if preserve else ([], 0)

        out: list[tuple[str, int]] = []
        rel = 0
        part_pos: list[int] = []
        for part, ptype in parts:
            emit = gen_words if ptype == "W" else gen_nums
            part_pos.append(rel)
            if emit:
                out.append((part, rel))
                rel += 1
        advance = max(1, rel)

        if preserve and token:
            out.insert(0, (token, 0))
        if cat_all and len(parts) > 1:
            out.append(("".join(p for p, _ in parts), 0))
        if cat_words or cat_nums:
            i = 0
            while i < len(parts):
                j = i
                while j < len(parts) and parts[j][1] == parts[i][1]:
                    j += 1
                run = parts[i:j]
                want = cat_words if parts[i][1] == "W" else cat_nums
                if want and len(run) > 1:
                    out.append(("".join(p for p, _ in run),
                                part_pos[i]))
                i = j
        # single-part token whose text changed (e.g. "Neil's" -> "Neil")
        if len(parts) == 1 and not out:
            out.append((parts[0][0], 0))
        return out, advance

    def apply(toks):
        # group by input position so synonym stacks stay stacked
        out: list[tuple[str, int]] = []
        base = 0
        i = 0
        n = len(toks)
        while i < n:
            pos = toks[i][1]
            group = []
            while i < n and toks[i][1] == pos:
                group.append(toks[i][0])
                i += 1
            adv_max = 0
            for term in group:
                emitted, adv = one(term)
                out.extend((t, base + rp) for t, rp in emitted)
                adv_max = max(adv_max, adv)
            base += adv_max
        # stable order: position then insertion
        out.sort(key=lambda tp: tp[1])
        return out

    return apply
