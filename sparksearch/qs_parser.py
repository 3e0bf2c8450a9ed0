"""query_string mini-language parser → query AST.

The reference parses the Lucene query language on the coordinator
(sv/index/query/QueryStringQueryBuilder.java,
sv/index/search/QueryStringQueryParser.java) into a bool tree. This is the
driver-side equivalent for the common subset:

  hash join              → bool(should=[match hash, match join])   (OR default)
  hash AND join          → bool(must=[match hash, match join])
  +hash join -error      → bool(must=[hash], should=[join], must_not=[error])
  "table scan"           → match_phrase
  lang:en                → term query on a keyword field
  (a AND b) OR c         → nested bool
  NOT x                  → must_not

Grammar (OR binds loosest; AND joins adjacent clauses into musts; +/-/NOT
are clause modifiers):

  expr   := alt (OR alt)*
  alt    := clause+            # AND between two clauses → both must
  clause := [+|-|NOT] atom
  atom   := '(' expr ')' | '"' words '"' | field ':' word | word
"""

from __future__ import annotations

import re

from sparksearch.queries import (
    Bool, Fuzzy, Match, MatchPhrase, Prefix, Query, Regexp, Term,
    TextPrefix, Wildcard,
)

__all__ = ["parse_query_string"]

_TOKEN_RE = re.compile(r'"[^"]*"|\(|\)|[^\s()"]+')

#: fields treated as keyword doc-values (exact term match); anything else
#: routed to the analyzed text field
_KEYWORD_FIELDS = {"lang", "url"}


def _tokenize(s: str) -> list[str]:
    return _TOKEN_RE.findall(s)


class _Parser:
    def __init__(self, toks: list[str], default_field: str = "text"):
        self.toks = toks
        self.i = 0
        self.default_field = default_field

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_expr(self) -> Query:
        alts = [self.parse_alt()]
        while self.peek() in ("OR", "|", "||"):
            self.next()
            alts.append(self.parse_alt())
        if len(alts) == 1:
            return alts[0]
        return Bool(should=alts, minimum_should_match=1)

    def parse_alt(self) -> Query:
        # collect (modifier, atom) clauses; AND forces both sides to must
        clauses: list[tuple[str, Query]] = []
        force_next_must = False
        while True:
            t = self.peek()
            if t is None or t in ("OR", "|", "||", ")"):
                break
            if t in ("AND", "&&"):
                self.next()
                if clauses:
                    m, a = clauses[-1]
                    clauses[-1] = ("+" if m == "" else m, a)
                force_next_must = True
                continue
            mod = ""
            if t in ("NOT",):
                self.next()
                mod = "-"
                t = self.peek()
                if t is None:
                    break
            elif t.startswith("-") and len(t) > 1 and t != "-":
                mod = "-"
                self.toks[self.i] = t[1:]
            elif t.startswith("+") and len(t) > 1:
                mod = "+"
                self.toks[self.i] = t[1:]
            atom = self.parse_atom()
            if force_next_must and mod == "":
                mod = "+"
            force_next_must = False
            clauses.append((mod, atom))
        must = [a for m, a in clauses if m == "+"]
        should = [a for m, a in clauses if m == ""]
        must_not = [a for m, a in clauses if m == "-"]
        if len(clauses) == 1 and should:
            return should[0]
        return Bool(must=must, should=should, must_not=must_not)

    def parse_atom(self) -> Query:
        t = self.next()
        if t == "(":
            inner = self.parse_expr()
            if self.peek() == ")":
                self.next()
            return inner
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            return MatchPhrase(self.default_field, t[1:-1])
        if ":" in t:
            fld, val = t.split(":", 1)
            if fld in _KEYWORD_FIELDS:
                # wildcard on a keyword field: only the trailing-star
                # prefix form (QueryStringQueryParser getWildcardQuery)
                if val.endswith("*") and "*" not in val[:-1] \
                        and "?" not in val:
                    return Prefix(fld, val[:-1])
                return Term(fld, val)
            return self._text_atom(val)
        return self._text_atom(t)

    def _text_atom(self, val: str) -> Query:
        """Multi-term token forms on the analyzed field — the reference
        expands these over the term dictionary
        (QueryStringQueryParser getFuzzyQuery/getWildcardQuery/
        getRegexpQuery); matching them as analyzed text would silently
        strip the operators and query the wrong terms."""
        m = re.fullmatch(r"(.+?)~(\d*)", val)
        if m:
            base = m.group(1)
            if m.group(2):
                fz = int(m.group(2))
            else:  # bare ~ = AUTO ladder (Fuzziness.java)
                n = len(base)
                fz = 0 if n < 3 else (1 if n <= 5 else 2)
            return Fuzzy(self.default_field, base, fuzziness=fz)
        if val.startswith("/") and val.endswith("/") and len(val) > 2:
            return Regexp(self.default_field, val[1:-1])
        if "*" in val or "?" in val:
            if val.endswith("*") and "*" not in val[:-1] and "?" not in val:
                return TextPrefix(self.default_field, val[:-1])
            return Wildcard(self.default_field, val)
        return Match(self.default_field, val)


def parse_query_string(s: str, default_field: str = "text") -> Query:
    p = _Parser(_tokenize(s), default_field)
    return p.parse_expr()
