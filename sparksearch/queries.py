"""Query AST — the engine's logical IR.

Mirrors the reference query DSL's leaf + compound queries
(registered at /root/reference/server/src/main/java/org/opensearch/search/SearchModule.java:1112-1174),
with the normalization rules the reference applies driver-side:

- ``match`` analyzes text with the field's analyzer and produces OR
  (Occur.SHOULD, sv/index/search/MatchQuery.java:181) or AND of term queries;
  zero analyzed terms → match_none (zero_terms_query NONE, MatchQuery.java:204).
- ``bool`` combines must/filter (AND, filter unscored), should (OR),
  must_not (exclusion); pure-negative bool gets an implicit match_all
  (BoolQueryBuilder.java:85,336).
- ``minimum_should_match`` int / percentage / negative forms
  (sv/common/lucene/search/Queries.java:138-192).
- ``match_phrase`` default slop 0 (MatchQuery.java:171).

These dataclasses are backend-independent: executed by the NumPy oracle
(oracle.py) and by the Spark planner (exec.py); rank-identity between the two
is the correctness gate.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class Query:
    """Marker base class."""


@dataclass(frozen=True)
class MatchAll(Query):
    pass


@dataclass(frozen=True)
class MatchNone(Query):
    pass


@dataclass(frozen=True)
class Match(Query):
    field_name: str
    text: str
    operator: str = "or"            # 'or' | 'and' (MatchQuery default SHOULD)
    minimum_should_match: str | int | None = None
    analyzer: str = "standard"


@dataclass(frozen=True)
class MatchPhrase(Query):
    field_name: str
    text: str
    slop: int = 0
    analyzer: str = "standard"


@dataclass(frozen=True)
class Term(Query):
    field_name: str
    value: object


@dataclass(frozen=True)
class Terms(Query):
    field_name: str
    values: tuple


@dataclass(frozen=True)
class Range(Query):
    field_name: str
    gte: object = None
    gt: object = None
    lte: object = None
    lt: object = None


@dataclass(frozen=True)
class Exists(Query):
    field_name: str


@dataclass(frozen=True)
class Prefix(Query):
    field_name: str
    value: str


@dataclass(frozen=True)
class Ids(Query):
    values: tuple


@dataclass
class Bool(Query):
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)
    filter: list = field(default_factory=list)
    minimum_should_match: str | int | None = None


def calculate_min_should_match(n_optional: int, spec: str | int | None,
                               has_required: bool) -> int:
    """Queries.calculateMinShouldMatch semantics (Queries.java:138-192).

    Default: 0 when must/filter clauses exist, else 1 (BooleanQuery default).
    Supports int, negative int ("all but n"), and percentage forms.
    """
    if spec is None:
        return 0 if has_required else (1 if n_optional > 0 else 0)
    if isinstance(spec, int):
        result = n_optional + spec if spec < 0 else spec
    else:
        s = str(spec).strip()
        if s.endswith("%"):
            pct = int(s[:-1])
            if pct < 0:
                result = n_optional + int(n_optional * pct / 100.0)
            else:
                result = int(n_optional * pct / 100.0)
        else:
            v = int(s)
            result = n_optional + v if v < 0 else v
    # No upper clamp: msm greater than the number of optional clauses is
    # unsatisfiable and must match nothing (BooleanQuery semantics).
    return max(0, result)
