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
    """analyzer=None (default) falls back to the index's analyzer — the
    reference defaults the search analyzer to the field's index analyzer
    (sv/index/mapper/TextFieldMapper.java:326-389).

    fuzziness: None = exact terms; int = max edit distance; "AUTO" = Lucene
    ladder by term length (0 for <3 chars, 1 for 3-5, 2 for >5 —
    sv/common/unit/Fuzziness.java). Each query term expands over the term
    dictionary and a doc scores the MAX over matched expansions per clause
    (top_terms_blended rewrite approximation, MatchQuery.java:291-342)."""
    field_name: str
    text: str
    operator: str = "or"            # 'or' | 'and' (MatchQuery default SHOULD)
    minimum_should_match: str | int | None = None
    analyzer: str | None = None
    fuzziness: int | str | None = None
    #: adjacent transposition counts as ONE edit (Damerau-Levenshtein) —
    #: the reference default (FuzzyQueryBuilder.java DEFAULT_TRANSPOSITIONS,
    #: Fuzziness is passed transpositions=true by MatchQuery.java:291-342)
    fuzzy_transpositions: bool = True
    #: per-query-term dictionary expansion cap, highest-df terms kept
    #: (Lucene FuzzyQuery.defaultMaxExpansions = 50)
    max_expansions: int = 50


@dataclass(frozen=True)
class MatchPhrase(Query):
    """slop: max total positional displacement (sum over terms of the
    distance from its exact in-phrase slot, anchored at the first term's
    position). slop=0 is the exact consecutive-position intersection;
    slop=2 admits a transposition, matching Lucene's two-term behavior
    (MatchQuery.java:171; SloppyPhraseMatcher semantics approximated by
    the displacement-sum rule — each anchor contributes sloppy weight
    1/(1+d) to the phrase frequency, like Lucene's sloppyFreq)."""
    field_name: str
    text: str
    slop: int = 0
    analyzer: str | None = None


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


@dataclass(frozen=True)
class Wildcard(Query):
    """`wildcard` — term-dictionary automaton scan (* and ?); docs matching
    any expanded term score a constant 1.0 (Lucene MultiTermQuery
    CONSTANT_SCORE rewrite — sv/index/query/WildcardQueryBuilder.java)."""
    field_name: str
    pattern: str


@dataclass(frozen=True)
class Regexp(Query):
    """`regexp` — anchored regex over the term dictionary, constant score
    (sv/index/query/RegexpQueryBuilder.java)."""
    field_name: str
    pattern: str


@dataclass(frozen=True)
class Fuzzy(Query):
    """`fuzzy` — edit-distance expansion over the term dictionary, constant
    score (sv/index/query/FuzzyQueryBuilder.java; prefix_length 0).
    transpositions=True (the reference default) uses Damerau-Levenshtein;
    max_expansions keeps the highest-df expansions (default 50)."""
    field_name: str
    value: str
    fuzziness: int = 2
    transpositions: bool = True
    max_expansions: int = 50


@dataclass(frozen=True)
class TextPrefix(Query):
    """`prefix` on an analyzed text field — dictionary expansion, constant
    score (sv/index/query/PrefixQueryBuilder.java). (`Prefix` is the
    doc-values/keyword form.)"""
    field_name: str
    value: str


@dataclass(frozen=True)
class ConstantScore(Query):
    """`constant_score` — filter context, fixed boost score
    (sv/index/query/ConstantScoreQueryBuilder.java)."""
    filter_query: Query = None
    boost: float = 1.0


@dataclass
class DisMax(Query):
    """`dis_max` — max of subquery scores + tie_breaker·(sum − max)
    (sv/index/query/DisMaxQueryBuilder.java)."""
    queries: list = field(default_factory=list)
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class Boosting(Query):
    """`boosting` — positive query's score, multiplied by negative_boost
    for docs that also match the negative query
    (sv/index/query/BoostingQueryBuilder.java)."""
    positive: Query = None
    negative: Query = None
    negative_boost: float = 0.5


@dataclass
class MultiMatch(Query):
    """`multi_match` across analyzed text fields and keyword doc-value
    fields (term-equality legs score 1.0)
    (sv/index/search/MultiMatchQuery.java):
      best_fields   dis_max over per-field match scores
      most_fields   sum over per-field match scores
      cross_fields  term-centric: per term take the MAX score across
                    fields, sum over terms (the reference's blended
                    term-centric execution), operator/msm count TERMS
      phrase        dis_max over per-field match_phrase scores (keyword
                    legs match on whole-value equality)"""
    fields: list = field(default_factory=list)
    text: str = ""
    type: str = "best_fields"   # best_fields | most_fields | cross_fields | phrase
    tie_breaker: float = 0.0
    operator: str = "or"
    minimum_should_match: str | int | None = None


@dataclass(frozen=True)
class MoreLikeThis(Query):
    """`more_like_this` — rank the example's terms by tf·idf against the
    index stats, keep max_query_terms, run an OR match with
    minimum_should_match (sv/index/query/MoreLikeThisQueryBuilder.java;
    defaults max_query_terms=25, minimum_should_match='30%').

    Two `like` forms, as in the reference:
    - text form: `like_text` is analyzed directly.
    - doc form: `like_ids` references indexed docs; their SOURCE text is
      fetched (Executor(source_pages=...)) and re-analyzed — the
      reference's behavior when term vectors aren't stored
      (TermVectorsService generates from _source) — and, like the
      reference's default include=false, the liked docs themselves are
      excluded from the results.
    min_term_freq prunes example terms below the frequency floor
    (reference default 2 for the doc form; kept at 1 here for the text
    form's backward compatibility — pass 2 explicitly to match)."""
    field_name: str
    like_text: str = ""
    max_query_terms: int = 25
    minimum_should_match: str | int | None = "30%"
    min_doc_freq: int = 1
    like_ids: tuple = ()
    min_term_freq: int = 1
    include: bool = False


@dataclass(frozen=True)
class MatchPhrasePrefix(Query):
    """`match_phrase_prefix` — exact positional phrase over all terms but
    the last, whose slot accepts any dictionary term with that prefix
    (first `max_expansions` in term-dictionary order, reference default 50
    — sv/index/search/MatchQuery.java phrase_prefix path /
    MultiPhraseQuery). Scored as a pseudo-term: idf = Σ idfs of the exact
    (non-prefix) members, tf = anchor count."""
    field_name: str
    text: str
    max_expansions: int = 50
    analyzer: str | None = None


@dataclass(frozen=True)
class MatchBoolPrefix(Query):
    """`match_bool_prefix` — every analyzed term but the last is a
    BM25-scored term clause; the last is a prefix clause over the term
    dictionary scored 1.0 per matching doc (Lucene's constant-score
    multi-term rewrite inside the bool —
    sv/index/query/MatchBoolPrefixQueryBuilder.java). operator /
    minimum_should_match count ALL clauses, prefix included."""
    field_name: str
    text: str
    operator: str = "or"
    minimum_should_match: str | int | None = None
    analyzer: str | None = None


@dataclass(frozen=True)
class SpanNear(Query):
    """`span_near` — clauses (already-analyzed terms) within `slop`
    ([max−min]−(n−1) ≤ slop), optionally in order
    (sv/search/SearchModule.java:1140-1156 span registrations). Scored as
    a pseudo-term with tf = number of distinct anchor positions admitting
    a valid assignment (anchor = first clause's position when in_order,
    the window's min position otherwise)."""
    field_name: str
    clauses: tuple
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class Intervals(Query):
    """`intervals` (sv/index/query/IntervalQueryBuilder.java).

    Text form (`text`): analyzed terms all within `max_gaps`
    ([max−min]−(n−1) ≤ max_gaps), `ordered` optionally — the `match`
    source; same positional engine as SpanNear.

    Source form (`source`): a full IntervalsSourceProvider tree —
    IntervalsMatch / IntervalsPrefix leaves composed by IntervalsAnyOf /
    IntervalsAllOf. Executed over (start, end) interval frames with
    assignment semantics: a doc matches iff SOME choice of one interval
    per sub-source satisfies the ordering/gap rule (an over-approximation
    of Lucene's minimal-interval algebra that agrees on match/no-match;
    interval frequency counts distinct combined-interval starts)."""
    field_name: str
    text: str = ""
    max_gaps: int = 0
    ordered: bool = True
    analyzer: str | None = None
    source: object = None


@dataclass(frozen=True)
class IntervalsMatch:
    """`match` interval source (IntervalsSourceProvider.Match): analyzed
    terms within max_gaps, ordered optionally."""
    text: str
    max_gaps: int = -1              # -1 = unbounded (the reference default)
    ordered: bool = False
    analyzer: str | None = None


@dataclass(frozen=True)
class IntervalsPrefix:
    """`prefix` interval source (IntervalsSourceProvider.Prefix): single-
    position intervals of any dictionary term with the prefix (first
    `max_expansions` in term order — Lucene caps prefix interval
    expansion at 128)."""
    prefix: str
    max_expansions: int = 128


@dataclass(frozen=True)
class IntervalsAnyOf:
    """`any_of` (IntervalsSourceProvider.Disjunction): union of the
    sub-sources' intervals."""
    sources: tuple


@dataclass(frozen=True)
class IntervalsAllOf:
    """`all_of` (IntervalsSourceProvider.Combine): one interval from
    EVERY sub-source; `ordered` forces each to start after the previous
    ends; `max_gaps` bounds total uncovered positions inside the combined
    span: (max_end − min_start + 1) − Σ(len_i) ≤ max_gaps."""
    sources: tuple
    max_gaps: int = -1
    ordered: bool = False


@dataclass(frozen=True)
class IntervalsFiltered:
    """A source with a ``filter`` block
    (IntervalsSourceProvider.IntervalFilter; Lucene IntervalsSource
    filtering): keeps intervals of ``source`` standing in the given
    positional relation to SOME interval of ``filter_source`` —
    ``containing`` / ``contained_by`` / ``overlapping`` (plus their
    ``not_`` negations), ``before`` (ends before some filter interval
    starts), ``after``. The filter side constrains matching only; it
    contributes no scoring terms (as in Lucene, where the filtered
    source's matchCost/score come from the main source)."""
    source: object
    kind: str
    filter_source: object




@dataclass(frozen=True)
class SpanGap:
    """`span_gap` clause inside span_near (SpanGapQueryBuilder, registered
    with the span family in sv/search/SearchModule.java:1140-1156): a
    non-scoring pseudo-clause consuming `width` token positions between
    its neighbors. Only valid with in_order=True, as in Lucene."""
    field_name: str
    width: int = 1


@dataclass(frozen=True)
class FieldMaskingSpan:
    """`field_masking_span` (FieldMaskingSpanQueryBuilder, registered with
    the span family in sv/search/SearchModule.java:1140-1156): lets a
    span over a differently-analyzed SUB-FIELD participate in a span_near
    on the base field — Lucene's canonical use is combining a stemmed
    sub-field term with exact base-field terms positionally (the two
    fields share token positions because they share a tokenizer).

    This engine stores one postings set (the base field), so the masked
    clause is planned by EXPANSION: the sub-field term matches every
    base-dictionary term whose sub-field normalization (the `filters`
    chain, e.g. a stemmer) equals `term` — exact whenever the sub-field
    differs from the base only by per-token 1:1 filters, which is the
    masking precondition in Lucene too (positions must align).
    Scored like span_or over the expansion (pseudo-term idf = Σ member
    idfs)."""
    field_name: str                 # masked (sub-)field name, e.g. "text.es"
    term: str                       # sub-field term to match
    filters: tuple = ()             # sub-field token-filter chain specs


@dataclass(frozen=True)
class SpanFirst(Query):
    """`span_first` — the inner span (ordered `clauses` chain within
    `slop`) must end within the first `end` positions of the field
    (sv/index/query/SpanFirstQueryBuilder.java: match spans with
    end() <= end). Scored as a pseudo-term, pf = distinct anchors."""
    field_name: str
    clauses: tuple
    end: int
    slop: int = 0


@dataclass(frozen=True)
class SpanOr(Query):
    """`span_or` — union of span_term clauses; pf = distinct positions
    where ANY member term occurs (sv/index/query/SpanOrQueryBuilder.java),
    pseudo-term idf = Σ member idfs."""
    field_name: str
    clauses: tuple


@dataclass(frozen=True)
class SpanNot(Query):
    """`span_not` — occurrences of `include` with no `exclude` occurrence
    in [pos-pre, pos+post] (sv/index/query/SpanNotQueryBuilder.java
    pre/post windows)."""
    field_name: str
    include: str
    exclude: str
    pre: int = 0
    post: int = 0


@dataclass(frozen=True)
class SpanMulti(Query):
    """`span_multi` — a multi-term query (prefix/wildcard/regexp/fuzzy on
    the analyzed field) wrapped as a span: expands over the term
    dictionary (first `max_expansions` in term order — the reference's
    TopTermsSpanBooleanQueryRewrite cap) and matches like span_or over
    the expansion (sv/index/query/SpanMultiTermQueryBuilder.java)."""
    field_name: str
    match: Query = None
    max_expansions: int = 50


@dataclass(frozen=True)
class SpanWithin(Query):
    """`span_within` / `span_containing` — `little` (a single term) inside
    the window of a `big` span (ordered `big` chain within `big_slop`);
    sv/index/query/SpanWithinQueryBuilder.java /
    SpanContainingQueryBuilder.java. mode='within' emits the little spans
    (pf = distinct little positions inside some big match); 'containing'
    emits the big spans (pf = distinct big anchors enclosing a little)."""
    field_name: str
    little: str
    big: tuple
    big_slop: int = 0
    mode: str = "within"            # 'within' | 'containing'


@dataclass(frozen=True)
class TermsSet(Query):
    """`terms_set` — bool of exact term clauses requiring >= `required`
    distinct matches per doc, BM25-scored sum over the matched terms
    (sv/index/query/TermsSetQueryBuilder.java; the reference reads the
    minimum from a field/script — here a constant per query)."""
    field_name: str
    values: tuple
    required: int = 1


@dataclass(frozen=True)
class RankFeature(Query):
    """`rank_feature` — score a numeric feature field through a saturating
    function; docs missing the feature don't match
    (sv/index/query/RankFeatureQueryBuilder.java; functions per the
    rank_feature field type):
      saturation: S(v) = v / (v + pivot)
      log:        S(v) = ln(scaling_factor + v)
      sigmoid:    S(v) = v^exp / (v^exp + pivot^exp)
      linear:     S(v) = v
    score = boost · S(v)."""
    field_name: str
    function: str = "saturation"    # 'saturation'|'log'|'sigmoid'|'linear'
    pivot: float = 1.0
    scaling_factor: float = 1.0
    exponent: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class DistanceFeature(Query):
    """`distance_feature` — score decays with distance from `origin` on a
    date or numeric field: boost · pivot / (pivot + |value − origin|)
    (sv/index/query/DistanceFeatureQueryBuilder.java). `pivot` is in
    seconds for date fields (duration strings like '100s'/'7d' accepted),
    field units for numerics. Docs missing the field don't match."""
    field_name: str
    origin: object = None
    pivot: object = None
    boost: float = 1.0


@dataclass(frozen=True)
class CommonTerms(Query):
    """`common` terms query (CommonTermsQueryBuilder — deprecated alias of
    match but still registered in SearchModule): analyzed terms split by
    document frequency at `cutoff_frequency` (fraction of N when < 1,
    absolute df otherwise). Low-frequency terms select AND score
    (`low_freq_operator`); high-frequency terms only add score to docs the
    low-freq group already selected. If every term is high-frequency they
    select with `high_freq_operator` (Lucene CommonTermsQuery rewrite)."""
    field_name: str
    text: str
    cutoff_frequency: float = 0.01
    low_freq_operator: str = "or"
    high_freq_operator: str = "or"
    analyzer: str | None = None


@dataclass(frozen=True)
class Named(Query):
    """`_name`d clause — plans exactly as its inner query; the fetch phase
    reports which named clauses matched each hit as `matched_queries`
    (sv/search/fetch/subphase/MatchedQueriesPhase.java). Every query
    builder in the reference carries queryName (AbstractQueryBuilder)."""
    query: Query = None
    name: str = ""


@dataclass
class Script(Query):
    """`script` query — filter context, constant score 0, the boolean
    script evaluated per doc over doc-values
    (sv/index/query/ScriptQueryBuilder.java). Compiled to a Catalyst
    predicate by sparksearch.painless (no Python on the scan)."""
    source: str
    params: dict | None = None



# --- function_score (sv/index/query/functionscore/...) ---------------------

@dataclass(frozen=True)
class WeightFunction:
    """Constant weight factor (WeightBuilder)."""
    weight: float = 1.0


@dataclass(frozen=True)
class FieldValueFactor:
    """field_value_factor: modifier(factor · doc[field]), missing default
    (FieldValueFactorFunctionBuilder; modifiers none/log1p/ln1p/sqrt/
    square/reciprocal)."""
    field: str
    factor: float = 1.0
    modifier: str = "none"
    missing: float = 1.0


@dataclass
class ScriptScore:
    """script_score function: the compiled Painless expression becomes the
    function value; `_score` inside the script is the base query score
    (sv/index/query/functionscore/ScriptScoreFunctionBuilder.java and the
    top-level script_score query, ScriptScoreQueryBuilder.java)."""
    source: str
    params: dict | None = None


@dataclass(frozen=True)
class DecayFunction:
    """gauss/exp/linear decay on a numeric or timestamp field
    (DecayFunctionBuilder). For timestamps, origin is an ISO string and
    scale/offset are seconds; dist = max(0, |v − origin| − offset);
      gauss:  exp(−dist²/(2σ²)),  σ² = −scale²/(2·ln decay)
      exp:    exp(ln(decay)/scale · dist)
      linear: max(0, (s − dist)/s), s = scale/(1 − decay)"""
    kind: str                      # 'gauss' | 'exp' | 'linear'
    field: str
    origin: object
    scale: float
    offset: float = 0.0
    decay: float = 0.5


@dataclass(frozen=True)
class RandomScore:
    """function_score ``random_score`` (RandomScoreFunctionBuilder,
    registered in FunctionScoreQueryBuilder.java's function family): a
    deterministic per-document pseudo-random value in [0,1) derived from
    (seed, field). The reference hashes seed + the doc's field value
    (default _seq_no) with murmur; here the hash is md5-derived (first 8
    hex chars as uint32 / 2^32) so an independent SQL engine reproduces
    it bit-for-bit — same contract (seeded, uniform, stable per doc),
    different hash function (documented deviation)."""
    seed: int = 0
    field: str = "docid"


@dataclass
class FunctionScore(Query):
    """function_score: combine the query score with function values —
    score_mode folds the function values (multiply/sum/avg/max/min),
    boost_mode folds the result into the query score
    (multiply/replace/sum/avg/max/min)
    (sv/index/query/functionscore/FunctionScoreQueryBuilder.java:72)."""
    query: Query = None
    functions: list = field(default_factory=list)
    score_mode: str = "multiply"
    boost_mode: str = "multiply"


@dataclass(frozen=True)
class Nested(Query):
    """nested query: matches docs where AT LEAST ONE element of the
    array-of-structs doc-values column `path` satisfies the inner filter
    query — every inner clause is evaluated against the SAME element,
    the block-join semantics that distinguish a nested field from a
    flattened object field (where `a=1 AND b=2` may match across two
    different elements). Inner field names are `path.leaf` references.

    Filter-context semantics (Lucene ScoreMode.None): the inner queries
    are doc-values predicates (term/terms/range/exists/prefix/bool), not
    BM25-scored text, so every score_mode collapses to a constant and
    the query plans as ONE `exists()` lambda inside the docs scan — no
    join, no shuffle, no child-doc materialization.
    Reference: sv/index/query/NestedQueryBuilder.java:96-180 (path +
    inner query + ScoreMode; doToQuery builds the block join)."""
    path: str
    query: Query = None
    score_mode: str = "none"


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
