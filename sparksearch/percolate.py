"""Percolator: match documents against a table of stored queries.

The reference holds stored queries in a dedicated percolator index and
evaluates candidate queries per incoming document
(sv/modules/percolator/ — PercolateQueryBuilder / PercolatorFieldMapper,
with a term-extraction pre-filter so only plausible queries run).

Spark shape: the query table is broadcast (query sets are tiny next to
the corpus), documents are analyzed ONCE into a term→positions map, and
every membership/phrase check is a higher-order array function — pure
JVM whole-stage-codegen, no Python in the match loop, per-doc work
∝ #queries. At 100 TB the docs side streams through map tasks with no
shuffle at all; the output is (url, qid) pairs.

With `prefilter=True` the QueryAnalyzer candidate step is applied too:
anchor terms extracted per stored query equi-join the doc's term keys,
so per-doc work becomes ∝ #doc terms + #candidate queries — the shape
for 10⁶ stored queries (the reference stores extracted terms in the
percolator index for exactly this prune).

Supported stored-query kinds (the common percolator registrations):
  term       one required term
  match_or   ≥ msm of the terms present (bool SHOULD)
  match_and  all terms present (bool MUST / operator=and)
  phrase     terms at consecutive positions (match_phrase, slop 0)
  bool       should terms (≥ msm when any) + optional `must` array
             (every term present) + optional `must_not` array (no term
             present) — the stored bool query shape
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.build import doc_postings_udf

__all__ = ["percolate"]


def _anchor_terms(queries: DataFrame) -> Column:
    """Extracted anchor terms per stored query — the reference's
    candidate-selection step (modules/percolator/.../QueryAnalyzer.java):
    a DISJUNCTION needs every term as an anchor (any one present makes
    the query a candidate); a CONJUNCTION needs only ONE required term
    (QueryAnalyzer keeps the "best" required extraction — longest term,
    the cheapest selective proxy without df stats); a bool anchors on
    one `must` term when present, else its should terms.  NULL means
    un-anchorable (pure must_not / empty) — those queries must evaluate
    against every doc."""
    longest = F.element_at(
        F.array_sort(
            F.col("terms"),
            lambda a, b: F.when(F.length(a) > F.length(b), -1)
            .when(F.length(a) < F.length(b), 1)
            .when(a < b, -1).when(a > b, 1).otherwise(0)), 1)
    cols = queries.columns
    must = (F.col("must") if "must" in cols
            else F.lit(None).cast("array<string>"))
    longest_must = F.element_at(
        F.array_sort(
            must,
            lambda a, b: F.when(F.length(a) > F.length(b), -1)
            .when(F.length(a) < F.length(b), 1)
            .when(a < b, -1).when(a > b, 1).otherwise(0)), 1)
    some_terms = F.size(F.col("terms")) > 0
    return (F.when(F.col("kind").isin("term", "match_or"),
                   F.when(some_terms, F.col("terms")))
            .when(F.col("kind").isin("match_and", "phrase"),
                  F.when(some_terms, F.array(longest)))
            .when(F.col("kind") == "bool",
                  F.when(F.size(F.coalesce(
                      must, F.array().cast("array<string>"))) > 0,
                      F.array(longest_must))
                  .when(some_terms, F.col("terms"))))


def percolate(docs: DataFrame, queries: DataFrame,
              analyzer: str = "standard", sort: bool = True,
              prefilter: bool = False) -> DataFrame:
    """(url, qid) for every stored query matching each document.

    `docs`: (url, text); `queries`: (qid, kind, terms array<string>, msm).
    `sort=False` skips the final global sort — required on streaming
    inputs (percolate_stream), where a global order is meaningless.

    `prefilter=True` adds the reference's candidate pre-selection
    (PercolatorFieldMapper extracts query terms at store time;
    QueryAnalyzer picks anchors): instead of evaluating EVERY stored
    query per doc, the doc's term keys equi-join the broadcast anchor
    table and only candidate (doc, query) pairs run the full predicate.
    Per-doc work drops from O(#queries) to O(#doc terms + #candidates)
    — the shape that survives 10⁶ stored queries; the only shuffle is
    the final distinct, ∝ matches.  Queries with no extractable anchor
    (pure must_not) still evaluate everywhere, exactly like the
    reference's verified-candidates fallback.
    """
    tok = docs.select(
        "url", doc_postings_udf(analyzer)(F.col("text")).alias("_t"))
    # term → positions lookup, built once per doc
    tok = tok.select(
        "url",
        F.map_from_entries(
            F.transform("_t.entries",
                        lambda e: F.struct(e["term"].alias("k"),
                                           e["positions"].alias("v"))))
        .alias("pmap"))
    if prefilter:
        qa = queries.withColumn("_anchor", _anchor_terms(queries))
        anch = (qa.where(F.col("_anchor").isNotNull())
                .select("qid", F.explode("_anchor").alias("_aterm"))
                .distinct())
        cand = (tok.select("url", "pmap",
                           F.explode(F.map_keys("pmap")).alias("_aterm"))
                .join(F.broadcast(anch), "_aterm")
                .drop("_aterm")
                .join(F.broadcast(queries), "qid"))
        unanch = qa.where(F.col("_anchor").isNull()).drop("_anchor")
        paired = cand
        if unanch.limit(1).count() > 0:
            paired = cand.unionByName(tok.join(F.broadcast(unanch)))
    else:
        paired = tok.join(F.broadcast(queries))

    def pos_of(term):
        return F.coalesce(F.element_at(F.col("pmap"), term),
                          F.array().cast("array<int>"))

    present = lambda t: F.map_contains_key(F.col("pmap"), t)  # noqa: E731
    n_present = F.size(F.filter(F.col("terms"), present))
    n_terms = F.size(F.col("terms"))
    # phrase: some position p of terms[0] has terms[i] at p+i for all i —
    # sequence/forall keep it expression-only with per-row term arrays
    phrase_ok = F.exists(
        pos_of(F.element_at(F.col("terms"), 1)),
        lambda p: F.forall(
            F.sequence(F.lit(2), n_terms),
            lambda i: F.array_contains(
                pos_of(F.element_at(F.col("terms"), i)), p + i - 1)))
    matched = (F.when(F.col("kind") == "term", n_present >= 1)
               .when(F.col("kind") == "match_and", n_present == n_terms)
               .when(F.col("kind") == "match_or",
                     n_present >= F.coalesce(F.col("msm"), F.lit(1)))
               .when(F.col("kind") == "phrase",
                     # sequence(2, 1) would step DOWNWARD — dispatch the
                     # single-term phrase to plain membership instead
                     F.when(n_terms == 1, n_present >= 1)
                     .otherwise((n_terms >= 2) & phrase_ok)))
    # the bool branch is ALWAYS present (missing must/must_not columns
    # default to null = no constraint) so a should-only bool still matches
    # instead of falling through to otherwise(False)
    cols = queries.columns
    must = F.col("must") if "must" in cols else F.lit(None) \
        .cast("array<string>")
    must_not = F.col("must_not") if "must_not" in cols else \
        F.lit(None).cast("array<string>")
    must_ok = F.coalesce(F.forall(must, present), F.lit(True))
    not_ok = ~F.coalesce(F.exists(must_not, present), F.lit(False))
    should_ok = F.when(
        n_terms > 0,
        n_present >= F.coalesce(F.col("msm"), F.lit(1))) \
        .otherwise(F.lit(True))
    matched = matched.when(F.col("kind") == "bool",
                           must_ok & not_ok & should_ok)
    matched = matched.otherwise(F.lit(False))
    out = paired.where(matched).select("url", "qid")
    if prefilter:
        # a disjunction with several anchor terms present yields one
        # candidate row per hit anchor — dedupe; the shuffle is ∝ matches
        out = out.distinct()
    return out.orderBy("url", "qid") if sort else out
