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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearch.build import doc_postings_udf

__all__ = ["percolate"]


def percolate(docs: DataFrame, queries: DataFrame,
              analyzer: str = "standard", sort: bool = True) -> DataFrame:
    """(url, qid) for every stored query matching each document.

    `docs`: (url, text); `queries`: (qid, kind, terms array<string>, msm).
    `sort=False` skips the final global sort — required on streaming
    inputs (percolate_stream), where a global order is meaningless.
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
    return out.orderBy("url", "qid") if sort else out
