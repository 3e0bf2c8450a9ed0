"""Query execution: AST → DataFrame plan → BM25 top-k.

Spark form of the reference's QUERY_THEN_FETCH lifecycle (SURVEY.md §3.1)
with DFS-global statistics baked in at build time:

  1. driver-side rewrite: analyze query text with the index's analyzer,
     normalize bool/minimum_should_match (queries.py) — the analogue of
     Rewriteable.rewrite on the coordinator.
  2. per-clause plan: postings_for(terms) [partition-pruned scan]
     ⋈ broadcast(stats_for(terms) with idf) → score expression — all
     whole-stage-codegen'd JVM expressions, zero Python in the hot path.
  3. combine: groupBy(docid) for OR/msm, inner joins for AND, left_anti for
     must_not (SURVEY.md §2.7 set ops).
  4. global top-k: orderBy(score desc, docid asc).limit(k) — Spark's
     TakeOrderedAndProject = per-partition top-k + merge, exactly the
     reference's per-shard collector + coordinator mergeTopDocs
     (sv/action/search/SearchPhaseController.java:191-249).
  5. fetch: broadcast join of the k-row result against docs for url — the
     FetchPhase equivalent (sv/search/fetch/FetchPhase.java:96-268).

Phrase queries intersect position arrays with built-in array functions
(array_intersect over shifted positions) — no UDF.

Scoring (bm25.py semantics, as Catalyst expressions):
  idf   = ln(1 + (N - df + 0.5)/(df + 0.5))
  score = idf * (k1+1) * tf / (tf + k1*(1 - b + b*dl_q/avgdl))
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch import bm25
from sparksearch.analysis import analyze
from sparksearch.index import IndexReader
from sparksearch.queries import (
    Bool, Boosting, ConstantScore, DisMax, Exists, Fuzzy, Ids, Match,
    MatchAll, MatchNone, MatchPhrase, MoreLikeThis, MultiMatch, Prefix,
    Query, Range, Regexp, Term, Terms, TextPrefix, Wildcard,
    calculate_min_should_match,
)

__all__ = ["Executor"]


def _idf_col(n_docs: int) -> Column:
    df = F.col("df").cast("double")
    return F.log1p((F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))


def _tf_norm(tf: Column, dl_q: Column, avgdl: float,
             k1: float = bm25.K1, b: float = bm25.B) -> Column:
    tf = tf.cast("double")
    denom = tf + k1 * (1.0 - b + b * dl_q.cast("double") / float(avgdl))
    return F.lit(k1 + 1.0) * tf / denom


class Executor:
    """Executes Query ASTs against an IndexReader."""

    def __init__(self, index: IndexReader):
        self.ix = index

    # ---- public API --------------------------------------------------------
    def search(self, q: Query, k: int = 10, fetch: bool = True,
               mode: str = "auto") -> DataFrame:
        """Top-k (docid, score[, url]) — score desc, docid asc.

        mode: "auto" uses the block-max WAND pruned path (wand.py) for match
        queries when packed segments are available; "wand" forces it;
        "plan" forces the generic DataFrame plan.
        """
        # auto mode additionally requires the packed segments to cover
        # exactly the committed generations — in the window between a
        # meta.json commit and the generation's segment build (crash or
        # concurrent reader), WAND over stale segments would silently omit
        # the new docs, so fall back to the row-postings plan instead.
        # mode="wand" trusts the caller (tests that just built segments).
        use_wand = (mode in ("auto", "wand") and isinstance(q, Match)
                    and self.ix.use_segments
                    and (mode == "wand" or self.ix.segments_cover_all()))
        if use_wand:
            from sparksearch.wand import wand_topk
            topk = wand_topk(self.ix, q, k)
        else:
            scored = self._plan(q, scored=True)
            topk = (scored
                    .orderBy(F.col("score").desc(), F.col("docid").asc())
                    .limit(k))
        if fetch:
            # FetchPhase: k-row result broadcast against the corpus-side dict
            topk = (self.ix.docs.select("docid", "url")
                    .join(F.broadcast(topk), "docid")
                    .select("docid", "url", "score")
                    .orderBy(F.col("score").desc(), F.col("docid").asc()))
        return topk

    def count(self, q: Query) -> int:
        return self._plan(q, scored=False).count()

    # ---- planning: Query -> DataFrame(docid, score) ------------------------
    def _plan(self, q: Query, scored: bool) -> DataFrame:
        ix = self.ix
        if isinstance(q, MatchAll):
            return ix.docs.select(
                "docid", F.lit(1.0 if scored else 0.0).alias("score"))
        if isinstance(q, MatchNone):
            return self._empty()
        if isinstance(q, Match):
            return self._plan_match(q, scored)
        if isinstance(q, MatchPhrase):
            return self._plan_phrase(q, scored)
        if isinstance(q, (Term, Terms, Range, Exists, Prefix, Ids)):
            return self._plan_docvalue_filter(q)
        if isinstance(q, Bool):
            return self._plan_bool(q, scored)
        if isinstance(q, (Wildcard, Regexp, Fuzzy, TextPrefix)):
            return self._plan_multiterm(q, scored)
        if isinstance(q, ConstantScore):
            inner = self._plan(q.filter_query, scored=False).select("docid")
            return inner.select(
                "docid", F.lit(float(q.boost) if scored else 0.0)
                .alias("score"))
        if isinstance(q, DisMax):
            return self._plan_dismax(q, scored)
        if isinstance(q, Boosting):
            return self._plan_boosting(q, scored)
        if isinstance(q, MultiMatch):
            return self._plan_multimatch(q, scored)
        if isinstance(q, MoreLikeThis):
            return self._plan_mlt(q, scored)
        raise TypeError(f"unsupported query: {q!r}")

    def _plan_multiterm(self, q: Query, scored: bool) -> DataFrame:
        """Dictionary-expansion queries (wildcard/regexp/fuzzy/prefix on the
        analyzed field): filter the term dictionary (stats), join postings
        on the matching terms (broadcast — the Zipf dictionary head is
        small), emit constant score 1.0 per matching doc — Lucene's
        CONSTANT_SCORE multi-term rewrite. Fully distributed: no driver-side
        term collection."""
        d = self.ix.stats.select("term")
        if isinstance(q, Wildcard):
            like = q.pattern.replace("%", r"\%").replace("_", r"\_") \
                .replace("*", "%").replace("?", "_")
            cond = F.col("term").like(like)
        elif isinstance(q, Regexp):
            cond = F.col("term").rlike(f"^(?:{q.pattern})$")
        elif isinstance(q, Fuzzy):
            cond = F.levenshtein(F.col("term"), F.lit(q.value)) \
                <= int(q.fuzziness)
        else:  # TextPrefix
            cond = F.col("term").startswith(q.value)
        matched = d.filter(cond)
        docids = (self.ix.postings.join(F.broadcast(matched), "term")
                  .select("docid").distinct())
        return docids.select(
            "docid", F.lit(1.0 if scored else 0.0).alias("score"))

    def _plan_dismax(self, q: DisMax, scored: bool) -> DataFrame:
        legs = [self._plan(sq, scored) for sq in q.queries]
        if not legs:
            return self._empty()
        unioned = reduce(lambda a, b: a.unionAll(b), legs)
        agg = (unioned.groupBy("docid")
               .agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm")))
        score = (F.col("_mx")
                 + F.lit(float(q.tie_breaker)) * (F.col("_sm") - F.col("_mx"))
                 if scored else F.lit(0.0))
        return agg.select("docid", score.alias("score"))

    def _plan_boosting(self, q: Boosting, scored: bool) -> DataFrame:
        pos = self._plan(q.positive, scored)
        neg = (self._plan(q.negative, scored=False)
               .select("docid", F.lit(True).alias("_neg")))
        out = pos.join(neg, "docid", "left")
        score = F.when(F.col("_neg"),
                       F.col("score") * float(q.negative_boost)) \
            .otherwise(F.col("score")) if scored else F.lit(0.0)
        return out.select("docid", score.alias("score"))

    def _plan_multimatch(self, q: MultiMatch, scored: bool) -> DataFrame:
        """best_fields = dis_max(tie_breaker), most_fields = score sum
        (MultiMatchQuery.java). Analyzed field 'text' scores BM25; keyword
        doc-value fields score 1.0 on exact equality."""
        legs = []
        for f in q.fields:
            if f == "text":
                legs.append(self._plan(Match("text", q.text), scored))
            else:
                legs.append(
                    self.ix.docs.filter(F.col(f) == F.lit(q.text))
                    .select("docid",
                            F.lit(1.0 if scored else 0.0).alias("score")))
        if not legs:
            return self._empty()
        if q.type == "most_fields":
            unioned = reduce(lambda a, b: a.unionAll(b), legs)
            return (unioned.groupBy("docid")
                    .agg(F.sum("score").alias("score")))
        return self._dismax_of(legs, q.tie_breaker, scored)

    def _dismax_of(self, legs: list[DataFrame], tie: float,
                   scored: bool) -> DataFrame:
        unioned = reduce(lambda a, b: a.unionAll(b), legs)
        agg = (unioned.groupBy("docid")
               .agg(F.max("score").alias("_mx"), F.sum("score").alias("_sm")))
        score = (F.col("_mx") + F.lit(float(tie))
                 * (F.col("_sm") - F.col("_mx"))) if scored else F.lit(0.0)
        return agg.select("docid", score.alias("score"))

    def _plan_mlt(self, q: MoreLikeThis, scored: bool) -> DataFrame:
        """more_like_this (like_text form): rank the example's terms by
        tf·idf (driver-side — stats for a handful of terms), keep the top
        max_query_terms, then an ordinary OR match with msm."""
        from collections import Counter
        terms = [t for t, _ in analyze(q.like_text, self.ix.analyzer)]
        if not terms:
            return self._empty()
        cnt = Counter(terms)
        srows = self.ix.stats_for(sorted(cnt)).collect()
        dfm = {r["term"]: r["df"] for r in srows}
        ranked = sorted(
            ((t, c * bm25.idf(dfm.get(t, 0), self.ix.n_docs))
             for t, c in cnt.items()
             if dfm.get(t, 0) >= q.min_doc_freq),
            key=lambda x: (-x[1], x[0]))
        selected = [t for t, _ in ranked[:q.max_query_terms]]
        if not selected:
            return self._empty()
        return self._plan(
            Match(q.field_name, " ".join(selected),
                  minimum_should_match=q.minimum_should_match), scored)

    def _empty(self) -> DataFrame:
        return (self.ix.docs.select("docid", F.lit(0.0).alias("score"))
                .limit(0))

    def _term_scores(self, terms: list[str], scored: bool) -> DataFrame:
        """(docid, term, score) for every posting of the given terms."""
        p = self.ix.postings_for(terms, with_positions=False) \
            .select("term", "docid", "tf", "dl_q")
        s = self.ix.stats_for(terms).withColumn("idf", _idf_col(self.ix.n_docs))
        j = p.join(F.broadcast(s.select("term", "idf")), "term")
        score = (F.col("idf") * _tf_norm(F.col("tf"), F.col("dl_q"),
                                         self.ix.avgdl)
                 if scored else F.lit(0.0))
        return j.select("docid", "term", score.alias("score"))

    def _plan_match(self, q: Match, scored: bool) -> DataFrame:
        terms = [t for t, _ in analyze(q.text, q.analyzer or self.ix.analyzer)]
        if not terms:
            return self._empty()  # zero_terms_query NONE
        # a term appearing w times in the query text yields w SHOULD clauses
        # in the reference → weight both score and clause count by w
        from collections import Counter
        cnt = Counter(terms)
        uniq = sorted(cnt)
        per = self._term_scores(uniq, scored)
        wmap = F.create_map(*[x for t, c in cnt.items()
                              for x in (F.lit(t), F.lit(float(c)))])
        w = F.element_at(wmap, F.col("term"))
        if q.operator == "and":
            msm = len(terms)
        else:
            msm = calculate_min_should_match(
                len(terms), q.minimum_should_match, has_required=False)
        agg = (per.groupBy("docid")
                  .agg(F.sum(F.col("score") * w).alias("score"),
                       F.sum(w).cast("int").alias("_n")))
        if msm > 1:
            agg = agg.filter(F.col("_n") >= msm)
        return agg.select("docid", "score")

    def _plan_phrase(self, q: MatchPhrase, scored: bool) -> DataFrame:
        terms = [t for t, _ in analyze(q.text, q.analyzer or self.ix.analyzer)]
        if not terms:
            return self._empty()
        if len(terms) == 1:
            return self._plan_match(
                Match(q.field_name, q.text, analyzer=q.analyzer), scored)
        if q.slop > 0:
            return self._plan_phrase_sloppy(terms, q.slop, scored)
        # n-way docid join of the member terms' postings; phrase frequency =
        # |pos_0 ∩ (pos_1 - 1) ∩ ... ∩ (pos_i - i)| — built-in array ops only
        uniq = sorted(set(terms))
        p = self.ix.postings_for(uniq).select("term", "docid", "positions", "dl_q")
        def shift_by(i: int):
            # single-arg lambda only: a two-arg lambda would make Spark bind
            # the second parameter to the array element index
            return lambda x: x - F.lit(i)

        legs = []
        for i, t in enumerate(terms):
            leg = (p.filter(F.col("term") == t)
                    .select(F.col("docid"),
                            (F.transform(F.col("positions"), shift_by(i))
                             if i else F.col("positions")).alias(f"pos{i}"),
                            *( [F.col("dl_q")] if i == 0 else [] )))
            legs.append(leg)
        joined = reduce(lambda a, b: a.join(b, "docid"), legs)
        pf = reduce(lambda acc, i: F.array_intersect(acc, F.col(f"pos{i}")),
                    range(1, len(terms)), F.col("pos0"))
        joined = joined.select("docid", "dl_q",
                               F.size(pf).cast("double").alias("pf")) \
                       .filter(F.col("pf") > 0)
        return self._phrase_score(joined, terms, scored)

    def _plan_phrase_sloppy(self, terms: list[str], slop: int,
                            scored: bool) -> DataFrame:
        """Sloppy phrase (slop > 0): anchor at each position p0 of terms[0];
        per later term i, displacement d_i = min over its positions of
        |p_i − (p0+i)| via array_min/transform (JVM higher-order fns, no
        explode of non-anchor legs); anchors with Σd_i ≤ slop contribute
        sloppy weight 1/(1+Σd_i) to the phrase frequency — Lucene's
        sloppyFreq rule over the displacement-sum distance
        (sv/index/search/MatchQuery.java:171; slop=2 admits a transposition
        exactly as Lucene's two-term matcher does)."""
        uniq = sorted(set(terms))
        p = self.ix.postings_for(uniq).select("term", "docid", "positions",
                                              "dl_q")
        cur = (p.filter(F.col("term") == terms[0])
                .select("docid", "dl_q",
                        F.explode("positions").alias("_p0")))
        dcols = []
        for i, t in enumerate(terms[1:], start=1):
            leg = (p.filter(F.col("term") == t)
                    .select("docid", F.col("positions").alias(f"_ps{i}")))
            cur = cur.join(leg, "docid")

            def dist_to_slot(i=i):
                return lambda x: F.abs(x - (F.col("_p0") + F.lit(i)))

            cur = (cur.withColumn(
                        f"_d{i}",
                        F.array_min(F.transform(F.col(f"_ps{i}"),
                                                dist_to_slot())))
                      .drop(f"_ps{i}"))
            dcols.append(F.col(f"_d{i}"))
        d_total = reduce(lambda a, b: a + b, dcols)
        matched = (cur.withColumn("_d", d_total.cast("double"))
                      .filter(F.col("_d") <= float(slop)))
        joined = (matched.groupBy("docid", "dl_q")
                  .agg(F.sum(F.lit(1.0) / (F.lit(1.0) + F.col("_d")))
                       .alias("pf"))
                  .select("docid", "dl_q", "pf"))
        return self._phrase_score(joined, terms, scored)

    def _phrase_score(self, joined: DataFrame, terms: list[str],
                      scored: bool) -> DataFrame:
        """Pseudo-term scoring shared by exact + sloppy phrase:
        idf = Σ member idfs (duplicates counted per occurrence),
        tf = (sloppy) phrase frequency."""
        if not scored:
            return joined.select("docid", F.lit(0.0).alias("score"))
        uniq = sorted(set(terms))
        sum_idf = (self.ix.stats_for(uniq)
                   .withColumn("idf", _idf_col(self.ix.n_docs)))
        from collections import Counter
        cnt = Counter(terms)
        sum_idf = sum_idf.select(
            F.sum(F.col("idf") *
                  F.element_at(
                      F.create_map(*[x for t2, c in cnt.items()
                                     for x in (F.lit(t2), F.lit(float(c)))]),
                      F.col("term"))).alias("sum_idf"))
        score = (F.col("sum_idf") *
                 _tf_norm(F.col("pf"), F.col("dl_q"), self.ix.avgdl))
        return (joined.crossJoin(F.broadcast(sum_idf))
                .select("docid", score.alias("score")))

    def _plan_docvalue_filter(self, q: Query) -> DataFrame:
        """Metadata-field predicates answered from the docs table (the
        engine's doc-values columnar store) with full Catalyst pushdown."""
        d = self.ix.docs
        if isinstance(q, Term):
            cond = F.col(q.field_name) == F.lit(q.value)
        elif isinstance(q, Terms):
            cond = F.col(q.field_name).isin(list(q.values))
        elif isinstance(q, Exists):
            cond = F.col(q.field_name).isNotNull()
        elif isinstance(q, Prefix):
            cond = F.col(q.field_name).startswith(q.value)
        elif isinstance(q, Ids):
            cond = F.col("url").isin(list(q.values))
        elif isinstance(q, Range):
            cond = F.lit(True)
            if q.gte is not None:
                cond = cond & (F.col(q.field_name) >= F.lit(q.gte))
            if q.gt is not None:
                cond = cond & (F.col(q.field_name) > F.lit(q.gt))
            if q.lte is not None:
                cond = cond & (F.col(q.field_name) <= F.lit(q.lte))
            if q.lt is not None:
                cond = cond & (F.col(q.field_name) < F.lit(q.lt))
        else:
            raise TypeError(q)
        return d.filter(cond).select("docid", F.lit(0.0).alias("score"))

    def _plan_bool(self, q: Bool, scored: bool) -> DataFrame:
        must, should, must_not, filt = (list(q.must), list(q.should),
                                        list(q.must_not), list(q.filter))
        if not must and not should and not filt and must_not:
            must = [MatchAll()]  # pure-negative fix (BoolQueryBuilder.java:85)

        req: DataFrame | None = None
        for c in must:
            leg = self._plan(c, scored)
            req = leg if req is None else (
                req.join(leg.withColumnRenamed("score", "_s"), "docid")
                   .select("docid",
                           (F.col("score") + F.col("_s")).alias("score")))
        for c in filt:
            leg = self._plan(c, scored=False).select("docid")
            req = (leg.select("docid", F.lit(0.0).alias("score"))
                   if req is None else req.join(leg, "docid", "left_semi"))

        opt: DataFrame | None = None
        if should:
            legs = [self._plan(c, scored) for c in should]
            unioned = reduce(lambda a, b: a.unionAll(b), legs)
            opt = (unioned.groupBy("docid")
                   .agg(F.sum("score").alias("_opt_score"),
                        F.count("*").alias("_n_opt")))

        msm = calculate_min_should_match(
            len(should), q.minimum_should_match, has_required=req is not None)

        if req is not None:
            out = req
            if opt is not None:
                out = out.join(opt, "docid", "left")
                if msm > 0:
                    out = out.filter(F.coalesce(F.col("_n_opt"), F.lit(0)) >= msm)
                out = out.select(
                    "docid",
                    (F.col("score")
                     + F.coalesce(F.col("_opt_score"), F.lit(0.0))).alias("score"))
        elif opt is not None:
            out = (opt.filter(F.col("_n_opt") >= msm) if msm > 0 else opt) \
                .select("docid", F.col("_opt_score").alias("score"))
        else:
            out = self._plan(MatchAll(), scored)

        for c in must_not:
            excl = self._plan(c, scored=False).select("docid")
            out = out.join(excl, "docid", "left_anti")
        return out
