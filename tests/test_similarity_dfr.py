"""DFR / DFI / IB similarities (SimilarityService BUILT_IN tail).

Covers the knobs the contract entries don't: basic_model=in, DFI
standardized/saturated, h3/z refusal, config round-trips, and a
tiny-corpus numeric check against a straight-Python recomputation of
the published Lucene formulas.
"""

import math

import pytest

from sparksearch.queries import Match
from sparksearch.similarity import (
    DFISimilarity,
    DFRSimilarity,
    IBSimilarity,
    from_config,
)


def test_from_config_dfr_dfi_ib():
    assert from_config({"type": "DFR", "basic_model": "ine",
                        "after_effect": "l", "normalization": "h1",
                        "normalization.h1.c": 2.0}) == \
        DFRSimilarity("ine", "l", "h1", 2.0)
    assert from_config({"type": "DFI",
                        "independence_measure": "saturated"}) == \
        DFISimilarity("saturated")
    assert from_config({"type": "IB", "distribution": "spl",
                        "lambda": "ttf", "normalization": "no"}) == \
        IBSimilarity("spl", "ttf", "no")
    for s in (DFRSimilarity("if", "b", "h2"), DFISimilarity(),
              IBSimilarity("ll", "df", "h1", 0.5)):
        assert from_config(s.to_config()) == s
    assert not DFRSimilarity().is_default_bm25


@pytest.mark.parametrize("norm", ["h3", "z"])
def test_h3_z_refused(spark, norm, index_sf0001):
    """h3/z normalizations refuse loudly instead of approximating
    (their Lucene constants are not reproduced here)."""
    from sparksearch.exec import Executor
    ex = Executor(index_sf0001, similarity={
        "type": "DFR", "basic_model": "g", "after_effect": "l",
        "normalization": norm})
    with pytest.raises(NotImplementedError, match="normalization"):
        ex.search(Match("text", "join"), k=5, fetch=False).collect()


@pytest.mark.parametrize("model,effect,norm", [
    ("g", "b", "h2"), ("in", "l", "h2"), ("ine", "b", "no"),
    ("if", "l", "h1"),
])
def test_dfr_matches_python_recompute(spark, index_sf0001, model,
                                      effect, norm):
    from sparksearch.exec import Executor
    term = "join"
    ex = Executor(index_sf0001, similarity={
        "type": "DFR", "basic_model": model, "after_effect": effect,
        "normalization": norm})
    got = {r.docid: r.score
           for r in ex.search(Match("text", term), k=1000,
                              fetch=False).collect()}
    tf, df, cf, N, ttf, avgdl, dlq = _idx_stats(index_sf0001, term)
    log2 = lambda x: math.log(x, 2)
    for d, t in tf.items():
        fl = dlq[d]
        tfn = {"no": t, "h1": t * avgdl / fl,
               "h2": t * log2(1 + avgdl / fl)}[norm]
        A = 1.0 if effect == "l" else (cf + 2.0) / df
        if model == "g":
            lam = (cf + 1.0) / (N + cf + 1.0)
            m = log2(1 + lam) + tfn * log2((1 + lam) / lam)
        elif model == "in":
            m = tfn * log2((N + 1.0) / (df + 0.5))
        elif model == "ine":
            ne = N * (1 - ((N - 1.0) / N) ** cf)
            m = tfn * log2((N + 1.0) / (ne + 0.5))
        else:
            m = tfn * log2(1 + (N + 1.0) / (cf + 0.5))
        want = max(0.0, A * m / (1 + tfn))
        assert got[d] == pytest.approx(want, rel=1e-6), (d, model)


@pytest.mark.parametrize("measure", ["standardized", "saturated",
                                     "chisquared"])
def test_dfi_matches_python_recompute(spark, index_sf0001, measure):
    from sparksearch.exec import Executor
    term = "join"
    ex = Executor(index_sf0001,
                  similarity={"type": "DFI",
                              "independence_measure": measure})
    got = {r.docid: r.score
           for r in ex.search(Match("text", term), k=1000,
                              fetch=False).collect()}
    tf, df, cf, N, ttf, avgdl, dlq = _idx_stats(index_sf0001, term)
    for d, t in tf.items():
        e = (cf + 1.0) * dlq[d] / (ttf + 1.0)
        if t <= e:
            want = 0.0
        else:
            m = {"standardized": (t - e) / math.sqrt(e),
                 "saturated": (t - e) / e,
                 "chisquared": (t - e) ** 2 / e}[measure]
            want = math.log(m + 1, 2)
        assert got[d] == pytest.approx(want, rel=1e-6, abs=1e-9)


def test_ib_spl_positive_and_ranked(spark, index_sf0001):
    from sparksearch.exec import Executor
    ex = Executor(index_sf0001, similarity={
        "type": "IB", "distribution": "spl", "lambda": "ttf",
        "normalization": "h2"})
    r = ex.search(Match("text", "join table"), k=10,
                  fetch=False).collect()
    assert len(r) > 0
    assert all(x.score > 0 for x in r)
    assert [x.score for x in r] == sorted((x.score for x in r),
                                          reverse=True)


def _idx_stats(ix, term):
    """Recompute (tf, df, cf, N, ttf, avgdl, dl_q) straight from the
    index's postings/doc tables so the python side sees exactly the
    corpus the Executor scored (avgdl/total_tf from the committed
    meta, like Executor._term_scores)."""
    post = (ix.postings.filter(f"term = '{term}'")
            .select("docid", "tf").collect())
    tf = {r.docid: r.tf for r in post}
    N, ttf = ix.n_docs, int(ix.meta["total_tf"])
    dlq = {r.docid: r.dl_q
           for r in ix.docs.select("docid", "dl_q").collect()}
    return (tf, len(tf), sum(tf.values()), N, ttf, ix.avgdl, dlq)


def test_wand_rank_identical_under_tuned_bm25(spark, index_sf0001):
    """The packed impact pairs are raw (max_tf, min_dlq) statistics, so
    block-max WAND must stay rank-and-score identical to the plan path
    under ANY BM25 (k1, b) — and forced-plan vs forced-wand must agree
    exactly."""
    from sparksearch.exec import Executor
    from sparksearch.merge import ensure_segments
    from sparksearch.queries import Match
    ensure_segments(spark, index_sf0001.index_dir)
    ix = index_sf0001.reload()
    for k1, b in ((1.6, 0.9), (0.5, 0.2), (2.0, 1.0)):
        ex = Executor(ix, similarity={"type": "BM25", "k1": k1, "b": b})
        q = Match("text", "hash join table")
        plan = [(r.docid, round(r.score, 6)) for r in
                ex.search(q, k=10, fetch=False, mode="plan").collect()]
        wand = [(r.docid, round(r.score, 6)) for r in
                ex.search(q, k=10, fetch=False, mode="wand").collect()]
        assert plan == wand, (k1, b)


def test_dfr_ib_nondecreasing_in_freq(spark):
    """The post-LUCENE-8015 guarantee: with stats fixed, every DFR and
    IB configuration's score is non-decreasing in tf (the refactor that
    introduced the aeTimes1pTfn/(1+tfn) form exists precisely for
    this)."""
    import itertools

    from pyspark.sql import functions as F

    from sparksearch.similarity import DFRSimilarity, IBSimilarity
    base = (spark.createDataFrame([(t,) for t in range(1, 40)],
                                  "tf long")
            .withColumn("df", F.lit(10).cast("long"))
            .withColumn("cf", F.lit(80).cast("long")))
    sims = [DFRSimilarity(m, e, n)
            for m, e, n in itertools.product(
                ("g", "if", "in", "ine"), ("b", "l"),
                ("no", "h1", "h2"))]
    sims += [IBSimilarity(d, l, n)
             for d, l, n in itertools.product(
                 ("ll", "spl"), ("df", "ttf"), ("no", "h1", "h2"))]
    for sim in sims:
        col = sim.score_expr(F.col("tf"), F.lit(40.0).cast("double"),
                             n_docs=1000, avgdl=50.0, total_tf=50000)
        vals = [r.s for r in
                base.select(col.alias("s")).orderBy("tf").collect()]
        assert all(b >= a - 1e-12 for a, b in zip(vals, vals[1:])), sim
        assert all(v >= 0.0 for v in vals), sim
