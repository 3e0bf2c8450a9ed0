"""Round-3 contract entries.

Fuzzy transpositions + expansion cap, non-English analyzers, and the
remaining reference-registry leaves (more_like_this doc form,
random_score, field_masking_span, highlighter options, rank_eval ERR,
completion contexts / fuzzy prefix).  Every entry has a DuckDB oracle
that recomputes the semantics independently (transposition distance via
DuckDB's own `damerau_levenshtein`, not the engine's DP).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sparksearch import contract as C
from sparksearch.queries import Match


# ---------------------------------------------------------------------------
# fuzzy: Damerau transpositions (reference default) + max_expansions cap
# ---------------------------------------------------------------------------

def q_match_fuzzy_transpose(spark, sf_dir):
    """'jion tbale' at fuzziness=1: both terms reach their targets ONLY
    via an adjacent transposition (DL=1, plain levenshtein=2) — the case
    the reference's transpositions=true default exists for
    (sv/common/unit/Fuzziness.java, FuzzyQueryBuilder.java
    DEFAULT_TRANSPOSITIONS)."""
    _, ex = C.get_engine(spark, sf_dir)
    return C.topk_rounded(ex, Match("text", "jion tbale", fuzziness=1), k=10)


def q_fuzzy_capped(spark, sf_dir):
    """max_expansions binds: 'part'~2 expands to 4 dictionary terms
    (fast, part, sort, spark); max_expansions=2 keeps the 2 highest-df
    (df desc, term asc — Lucene TopTermsBlendedFreqScoringRewrite
    order), so the result provably reflects the cap."""
    _, ex = C.get_engine(spark, sf_dir)
    return C.topk_rounded(
        ex, Match("text", "part", fuzziness=2, max_expansions=2), k=10)


def _fuzzy_dl_sql(term_fz: list[tuple[str, int]], cap: int,
                  msm: int = 0, k: int = 10) -> str:
    """Blended fuzzy-match oracle: expansion set from DuckDB's own
    damerau_levenshtein (independent of the engine's DP), df-ranked
    row_number cap, per-clause MAX over expansions, summed."""
    P, TOK, DL = C._PAGES, C._TOK, C._DL
    idf, tfn = C._idf_sql, C._tfn_sql
    vals = ", ".join(f"('{t}', {fz}, 1.0)" for t, fz in term_fz)
    return f"""
WITH {P}, {TOK}, {DL},
dict AS ( SELECT term, CAST(count(DISTINCT docid) AS BIGINT) AS df
          FROM tok GROUP BY term ),
qts AS ( SELECT * FROM (VALUES {vals}) v(qt, fz, w) ),
exp0 AS ( SELECT q.qt, q.w, d.term, d.df FROM qts q JOIN dict d
          ON abs(length(d.term) - length(q.qt)) <= q.fz
          AND damerau_levenshtein(d.term, q.qt) <= q.fz ),
exp AS ( SELECT qt, w, term, df FROM (
           SELECT *, row_number() OVER (PARTITION BY qt
                       ORDER BY df DESC, term ASC) AS rn FROM exp0 )
         WHERE rn <= {cap} ),
tf AS ( SELECT docid, term, count(*) AS tf FROM tok
        WHERE term IN ( SELECT term FROM exp ) GROUP BY docid, term ),
sc AS ( SELECT tf.docid, e.qt, e.w,
               max({idf('e.df', 'g.n')} *
                   {tfn('tf.tf', 'dlq.dl_q', 'g.avgdl')}) AS s
        FROM tf JOIN exp e USING (term) JOIN dlq USING (docid) CROSS JOIN g
        GROUP BY tf.docid, e.qt, e.w ),
agg AS ( SELECT docid, sum(w * s) AS score, sum(w) AS nm
         FROM sc GROUP BY docid )
SELECT p.docid, p.url, round(agg.score, 4) AS score
FROM agg JOIN pages p USING (docid)
WHERE agg.nm >= {msm}
ORDER BY round(agg.score, 4) DESC, p.docid ASC LIMIT {k}
""".strip()


# ---------------------------------------------------------------------------
# batch ANN join with auto-sized planes
# ---------------------------------------------------------------------------

def q_knn_join_lsh_sized(spark, sf_dir):
    """lsh_knn_join with planes=None: the plane count derives from the
    corpus size (ceil(log2(n / target_bucket))) instead of a fixed
    constant — 500 vectors at target_bucket=64 auto-sizes to 3 planes /
    8 cells. The oracle mirrors the same 3-plane projection in SQL."""
    from sparksearch.contract_dataops import _emb
    from sparksearch.dataops import lsh_knn_join
    return lsh_knn_join(_emb(spark, sf_dir), k=5, planes=None,
                        target_bucket=64, multiprobe=1,
                        query_ids=list(range(10)))


# ---------------------------------------------------------------------------
# driver-local BPE trainer (the 100 TB merge-loop shape)
# ---------------------------------------------------------------------------

def q_bpe_merges_local(spark, sf_dir):
    """bpe_train's driver-local merge loop: the Zipf-bounded word
    histogram is collected once and the K merge steps run on the driver
    with incremental pair-count maintenance — zero cluster jobs per
    merge, vs one shuffle per step in the distributed loop. Must produce
    byte-identical merges (same oracle SQL as `bpe_merges`)."""
    from sparksearch.bpe import bpe_train
    from sparksearch import contract_round2m as M
    merges = bpe_train(M.C.pages_df(spark, sf_dir), M._BPE_K,
                       driver_max_words=2_000_000)
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["pair_count"])
         for m in merges],
        "step int, left string, right string, merged string, "
        "pair_count long")


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def queries() -> dict:
    return {
        "match_fuzzy_transpose": q_match_fuzzy_transpose,
        "fuzzy_capped": q_fuzzy_capped,
        "knn_join_lsh_sized": q_knn_join_lsh_sized,
        "bpe_merges_local": q_bpe_merges_local,
    }


def oracle_sql() -> dict:
    from sparksearch.contract_dataops import sql_knn_join_lsh
    from sparksearch.dataops import lsh_planes_for
    return {
        "match_fuzzy_transpose": _fuzzy_dl_sql(
            [("jion", 1), ("tbale", 1)], cap=50),
        "fuzzy_capped": _fuzzy_dl_sql([("part", 2)], cap=2),
        # the gate corpus (sf0.01 embeddings) has 500 vectors; the oracle
        # derives the plane count through the same public formula
        "knn_join_lsh_sized": sql_knn_join_lsh(
            planes=lsh_planes_for(500, target_bucket=64)),
        "bpe_merges_local": __import__(
            "sparksearch.contract_round2m",
            fromlist=["_bpe_merges_sql"])._bpe_merges_sql(),
    }
