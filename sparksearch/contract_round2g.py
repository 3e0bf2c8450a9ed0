"""Driver-contract entries, round-2g surface: configurable similarity
modules (BM25 k1/b tuning, boolean, LMDirichlet, LMJelinekMercer).

Reference cites: sv/index/similarity/SimilarityService.java (BUILT_IN
registry), SimilarityProviders.java (parameter parsing); Lucene
BooleanSimilarity / LMDirichletSimilarity / LMJelinekMercerSimilarity for
the formulas (collection probability p = (cf+1)/(T+1), scores clamped at
0, doc length = the SmallFloat-decoded norm — our dl_q).

Every entry runs the same two-term match through an Executor with the
similarity overridden (the index-settings path is covered by
tests/test_similarity.py building a small index with meta-persisted
similarity); the oracle recomputes the exact formula in SQL over the same
corpus, so a drift in any constant (mu, lambda, the +1 smoothing, the
clamp) fails the gate.
"""

from __future__ import annotations

from sparksearch import contract as C

_idf, _tfn = C._idf_sql, C._tfn_sql

_Q = ("hash", "join")
_MU = 2000.0
_LAM = 0.1
_K1T, _BT = 1.6, 0.9    # tuned BM25 entry


def _run(spark, sf_dir, similarity):
    from sparksearch.exec import Executor
    from sparksearch.queries import Match
    ix, _ = C.get_engine(spark, sf_dir)
    ex = Executor(ix, similarity=similarity)
    return C.topk_rounded(ex, Match("text", " ".join(_Q)), k=10)


def q_sim_lmdirichlet(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "LMDirichlet", "mu": _MU})


def q_sim_lmjm(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "LMJelinekMercer", "lambda": _LAM})


def q_sim_boolean(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "boolean"})


def q_sim_bm25_tuned(spark, sf_dir):
    return _run(spark, sf_dir, {"type": "BM25", "k1": _K1T, "b": _BT})


_SCRIPT = ("Math.log(1 + doc.freq) * "
           "Math.log(field.docCount / (term.docFreq + 1.0))")


def q_sim_scripted(spark, sf_dir):
    """`scripted` similarity: a TF-IDF-style user expression compiled by
    the Painless-subset compiler into the scoring column."""
    return _run(spark, sf_dir,
                {"type": "scripted", "script": {"source": _SCRIPT}})


def _per_term(term: str, tag: str, formula: str) -> str:
    """CTE chain: tf + cf for one term; `formula` references tf{tag}.tf,
    cf{tag}.cf, dlq.dl_q, g.* freely."""
    return f"""
tf{tag} AS ( SELECT docid, count(*) AS tf FROM tok WHERE term = '{term}'
        GROUP BY docid ),
cf{tag} AS ( SELECT count(*) AS cf FROM tok WHERE term = '{term}' ),
df{tag} AS ( SELECT count(*) AS df FROM tf{tag} ),
sc{tag} AS ( SELECT tf{tag}.docid, {formula} AS s
        FROM tf{tag} CROSS JOIN cf{tag} CROSS JOIN df{tag}
        JOIN dlq USING (docid) CROSS JOIN g )""".strip()


def _sum_topk(tags: list[str]) -> str:
    unions = " UNION ALL ".join(f"SELECT * FROM sc{t}" for t in tags)
    return f"""
sc AS ( SELECT docid, sum(s) AS score FROM ( {unions} ) GROUP BY docid )
SELECT p.docid, p.url, round(sc.score, 4) AS score
FROM sc JOIN pages p USING (docid)
ORDER BY round(sc.score, 4) DESC, p.docid ASC
LIMIT 10""".strip()


def sqls() -> dict[str, str]:
    P, TOK, DL = C._PAGES, C._TOK, C._DL

    def build(formula_for):
        chains = [_per_term(t, chr(ord('a') + i),
                            formula_for(chr(ord('a') + i)))
                  for i, t in enumerate(_Q)]
        tags = [chr(ord('a') + i) for i in range(len(_Q))]
        return ("WITH " + ",\n".join([P, TOK, DL] + chains) + ",\n"
                + _sum_topk(tags))

    lmd = lambda g: (
        f"greatest(0.0, ln(1 + tf{g}.tf / ({_MU} * (cf{g}.cf + 1.0) / "
        f"(g.ttf + 1.0))) + ln({_MU} / (dlq.dl_q + {_MU})))")
    lmjm = lambda g: (
        f"greatest(0.0, ln(1 + ((1.0 - {_LAM}) * tf{g}.tf / dlq.dl_q) / "
        f"({_LAM} * (cf{g}.cf + 1.0) / (g.ttf + 1.0))))")
    boolean = lambda g: "1.0"
    bm25t = lambda g: (
        f"{_idf(f'df{g}.df', 'g.n')} * ({_K1T + 1.0} * tf{g}.tf / "
        f"(tf{g}.tf + {_K1T} * (1 - {_BT} + {_BT} * dlq.dl_q / g.avgdl)))")

    scripted = lambda g: (
        f"ln(1 + tf{g}.tf) * ln(g.n / (df{g}.df + 1.0))")

    return {
        "similarity_lmdirichlet": build(lmd),
        "similarity_lmjm": build(lmjm),
        "similarity_boolean": build(boolean),
        "similarity_bm25_tuned": build(bm25t),
        "similarity_scripted": build(scripted),
    }


def oracle_sql() -> dict:
    return sqls()


def queries() -> dict:
    return {
        "similarity_lmdirichlet": q_sim_lmdirichlet,
        "similarity_lmjm": q_sim_lmjm,
        "similarity_boolean": q_sim_boolean,
        "similarity_bm25_tuned": q_sim_bm25_tuned,
        "similarity_scripted": q_sim_scripted,
    }
