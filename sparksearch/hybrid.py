"""Hybrid retrieval: BM25 ∪ kNN candidate lists fused by reciprocal rank.

The reference's hybrid query (neural-search search-pipeline
`phase_results_processors`; OpenSearch core grew an RRF score-ranker
processor for the same job) runs each sub-query independently, then
combines the per-query rank lists — reciprocal rank fusion scores doc d as
Σ_lists 1/(k + rank_list(d)) with k=60 from Cormack et al. 2009. RRF needs
only ranks, never score calibration, which is why it is the standard way to
mix lexical BM25 with embedding-cosine retrieval.

Spark shape: each retriever emits a bounded top-`pool` candidate frame
(BM25 via the engine's TakeOrderedAndProject top-k; kNN via the
distributed cosine scan), so the rank window runs over ≤pool rows per
list — a driver-sized frame, NOT a corpus-wide single-partition window.
The fusion itself is a union + groupBy over ≤ n_lists·pool rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "normalize_fuse", "hybrid_search"]


def rrf_fuse(ranked_lists: list[DataFrame], rrf_k: int = 60,
             top_n: int = 10, key: str = "docid") -> DataFrame:
    """Fuse bounded candidate lists (key, score) by reciprocal rank.

    Each input frame must already be a TOP-POOL result (bounded rows);
    ranks are assigned by (score desc, key asc) within each list."""
    w = Window.orderBy(F.col("score").desc(), F.col(key).asc())
    contribs = [
        df.select(key, "score")
          .withColumn("_rank", F.row_number().over(w))
          .select(key, (1.0 / (F.lit(float(rrf_k)) + F.col("_rank")))
                  .alias("_c"))
        for df in ranked_lists
    ]
    u = contribs[0]
    for c in contribs[1:]:
        u = u.unionByName(c)
    return (u.groupBy(key)
            .agg(F.round(F.sum("_c"), 6).alias("score"))
            .orderBy(F.col("score").desc(), F.col(key).asc())
            .limit(top_n))


def normalize_fuse(ranked_lists: list[DataFrame],
                   normalization: str = "min_max",
                   combination: str = "arithmetic_mean",
                   weights: list[float] | None = None,
                   top_n: int = 10, key: str = "docid") -> DataFrame:
    """Score-normalization fusion — the neural-search plugin's
    normalization-processor semantics (plugin repo, not in the reference
    core; core only registers the phase-results hook):

    per list:  min_max → (s - min)/(max - min), constant list → 1.0;
               l2 → s / sqrt(Σ s²), zero list → 0.0
    combine:   arithmetic_mean → Σ wᵢ·nᵢ / Σ wᵢ over ALL lists
               (a doc missing from a list contributes 0 for it);
               geometric_mean → exp(Σ wᵢ·ln nᵢ / Σ wᵢ) and
               harmonic_mean → Σ wᵢ / Σ wᵢ/nᵢ, both over the lists
               where the doc appears with n > 0 (log/÷0 guards).

    Inputs are bounded top-pool frames, so the per-list min/max window
    and the fusion groupBy run over ≤ n_lists·pool rows total."""
    nl = len(ranked_lists)
    w = [1.0] * nl if weights is None else [float(x) for x in weights]
    if len(w) != nl:
        raise ValueError(f"weights length {len(w)} != {nl} sub-queries")
    if normalization not in ("min_max", "l2"):
        raise ValueError(f"unsupported normalization: {normalization}")
    if combination not in ("arithmetic_mean", "geometric_mean",
                           "harmonic_mean"):
        raise ValueError(f"unsupported combination: {combination}")
    win = Window.partitionBy()          # whole (bounded) leg
    legs = []
    for i, df in enumerate(ranked_lists):
        s = F.col("score")
        if normalization == "min_max":
            mn, mx = F.min(s).over(win), F.max(s).over(win)
            norm = (F.when(mx == mn, F.lit(1.0))
                    .otherwise((s - mn) / (mx - mn)))
        else:
            nrm = F.sqrt(F.sum(s * s).over(win))
            norm = F.when(nrm == 0.0, F.lit(0.0)).otherwise(s / nrm)
        legs.append(df.select(key, norm.alias("_n"),
                              F.lit(w[i]).alias("_w")))
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    tot_w = float(sum(w))
    if combination == "arithmetic_mean":
        score = F.sum(F.col("_w") * F.col("_n")) / F.lit(tot_w)
    elif combination == "geometric_mean":
        pos = F.col("_n") > 0.0
        score = F.exp(F.sum(F.when(pos, F.col("_w") * F.log("_n")))
                      / F.sum(F.when(pos, F.col("_w"))))
    else:
        pos = F.col("_n") > 0.0
        score = (F.sum(F.when(pos, F.col("_w")))
                 / F.sum(F.when(pos, F.col("_w") / F.col("_n"))))
    return (u.groupBy(key)
            .agg(F.round(score, 6).alias("score"))
            .filter(F.col("score").isNotNull())
            .orderBy(F.col("score").desc(), F.col(key).asc())
            .limit(top_n))


def _doc_id_of_url(col):
    """pages urls embed the source doc_id as the zero-padded last 8 chars
    (corpus._url_expr) — the deterministic docid↔vec_id bridge."""
    return F.substring(col, -8, 8).cast("long")


def hybrid_search(ex, q, emb: DataFrame, query_vec_id: int,
                  k: int = 10, pool: int = 50, rrf_k: int = 60,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """BM25 top-`pool` for query `q` + cosine top-`pool` around
    `query_vec_id`, RRF-fused to the final top-`k` (docid, score).

    The kNN list maps vec_id→docid through the docs table's url key; both
    legs stay bounded so fusion is a broadcast-scale operation."""
    from sparksearch.dataops import brute_force_knn

    bm = (ex.search(q, k=pool, fetch=False)
          .select("docid", F.round("score", 4).alias("score")))

    knn = brute_force_knn(emb, query_vec_id, k=pool,
                          id_col=id_col, vec_col=vec_col)
    vec_docids = (ex.ix.docs
                  .select("docid", _doc_id_of_url(F.col("url"))
                          .alias(id_col))
                  .join(F.broadcast(knn), id_col)
                  .select("docid", F.col("cosine").alias("score")))
    return rrf_fuse([bm, vec_docids], rrf_k=rrf_k, top_n=k)
