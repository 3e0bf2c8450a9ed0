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

__all__ = ["rrf_fuse", "hybrid_search"]


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
