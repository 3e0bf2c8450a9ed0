"""Okapi BM25 scoring math, reference-exact.

Defaults k1=1.2, b=0.75, discount_overlaps=true
(/root/reference/server/src/main/java/org/opensearch/index/similarity/SimilarityProviders.java:308-316;
default similarity selection at sv/index/similarity/SimilarityService.java:72,99-125).

Per query term t and document d (LegacyBM25Similarity — includes the (k1+1)
numerator factor):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(d)  = tf / (tf + k1 * (1 - b + b * dl_q / avgdl))
    score   = sum_t idf(t) * (k1 + 1) * tfn(d)

where:
  N      = docCount for the field (global — DFS_QUERY_THEN_FETCH semantics,
           sv/search/dfs/DfsPhase.java:57-104 aggregated at
           sv/action/search/SearchPhaseController.java:106-122)
  df     = number of documents containing t (global)
  avgdl  = sumTotalTermFreq / docCount using RAW token counts
  dl_q   = the *quantized* doc length: SmallFloat decode(encode(raw_dl))
           (norms.py) — this is what makes ranks Lucene-identical.

Ties break by ascending docid (Lucene per-shard doc order, then shard order
in TopDocs.merge — sv/action/search/SearchPhaseController.java:246-249); we
define a deterministic global docid (dense, ordered by url) so the global
tie-break is simply docid asc.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75

__all__ = ["K1", "B", "idf", "bm25_term_score", "bm25_term_score_np"]


def idf(df: int, n_docs: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term_score(tf: float, df: int, n_docs: int, dl_q: float, avgdl: float,
                    k1: float = K1, b: float = B) -> float:
    """Score contribution of one term in one document."""
    w = idf(df, n_docs)
    return w * (k1 + 1.0) * tf / (tf + k1 * (1.0 - b + b * dl_q / avgdl))


def bm25_term_score_np(tf: np.ndarray, df: np.ndarray, n_docs: int,
                       dl_q: np.ndarray, avgdl: float,
                       k1: float = K1, b: float = B) -> np.ndarray:
    """Vectorized BM25 per-(term,doc) scores."""
    tf = np.asarray(tf, dtype=np.float64)
    df = np.asarray(df, dtype=np.float64)
    dl_q = np.asarray(dl_q, dtype=np.float64)
    w = np.log1p((n_docs - df + 0.5) / (df + 0.5))
    return w * (k1 + 1.0) * tf / (tf + k1 * (1.0 - b + b * dl_q / avgdl))
