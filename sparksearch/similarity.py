"""Configurable similarity modules (index setting ``similarity``).

Reimplements the reference's per-field similarity registry
(/root/reference/server/src/main/java/org/opensearch/index/similarity/SimilarityService.java
BUILT_IN: BM25 / boolean / LMDirichlet / LMJelinekMercer / DFR / DFI / IB;
SimilarityProviders.java for the per-type parameter parsing) for the four
similarities that cover real usage:

- **BM25(k1, b)** — the default; tunable k1/b
  (SimilarityProviders.createBM25Similarity).
- **boolean** — score = query boost (1.0 here) per matching clause, no
  tf/idf (SimilarityProviders.createBooleanSimilarity; Lucene
  BooleanSimilarity).
- **LMDirichlet(mu=2000)** — Lucene LMDirichletSimilarity:
  ``max(0, log(1 + tf/(mu·p)) + log(mu/(dl+mu)))`` with collection
  probability ``p = (cf+1)/(T+1)`` (LMSimilarity.LMStats smoothing).
- **LMJelinekMercer(lambda=0.1)** — Lucene LMJelinekMercerSimilarity:
  ``max(0, log(1 + ((1-λ)·tf/dl) / (λ·p)))``.

All formulas are Catalyst column expressions over the per-posting row
(tf, dl_q) joined with the broadcast per-term stats (df, cf) — the same
single-scan plan shape as the default BM25 path. ``dl_q`` is the
SmallFloat-quantized doc length, exactly the decoded norm Lucene feeds its
similarities.

Scope: configurable similarity applies to the term-scored paths (match /
bool / msearch — everything through ``Executor._term_scores``). Positional
and expanded paths (phrase, spans, fuzzy, synonym-blended, MLT) raise
NotImplementedError under a non-BM25 similarity rather than silently
scoring BM25; the block-max WAND path requires default-parameter BM25
(its stored impact bounds are BM25 upper bounds) and falls back to the
plan path otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from sparksearch import bm25

__all__ = ["Similarity", "BM25Similarity", "BooleanSimilarity",
           "LMDirichletSimilarity", "LMJelinekMercerSimilarity",
           "ScriptedSimilarity", "from_config"]


@dataclass(frozen=True)
class Similarity:
    """Scores one (docid, term) posting row. `score_expr` may reference
    the columns ``tf``, ``dl_q`` (posting) and ``df``, ``cf`` (broadcast
    per-term stats) plus the index-level constants passed in."""

    def score_expr(self, tf: Column, dl_q: Column, n_docs: int,
                   avgdl: float, total_tf: int) -> Column:
        raise NotImplementedError

    @property
    def is_default_bm25(self) -> bool:
        return False

    def to_config(self) -> dict:
        raise NotImplementedError


@dataclass(frozen=True)
class BM25Similarity(Similarity):
    k1: float = bm25.K1
    b: float = bm25.B

    def score_expr(self, tf, dl_q, n_docs, avgdl, total_tf):
        df = F.col("df").cast("double")
        idf = F.log1p((F.lit(float(n_docs)) - df + 0.5) / (df + 0.5))
        t = tf.cast("double")
        denom = t + self.k1 * (1.0 - self.b
                               + self.b * dl_q.cast("double") / float(avgdl))
        return idf * F.lit(self.k1 + 1.0) * t / denom

    @property
    def is_default_bm25(self) -> bool:
        return self.k1 == bm25.K1 and self.b == bm25.B

    def to_config(self) -> dict:
        return {"type": "BM25", "k1": self.k1, "b": self.b}


@dataclass(frozen=True)
class BooleanSimilarity(Similarity):
    def score_expr(self, tf, dl_q, n_docs, avgdl, total_tf):
        return F.lit(1.0)

    def to_config(self) -> dict:
        return {"type": "boolean"}


def _collection_prob(total_tf: int) -> Column:
    # LMSimilarity.LMStats: p = (totalTermFreq + 1) / (sumTotalTermFreq + 1)
    return (F.col("cf").cast("double") + 1.0) / float(total_tf + 1)


@dataclass(frozen=True)
class LMDirichletSimilarity(Similarity):
    mu: float = 2000.0

    def score_expr(self, tf, dl_q, n_docs, avgdl, total_tf):
        p = _collection_prob(total_tf)
        s = (F.log1p(tf.cast("double") / (F.lit(self.mu) * p))
             + F.log(F.lit(self.mu) / (dl_q.cast("double") + self.mu)))
        return F.greatest(s, F.lit(0.0))

    def to_config(self) -> dict:
        return {"type": "LMDirichlet", "mu": self.mu}


@dataclass(frozen=True)
class LMJelinekMercerSimilarity(Similarity):
    lam: float = 0.1

    def score_expr(self, tf, dl_q, n_docs, avgdl, total_tf):
        p = _collection_prob(total_tf)
        s = F.log1p((F.lit(1.0 - self.lam) * tf.cast("double")
                     / dl_q.cast("double")) / (F.lit(self.lam) * p))
        return F.greatest(s, F.lit(0.0))

    def to_config(self) -> dict:
        return {"type": "LMJelinekMercer", "lambda": self.lam}


@dataclass(frozen=True)
class ScriptedSimilarity(Similarity):
    """``scripted`` similarity (ScriptedSimilarityProvider; the script
    context of sv/script/SimilarityScript.java): the user's expression is
    compiled by the Painless-subset compiler to ONE Catalyst column.
    Reference binding names map onto the per-posting join columns:
    ``doc.freq``→tf, ``doc.length``→decoded norm (dl_q),
    ``term.docFreq``→df, ``term.totalTermFreq``→cf;
    ``field.docCount`` and ``field.sumTotalTermFreq`` are inlined as
    literals at plan time."""
    source: str = ""

    def score_expr(self, tf, dl_q, n_docs, avgdl, total_tf):
        from sparksearch.painless import compile_script
        src = (self.source
               .replace("doc.freq", "doc['tf']")
               .replace("doc.length", "doc['dl_q']")
               .replace("term.docFreq", "doc['df']")
               .replace("term.totalTermFreq", "doc['cf']")
               .replace("field.docCount", f"{float(n_docs)!r}")
               .replace("field.sumTotalTermFreq", f"{float(total_tf)!r}"))
        return compile_script(src).col.cast("double")

    def to_config(self) -> dict:
        return {"type": "scripted", "script": {"source": self.source}}


def from_config(cfg: dict | Similarity | None) -> Similarity:
    """Parse an index-settings similarity dict
    (SimilarityProviders.java parameter names)."""
    if cfg is None:
        return BM25Similarity()
    if isinstance(cfg, Similarity):
        return cfg
    typ = cfg.get("type", "BM25")
    if typ == "BM25":
        return BM25Similarity(k1=float(cfg.get("k1", bm25.K1)),
                              b=float(cfg.get("b", bm25.B)))
    if typ == "boolean":
        return BooleanSimilarity()
    if typ == "LMDirichlet":
        return LMDirichletSimilarity(mu=float(cfg.get("mu", 2000.0)))
    if typ == "LMJelinekMercer":
        return LMJelinekMercerSimilarity(
            lam=float(cfg.get("lambda", 0.1)))
    if typ == "scripted":
        return ScriptedSimilarity(source=cfg["script"]["source"])
    raise ValueError(f"unknown similarity type: {typ!r}")
