"""Fetch-phase add-ons: highlighting and term suggestion.

- highlight: the reference re-analyzes fetched text and wraps matched terms
  (sv/search/fetch/subphase/highlight/PlainHighlighter.java — default tags
  <em>/</em>). Here: word-boundary regexp_replace over the fetched text —
  exact for the engine's whitespace-separated corpus, JVM-side, and
  reproducible in the SQL oracle.
- term suggester: corrections from the term dictionary ranked by
  (edit distance asc, df desc, term asc) within max_edits — the analogue of
  sv/search/suggest/ term suggesting over the live dictionary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["highlight", "suggest_terms"]


def highlight(topk: DataFrame, pages: DataFrame, terms: list[str],
              pre: str = "<em>", post: str = "</em>") -> DataFrame:
    """Wrap query-term word occurrences in the fetched text.

    `topk` must carry (docid, url, score); text comes from the corpus via a
    broadcast join on url (the fetch phase itself)."""
    import re as _re
    pat = r"\b(" + "|".join(_re.escape(t) for t in sorted(set(terms))) + r")\b"
    fetched = pages.select("url", "text").join(F.broadcast(topk), "url")
    return (fetched.select(
        "docid", "url", "score",
        F.regexp_replace(F.col("text"), pat, f"{pre}$1{post}")
        .alias("highlight"))
        .orderBy(F.col("score").desc(), F.col("docid").asc()))


def suggest_terms(ix, text: str, max_edits: int = 2,
                  size: int = 3) -> DataFrame:
    """Term-suggester: nearest dictionary terms for each input token."""
    from sparksearch.analysis import analyze
    toks = sorted({t for t, _ in analyze(text, ix.analyzer)})
    if not toks:
        return ix.stats.select(
            F.lit("").alias("input"), "term", "df").limit(0)
    inputs = ix.spark.createDataFrame([(t,) for t in toks], "input string")
    d = ix.stats.select("term", "df")
    from pyspark.sql import Window
    cand = (inputs.crossJoin(d)
            .withColumn("dist",
                        F.levenshtein(F.col("input"), F.col("term")))
            .where(F.col("dist") <= max_edits)
            .where(F.col("dist") > 0))
    w = Window.partitionBy("input").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= size)
            .select("input", "term", F.col("dist").cast("int").alias("dist"),
                    F.col("df").cast("long").alias("df"), "rank")
            .orderBy("input", "rank"))
