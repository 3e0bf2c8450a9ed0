"""Damerau-Levenshtein edit distance for fuzzy term expansion.

The reference's fuzzy matching defaults to `transpositions=true`
(sv/common/unit/Fuzziness.java, sv/index/query/FuzzyQueryBuilder.java:60
`DEFAULT_TRANSPOSITIONS`; MatchQuery.java:291-342 passes it to Lucene's
FuzzyQuery, whose automaton treats an adjacent transposition as ONE
primitive edit).  Spark has no built-in transposition-aware distance, so
the engine plans fuzzy expansion in two stages:

  1. JVM prefilter over the term dictionary (distributed, no Python):
     length band |len(t) - len(q)| <= f  (every DL edit changes length by
     at most 1) AND levenshtein(t, q) <= 2f  (a transposition costs one DL
     edit but at most two plain-Levenshtein edits, so DL(a,b) <= f implies
     lev(a,b) <= 2f — the prefilter never drops a true match);
  2. exact unrestricted Damerau-Levenshtein on the pruned candidates via
     an Arrow-batched pandas UDF (the survivors are a tiny, bounded slice
     of the dictionary, so the Python hop is off the hot path).

The DP below is the Lowrance-Wagner *unrestricted* metric — the same
semantics as DuckDB's `damerau_levenshtein`, which the correctness gate
uses as the independently-implemented oracle (e.g. dl('ca','abc') = 2,
where the restricted/OSA variant gives 3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["dl_distance", "dl_dist_col"]


def dl_distance(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein distance (Lowrance-Wagner DP):
    insert / delete / substitute / transpose-adjacent, where a transposed
    pair may be edited again afterwards."""
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    maxd = la + lb
    # d has a 2-row/col sentinel border (index 0 = the "minus one" row)
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    last_row: dict[str, int] = {}
    for i in range(1, la + 1):
        last_col = 0
        for j in range(1, lb + 1):
            k = last_row.get(b[j - 1], 0)
            lcol = last_col
            if a[i - 1] == b[j - 1]:
                cost = 0
                last_col = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,          # substitute / match
                d[i + 1][j] + 1,         # insert
                d[i][j + 1] + 1,         # delete
                # transpose a[k-1]==b[j-1] with a[i-1]==b[l-1], deleting /
                # inserting everything between the swapped pair
                d[k][lcol] + (i - k - 1) + 1 + (j - lcol - 1))
        last_row[a[i - 1]] = i
    return d[la + 1][lb + 1]


_PUDF = None


def _dl_pudf():
    # built lazily: pandas_udf parses its DDL return type through the
    # active SparkSession, so module import must stay session-free
    global _PUDF
    if _PUDF is None:
        def _batch(a: pd.Series, b: pd.Series) -> pd.Series:
            return pd.Series([dl_distance(x or "", y or "")
                              for x, y in zip(a, b)], dtype="int32")
        _PUDF = pandas_udf(_batch, "int")
    return _PUDF


def dl_dist_col(a: Column | str, b: Column | str) -> Column:
    """Column of exact Damerau-Levenshtein distances (Arrow-batched).
    Apply AFTER the JVM length-band + levenshtein<=2f prefilter."""
    return _dl_pudf()(F.col(a) if isinstance(a, str) else a,
                      F.col(b) if isinstance(b, str) else b)
