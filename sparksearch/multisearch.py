"""Cross-index search: one query over many indices, merged top-k.

The reference resolves the request's index expression (names, commas,
`*` wildcards, aliases — sv/cluster/metadata/IndexNameExpressionResolver
.java) to a set of concrete indices, fans the query out, scores each
shard with ITS OWN statistics under the default QUERY_THEN_FETCH
(per-shard idf/avgdl — only DFS_QUERY_THEN_FETCH globalizes them), and
merges the per-shard top-k by score in the coordinating node's reduce
(sv/action/search/TransportSearchAction.java, SearchPhaseController).

Spark shape: each index contributes its own bounded top-k plan (each
already pruned/broadcast/TakeOrderedAndProject on its own index), the
union is k·|indices| rows, and the final merge is another
TakeOrderedAndProject over that tiny union — no cross-index shuffle of
anything but top-k rows. Ties across indices break by (_index, docid),
the analogue of the reference's shard-index tie-break.
"""

from __future__ import annotations

from fnmatch import fnmatch
from functools import reduce

from pyspark.sql import DataFrame, functions as F

__all__ = ["resolve_indices", "msearch_indices"]


def resolve_indices(executors: dict, expression: str) -> dict:
    """Index-expression resolution: comma-separated names and `*`
    wildcards against the registered index names."""
    pats = [p.strip() for p in expression.split(",") if p.strip()]
    out = {name: ex for name, ex in executors.items()
           if any(fnmatch(name, p) for p in pats)}
    if not out:
        raise ValueError(f"no indices match {expression!r}")
    return out


def msearch_indices(executors: dict, q, k: int = 10,
                    expression: str = "*", search_fn=None) -> DataFrame:
    """Merged top-k over every matching index: (_index, docid, url,
    score), score desc then (_index, docid) asc. `search_fn(ex, q, k)`
    overrides the per-index search (e.g. a rounded-score variant)."""
    chosen = resolve_indices(executors, expression)
    run = search_fn or (lambda ex, qq, kk: ex.search(qq, k=kk, fetch=True))
    legs = [run(ex, q, k)
            .withColumn("_index", F.lit(name))
            for name, ex in sorted(chosen.items())]
    union = reduce(DataFrame.unionByName, legs)
    return (union
            .orderBy(F.col("score").desc(), F.col("_index").asc(),
                     F.col("docid").asc())
            .limit(k)
            .select("_index", "docid", "url", "score"))
