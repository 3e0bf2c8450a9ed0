"""Embedding clustering: deterministic Lloyd's k-means in DataFrame algebra.

The training-data-pipeline op behind corpus bucketing / topic balancing /
semantic dedup sharding: cluster the embedding table, then sample or cap
per cluster. Spark shape per iteration:

  1. assignment: the k current centroids are a driver-side constant
     folded into ONE projection — per row, k squared-L2 distances via
     `zip_with` + `aggregate` (JVM higher-order functions, no Python,
     no join) and an argmin;
  2. update: `posexplode` the vectors and take groupBy(cluster, dim)
     means — one map-side-combinable shuffle of (k x dim) cells.

T iterations = T bounded driver round-trips of k x dim doubles — the
same "training, not serving" posture as bpe.bpe_train. Init is the k
lowest-id vectors (deterministic, seedless); new centroid means are
rounded to 6 decimals on every engine so float summation order (Spark's
partition-order-dependent avg) can never flip an assignment between
runs or between engines — the DuckDB oracle unrolls the identical
iterations.

Empty clusters keep their previous centroid (the standard Lloyd's
degenerate-case choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["kmeans_assign", "kmeans"]


def _dist_sql(cent: list[float]) -> str:
    arr = "array(" + ", ".join(repr(float(x)) for x in cent) + ")"
    return (f"aggregate(zip_with(v, {arr}, (x, y) -> (x - y) * (x - y)), "
            f"0D, (a, x) -> a + x)")


def kmeans_assign(e: DataFrame, cents: list[list[float]]) -> DataFrame:
    """Add `cl`: index of the nearest centroid (ties -> lowest index)."""
    dists = "array(" + ", ".join(_dist_sql(c) for c in cents) + ")"
    cl = (f"CAST(array_position({dists}, "
          f"array_min({dists})) - 1 AS INT)")
    return e.withColumn("cl", F.expr(cl))


def kmeans(embs: DataFrame, k: int = 4, iters: int = 2,
           id_col: str = "vec_id",
           vec_col: str = "embedding") -> tuple[DataFrame, list[list[float]]]:
    """(assigned frame with `cl`, final centroids) after `iters` Lloyd's
    iterations from the k lowest-id vectors."""
    e = (embs.select(
        F.col(id_col).alias("vid"),
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("v")))
    cents = [list(map(float, r["v"]))
             for r in e.orderBy("vid").limit(k).collect()]
    for _ in range(iters):
        assigned = kmeans_assign(e, cents)
        rows = (assigned
                .select("cl", F.posexplode("v").alias("pos", "val"))
                .groupBy("cl", "pos")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .collect())
        upd: dict[int, dict[int, float]] = {}
        for r in rows:
            upd.setdefault(int(r["cl"]), {})[int(r["pos"])] = float(r["m"])
        cents = [[upd[c][p] for p in range(len(cents[c]))] if c in upd
                 else cents[c] for c in range(k)]
    return kmeans_assign(e, cents), cents
