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


def semantic_dedup(embs: DataFrame, k: int = 4, iters: int = 2,
                   tau: float = 0.35, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): k-means the embedding space, then inside every
    cluster mark as duplicate any item whose cosine similarity to a
    LOWER-id cluster member exceeds ``tau`` (deterministic keep-lowest
    rule standing in for the paper's keep-farthest-from-centroid).

    Returns (vid, cl, is_dup). Scale shape: the quadratic pair work is
    confined to clusters — the self-join key is the cluster id, so
    shuffle and compute are ∝ Σ|cluster|², never n²; k is the knob that
    bounds cluster size (SemDeDup runs k≈10⁵ at web scale). Cosines are
    rounded to 6 decimals before the threshold so the oracle comparison
    can't flip on summation noise."""
    assigned, _ = kmeans(embs, k, iters, id_col, vec_col)
    nrm = assigned.select(
        "vid", "cl",
        F.expr("transform(v, x -> x / sqrt(aggregate(v, 0D, "
               "(s, y) -> s + y * y)))").alias("nv"))
    a, b = nrm.alias("a"), nrm.alias("b")
    cos = F.round(F.aggregate(
        F.zip_with(F.col("a.nv"), F.col("b.nv"), lambda x, y: x * y),
        F.lit(0.0), lambda s, x: s + x), 6)
    dups = (a.join(b, (F.col("a.cl") == F.col("b.cl"))
                   & (F.col("a.vid") < F.col("b.vid")))
            .filter(cos > tau)
            .select(F.col("b.vid").alias("vid")).distinct()
            .withColumn("is_dup", F.lit(True)))
    return (assigned.select("vid", "cl")
            .join(dups, "vid", "left")
            .select("vid", "cl",
                    F.coalesce("is_dup", F.lit(False)).alias("is_dup")))
