"""Deterministic Lloyd's k-means (clustering.py)."""

from __future__ import annotations


def test_kmeans_separates_obvious_clusters(spark):
    # two tight blobs on opposite corners; k=2 must split them exactly
    rows = []
    for i in range(10):
        rows.append((i, [0.0 + i * 1e-3, 0.0]))
        rows.append((100 + i, [10.0, 10.0 - i * 1e-3]))
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from sparksearch.clustering import kmeans
    assigned, cents = kmeans(embs, k=2, iters=2)
    got = {r["vid"]: r["cl"] for r in assigned.collect()}
    blob0 = {got[i] for i in range(10)}
    blob1 = {got[100 + i] for i in range(10)}
    assert len(blob0) == 1 and len(blob1) == 1 and blob0 != blob1
    # centroids converge to the blob means (rounded to 6)
    c0 = cents[blob0.pop()]
    assert abs(c0[0] - 0.0045) < 1e-6 and abs(c0[1]) < 1e-9


def test_kmeans_is_deterministic_across_runs(spark):
    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    from sparksearch.clustering import kmeans
    a1, c1 = kmeans(embs, k=3, iters=2)
    a2, c2 = kmeans(embs, k=3, iters=2)
    assert c1 == c2
    r1 = sorted((r["vid"], r["cl"]) for r in a1.collect())
    r2 = sorted((r["vid"], r["cl"]) for r in a2.collect())
    assert r1 == r2
