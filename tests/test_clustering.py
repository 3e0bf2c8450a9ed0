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


def test_semantic_dedup_marks_within_cluster_neighbors(spark):
    """Two near-identical vectors in the same cluster: the higher id is
    marked dup; the distant vector is kept."""
    from sparksearch.clustering import semantic_dedup
    rows = [(0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
            (2, [0.0, 1.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 1.0, 0.0])]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r.vid: r.is_dup
           for r in semantic_dedup(embs, k=2, iters=2, tau=0.9).collect()}
    assert out[1] is True          # loses to lower-id near-twin
    assert out[0] is False and out[2] is False and out[3] is False


def test_semantic_dedup_cross_cluster_pairs_ignored(spark):
    """Identical vectors land in the same cluster by construction, but a
    pair above tau split across clusters is NOT compared (SemDeDup's
    within-cluster scope)."""
    from sparksearch.clustering import semantic_dedup
    # k=4 with 4 points: init centroids are the 4 points themselves, so
    # every point is its own cluster -> no pairs at all
    rows = [(i, v) for i, v in enumerate(
        ([1.0, 0.0], [0.999, 0.02], [0.0, 1.0], [0.02, 0.999]))]
    embs = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semantic_dedup(embs, k=4, iters=1, tau=0.9)
    assert all(not r.is_dup for r in out.collect())
