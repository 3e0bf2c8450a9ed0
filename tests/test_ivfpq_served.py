"""Served IVF-PQ lifecycle: build-once persistence, residual encoding,
query-time pruning, and recall sanity vs exact L2."""

import json
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    from sparksearch.dataops import ivfpq_build
    out = str(tmp_path_factory.mktemp("ivfpq"))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    ivfpq_build(emb, out, n_cells=8, m=8, kc=16, iters=1)
    return out


def test_build_persists_codes_and_meta(spark, index_dir):
    meta = json.load(open(os.path.join(index_dir, "ivfpq_meta.json")))
    assert meta["m"] == 8 and meta["kc"] == 16 and meta["dim"] == 64
    assert len(meta["centroids"]) == 8
    assert len(meta["books"]) == 8
    assert all(len(b) == 16 and len(b[0]) == 8 for b in meta["books"])
    codes = spark.read.parquet(os.path.join(index_dir, "codes"))
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert codes.count() == emb.count()
    # every code is a valid m-vector of [0, kc) ints, every cell valid
    bad = codes.where(
        (F.size("code") != 8) | (F.col("cell") < 0) | (F.col("cell") >= 8)
        | F.exists("code", lambda c: (c < 0) | (c >= 16))).count()
    assert bad == 0
    # cell-partitioned layout on disk
    assert any(d.startswith("cell=")
               for d in os.listdir(os.path.join(index_dir, "codes")))


def test_query_prunes_and_answers(spark, index_dir):
    from sparksearch.dataops import ivfpq_query
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = emb.where("vec_id = 3").first()["embedding"]
    out = ivfpq_query(spark, index_dir, qv, k=10, n_probe=2, exclude_id=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cell" in plan
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["adc"] is not None and r["vid"] != 3 for r in rows)
    assert [r["adc"] for r in rows] == sorted(r["adc"] for r in rows)


def test_recall_vs_exact_l2(spark, index_dir):
    """Full-probe residual-PQ top-10 must recover most of the exact
    L2 top-10 (ADC is an approximation; residual coding keeps it
    tight at full probe)."""
    from sparksearch.dataops import ivfpq_query
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = emb.where("vec_id = 3").first()["embedding"]
    approx = {r["vid"] for r in
              ivfpq_query(spark, index_dir, qv, k=10, n_probe=8,
                          exclude_id=3).collect()}
    qarr = "array(" + ", ".join(repr(float(x)) for x in qv) + ")"
    l2 = F.expr(f"aggregate(zip_with(transform(embedding, "
                f"x -> CAST(x AS DOUBLE)), {qarr}, "
                f"(x, y) -> (x - y) * (x - y)), 0D, (a, x) -> a + x)")
    exact = {r["vec_id"] for r in
             emb.where("vec_id != 3")
                .select("vec_id", l2.alias("d"))
                .orderBy("d", "vec_id").limit(10).collect()}
    # ~50 random unit vectors is a worst case for PQ (distances
    # concentrate); still expect a solid overlap, not chance (~2)
    assert len(approx & exact) >= 3


def test_query_beats_percall_form_on_jobs(spark, index_dir):
    """The served query never touches the float-vector table."""
    from sparksearch.dataops import ivfpq_query
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qv = emb.where("vec_id = 3").first()["embedding"]
    out = ivfpq_query(spark, index_dir, qv, k=5, n_probe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "embeddings.parquet" not in plan
    assert "codes" in plan
