"""Shared Spark session + built-index fixtures."""

from __future__ import annotations

import os
import shutil

import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder
         .master("local[8]")
         .appName("sparksearch-tests")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .config("spark.driver.memory", "8g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def index_sf0001(spark, tmp_path_factory):
    """Index built over pages derived from sf0.001 documents."""
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.index import IndexReader

    out = str(tmp_path_factory.mktemp("index") / "sf0001")
    pages = pages_from_documents(spark, f"{TESTDATA}/sf0.001")
    build_index(pages, out, analyzer="standard", n_buckets=4, partitions=4,
                verify_extract=True)
    yield IndexReader(spark, out)
    shutil.rmtree(out, ignore_errors=True)


@pytest.fixture(scope="session")
def oracle_sf0001(spark):
    """OracleIndex over the same corpus, same docid order (url asc)."""
    import duckdb
    from sparksearch.oracle import OracleIndex

    rows = duckdb.sql(f"""
        SELECT 'https://site' || (doc_id % 97) || '.example/p/' ||
               lpad(CAST(doc_id AS VARCHAR), 8, '0') AS url, text, lang
        FROM '{TESTDATA}/sf0.001/documents.parquet' ORDER BY url
    """).fetchall()
    docs = [{"url": r[0], "text": r[1], "lang": r[2]} for r in rows]
    return OracleIndex(docs), docs
