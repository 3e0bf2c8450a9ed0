"""Structured Streaming indexing: micro-batches become generations,
replayed batches are idempotent, queries see streamed docs."""

import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def stream_setup(spark, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents

    root = tmp_path_factory.mktemp("stream")
    ix_dir = str(root / "index")
    src_dir = str(root / "incoming")
    ckpt = str(root / "ckpt")
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    first = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    rest = pages.filter(F.crc32(F.col("url")) % 2 == 1)
    build_index(first, ix_dir, n_buckets=4, partitions=4)
    from sparksearch.segments import build_segments
    build_segments(spark, ix_dir, salt_target=64, n_chunks=1, partitions=4)
    rest.write.mode("overwrite").parquet(src_dir)
    return ix_dir, src_dir, ckpt


def test_stream_index_drain_and_idempotent(spark, stream_setup):
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    from sparksearch.streaming import indexed_batches, stream_index

    ix_dir, src_dir, ckpt = stream_setup
    q = stream_index(spark, src_dir, ix_dir, ckpt, partitions=4,
                     salt_target=64, available_now=True)
    q.awaitTermination(120)
    assert not q.isActive

    ix = IndexReader(spark, ix_dir)
    assert ix.generations == [0, 1]
    assert ix.n_docs == 500
    assert indexed_batches(ix_dir)  # at least one batch recorded

    hits = Executor(ix).search(Match("text", "join"), k=5).collect()
    assert len(hits) == 5

    # restart over the same checkpoint: no files left → no new generation;
    # and a replayed batch id would be skipped by the state file
    q2 = stream_index(spark, src_dir, ix_dir, ckpt, partitions=4,
                      salt_target=64, available_now=True)
    q2.awaitTermination(120)
    ix2 = IndexReader(spark, ix_dir)
    assert ix2.generations == [0, 1]
    assert ix2.n_docs == 500
