"""Regression tests for the round-4 ADVICE fixes: nfkc_cf default
ignorables, should-only percolator bools, rollover created_ts, snapshot
GC tmp-guard + single-writer lock, reshard pre-merge tombstone carry."""

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from sparksearch.queries import Match, Term


def test_nfkc_cf_strips_default_ignorables():
    from sparksearch.normfilters import icu_normalizer_filter
    f = icu_normalizer_filter({"name": "nfkc_cf"})
    toks = [("co\xadoperate", 0), ("a‌b‍c", 1), ("x﻿y", 2)]
    assert [t for t, _ in f(toks)] == ["cooperate", "abc", "xy"]
    # NFKC itself can emit a default-ignorable: U+3164 -> U+1160
    assert [t for t, _ in f([("ㅤka", 0)])] == ["ka"]
    # nfc / nfkc modes stay pure normal forms (no DI stripping)
    nfc = icu_normalizer_filter({"name": "nfc"})
    assert [t for t, _ in nfc([("co\xadop", 0)])] == ["co\xadop"]


def test_percolate_should_only_bool(spark):
    from sparksearch.percolate import percolate
    docs = spark.createDataFrame(
        [("u1", "fast hash join"), ("u2", "slow scan")], "url string, text string")
    # should-only bool: no must / must_not columns at all
    queries = spark.createDataFrame(
        [("q1", "bool", ["join", "scan"], 1), ("q2", "bool", ["hash"], 1),
         ("q3", "bool", ["missing"], 1)],
        "qid string, kind string, terms array<string>, msm int")
    got = {(r["url"], r["qid"]) for r in percolate(docs, queries).collect()}
    assert got == {("u1", "q1"), ("u2", "q1"), ("u1", "q2")}


def test_rollover_age_uses_created_ts(spark, index_sf0001, tmp_path):
    from sparksearch.index import rollover, set_alias
    ix_dir = index_sf0001.index_dir
    reg = str(tmp_path / "aliases.json")
    set_alias(reg, "logs", ix_dir)
    meta_path = f"{ix_dir}/meta.json"
    with open(meta_path) as f:
        meta = json.load(f)
    assert "created_ts" in meta  # stamped at build time
    # simulate an old index that keeps committing: created long ago,
    # meta.json mtime fresh
    meta["created_ts"] = time.time() - 3600
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    os.utime(meta_path)  # mtime = now
    res = rollover(reg, "logs", str(tmp_path / "newix"), max_age_s=600)
    assert res["rolled_over"] is True  # mtime-based age would say 0s


def test_snapshot_gc_spares_inflight_tmp_and_locks(index_sf0001, tmp_path):
    from sparksearch.snapshot import (_repo_lock, create_snapshot,
                                      delete_snapshot)
    repo = str(tmp_path / "repo")
    create_snapshot(index_sf0001.index_dir, repo, "s1")
    create_snapshot(index_sf0001.index_dir, repo, "s2")
    # plant an in-flight tmp blob with the real tmp naming
    bdir = os.path.join(repo, "blobs", "zz")
    os.makedirs(bdir)
    tmp_blob = os.path.join(bdir, "f" * 64 + f".tmp.{os.getpid()}.7")
    with open(tmp_blob, "w") as f:
        f.write("inflight")
    delete_snapshot(repo, "s2", gc=True)
    assert os.path.exists(tmp_blob)  # '.tmp.' guard matched
    # single-writer: a held lock blocks a second writer until timeout
    with _repo_lock(repo):
        with pytest.raises(TimeoutError):
            _repo_lock(repo, timeout_s=0.2).__enter__()
    # and releases cleanly
    delete_snapshot(repo, "s1", gc=True)


def test_reshard_carries_tombstones(spark, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.deletes import delete_by_query, expunge_deletes
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader, reshard

    src = str(tmp_path_factory.mktemp("rsrc"))
    dst = str(tmp_path_factory.mktemp("rdst"))
    shutil.rmtree(src, ignore_errors=True)
    build_index(pages_from_documents(spark, "/root/testdata/sf0.001"),
                src, n_buckets=4, partitions=4)
    n_del = delete_by_query(spark, src, Term("lang", "de"))
    assert n_del > 0
    src_ix = IndexReader(spark, src)
    before = {r["docid"]: r["score"] for r in
              Executor(src_ix).search(Match("text", "join"), k=1000,
                                      fetch=False).collect()}

    reshard(spark, src, dst, n_buckets=8)
    ix = IndexReader(spark, dst)
    # pre-merge semantics: tombstones carried, bookkeeping consistent
    assert ix.n_deleted == n_del and ix.delete_files
    assert ix.n_docs == src_ix.n_docs
    assert ix.docs.filter(F.col("lang") == "de").count() == 0
    after = {r["docid"]: r["score"] for r in
             Executor(ix).search(Match("text", "join"), k=1000,
                                 fetch=False).collect()}
    assert after == before  # rank + score identity
    # a later expunge reconciles the counts exactly once
    expunge_deletes(spark, dst)
    ix2 = IndexReader(spark, dst)
    assert ix2.n_deleted == 0
    assert ix2.n_docs == src_ix.n_docs - n_del
