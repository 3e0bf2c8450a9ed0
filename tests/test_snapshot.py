"""Snapshot repository: incremental content-addressed snapshots, verified
restore, GC — FsRepository/BlobStoreRepository analogue (snapshot.py)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from sparksearch.snapshot import (create_snapshot, delete_snapshot,
                                  list_snapshots, restore_snapshot,
                                  verify_repository)


def _pages(spark):
    from sparksearch.corpus import pages_from_documents
    return pages_from_documents(spark, "/root/testdata/sf0.001")


def _search_pairs(spark, index_dir):
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    ex = Executor(IndexReader(spark, index_dir))
    rows = ex.search(Match("text", "hash join table"), k=10).collect()
    return sorted((r["url"], round(r["score"], 9)) for r in rows)


@pytest.fixture(scope="module")
def snap_env(spark, tmp_path_factory):
    """gen0-only index snapshotted as s1, then gen1 added and snapshotted
    as s2 — the incremental pair every test reads."""
    from sparksearch.build import build_index
    from sparksearch.merge import add_generation

    base = tmp_path_factory.mktemp("snap")
    ix = str(base / "ix")
    repo = str(base / "repo")
    pages = _pages(spark)
    half1 = pages.filter(F.crc32(F.col("url")) % 2 == 0)
    half2 = pages.filter(F.crc32(F.col("url")) % 2 == 1)
    build_index(half1, ix, n_buckets=4, partitions=4)
    m1 = create_snapshot(ix, repo, "s1", ts=1.0)
    add_generation(spark, ix, half2, partitions=4, salt_target=64)
    m2 = create_snapshot(ix, repo, "s2", spark=spark, ts=2.0)
    return {"ix": ix, "repo": repo, "m1": m1, "m2": m2, "base": base}


def test_snapshot_is_incremental(snap_env):
    m1, m2 = snap_env["m1"], snap_env["m2"]
    # first snapshot uploads everything
    assert m1["metrics"]["reused_bytes"] == 0
    assert m1["metrics"]["copied_bytes"] == m1["metrics"]["total_bytes"]
    # second snapshot reuses every gen0 file and copies only the delta
    assert m2["metrics"]["reused_bytes"] > 0
    assert 0 < m2["metrics"]["copied_bytes"] < m2["metrics"]["total_bytes"]
    gen0 = {f["sha256"] for f in m1["files"]}
    reused = [f for f in m2["files"] if f["sha256"] in gen0]
    assert len(reused) >= len(m1["files"]) - 2  # meta.json/stats rewritten


def test_restore_round_trips_search(spark, snap_env):
    dest = str(snap_env["base"] / "restored")
    restore_snapshot(snap_env["repo"], "s2", dest)
    assert _search_pairs(spark, dest) == _search_pairs(spark, snap_env["ix"])
    # restored commit is the snapshotted commit, byte-for-byte
    with open(os.path.join(dest, "meta.json")) as f:
        assert json.load(f) == snap_env["m2"]["index_meta"]


def test_restore_earlier_snapshot_is_gen0_only(spark, snap_env):
    dest = str(snap_env["base"] / "restored_s1")
    m = restore_snapshot(snap_env["repo"], "s1", dest, spark=spark)
    assert m["index_meta"]["generations"] == [0]
    from sparksearch.index import IndexReader
    ixr = IndexReader(spark, dest)
    assert ixr.meta["n_docs"] == snap_env["m1"]["index_meta"]["n_docs"]


def test_restore_refuses_nonempty_dest(snap_env):
    with pytest.raises(ValueError, match="already holds"):
        restore_snapshot(snap_env["repo"], "s1", snap_env["ix"])


def test_duplicate_and_invalid_names(snap_env):
    with pytest.raises(ValueError, match="already exists"):
        create_snapshot(snap_env["ix"], snap_env["repo"], "s1")
    with pytest.raises(ValueError, match="invalid snapshot name"):
        create_snapshot(snap_env["ix"], snap_env["repo"], "a/b")


def test_verify_catches_corruption(snap_env, tmp_path):
    repo = snap_env["repo"]
    assert verify_repository(repo)["corrupt"] == []
    # flip a byte in one blob referenced only by s2
    victim = next(f for f in snap_env["m2"]["files"]
                  if f["sha256"] not in
                  {g["sha256"] for g in snap_env["m1"]["files"]})
    blob = os.path.join(repo, "blobs", victim["sha256"][:2],
                        victim["sha256"])
    raw = bytearray(open(blob, "rb").read())
    raw[0] ^= 0xFF
    with open(blob, "wb") as f:
        f.write(raw)
    bad = verify_repository(repo)["corrupt"]
    assert [b["sha256"] for b in bad] == [victim["sha256"]]
    with pytest.raises(IOError, match="corrupt"):
        restore_snapshot(repo, "s2", str(tmp_path / "x"))
    # repair for later tests
    blob_src = os.path.join(snap_env["ix"], victim["path"])
    import shutil
    shutil.copyfile(blob_src, blob)
    assert verify_repository(repo)["corrupt"] == []


def test_mount_snapshot_is_zero_copy_and_searchable(spark, snap_env):
    from sparksearch.snapshot import mount_snapshot
    from sparksearch.exec import Executor
    from sparksearch.queries import Match
    mnt = str(snap_env["base"] / "mounted")
    ixr = mount_snapshot(snap_env["repo"], "s2", spark, mnt)
    ex = Executor(ixr)
    rows = ex.search(Match("text", "hash join table"), k=10).collect()
    got = sorted((r["url"], round(r["score"], 9)) for r in rows)
    assert got == _search_pairs(spark, snap_env["ix"])
    # every mounted file is a hardlink to a repo blob, not a copy
    for root, _dirs, files in os.walk(mnt):
        for f in files:
            assert os.stat(os.path.join(root, f)).st_nlink >= 2


def test_cli_snapshot_restore_roundtrip(spark, snap_env, capsys):
    from sparksearch.cli import main
    repo = str(snap_env["base"] / "cli_repo")
    dest = str(snap_env["base"] / "cli_restored")
    assert main(["snapshot", "--index", snap_env["ix"], "--repo", repo,
                 "--name", "cli-1", "--local"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["snapshot"] == "cli-1" and out["copied_bytes"] > 0
    assert main(["snapshots", "--repo", repo]) == 0
    assert [s["name"] for s in
            json.loads(capsys.readouterr().out.strip())] == ["cli-1"]
    assert main(["restore", "--repo", repo, "--name", "cli-1",
                 "--dest", dest]) == 0
    assert _search_pairs(spark, dest) == _search_pairs(spark, snap_env["ix"])


def test_delete_gc_keeps_shared_blobs(spark, snap_env):
    repo = snap_env["repo"]
    res = delete_snapshot(repo, "s1", gc=True)
    # s1-only blobs (old meta.json/stats) freed; shared gen0 blobs survive
    assert res["blobs_removed"] >= 1
    assert [s["name"] for s in list_snapshots(repo)] == ["s2"]
    assert verify_repository(repo)["corrupt"] == []
    dest = str(snap_env["base"] / "after_gc")
    restore_snapshot(repo, "s2", dest)
    assert _search_pairs(spark, dest) == _search_pairs(spark, snap_env["ix"])
