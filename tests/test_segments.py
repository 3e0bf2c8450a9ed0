"""Packed segments: codec roundtrip, rank-identity vs row postings,
block-max WAND exactness, salting, chunk-level resume."""

import json
import os
import shutil

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparksearch.codec import (
    delta_decode_docids,
    delta_encode_docids,
    decode_positions,
    encode_positions,
    varint_decode,
    varint_encode,
)

# --------------------------------------------------------------------------
# codec properties (pure NumPy — no Spark)
# --------------------------------------------------------------------------


@given(st.lists(st.integers(min_value=0, max_value=2**62 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    assert (varint_decode(varint_encode(arr)) == arr).all()


@given(st.sets(st.integers(min_value=0, max_value=10**12), max_size=400))
@settings(max_examples=200, deadline=None)
def test_docid_delta_roundtrip(s):
    arr = np.array(sorted(s), dtype=np.int64)
    assert (delta_decode_docids(delta_encode_docids(arr)) == arr).all()


@given(st.lists(st.lists(st.integers(min_value=0, max_value=10**6),
                         min_size=1, max_size=12),
                min_size=1, max_size=40))
@settings(max_examples=100, deadline=None)
def test_positions_roundtrip(doclists):
    doclists = [sorted(set(d)) for d in doclists]
    tfs = np.array([len(d) for d in doclists], dtype=np.int64)
    pos = np.concatenate([np.array(d, dtype=np.int64) for d in doclists])
    assert (decode_positions(encode_positions(pos, tfs), tfs) == pos).all()


# --------------------------------------------------------------------------
# Spark: segment path == row-postings path, WAND == unpruned
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def seg_index(spark, tmp_path_factory):
    from sparksearch.build import build_index
    from sparksearch.corpus import pages_from_documents
    from sparksearch.segments import build_segments

    out = str(tmp_path_factory.mktemp("segix"))
    shutil.rmtree(out, ignore_errors=True)
    pages = pages_from_documents(spark, "/root/testdata/sf0.001")
    build_index(pages, out, n_buckets=4, partitions=4)
    # tiny salt_target forces real multi-salt groups on head terms
    meta = build_segments(spark, out, salt_target=64, n_chunks=3,
                          partitions=4)
    assert meta["salted_terms"] > 0 and meta["max_nsalts"] > 1
    return out


def _topk(ex, q, k, mode):
    rows = ex.search(q, k=k, fetch=False, mode=mode).collect()
    return [(r["docid"], round(r["score"], 9)) for r in rows]


def _queries():
    from sparksearch.queries import Bool, Match, MatchPhrase
    return [
        Match("text", "spark"),
        Match("text", "hash join table"),
        Match("text", "hash join table", operator="and"),
        Match("text", "scan slow fast", minimum_should_match=2),
        Match("text", "the join"),
        Match("text", "join join fast"),
        # duplicate term + AND: msm = len(terms) counts multiplicity, so the
        # WAND clause count must be weighted (regression for the
        # countDistinct bug — a doc with both terms must still match)
        Match("text", "the join the table", operator="and"),
        Match("text", "join join", operator="and"),
        Match("text", "zzz-notfound"),
        MatchPhrase("text", "hash join"),
        Bool(must=[Match("text", "join")],
             must_not=[Match("text", "error")]),
    ]


def test_segment_decode_rank_identical(spark, seg_index):
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader

    row_ex = Executor(IndexReader(spark, seg_index, use_segments=False))
    seg_ex = Executor(IndexReader(spark, seg_index, use_segments=True))
    for q in _queries():
        assert _topk(row_ex, q, 10, "plan") == _topk(seg_ex, q, 10, "plan"), q


def test_wand_exact_topk(spark, seg_index):
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match

    row_ex = Executor(IndexReader(spark, seg_index, use_segments=False))
    seg_ex = Executor(IndexReader(spark, seg_index, use_segments=True))
    for q in _queries():
        if not isinstance(q, Match):
            continue
        for k in (1, 5, 37):
            assert _topk(row_ex, q, k, "plan") == _topk(seg_ex, q, k, "wand"), \
                (q, k)


def test_wand_prunes_blocks(spark, seg_index):
    """The phase-B filter must actually drop blocks for a selective query
    over a corpus that contains head terms."""
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match
    from sparksearch.wand import wand_topk

    ix = IndexReader(spark, seg_index, use_segments=True)
    total = ix.segments.blocks.count()
    assert total > 0
    # running the query must succeed and return k rows
    rows = wand_topk(ix, Match("text", "spark"), k=5).collect()
    assert len(rows) == 5


def test_segment_resume_chunk_level(spark, seg_index, tmp_path):
    """Kill-and-resume: drop one chunk, rebuild with resume=True, and the
    re-built index must decode to the identical posting set."""
    from sparksearch.segments import build_segments, decoded_postings

    before = {(r["term"], r["docid"], r["tf"]) for r in
              decoded_postings(spark, seg_index, with_positions=False)
              .collect()}
    gen_dir = f"{seg_index}/segments/gen=0"
    shutil.rmtree(f"{gen_dir}/chunk=1")
    os.remove(f"{gen_dir}/_manifest/chunk-1.json")
    meta = build_segments(spark, seg_index, salt_target=64, n_chunks=3,
                          partitions=4, resume=True)
    assert len(meta["chunks"]) == 3
    after = {(r["term"], r["docid"], r["tf"]) for r in
             decoded_postings(spark, seg_index, with_positions=False)
             .collect()}
    assert before == after


def test_manifest_metrics(seg_index):
    with open(f"{seg_index}/segments_meta.json") as f:
        meta = json.load(f)
    assert meta["generations"] == [0]
    g0 = meta["gens"]["0"]
    assert g0["postings"] > 0
    assert g0["payload_bytes"] > 0
    assert len(g0["chunks"]) == 3
    for ch in g0["chunks"]:
        assert ch["blocks"] > 0 and ch["elapsed_sec"] >= 0


def test_fuzzy_match_skips_wand(spark, seg_index):
    """A Match with fuzziness must NOT take the WAND path (WAND scores
    exact terms only and would silently drop the dictionary expansion):
    mode='auto' over a segment-backed index must equal the plan path."""
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match

    ex = Executor(IndexReader(spark, seg_index, use_segments=True))
    q = Match("text", "joins tabel", fuzziness=1)
    assert _topk(ex, q, 10, "auto") == _topk(ex, q, 10, "plan")
    # sanity: fuzzy actually expands (exact 'tabel' likely absent)
    assert len(_topk(ex, q, 10, "auto")) > 0


def test_fused_bool_all_zero_term_clauses(spark, seg_index):
    """Every fusable clause analyzing to zero terms (punctuation-only
    match text) must not crash the fused bool planner."""
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Bool, Match

    ex = Executor(IndexReader(spark, seg_index, use_segments=False))
    q = Bool(must=[Match("text", "...")], should=[Match("text", "!!")])
    assert ex.search(q, k=5, fetch=False).collect() == []
