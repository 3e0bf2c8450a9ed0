"""Index-sort early termination: sorted top-k from a file PREFIX.

Lucene index sorting (IndexWriterConfig.setIndexSort; reference
sv/index/IndexSortConfig.java, sv/search/query/TopDocsCollectorContext's
early-terminating numeric-sort collector): when the index is sorted by
the same field the query sorts on, the collector stops after k
competitive docs per segment instead of visiting every doc.

Spark shape: `build_index(..., index_sort=(field, asc))` wrote the docs
layout with `repartitionByRange` — every parquet file covers a
NON-OVERLAPPING value range — and recorded per-file (rows, min, max) in
`_sort_manifest.json`. A sorted top-k then needs only the shortest file
prefix (in value order) that provably contains the k winners:

  1. order the manifest's files by min (asc) or max (desc);
  2. scan the smallest prefix whose cumulative row count ≥ k;
  3. take top-k within the prefix; the answer is EXACT iff the k-th
     value beats every unscanned file's bound (strict — a tie could
     steal a slot through the docid tie-break);
  4. under a filter the prefix may starve — extend (double, plus every
     file whose bound ties the current k-th value) and repeat.

The loop is driver-side over the manifest (pure metadata, no data
collect beyond the ≤k boundary probe) and runs ≤ log₂(#files) bounded
Spark jobs — at 10^12 docs the win is reading ~k/rows_per_file files
instead of the whole corpus. DELETED docs are filtered before the
boundary probe, so tombstones never make a starved prefix look full.
"""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["sorted_topk"]


def _ser(v):
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat(sep=" ")
    return v


def _load_manifests(ix) -> tuple[str, bool, list[dict]]:
    isort = ix.meta.get("index_sort")
    if not isort:
        raise ValueError("index has no index_sort layout "
                         "(build_index(..., index_sort=...))")
    files: list[dict] = []
    for gen in ix.meta["generations"]:
        gen_dir = os.path.join(ix.index_dir, "docs", f"gen={gen}")
        mpath = os.path.join(gen_dir, "_sort_manifest.json")
        if not os.path.exists(mpath):
            raise ValueError(f"generation {gen} lacks _sort_manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        if m["field"] != isort["field"]:
            raise ValueError(f"generation {gen} sorted by {m['field']!r}, "
                             f"index_sort is {isort['field']!r}")
        for row in m["files"]:
            files.append({**row,
                          "path": os.path.join(gen_dir, row["file"])})
    return isort["field"], bool(isort["asc"]), files


def sorted_topk(ix, k: int, asc: bool = True,
                filter_expr: Column | None = None,
                info: dict | None = None) -> DataFrame:
    """Top-k docs by the index-sort field (ties broken by docid asc),
    scanning only a manifest-pruned file prefix.

    `filter_expr` is an optional Catalyst boolean over docs columns
    (doc-values filter context). Pass a dict as `info` to receive
    {files_scanned, files_total, rounds} for plan assertions. The
    returned DataFrame re-plans the final prefix lazily — callers get a
    normal (pruned-scan) plan, not collected rows."""
    field, layout_asc, files = _load_manifests(ix)
    spark = ix.spark
    # value-order the files for the REQUESTED direction; the layout's own
    # direction is irrelevant because ranges are non-overlapping both ways
    if asc:
        files.sort(key=lambda r: (_ser(r["min"]), _ser(r["max"])))
    else:
        files.sort(key=lambda r: (_ser(r["max"]), _ser(r["min"])),
                   reverse=True)

    def bound(row):      # first value an UNSCANNED file could contribute
        return _ser(row["min"]) if asc else _ser(row["max"])

    def _scan(paths: list[str]) -> DataFrame:
        df = ix.live(spark.read.parquet(*paths))
        if filter_expr is not None:
            df = df.filter(filter_expr)
        order = [F.col(field).asc() if asc else F.col(field).desc(),
                 F.col("docid").asc()]
        return df.orderBy(*order).limit(k)

    # smallest prefix that could hold k rows
    p, cum = 0, 0
    while p < len(files) and cum < k:
        cum += files[p]["rows"]
        p += 1
    rounds = 0
    while True:
        rounds += 1
        top = _scan([f["path"] for f in files[:p]]).select(field).collect()
        if p >= len(files):
            break
        if len(top) == k:
            kth = _ser(top[-1][0])
            # strict: an unscanned file whose bound TIES kth could still
            # win the docid tie-break
            safe = ((bound(files[p]) > kth) if asc
                    else (bound(files[p]) < kth))
            if safe:
                break
            # pull in every file whose bound ties/beats kth, then double
            while p < len(files) and (
                    (bound(files[p]) <= kth) if asc
                    else (bound(files[p]) >= kth)):
                p += 1
        else:
            p = min(len(files), max(p * 2, p + 1))   # starved: double
    if info is not None:
        info.update({"files_scanned": p, "files_total": len(files),
                     "rounds": rounds})
    return _scan([f["path"] for f in files[:p]])
