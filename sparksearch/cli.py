"""spark-submit entry points: build / add / merge / segments / query / bench.

Usage (cluster; exercised end-to-end against Spark's spark-submit):
    spark-submit --py-files sparksearch.zip sparksearch/cli.py build \
        --input /data/pages_iceberg_or_parquet --output /data/index \
        --partitions 4096 --buckets 512 --resume
    spark-submit --py-files sparksearch.zip sparksearch/cli.py segments \
        --index /data/index --salt-target 1000000 --chunks 16 --resume
    spark-submit --py-files sparksearch.zip sparksearch/cli.py add \
        --index /data/index --input /data/new_batch
    spark-submit --py-files sparksearch.zip sparksearch/cli.py merge \
        --index /data/index
    spark-submit --py-files sparksearch.zip sparksearch/cli.py query \
        --index /data/index --match "hash join" --k 10 [--wand]
    spark-submit --py-files sparksearch.zip sparksearch/cli.py search \
        --index /data/index --body body.json   # full _search request body
    spark-submit --py-files sparksearch.zip sparksearch/cli.py snapshot \
        --index /data/index --repo /backups/repo --name nightly-01
    spark-submit --py-files sparksearch.zip sparksearch/cli.py restore \
        --repo /backups/repo --name nightly-01 --dest /data/index_restored

The driver-side session builder honors an existing SparkSession when run
under spark-submit (getOrCreate) — master/cores/memory come from the
submit command, not from here. Zip the package with:
    cd <repo> && zip -r sparksearch.zip sparksearch
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(app: str):
    from pyspark.sql import SparkSession
    return SparkSession.builder.appName(app).getOrCreate()


def _read_pages(spark, path: str):
    reader = spark.read
    if path.endswith(".json") or path.endswith(".jsonl"):
        return reader.json(path)
    try:
        df = reader.format("iceberg").load(path)
    except Exception:
        df = reader.parquet(path)
    cols = set(df.columns)
    if "url" not in cols and {"doc_id", "text"} <= cols:
        # a documents-shaped table (the testdata corpus): synthesize the
        # pages(url, warc_ts, html, text, lang) shape deterministically
        # instead of failing the build with a missing-column error
        from sparksearch.corpus import pages_from_docs_frame
        return pages_from_docs_frame(df)
    return df


def cmd_build(args) -> int:
    from sparksearch.build import build_index
    spark = _spark("sparksearch-build")
    pages = _read_pages(spark, args.input)
    meta = build_index(pages, args.output, analyzer=args.analyzer,
                       n_buckets=args.buckets, partitions=args.partitions,
                       resume=args.resume, verify_extract=args.verify_extract)
    print(json.dumps(meta))
    return 0


def cmd_segments(args) -> int:
    from sparksearch.segments import build_segments
    spark = _spark("sparksearch-segments")
    meta = build_segments(spark, args.index, gen=args.gen,
                          salt_target=args.salt_target,
                          n_chunks=args.chunks,
                          partitions=args.partitions, resume=args.resume)
    print(json.dumps(meta))
    return 0


def cmd_add(args) -> int:
    from sparksearch.merge import add_generation, merge_segments, should_merge
    spark = _spark("sparksearch-add")
    pages = _read_pages(spark, args.input)
    meta = add_generation(spark, args.index, pages,
                          partitions=args.partitions,
                          salt_target=args.salt_target)
    if args.auto_merge and should_merge(args.index):
        merge_segments(spark, args.index, partitions=args.partitions,
                       salt_target=args.salt_target)
    print(json.dumps(meta))
    return 0


def cmd_merge(args) -> int:
    from sparksearch.merge import merge_segments
    spark = _spark("sparksearch-merge")
    meta = merge_segments(spark, args.index, partitions=args.partitions,
                          salt_target=args.salt_target)
    print(json.dumps(meta))
    return 0


def cmd_query(args) -> int:
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    from sparksearch.queries import Match, MatchPhrase
    spark = _spark("sparksearch-query")
    ix = IndexReader(spark, args.index, use_segments=args.wand)
    ex = Executor(ix)
    if args.match:
        q = Match("text", args.match,
                  operator="and" if args.op == "and" else "or")
    elif args.phrase:
        q = MatchPhrase("text", args.phrase)
    else:
        print("one of --match/--phrase required", file=sys.stderr)
        return 2
    t0 = time.time()
    rows = ex.search(q, k=args.k,
                     mode="wand" if args.wand else "auto").collect()
    out = [{"docid": r["docid"], "url": r["url"], "score": r["score"]}
           for r in rows]
    print(json.dumps({"hits": out, "took_sec": round(time.time() - t0, 3)}))
    return 0


def cmd_search(args) -> int:
    """Full `_search` request body from a JSON file (or '-' for stdin) —
    the complete body surface (query DSL, sort, aggs, rescore, collapse,
    suggest, …) via spark-submit."""
    from sparksearch.api import run_search
    from sparksearch.exec import Executor
    from sparksearch.index import IndexReader
    spark = _spark("sparksearch-search")
    ix = IndexReader(spark, args.index, use_segments=False)
    ex = Executor(ix)
    body = json.load(sys.stdin if args.body == "-" else open(args.body))
    t0 = time.time()
    resp = run_search(ex, body)
    resp["took_sec"] = round(time.time() - t0, 3)
    print(json.dumps(resp, default=str))
    return 0


def cmd_snapshot(args) -> int:
    """Incremental content-addressed snapshot of a committed index
    (snapshot.py); one Spark task per file unless --local."""
    from sparksearch.snapshot import create_snapshot
    spark = None if args.local else _spark("sparksearch-snapshot")
    m = create_snapshot(args.index, args.repo, args.name, spark=spark)
    print(json.dumps({"snapshot": m["name"], **m["metrics"]}))
    return 0


def cmd_restore(args) -> int:
    from sparksearch.snapshot import restore_snapshot
    m = restore_snapshot(args.repo, args.name, args.dest,
                         verify=not args.no_verify)
    print(json.dumps({"restored": m["name"], "dest": args.dest,
                      **m["metrics"]}))
    return 0


def cmd_snapshots(args) -> int:
    from sparksearch.snapshot import list_snapshots
    print(json.dumps(list_snapshots(args.repo)))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="sparksearch")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--analyzer", default="standard")
    b.add_argument("--buckets", type=int, default=8)
    b.add_argument("--partitions", type=int, default=None)
    b.add_argument("--resume", action="store_true")
    b.add_argument("--verify-extract", action="store_true")
    b.set_defaults(fn=cmd_build)

    s = sub.add_parser("segments")
    s.add_argument("--index", required=True)
    s.add_argument("--gen", type=int, default=0)
    s.add_argument("--salt-target", type=int, default=65536)
    s.add_argument("--chunks", type=int, default=4)
    s.add_argument("--partitions", type=int, default=None)
    s.add_argument("--resume", action="store_true")
    s.set_defaults(fn=cmd_segments)

    a = sub.add_parser("add")
    a.add_argument("--index", required=True)
    a.add_argument("--input", required=True)
    a.add_argument("--salt-target", type=int, default=65536)
    a.add_argument("--partitions", type=int, default=None)
    a.add_argument("--auto-merge", action="store_true")
    a.set_defaults(fn=cmd_add)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--salt-target", type=int, default=65536)
    m.add_argument("--partitions", type=int, default=None)
    m.set_defaults(fn=cmd_merge)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--match")
    q.add_argument("--phrase")
    q.add_argument("--op", default="or", choices=["or", "and"])
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--wand", action="store_true")
    q.set_defaults(fn=cmd_query)

    se = sub.add_parser("search")
    se.add_argument("--index", required=True)
    se.add_argument("--body", required=True,
                    help="path to a _search JSON body, or - for stdin")
    se.set_defaults(fn=cmd_search)

    sn = sub.add_parser("snapshot")
    sn.add_argument("--index", required=True)
    sn.add_argument("--repo", required=True)
    sn.add_argument("--name", required=True)
    sn.add_argument("--local", action="store_true",
                    help="driver-side copies (default fans out via Spark)")
    sn.set_defaults(fn=cmd_snapshot)

    rs = sub.add_parser("restore")
    rs.add_argument("--repo", required=True)
    rs.add_argument("--name", required=True)
    rs.add_argument("--dest", required=True)
    rs.add_argument("--no-verify", action="store_true")
    rs.set_defaults(fn=cmd_restore)

    sl = sub.add_parser("snapshots")
    sl.add_argument("--repo", required=True)
    sl.set_defaults(fn=cmd_snapshots)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
