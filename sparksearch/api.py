"""The `_search` request-body API: one JSON body in, hits + aggregations out.

This is the top-level surface a reference user actually calls
(sv/rest/action/search/RestSearchAction.java →
sv/search/builder/SearchSourceBuilder.java): everything the engine
already implements — query DSL, sort, from/size, search_after,
min_score, _source filtering, highlight — driven from the single body
dict, plus an `aggs` sub-body routed to the aggregation operators.

Two shapes:
- ``search_df(ex, body)`` → the hits as a DataFrame (the oracle-gated
  form; stays lazy, sort+limit compiles to TakeOrderedAndProject).
- ``run_search(ex, body)`` → the familiar response envelope
  ``{hits: {total, max_score, hits: [{_id, _score, _source}...]},
  aggregations: {...}}`` — a driver-side collect bounded by `size`.
- ``aggs_df(ex, body)`` → one top-level agg as a bucket DataFrame.

Supported body keys: query, size, from, sort (field / ``_score`` /
``_doc``, asc/desc), search_after, min_score, post_filter (hits only —
aggs deliberately don't see it), track_total_hits (True=exact /
int cap, default 10,000), _source (bool / includes / excludes), aggs
(terms / histogram / date_histogram / metric leaves, one nesting level
of sub-metrics; scoped to the body's query in filter context).
Highlighting stays on the fetchops surface (it needs the raw pages
source, which the docs table deliberately does not carry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparksearch.dsl import from_dsl
from sparksearch.queries import MatchAll

__all__ = ["search_df", "run_search", "aggs_df"]

_SCORE_4 = lambda c: F.round(c, 4)


def _parse_sort(spec) -> list[tuple[str, bool]]:
    """body `sort` → [(field, asc)]; defaults to relevance order."""
    if not spec:
        return [("_score", False), ("_doc", True)]
    out: list[tuple[str, bool]] = []
    for s in (spec if isinstance(spec, list) else [spec]):
        if isinstance(s, str):
            out.append((s, s != "_score"))
        else:
            (field, opts), = s.items()
            order = (opts.get("order", "asc")
                     if isinstance(opts, dict) else opts)
            out.append((field, order != "desc"))
    if not any(f in ("_doc", "docid") for f, _ in out):
        out.append(("_doc", True))   # total order for stable pagination
    return out


def _sort_col(field: str):
    if field == "_score":
        return F.col("score")
    if field == "_doc":
        return F.col("docid")
    return F.col(field)


def search_df(ex, body: dict) -> DataFrame:
    """Execute a `_search` body; returns (docid, url, score, <sort and
    _source fields>) ordered per the body's sort, offset by `from`."""
    q = from_dsl(body["query"]) if "query" in body else MatchAll()
    size = int(body.get("size", 10))
    from_ = int(body.get("from", 0))
    sort = _parse_sort(body.get("sort"))
    needs_score = any(f == "_score" for f, _ in sort) \
        or "min_score" in body or not body.get("sort")

    scored = ex._plan(q, scored=needs_score)
    if "min_score" in body:
        scored = scored.filter(
            F.col("score") >= float(body["min_score"]))
    if "post_filter" in body:
        # filters HITS only — aggs_df deliberately never sees it
        # (SearchSourceBuilder postFilter semantics)
        pf = ex._plan(from_dsl(body["post_filter"]),
                      scored=False).select("docid")
        scored = scored.join(pf, "docid", "left_semi")
    scored = scored.select("docid", _SCORE_4(F.col("score")).alias("score"))

    doc_fields = {f for f, _ in sort if f not in ("_score", "_doc")}
    src = body.get("_source", True)
    inc = exc = None
    if isinstance(src, dict):
        inc, exc = src.get("includes"), src.get("excludes")
    elif isinstance(src, list):
        inc = src
    keep_src: list[str] = []
    if src is not False:
        import fnmatch
        candidates = [c for c in ex.ix.docs.columns
                      if c not in ("docid", "url", "pday")]
        for c in candidates:
            if inc is not None and not any(fnmatch.fnmatch(c, p)
                                           for p in inc):
                continue
            if exc and any(fnmatch.fnmatch(c, p) for p in exc):
                continue
            keep_src.append(c)
    fetch_cols = ["docid", "url"] + sorted(doc_fields | set(keep_src))
    d = ex.ix.docs.select(*fetch_cols)
    out = scored.join(d, "docid")

    order = [(_sort_col(f).asc() if asc else _sort_col(f).desc())
             for f, asc in sort]
    after = body.get("search_after")
    if after is not None:
        # keyset: strictly after the cursor in the sort's lexicographic
        # order (SearchAfterBuilder semantics)
        cond = F.lit(False)
        eqs = F.lit(True)
        for (f, asc), v in zip(sort, after):
            c = _sort_col(f)
            cond = cond | (eqs & ((c > F.lit(v)) if asc
                                  else (c < F.lit(v))))
            eqs = eqs & (c == F.lit(v))
        out = out.filter(cond)

    out = out.orderBy(*order).limit(from_ + size)
    if from_:
        from pyspark.sql import Window
        w = Window.orderBy(*order)
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") > from_).drop("_rn"))
    return out


def run_search(ex, body: dict) -> dict:
    """The response envelope (RestSearchAction shape). Collects ≤ size
    hit rows driver-side; total is a separate count on the filter plan."""
    q = from_dsl(body["query"]) if "query" in body else MatchAll()
    total = ex._plan(q, scored=False).count()
    # track_total_hits: True → exact; int cap (default 10,000 like the
    # reference's SearchContext.TRACK_TOTAL_HITS_UP_TO) → capped + "gte"
    tth = body.get("track_total_hits", 10_000)
    if tth is True:
        total_rep = {"value": total, "relation": "eq"}
    else:
        cap = int(tth)
        total_rep = ({"value": total, "relation": "eq"}
                     if total <= cap else
                     {"value": cap, "relation": "gte"})
    rows = search_df(ex, body).collect()
    hits = []
    for r in rows:
        d = r.asDict()
        hit = {"_id": d.pop("url"), "_score": d.pop("score", None),
               "_source": {k: v for k, v in d.items() if k != "docid"}}
        hits.append(hit)
    max_score = max((h["_score"] for h in hits
                     if h["_score"] is not None), default=None)
    resp = {"hits": {"total": total_rep,
                     "max_score": max_score, "hits": hits}}
    if "aggs" in body:
        resp["aggregations"] = {}
        for name, spec in body["aggs"].items():
            sub = {"aggs": {name: spec}}
            if "query" in body:       # aggs see the query, not post_filter
                sub["query"] = body["query"]
            bdf = aggs_df(ex, sub)
            resp["aggregations"][name] = [r.asDict() for r in bdf.collect()]
    return resp


_METRICS = {"avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max,
            "value_count": F.count}


def _metric_col(kind: str, spec: dict, name: str):
    v = F.col(spec["field"]).cast("double")
    c = _METRICS[kind](v)
    if kind == "value_count":
        return c.cast("long").alias(name)
    return F.round(c, 6).alias(name)


def aggs_df(ex, body: dict) -> DataFrame:
    """One top-level agg from the body (+ one level of sub-metrics) as a
    bucket DataFrame — terms / histogram / date_histogram buckets, or a
    single-row metric.

    Aggregations run over the QUERY-MATCHED set (AggregationPhase sits
    behind the query in the reference), not the whole index — the body's
    `query` is applied as a filter-context semi-join. `post_filter` by
    design does NOT reach aggs (it only filters hits)."""
    (name, spec), = body["aggs"].items()
    spec = dict(spec)
    sub = spec.pop("aggs", None)
    (kind, cfg), = ((k, v) for k, v in spec.items() if k != "aggs")
    d = ex.ix.docs
    if "query" in body:
        matched = ex._plan(from_dsl(body["query"]),
                           scored=False).select("docid")
        d = d.join(matched, "docid", "left_semi")
    subcols = []
    if sub:
        for sname, sspec in sub.items():
            (skind, scfg), = sspec.items()
            subcols.append(_metric_col(skind, scfg, sname))

    if kind in _METRICS:
        return d.agg(_metric_col(kind, cfg, name))
    if kind == "terms":
        key = F.col(cfg["field"]).alias("key")
        out = (d.filter(F.col(cfg["field"]).isNotNull())
               .groupBy(key)
               .agg(F.count("*").cast("long").alias("doc_count"), *subcols)
               .orderBy(F.col("doc_count").desc(), F.col("key").asc())
               .limit(int(cfg.get("size", 10))))
        return out
    if kind == "histogram":
        interval = float(cfg["interval"])
        key = (F.floor(F.col(cfg["field"]).cast("double") / interval)
               * interval).alias("key")
        return (d.groupBy(key)
                .agg(F.count("*").cast("long").alias("doc_count"),
                     *subcols)
                .orderBy("key"))
    if kind == "date_histogram":
        iv = cfg.get("fixed_interval", "1m")
        secs = {"1m": 60, "1h": 3600, "1d": 86400}[iv]
        key = (F.floor(F.unix_timestamp(F.col(cfg["field"])) / secs)
               .cast("long") * secs).alias("key")
        return (d.groupBy(key)
                .agg(F.count("*").cast("long").alias("doc_count"),
                     *subcols)
                .orderBy("key"))
    raise ValueError(f"unsupported agg type: {kind!r}")
