"""Structured field types: `ip`, numeric/date `range`, and `_doc_count`.

Reference semantics re-expressed over Spark doc-value columns:

- **ip field** (server/src/main/java/org/opensearch/index/mapper/
  IpFieldMapper.java:224-300): term queries accept an exact address OR
  CIDR notation ("10.32.0.0/11" — `InetAddresses.parseCidr`, termQuery
  line 234); range queries compare addresses numerically, never
  lexically ("9.0.0.0" < "10.0.0.0").  Stored form here is the dotted
  quad string; every comparison goes through the uint32 encoding.
  IPv4 only — the synthetic corpus has no v6; a v6 literal raises.

- **range field** (server/src/main/java/org/opensearch/index/mapper/
  RangeType.java:906-940 createRangeQuery): a doc value is an interval
  struct `{gte, lte}`; queries carry a window plus a ShapeRelation —
  INTERSECTS (default), WITHIN (doc interval inside the window),
  CONTAINS (doc interval covers the window).

- **_doc_count** (server/src/main/java/org/opensearch/index/mapper/
  DocCountFieldMapper.java): pre-aggregated documents carry a positive
  integer `_doc_count`; every bucket agg counts `sum(_doc_count)`
  instead of 1 per doc, defaulting to 1 when absent.

All pure Catalyst column algebra — no UDFs, no shuffles beyond the
aggregation itself, so the 100 TB story is the same as any filter/agg.
"""

from __future__ import annotations

import ipaddress

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "ip_num",
    "cidr_bounds",
    "ip_term_cond",
    "ip_range_cond",
    "range_relation_cond",
    "terms_agg_doc_count",
]


def ip_num(col: Column) -> Column:
    """Dotted-quad IPv4 string → uint32-as-long (the comparable form —
    the reference compares the 16-byte InetAddressPoint encoding, which
    for v4 is numeric order)."""
    p = F.split(col, r"\.")
    return (p.getItem(0).cast("long") * 16777216
            + p.getItem(1).cast("long") * 65536
            + p.getItem(2).cast("long") * 256
            + p.getItem(3).cast("long"))


def _ip4(value: str) -> int:
    addr = ipaddress.ip_address(value)
    if addr.version != 4:
        raise NotImplementedError("ip field: IPv6 literals not supported")
    return int(addr)


def cidr_bounds(cidr: str) -> tuple[int, int]:
    """CIDR "a.b.c.d/nn" → inclusive [network, broadcast] uint32 bounds
    (InetAddresses.parseCidr + the lower/upper bytes the reference's
    termQuery derives, IpFieldMapper.java:234-236)."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version != 4:
        raise NotImplementedError("ip field: IPv6 CIDR not supported")
    return int(net.network_address), int(net.broadcast_address)


def ip_term_cond(field: Column, value: str) -> Column:
    """`term` on an ip field: exact address, or CIDR → inclusive range
    (IpFieldMapper.termQuery, line 224-237)."""
    v = ip_num(field)
    if "/" in value:
        lo, hi = cidr_bounds(value)
        return (v >= lo) & (v <= hi)
    return v == _ip4(value)


def ip_range_cond(field: Column, gte: str | None = None,
                  lte: str | None = None, gt: str | None = None,
                  lt: str | None = None) -> Column:
    """`range` on an ip field — numeric address comparison
    (IpFieldMapper.rangeQuery, line 267-300), so "9.0.0.0" sorts below
    "10.0.0.0" unlike a string comparison."""
    v = ip_num(field)
    cond = F.lit(True)
    if gte is not None:
        cond = cond & (v >= _ip4(gte))
    if gt is not None:
        cond = cond & (v > _ip4(gt))
    if lte is not None:
        cond = cond & (v <= _ip4(lte))
    if lt is not None:
        cond = cond & (v < _ip4(lt))
    return cond


def range_relation_cond(field: Column, gte, lte,
                        relation: str = "intersects") -> Column:
    """Query over a range-typed field value (struct {gte, lte}) with a
    ShapeRelation (RangeType.createRangeQuery, RangeType.java:906-940):

    - intersects: doc ∩ [gte, lte] ≠ ∅
    - within:     doc ⊆ [gte, lte]
    - contains:   doc ⊇ [gte, lte]

    Bounds inclusive on both sides (the from/to + includeFrom/includeTo
    normal form after parsing)."""
    dlo, dhi = field.getField("gte"), field.getField("lte")
    rel = relation.lower()
    if rel == "intersects":
        return (dlo <= F.lit(lte)) & (dhi >= F.lit(gte))
    if rel == "within":
        return (dlo >= F.lit(gte)) & (dhi <= F.lit(lte))
    if rel == "contains":
        return (dlo <= F.lit(gte)) & (dhi >= F.lit(lte))
    raise ValueError(f"unknown range relation: {relation}")


def terms_agg_doc_count(df: DataFrame, field: str, size: int = 10,
                        doc_count_col: str = "_doc_count") -> DataFrame:
    """terms agg over pre-aggregated input: bucket doc_count =
    sum(_doc_count), defaulting to 1 where the column is null
    (DocCountFieldMapper — "counts buckets as if there were N docs").
    Map-side partial aggregation applies as with any sum; the top-size
    cut is a TakeOrderedAndProject, no global sort."""
    cnt = (F.coalesce(F.col(doc_count_col), F.lit(1)).cast("long")
           if doc_count_col in df.columns else F.lit(1).cast("long"))
    return (df.groupBy(F.col(field).alias("key"))
            .agg(F.sum(cnt).alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("key").asc())
            .limit(size))
