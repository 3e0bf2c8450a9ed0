"""Structured field types: `ip`, numeric/date `range`, and `_doc_count`.

Reference semantics re-expressed over Spark doc-value columns:

- **ip field** (server/src/main/java/org/opensearch/index/mapper/
  IpFieldMapper.java:224-300): term queries accept an exact address OR
  CIDR notation ("10.32.0.0/11" — `InetAddresses.parseCidr`, termQuery
  line 234); range queries compare addresses numerically, never
  lexically ("9.0.0.0" < "10.0.0.0").  Stored form here is the textual
  address; v4-only comparisons go through the uint32 encoding, and any
  comparison involving IPv6 goes through the reference's actual order:
  the 16-byte InetAddressPoint encoding (v4 embedded as the IPv4-mapped
  ::ffff:a.b.c.d block), realised as a fixed-width 32-hex-char string
  so lexicographic ORDER == numeric 128-bit order in both Spark and any
  SQL oracle.  `ip16_hex` expands compressed `::` notation and embedded
  v4 tails entirely in Catalyst expressions — no UDF.

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
    "ip16_hex",
    "ip16_lit",
    "cidr_bounds",
    "cidr_bounds16",
    "ip_term_cond",
    "ip_range_cond",
    "range_relation_cond",
    "terms_agg_doc_count",
]

#: the IPv4-mapped IPv6 prefix ::ffff:0:0 as hex — v4 addresses embed
#: here in the 16-byte space (InetAddressPoint.encode; RFC 4291 §2.5.5.2)
_V4_MAPPED_PREFIX = "0" * 20 + "ffff"


def ip_num(col: Column) -> Column:
    """Dotted-quad IPv4 string → uint32-as-long (the comparable form —
    the reference compares the 16-byte InetAddressPoint encoding, which
    for v4 is numeric order)."""
    p = F.split(col, r"\.")
    return (p.getItem(0).cast("long") * 16777216
            + p.getItem(1).cast("long") * 65536
            + p.getItem(2).cast("long") * 256
            + p.getItem(3).cast("long"))


def _hex32(col: Column) -> Column:
    """Decimal-string long column → 8 lowercase hex chars."""
    return F.lpad(F.lower(F.conv(col.cast("string"), 10, 16)), 8, "0")


def ip16_hex(col: Column) -> Column:
    """Any textual IP (v4 dotted quad, full or `::`-compressed v6, v6
    with an embedded v4 tail) → its 16-byte InetAddressPoint encoding as
    32 lowercase hex chars.  Lexicographic order on the result IS the
    reference's ip-field sort order (IpFieldMapper encodes v4 as the
    IPv4-mapped v6 block, so v4 and v6 share one comparable space).

    Pure Catalyst: split/conv/lpad/transform — stays inside
    whole-stage codegen, no Python in the plan."""
    s = F.lower(F.trim(col))
    # --- v4 dotted quad → v4-mapped block ------------------------------
    v4hex = F.concat(F.lit(_V4_MAPPED_PREFIX), _hex32(ip_num(s)))
    # --- v6 with embedded v4 tail: rewrite "…:a.b.c.d" as two groups ---
    tail4 = F.regexp_extract(s, r":(\d+\.\d+\.\d+\.\d+)$", 1)
    tailn = ip_num(tail4)
    s6 = F.when(
        tail4 != "",
        F.concat(F.regexp_replace(s, r":\d+\.\d+\.\d+\.\d+$", ""),
                 F.lit(":"),
                 F.lower(F.conv(F.floor(tailn / 65536).cast("string"),
                                10, 16)),
                 F.lit(":"),
                 F.lower(F.conv((tailn % 65536).cast("string"), 10, 16)))
    ).otherwise(s)
    # --- expand `::` and pad every group to 4 hex chars ----------------
    halves = F.split(s6, "::", -1)
    def groups(h: Column) -> Column:
        return F.when((h.isNull()) | (h == ""),
                      F.array().cast("array<string>")) \
                .otherwise(F.split(h, ":"))
    left, right = groups(F.get(halves, 0)), groups(F.get(halves, 1))
    miss = F.lit(8) - F.size(left) - F.size(right)
    allg = F.concat(left, F.array_repeat(F.lit("0"), miss), right)
    v6hex = F.array_join(F.transform(allg, lambda g: F.lpad(g, 4, "0")),
                         "")
    return F.when(s.contains(":"), v6hex).otherwise(v4hex)


def ip16_lit(value: str) -> str:
    """Driver-side literal → the same 32-hex-char comparable form."""
    addr = ipaddress.ip_address(value)
    if addr.version == 4:
        addr = ipaddress.ip_address(f"::ffff:{value}")
    return f"{int(addr):032x}"


def cidr_bounds16(cidr: str) -> tuple[str, str]:
    """CIDR (v4 or v6) → inclusive [lo, hi] bounds in the 32-hex-char
    space.  v4 networks map into the v4-mapped block so the bounds stay
    comparable against `ip16_hex` of any stored address."""
    net = ipaddress.ip_network(cidr, strict=False)
    lo, hi = int(net.network_address), int(net.broadcast_address)
    if net.version == 4:
        base = 0xFFFF << 32
        lo, hi = base | lo, base | hi
    return f"{lo:032x}", f"{hi:032x}"


def _is_v6(value: str) -> bool:
    return ":" in value


def _ip4(value: str) -> int:
    addr = ipaddress.ip_address(value)
    if addr.version != 4:
        raise ValueError("ip field: v6 literal on the v4-numeric path "
                         "(use ip16_hex comparisons)")
    return int(addr)


def cidr_bounds(cidr: str) -> tuple[int, int]:
    """CIDR "a.b.c.d/nn" → inclusive [network, broadcast] uint32 bounds
    (InetAddresses.parseCidr + the lower/upper bytes the reference's
    termQuery derives, IpFieldMapper.java:234-236).  v4-numeric path
    only; v6 CIDRs go through `cidr_bounds16`."""
    net = ipaddress.ip_network(cidr, strict=False)
    if net.version != 4:
        raise ValueError("ip field: v6 CIDR on the v4-numeric path "
                         "(use cidr_bounds16)")
    return int(net.network_address), int(net.broadcast_address)


def ip_term_cond(field: Column, value: str) -> Column:
    """`term` on an ip field: exact address, or CIDR → inclusive range
    (IpFieldMapper.termQuery, line 224-237).  v6 literals (and v6 CIDRs)
    compare in the 16-byte encoded space via `ip16_hex`, exactly the
    order the reference's InetAddressPoint gives."""
    if _is_v6(value):
        v = ip16_hex(field)
        if "/" in value:
            lo, hi = cidr_bounds16(value)
            return (v >= lo) & (v <= hi)
        return v == ip16_lit(value)
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
    "10.0.0.0" unlike a string comparison.  Any v6 bound switches the
    whole comparison into the shared 16-byte space (v4 bounds map to
    ::ffff:a.b.c.d there, preserving cross-family order)."""
    bounds = {"gte": gte, "gt": gt, "lte": lte, "lt": lt}
    if any(b is not None and _is_v6(b) for b in bounds.values()):
        v = ip16_hex(field)
        lit = ip16_lit
    else:
        v = ip_num(field)
        lit = _ip4
    cond = F.lit(True)
    if gte is not None:
        cond = cond & (v >= lit(gte))
    if gt is not None:
        cond = cond & (v > lit(gt))
    if lte is not None:
        cond = cond & (v <= lit(lte))
    if lt is not None:
        cond = cond & (v < lit(lt))
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
