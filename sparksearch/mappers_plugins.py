"""Plugin-tier mappers and enrichment processors.

Re-expressions of the reference's optional mapper/ingest plugins over
Spark doc-value columns:

- **mapper-size** (`plugins/mapper-size/src/main/java/org/opensearch/
  index/mapper/size/SizeFieldMapper.java`): an opt-in `_size` metadata
  field holding the byte length of the original `_source`, queryable and
  sortable like any integer field.  Here `_size` = `octet_length` of the
  source payload columns (UTF-8 bytes, matching the reference's
  `source.length()` over the encoded bytes) — pure Catalyst, pushed to
  the scan.

- **mapper-murmur3** (`plugins/mapper-murmur3/src/main/java/org/
  opensearch/index/mapper/murmur3/Murmur3FieldMapper.java:190-200`): a
  `murmur3` field type hashing each value at index time
  (`MurmurHash3.hash128(bytes, 0, length, 0).h1` — the x64 128-bit
  variant's first word, seed 0) so `cardinality` aggs don't re-hash at
  query time.  The hash is implemented from Austin Appleby's public
  MurmurHash3 reference description (public domain), vectorized over
  factorized uniques in one Arrow batch UDF — per-unique-value cost,
  not per-row.

- **mapper-annotated-text** (`plugins/mapper-annotated-text/.../
  AnnotatedTextFieldMapper.java` — `AnnotatedText.parse`): markdown-like
  inline annotations ``[surface text](annotation+value)`` are stripped
  from the indexed text; each annotation value is injected as a single
  token at the SAME position as the first token of its surface span
  (posIncrement 0), so entity tokens are phrase-position-compatible
  with the surface words.  Multiple `&`-separated values stack at that
  position.  Annotation values are URL-decoded (%xx) like the plugin.

- **ingest-geoip analogue** (`modules/ingest-geoip/.../GeoIpProcessor
  .java`): enrich rows with attributes from a CIDR-range lookup table.
  The MaxMind mmdb does not ship, so the lookup source is a caller-
  provided DataFrame of ``(cidr string, ...attrs)``; the processor
  resolves each row's IPv4 against it.  Scale shape: ranges explode
  into covered /16 prefix buckets (≤ 2^(16-prefix) rows per range,
  guarded), the probe side joins on its /16 prefix — an **equi-join**
  a broadcast hash join handles, never a BroadcastNestedLoopJoin range
  scan; the residual BETWEEN filters inside the bucket.

All column work is Catalyst; the only Python is the murmur3 kernel
(Arrow-batched, factorized) and the annotated-text parser (index-time
analysis, same cost class as every analyzer chain).
"""

from __future__ import annotations

import re
import struct
from urllib.parse import unquote

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparksearch.fieldtypes import cidr_bounds, ip_num

__all__ = [
    "with_size",
    "murmur3_128_h1",
    "with_murmur3",
    "parse_annotated",
    "annotated_analyze",
    "geoip_enrich",
]


# ---------------------------------------------------------------------------
# mapper-size
# ---------------------------------------------------------------------------

def with_size(df: DataFrame, *source_cols: str,
              out: str = "_size") -> DataFrame:
    """Add the `_size` metadata field: total UTF-8/byte length of the
    source payload columns (SizeFieldMapper stores
    `context.sourceToParse().source().length()`)."""
    if not source_cols:
        raise ValueError("mapper-size needs at least one source column")
    total = None
    for c in source_cols:
        n = F.coalesce(F.octet_length(F.col(c)), F.lit(0)).cast("long")
        total = n if total is None else total + n
    return df.withColumn(out, total)


# ---------------------------------------------------------------------------
# mapper-murmur3 — MurmurHash3 x64 128, h1 word, seed 0
# ---------------------------------------------------------------------------

_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
_MASK = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK
    k ^= k >> 33
    return k


def murmur3_128_h1(data: bytes, seed: int = 0) -> int:
    """MurmurHash3 x64 128-bit, first 64-bit word (h1), as a SIGNED
    long — the value Murmur3FieldMapper stores
    (`MurmurHash3.hash128(...).h1`).  Implemented from the public
    algorithm description (Austin Appleby, public domain)."""
    h1 = h2 = seed & _MASK
    n = len(data)
    nblocks = n // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _MASK
        k2 &= _MASK
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _MASK
        h1 = (h1 * 5 + 0x52DCE729) & _MASK
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _MASK
        h2 = (h2 * 5 + 0x38495AB5) & _MASK
    tail = data[nblocks * 16:]
    k1 = k2 = 0
    t = len(tail)
    if t >= 9:
        for i in range(t - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _MASK
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & _MASK
        h2 ^= k2
    if t > 0:
        for i in range(min(t, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _MASK
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & _MASK
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK
    h2 = (h2 + h1) & _MASK
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _MASK
    # h2 = (h2 + h1): not needed — the mapper stores h1 only
    return h1 - (1 << 64) if h1 >= (1 << 63) else h1


def with_murmur3(df: DataFrame, field: str,
                 out: str | None = None) -> DataFrame:
    """Add `<field>_hash` = murmur3 x64-128 h1 of the UTF-8 value
    (null-safe).  Arrow-batched; hashes each DISTINCT value once per
    batch (pandas factorize), so a low-cardinality keyword column costs
    ~uniques, not ~rows."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _h(vals: pd.Series) -> pd.Series:
        codes, uniques = pd.factorize(vals)
        hashed = [None if u is None
                  else murmur3_128_h1(str(u).encode("utf-8"))
                  for u in uniques]
        return pd.Series(
            [None if c < 0 else hashed[c] for c in codes], dtype="object")

    return df.withColumn(out or f"{field}_hash", _h(F.col(field)))


# ---------------------------------------------------------------------------
# mapper-annotated-text
# ---------------------------------------------------------------------------

#: [surface](value) — value may not contain ')' or whitespace-only
_ANN_RE = re.compile(r"\[([^\]]+)\]\(([^)]+)\)")


def parse_annotated(markup: str) -> tuple[str, list[tuple[int, list[str]]]]:
    """Strip ``[surface](v1&v2)`` markup → (plain text, [(char_offset of
    surface in the plain text, [values])]).  Mirrors AnnotatedText.parse:
    the surface text stays in the token stream; values are injected at
    the surface's first token position."""
    out: list[str] = []
    anns: list[tuple[int, list[str]]] = []
    last = 0
    for m in _ANN_RE.finditer(markup):
        out.append(markup[last:m.start()])
        offset = sum(len(s) for s in out)
        surface = m.group(1)
        values = [unquote(v) for v in m.group(2).split("&") if v]
        anns.append((offset, values))
        out.append(surface)
        last = m.end()
    out.append(markup[last:])
    return "".join(out), anns


def annotated_analyze(markup: str) -> list[tuple[str, int]]:
    """Token stream of an annotated_text field: standard-analyzer tokens
    of the plain text, plus each annotation value as ONE keyword token at
    the position of the first surface token at-or-after its offset
    (posIncrement 0 — AnnotatedHighlighterAnalyzer injection)."""
    from sparksearch.analysis import _TOKEN_RE, MAX_TOKEN_LENGTH

    plain, anns = parse_annotated(markup)
    toks: list[tuple[str, int, int]] = []   # (term, pos, char_start)
    pos = 0
    for m in _TOKEN_RE.finditer(plain):
        t = m.group(0)
        for i in range(0, len(t), MAX_TOKEN_LENGTH):
            toks.append((t[i:i + MAX_TOKEN_LENGTH].lower(), pos,
                         m.start() + i))
            pos += 1
    out: list[tuple[str, int]] = [(t, p) for t, p, _ in toks]
    for offset, values in anns:
        anchor = next((p for _, p, s in toks if s >= offset), pos)
        out.extend((v, anchor) for v in values)
    out.sort(key=lambda tp: (tp[1], tp[0]))
    return out


# ---------------------------------------------------------------------------
# ingest-geoip analogue — CIDR-range enrichment
# ---------------------------------------------------------------------------

def geoip_enrich(df: DataFrame, ip_col: str, ranges: DataFrame,
                 cidr_col: str = "cidr",
                 max_bucket_bits: int = 8) -> DataFrame:
    """Enrich `df` with the attribute columns of the matching CIDR range.

    GeoIpProcessor resolves `ip` against a range database; here the
    database is `ranges` (cidr + attribute columns).  Plan shape: each
    CIDR explodes into its covered /16 buckets driver-side (the table is
    a bounded lookup source — GeoLite2-scale, i.e. broadcastable), rows
    join on their /16 prefix (hash equi-join), and a residual BETWEEN
    keeps the exact range.  A CIDR wider than /(16-max_bucket_bits)
    raises rather than exploding unbounded.

    Non-overlapping ranges are the caller's contract (as in the mmdb);
    overlaps would duplicate rows, matching SQL join semantics.
    """
    rows = ranges.collect()
    attr_cols = [c for c in ranges.columns if c != cidr_col]
    exploded = []
    for r in rows:
        lo, hi = cidr_bounds(r[cidr_col])
        if (hi - lo) >> 16 > (1 << max_bucket_bits):
            raise ValueError(
                f"CIDR {r[cidr_col]} spans {(hi - lo + 1) >> 16} /16 "
                f"buckets (> 2^{max_bucket_bits}); pre-split the range")
        for b in range(lo >> 16, (hi >> 16) + 1):
            exploded.append((b, lo, hi, *[r[c] for c in attr_cols]))
    spark = df.sparkSession
    lut = spark.createDataFrame(
        exploded, ["_b16", "_lo", "_hi", *attr_cols])
    probe = (df.withColumn("_ipn", ip_num(F.col(ip_col)))
             .withColumn("_pb16", (F.col("_ipn") / 65536).cast("long")))
    # equality on the /16 bucket is the hash-join key; the BETWEEN rides
    # along as the join's residual condition, so a probe that shares a
    # bucket with a range it does not belong to never produces a row
    cond = ((probe["_pb16"] == lut["_b16"])
            & probe["_ipn"].between(lut["_lo"], lut["_hi"]))
    return (probe.join(F.broadcast(lut), cond, "left")
            .select(*df.columns, *attr_cols))
