"""robots.txt (RFC 9309) URL filtering — the crawl-pipeline gatekeeper.

A Common-Crawl-style corpus must honour per-host robots rules before
anything downstream trains on it.  This implements the published RFC
9309 semantics:

- group selection: the group whose User-agent product token matches the
  crawler exactly, else the `*` group (multiple User-agent lines stack
  onto one group; repeated groups for the same agent merge);
- rule matching: a rule matches when its path pattern matches a PREFIX
  of the URL path; `*` matches any char sequence, `$` anchors the end;
- precedence: the longest (most-octets) matching pattern wins; at equal
  length Allow beats Disallow; no matching rule ⇒ allowed.

Spark shape: `robots_rules` parses the per-host robots.txt corpus in
one Arrow mapInPandas pass into (host, rules array<struct>); then
`robots_filter` BROADCASTS that table (hosts ≪ pages) onto the pages
frame and evaluates precedence with pure JVM higher-order functions —
filter → transform → array_max over (plen, allow) structs.  One
broadcast join, zero shuffles of the pages table, no Python per page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

__all__ = ["parse_robots", "robots_rules", "robots_filter"]


def parse_robots(content: str, agent: str = "*") -> list[tuple[str, bool]]:
    """[(path_pattern, allow)] for the RFC 9309 group that governs
    `agent` (exact product-token match preferred over `*`)."""
    groups: dict[str, list[tuple[str, bool]]] = {}
    current: list[str] = []
    rules_started = True
    for raw in content.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field, value = field.strip().lower(), value.strip()
        if field == "user-agent":
            if rules_started:       # a new group starts
                current = []
                rules_started = False
            ua = value.lower()
            groups.setdefault(ua, [])
            current.append(ua)
        elif field in ("allow", "disallow"):
            rules_started = True
            if not value:
                continue            # empty pattern matches nothing
            for ua in current:
                groups[ua].append((value, field == "allow"))
    return groups.get(agent.lower(), groups.get("*", []))


_RULE_T = T.ArrayType(T.StructType([
    T.StructField("pat", T.StringType()),      # LIKE-translated pattern
    T.StructField("plen", T.IntegerType()),    # RFC specificity (octets)
    T.StructField("allow", T.IntegerType()),   # 1 allow / 0 disallow
]))


def _like_of(pattern: str) -> str:
    anchored = pattern.endswith("$")
    core = pattern[:-1] if anchored else pattern
    esc = (core.replace("\\", "\\\\").replace("%", r"\%")
           .replace("_", r"\_").replace("*", "%"))
    return esc if anchored else esc + "%"


def robots_rules(robots: DataFrame, agent: str = "*",
                 host_col: str = "host",
                 content_col: str = "content") -> DataFrame:
    """(host, rules array<struct<pat, plen, allow>>) — one Arrow
    mapInPandas parse pass over the robots corpus."""
    import pandas as pd

    schema = T.StructType([
        T.StructField("host", T.StringType()),
        T.StructField("rules", _RULE_T),
    ])

    def kernel(batches):
        for pdf in batches:
            hosts, rules = [], []
            for h, c in zip(pdf[host_col], pdf[content_col]):
                parsed = parse_robots(c or "", agent)
                # hostnames are case-insensitive (RFC 3986 §3.2.2) — match
                # lowercased on both sides so HTTPS://Host.Example still
                # joins to its rules instead of failing open
                hosts.append((h or "").lower())
                # at most ONE trailing '$' is the end anchor; 'path$$' ends
                # in a literal '$'
                rules.append([(_like_of(p),
                               len(p[:-1]) if p.endswith("$") else len(p),
                               1 if a else 0) for p, a in parsed])
            yield pd.DataFrame({"host": hosts, "rules": rules})

    return robots.mapInPandas(kernel, schema=schema)


def robots_filter(pages: DataFrame, robots: DataFrame, agent: str = "*",
                  url_col: str = "url",
                  host_col: str = "host",
                  content_col: str = "content") -> DataFrame:
    """Keep the pages RFC 9309 allows for `agent`.  The parsed rules
    table is broadcast (hosts ≪ pages); precedence is evaluated as
    array_max over (plen, allow) structs of the matching rules — struct
    ordering IS the RFC rule: longest pattern first, Allow over
    Disallow on ties; empty ⇒ allowed."""
    rules = robots_rules(robots, agent, host_col, content_col)
    # scheme + host are case-insensitive; a compliance gate must not fail
    # open on 'HTTPS://Host.Example/...'
    host = F.lower(F.regexp_extract(
        F.col(url_col), r"^(?i)[a-z][a-z0-9+.-]*://([^/]*)", 1))
    path = F.regexp_replace(
        F.col(url_col), r"^(?i)[a-z][a-z0-9+.-]*://[^/]*", "")
    tagged = pages.withColumn("_host", host).withColumn(
        "_path", F.when(path == "", "/").otherwise(path))
    joined = tagged.join(
        F.broadcast(rules.withColumnRenamed("host", "_host")),
        "_host", "left")
    best = F.expr(
        "array_max(transform("
        "  filter(rules, r -> _path LIKE r.pat),"
        "  r -> struct(r.plen AS plen, r.allow AS allow)))")
    allowed = F.col("_best").isNull() | (F.col("_best.allow") == 1)
    return (joined.withColumn("_best", best)
            .where(allowed)
            .select(*pages.columns))
