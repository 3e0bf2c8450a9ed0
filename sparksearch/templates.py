"""Composable (v2) index templates + component templates.

Reference: server/src/main/java/org/opensearch/cluster/metadata/
MetadataIndexTemplateService.java — findV2Template:1018 (glob match, max
priority wins), collectMappings:1071 (composed_of order, template's own
mappings last = highest precedence), resolveSettings:1163 (same order,
flat key put), findConflictingV2Templates:696 (putting a template whose
index_patterns overlap an existing template AT THE SAME PRIORITY is
rejected), plus ComponentTemplate / ComposableIndexTemplate metadata.
Pattern syntax is Regex.simpleMatch: literal text with ``*`` wildcards.

The registry is a JSON document updated with atomic replace, like the
alias registry in index.py — Spark has no cluster-state master, so a
single atomically-committed JSON doc is the analogous visibility unit:
readers see the old or the new registry, never a partial state.
"""
from __future__ import annotations

import json
import os
import re

__all__ = [
    "put_component_template", "delete_component_template",
    "put_index_template", "delete_index_template",
    "find_template", "resolve_template", "simulate_index",
    "materialize_index",
]


# ---------------------------------------------------------------------------
# registry I/O
# ---------------------------------------------------------------------------

def _load(path: str) -> dict:
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)
    return {"component_templates": {}, "index_templates": {}}


def _save(path: str, reg: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(reg, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# glob matching / overlap (Regex.simpleMatch + automaton intersection)
# ---------------------------------------------------------------------------

def _simple_match(pattern: str, s: str) -> bool:
    """Regex.simpleMatch: literal text with ``*`` matching any run."""
    rx = "".join(".*" if c == "*" else re.escape(c) for c in pattern)
    return re.fullmatch(rx, s) is not None


def _globs_overlap(p1: str, p2: str) -> bool:
    """True iff some string matches BOTH ``*``-glob patterns (the
    automaton-intersection-nonempty check in
    findConflictingV2Templates). DP over pattern positions."""
    n1, n2 = len(p1), len(p2)
    memo: dict[tuple[int, int], bool] = {}

    def go(i: int, j: int) -> bool:
        if (i, j) in memo:
            return memo[i, j]
        if i == n1 and j == n2:
            r = True
        elif i < n1 and p1[i] == "*":
            # star emits nothing, or emits one char the other side consumes
            r = go(i + 1, j) or (j < n2 and go(i, j + 1))
        elif j < n2 and p2[j] == "*":
            r = go(i, j + 1) or (i < n1 and go(i + 1, j))
        elif i < n1 and j < n2 and p1[i] == p2[j]:
            r = go(i + 1, j + 1)
        else:
            r = False
        memo[i, j] = r
        return r

    return go(0, 0)


def _patterns_overlap(pats1, pats2) -> list[str]:
    return [f"{a} <> {b}" for a in pats1 for b in pats2
            if _globs_overlap(a, b)]


# ---------------------------------------------------------------------------
# CRUD
# ---------------------------------------------------------------------------

def put_component_template(path: str, name: str, body: dict) -> None:
    """``PUT _component_template/<name>`` — body carries ``template``
    ({settings, mappings, aliases}) and optional ``version``."""
    if "template" not in body:
        raise ValueError("component template body requires 'template'")
    reg = _load(path)
    reg["component_templates"][name] = body
    _save(path, reg)


def delete_component_template(path: str, name: str) -> None:
    """Refuses while any index template still composes it
    (MetadataIndexTemplateService.innerRemoveComponentTemplate)."""
    reg = _load(path)
    users = [tn for tn, t in reg["index_templates"].items()
             if name in t.get("composed_of", ())]
    if users:
        raise ValueError(
            f"component template {name!r} is in use by index templates "
            f"{sorted(users)}")
    reg["component_templates"].pop(name, None)
    _save(path, reg)


def put_index_template(path: str, name: str, body: dict,
                       create: bool = False) -> None:
    """``PUT _index_template/<name>``. Validates: non-empty
    ``index_patterns``; every ``composed_of`` component exists; and —
    the v2 invariant — no OTHER template's patterns overlap these at
    the same priority (addIndexTemplateV2:488/499)."""
    pats = body.get("index_patterns")
    if not pats or not isinstance(pats, list):
        raise ValueError("index template requires non-empty index_patterns")
    reg = _load(path)
    if create and name in reg["index_templates"]:
        raise ValueError(f"index template {name!r} already exists")
    missing = [c for c in body.get("composed_of", ())
               if c not in reg["component_templates"]]
    if missing:
        raise ValueError(f"unknown component templates: {sorted(missing)}")
    prio = int(body.get("priority", 0))
    conflicts = {}
    for other, t in reg["index_templates"].items():
        if other == name or int(t.get("priority", 0)) != prio:
            continue
        overl = _patterns_overlap(pats, t["index_patterns"])
        if overl:
            conflicts[other] = overl
    if conflicts:
        raise ValueError(
            f"index template {name!r} (priority {prio}) has overlapping "
            f"patterns with same-priority templates: {conflicts}")
    reg["index_templates"][name] = body
    _save(path, reg)


def delete_index_template(path: str, name: str) -> None:
    reg = _load(path)
    reg["index_templates"].pop(name, None)
    _save(path, reg)


# ---------------------------------------------------------------------------
# resolution
# ---------------------------------------------------------------------------

def find_template(path: str, index_name: str) -> str | None:
    """findV2Template: every template one of whose patterns matches;
    winner = highest priority (default 0). A same-priority double match
    is impossible because put rejects same-priority pattern overlap."""
    reg = _load(path)
    best, best_prio = None, None
    for name, t in reg["index_templates"].items():
        if any(_simple_match(p, index_name) for p in t["index_patterns"]):
            prio = int(t.get("priority", 0))
            if best_prio is None or prio > best_prio:
                best, best_prio = name, prio
    return best


def _deep_merge(base: dict, over: dict) -> dict:
    """Per-key recursive merge, later wins on leaves — the mapping merge
    used when stacking collectMappings' ordered list."""
    out = dict(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def resolve_template(path: str, name: str) -> dict:
    """Resolved {settings, mappings, aliases} for template ``name``:
    composed_of components IN ORDER, then the template's own block last
    (highest precedence) — resolveSettings:1163 / collectMappings:1071.
    Settings merge flat (key put); mappings and aliases merge deep."""
    reg = _load(path)
    t = reg["index_templates"].get(name)
    if t is None:
        raise KeyError(f"unknown index template: {name!r}")
    blocks = [reg["component_templates"][c]["template"]
              for c in t.get("composed_of", ())
              if c in reg["component_templates"]]
    if t.get("template"):
        blocks.append(t["template"])
    settings: dict = {}
    mappings: dict = {}
    aliases: dict = {}
    for b in blocks:
        settings.update(b.get("settings", {}))
        mappings = _deep_merge(mappings, b.get("mappings", {}))
        aliases = _deep_merge(aliases, b.get("aliases", {}))
    return {"settings": settings, "mappings": mappings, "aliases": aliases}


def materialize_index(path: str, index_name: str) -> dict:
    """Resolve AND ACTIVATE the winning template for a new index — the
    create-index path (MetadataCreateIndexService applies the resolved
    template): the settings ``analysis`` block is registered with the
    analyzer registry (named filters resolvable exactly like the
    reference's settings JSON), an analyzer named ``default`` becomes
    the index's default analyzer (the reference's convention for
    ``settings.analysis.analyzer.default``), and the
    ``index.default_pipeline`` setting is surfaced for the write path.

    Returns the resolved blocks plus:
    ``analyzers`` (names registered), ``default_analyzer`` (name or
    None), ``default_pipeline`` (pipeline id or None)."""
    sim = simulate_index(path, index_name)
    if sim["matched_template"] is None:
        raise ValueError(
            f"no index template matches {index_name!r}")
    resolved = dict(sim["template"])
    settings = resolved["settings"]
    registered: list[str] = []
    analysis = settings.get("analysis")
    if analysis:
        from sparksearch.analysis_custom import register_analysis
        registered = register_analysis(analysis)
    resolved["analyzers"] = registered
    resolved["default_analyzer"] = \
        "default" if "default" in registered else None
    resolved["default_pipeline"] = settings.get("index.default_pipeline")
    resolved["matched_template"] = sim["matched_template"]
    return resolved


def simulate_index(path: str, index_name: str) -> dict:
    """``POST _index_template/_simulate_index/<name>``: the winning
    template's resolved blocks plus the lower-priority templates the
    index ALSO matched (reported as overlapping, like the API does)."""
    reg = _load(path)
    winner = find_template(path, index_name)
    if winner is None:
        return {"matched_template": None, "template": None,
                "overlapping": []}
    overlapping = sorted(
        n for n, t in reg["index_templates"].items()
        if n != winner
        and any(_simple_match(p, index_name) for p in t["index_patterns"]))
    return {"matched_template": winner,
            "template": resolve_template(path, winner),
            "overlapping": overlapping}
