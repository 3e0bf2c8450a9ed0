"""Frozen html→text extractor (byte-identical contract).

Analogue of the reference's html_strip char filter
(/root/reference/modules/analysis-common/src/main/java/org/opensearch/analysis/common/HtmlStripCharFilterFactory.java:35-63
and modules/ingest-common/.../HtmlStripProcessor.java): removes markup,
drops the *content* of non-text elements (script/style/head), strips
comments and CDATA, and decodes character entities.

This function is the per-row invariant of the engine: for every corpus row,
``extract_text(html) == text`` must hold byte-for-byte (BASELINE.md gate).
It is therefore implemented as a frozen, dependency-free state machine —
no bs4/lxml, whose upgrades could silently change output. Do not "improve"
its behavior without regenerating every golden fixture.

Scale note: applied via an Arrow-batched pandas UDF over the `html` binary
column; the state machine is O(len(html)) with a compiled regex scanner.
"""

from __future__ import annotations

import html as _htmlmod
import re

__all__ = ["extract_text", "extract_series"]

# Elements whose entire content is dropped (non-content in web pages).
_DROP_CONTENT = ("script", "style", "head")

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_CDATA_RE = re.compile(r"<!\[CDATA\[.*?\]\]>", re.DOTALL)
# Attribute values may contain '>' when quoted — consume quoted spans whole.
_ATTRS = r"(?:\"[^\"]*\"|'[^']*'|[^>\"'])*"
_DROP_RE = re.compile(
    rf"<(script|style|head)\b{_ATTRS}>.*?</\1\s*>",
    re.DOTALL | re.IGNORECASE,
)
_TAG_RE = re.compile(rf"</?[a-zA-Z!]{_ATTRS}>")


def extract_text(html: bytes | str) -> str:
    """Strip markup from an HTML document, returning its text content.

    Order matters and is frozen: comments → CDATA → script/style/head
    subtrees → remaining tags → entity decode.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    s = _COMMENT_RE.sub("", html)
    s = _CDATA_RE.sub("", s)
    s = _DROP_RE.sub("", s)
    s = _TAG_RE.sub("", s)
    return _htmlmod.unescape(s)


def extract_series(htmls) -> "list[str]":
    """Batch helper for pandas UDFs: list/Series of bytes → list of str."""
    return [extract_text(h) for h in htmls]
