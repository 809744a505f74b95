"""HTML → (links, text) extraction: the engine's analogue of the
reference's per-row run extraction.

Reference mapping (SURVEY.md §2.2): ``compress_scanline``
(src/SegmentImageImpl_Scanline.cpp:13-36) parses one row of bytes into
runs and is flagged "BY FAR the performance bottleneck"; here one page
of HTML bytes is parsed into out-links (a 1→k flat-map) and extracted
text (1→1). Like the reference fanning rows across OpenMP threads
(src/SegmentImageImpl_Scanline.cpp:79-85), the engine fans pages across
an actor pool via ``Dataset.map_batches`` — the actor compiles its
regexes ONCE in ``__init__`` (state amortized across batches, the Ray
equivalent of not re-creating threads per call, ref
src/SegmentImageImpl_Scanline.cpp:52-73).

The text extractor is PINNED: its output is the byte-identical golden
``text`` column in fixtures (BASELINE.json input_hint). Do not change
its semantics without regenerating goldens.
"""

from __future__ import annotations

import html as _htmlmod
import re

import numpy as np
import pyarrow as pa

from ..functions.urls import normalize_url
from ..util import table_from_arrays

# --- pinned pure functions -------------------------------------------------

_SCRIPT_RE = re.compile(rb"(?is)<(script|style)\b.*?</\1\s*>")
_COMMENT_RE = re.compile(rb"(?s)<!--.*?-->")
_TAG_RE = re.compile(rb"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

_HREF_RE = re.compile(
    rb"""(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
)


def extract_text(html_bytes: bytes) -> str:
    """Pinned text extraction: drop script/style/comments, strip tags,
    unescape HTML entities, collapse whitespace. Deterministic; treats
    input as UTF-8 with replacement."""
    if not html_bytes:
        return ""
    b = _SCRIPT_RE.sub(b" ", html_bytes)
    b = _COMMENT_RE.sub(b" ", b)
    b = _TAG_RE.sub(b" ", b)
    s = b.decode("utf-8", errors="replace")
    s = _htmlmod.unescape(s)
    return _WS_RE.sub(" ", s).strip()


def extract_hrefs(html_bytes: bytes) -> list[str]:
    """Raw href attribute values of <a> anchors, in document order."""
    out = []
    for m in _HREF_RE.finditer(html_bytes):
        raw = m.group(2) or m.group(3) or m.group(4) or b""
        out.append(raw.decode("utf-8", errors="replace"))
    return out


_ANCHOR_RE = re.compile(
    rb"""(?is)<a\s[^>]*?href\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))"""
    rb"""[^>]*>(.*?)</a\s*>"""
)


def extract_anchors(src_url: str, html_bytes: bytes) -> list[tuple[str, str]]:
    """(normalized dst_url, anchor text) pairs of one page, in document
    order — the webgraph's edge payload (anchor text is the classic
    relevance signal crawl-graph rankers join onto edges). The anchor
    text goes through the SAME pinned text pipeline as page text
    (strip inner tags, unescape entities, collapse whitespace);
    self-links are dropped by the extract_links rule; duplicates are
    KEPT (dedup is a separate operator)."""
    out = []
    for m in _ANCHOR_RE.finditer(html_bytes or b""):
        raw = m.group(2) or m.group(3) or m.group(4) or b""
        dst = normalize_url(src_url, raw.decode("utf-8", errors="replace"))
        if dst is not None and dst != src_url:
            out.append((dst, extract_text(m.group(5) or b" ") ))
    return out


def extract_links(src_url: str, html_bytes: bytes) -> list[str]:
    """Normalized out-links of one page (self-links dropped, duplicates
    KEPT — dedup is a separate, explicitly-shuffling operator,
    SURVEY.md §2.7)."""
    links = []
    for href in extract_hrefs(html_bytes):
        dst = normalize_url(src_url, href)
        if dst is not None and dst != src_url:
            links.append(dst)
    return links


# --- batch stages ----------------------------------------------------------
#
# Two flavors per stage:
#  - plain FUNCTIONS (default): the extractor's only state is the
#    module-level compiled regexes, which live in the long-lived worker
#    processes — stateless tasks are elastic and pay zero pool startup.
#  - callable CLASSES (actor pools): the pattern for genuinely heavy
#    per-worker state (models, interning tables); kept API-compatible and
#    tested so swapping in a real parser is a one-line change.


def link_extract_fn(batch: pa.Table) -> pa.Table:
    """Stateless pages batch → edges batch (src_url, dst_url); 1→k."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    for u, h in zip(urls, htmls):
        links = extract_links(u, h or b"")
        src_out.extend([u] * len(links))
        dst_out.extend(links)
    return pa.table(
        {
            "src_url": pa.array(src_out, type=pa.string()),
            "dst_url": pa.array(dst_out, type=pa.string()),
        }
    )


def anchor_extract_fn(batch: pa.Table) -> pa.Table:
    """Stateless pages batch → (src_url, dst_url, anchor) batch; the
    1→k edge flat-map carrying the anchor-text payload."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    src_out: list[str] = []
    dst_out: list[str] = []
    txt_out: list[str] = []
    for u, h in zip(urls, htmls):
        for dst, txt in extract_anchors(u, h or b""):
            src_out.append(u)
            dst_out.append(dst)
            txt_out.append(txt)
    return pa.table(
        {
            "src_url": pa.array(src_out, type=pa.string()),
            "dst_url": pa.array(dst_out, type=pa.string()),
            "anchor": pa.array(txt_out, type=pa.string()),
        }
    )


def text_extract_fn(batch: pa.Table) -> pa.Table:
    """Stateless pages batch → (url, text) batch, 1→1; pinned extractor."""
    urls = batch.column("url")
    htmls = batch.column("html").to_pylist()
    texts = pa.array(
        [extract_text(h or b"") for h in htmls], type=pa.large_string()
    )
    return pa.table({"url": urls, "text": texts})


class LinkExtractor:
    """Actor-pool stage: pages batch → edges batch (src_url, dst_url).

    1→k flat-map shape: one input page emits k edge rows. Output is a
    fresh Arrow table; the input block is never mutated (zero-copy read).
    """

    def __init__(self) -> None:
        # Regexes are module-level-compiled already; per-actor state kept
        # for parity with heavier parsers (models, interning tables).
        self._href_re = _HREF_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        return link_extract_fn(batch)


class TextExtractor:
    """Actor-pool stage: pages batch → (url, text) batch, 1→1.

    The byte-identity invariant (extracted text == fixture ``text``)
    is asserted in tests over this stage's output.
    """

    def __init__(self) -> None:
        self._ws = _WS_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        return text_extract_fn(batch)
