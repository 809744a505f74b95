"""URL scalar functions (SURVEY.md §2.8).

The reference's only "scalar library" is byte predicates and interval
arithmetic (src/scanlines/naive_scanline.hpp:42-43,
src/SegmentImageImpl.cpp:53-76); the link-graph engine needs URL
normalization, host extraction and stable 64-bit hashing instead.

Normalization is PINNED: the fixture generator and the extractor use the
same function, so the byte-identical invariants hold by construction.
"""

from __future__ import annotations

import numpy as np
from urllib.parse import urljoin, urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}

# Fast-path detector: absolute http(s) url that normalization provably
# maps to itself — lowercase scheme+host, explicit non-default or no
# port, non-empty path with no dot-segments, no fragment, no chars that
# urlsplit/urlunsplit would transform. ~6x cheaper than the RFC-3986
# resolution path, and extraction spends most of its scalar time here.
import re as _re

_FAST_RE = _re.compile(
    r"^(https?)://([a-z0-9](?:[a-z0-9.\-]*[a-z0-9])?)(:(\d+))?(/[^#\s\\]*)?$"
)
_DOT_SEG_RE = _re.compile(r"/\.\.?(/|$)")


def _fast_normalize(href: str) -> "str | None":
    m = _FAST_RE.match(href)
    if m is None:
        return None
    scheme, _host, _, port, path = m.groups()
    if port is not None and (
        (scheme == "http" and port == "80")
        or (scheme == "https" and port == "443")
    ):
        return None  # default port needs stripping → slow path
    if path is None:
        return href + "/"  # empty path → "/" (rule 5), rest already canonical
    q = path.find("?")
    if q == len(path) - 1:
        return None  # EMPTY query: urlunsplit drops the bare '?' → slow path
    if _DOT_SEG_RE.search(path[:q] if q >= 0 else path):
        return None  # dot segments need resolution → slow path
    return href


def normalize_url(base: str, href: str) -> str | None:
    """Resolve ``href`` against ``base`` and canonicalize.

    Rules (deterministic, order matters):
      1. resolve relative refs against base (RFC 3986 via urljoin)
      2. lowercase scheme and host
      3. strip the fragment
      4. drop default ports (:80 http, :443 https)
      5. empty path → "/"
    Returns None for non-http(s) schemes (mailto:, javascript:, ...) and
    unparsable refs.
    """
    href = href.strip()
    if not href or href.startswith("#"):
        return None
    fast = _fast_normalize(href)
    if fast is not None:
        return fast
    try:
        resolved = urljoin(base, href)
        parts = urlsplit(resolved)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS[scheme]
    if netloc.endswith(default):
        netloc = netloc[: -len(default)]
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def host_of(url: str) -> str:
    """Lowercased host (no port) of a URL; '' when absent."""
    try:
        host = urlsplit(url).hostname
    except ValueError:
        return ""
    return host or ""


# --- stable 64-bit string hash (vectorized) --------------------------------
# FNV-1a over utf-8 bytes. Chosen because it is trivially reimplementable
# in any system (for differential tests) and fully deterministic across
# processes (unlike Python's builtin hash). Collision probability for the
# sandbox scales is negligible; the graph build additionally verifies
# injectivity over the observed vocabulary (config.vid_dtype guard,
# mirroring the reference's label-overflow throw,
# src/SegmentImageImpl.cpp:85-91).

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def hash64(s: str) -> int:
    h = _FNV_OFFSET
    prime = _FNV_PRIME
    with np.errstate(over="ignore"):
        for b in s.encode("utf-8"):
            h = np.uint64(h ^ np.uint64(b)) * prime
    return int(h)


def hash64_array(strings) -> np.ndarray:
    """Vectorized FNV-1a over an array-like of strings → uint64 array.

    Implemented as a byte-matrix scan: pads to the max length and runs
    one numpy pass per byte position. For typical URL lengths (<200
    bytes) this is ~100x faster than a Python loop.
    """
    arr = [s.encode("utf-8") for s in strings]
    n = len(arr)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lens = np.fromiter((len(b) for b in arr), dtype=np.int64, count=n)
    maxlen = int(lens.max()) if n else 0
    buf = np.zeros((n, maxlen), dtype=np.uint8)
    flat = np.frombuffer(b"".join(arr), dtype=np.uint8)
    # vectorized scatter of every string's bytes into its row
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    rows = np.repeat(np.arange(n, dtype=np.int64), lens)
    cols = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(starts, lens)
    buf[rows, cols] = flat
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    prime = _FNV_PRIME
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            active = lens > j
            hj = h[active]
            hj = (hj ^ buf[active, j].astype(np.uint64)) * prime
            h[active] = hj
    return h
