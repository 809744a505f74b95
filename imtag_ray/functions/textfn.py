"""Text-analysis batch functions for the training-data pipeline
(driver brief: language-ID, quality scoring, token counting, document
fingerprinting). All are vectorized over pandas/pyarrow batches and
their semantics are deliberately ANSI-SQL-replicable so the DuckDB
oracle can check them value-for-value (see __ray_entry__.oracle_sql).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")
_PUNCT = re.compile(r"[.,!?;:]")

# language marker words (surrounded by spaces when counting). Chosen to
# be replicable in SQL via replace-length counting.
LANG_MARKERS: dict[str, list[str]] = {
    "de": [" der ", " und ", " die ", " nicht "],
    "en": [" the ", " and ", " of ", " is "],
    "es": [" el ", " los ", " las ", " una "],
    "fr": [" le ", " les ", " des ", " est "],
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; 0 for empty/blank text.
    SQL: CASE WHEN trim(text)='' THEN 0 ELSE
         len(regexp_split_to_array(trim(text),'\\s+')) END"""
    stripped = texts.fillna("").str.strip()
    n = stripped.str.split(r"\s+", regex=True).str.len().astype("int64")
    n[stripped == ""] = 0
    return n.to_numpy()


# BPE-ish pre-tokenizer (GPT-2-style shape, ASCII classes so Python re
# and DuckDB RE2 agree exactly): optional leading space + letter run /
# digit run / symbol run.
_BPE = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+")
BPE_PATTERN_SQL = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+"


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count (driver brief: 'whitespace + a BPE-ish
    regex'): number of pre-tokenizer matches — letter runs, digit runs
    and symbol runs each with their optional leading space, the
    greedy-alternation shape GPT-2's pre-tokenizer uses.
    SQL: len(regexp_extract_all(text, pattern))."""
    return (
        texts.fillna("").str.count(_BPE).astype("int64").to_numpy()
    )


def quality_metrics(texts: pd.Series) -> dict[str, np.ndarray]:
    """Length/punctuation/token-shape quality signals.

    - n_chars: length in characters
    - n_tokens: whitespace tokens
    - avg_token_len: non-space chars / tokens (0 when no tokens), rounded 6dp
    - punct_ratio: [.,!?;:] count / max(n_chars,1), rounded 6dp
    """
    t = texts.fillna("")
    n_chars = t.str.len().astype("int64").to_numpy()
    n_tokens = token_count(t)
    nonspace = t.str.replace(r"\s", "", regex=True).str.len().to_numpy()
    with np.errstate(divide="ignore", invalid="ignore"):
        avg = np.where(n_tokens > 0, nonspace / np.maximum(n_tokens, 1), 0.0)
    punct = t.str.count(_PUNCT).to_numpy()
    pr = punct / np.maximum(n_chars, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": np.round(avg, 6),
        "punct_ratio": np.round(pr, 6),
    }


def langid(texts: pd.Series) -> np.ndarray:
    """Marker-word language ID over {de,en,es,fr}; 'und' when no marker
    hits. Ties break alphabetically (deterministic; SQL CASE chain with
    >= comparisons in alphabetical order reproduces it)."""
    padded = " " + texts.fillna("").str.lower().str.replace(
        r"\s+", " ", regex=True
    ) + " "
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        c = np.zeros(len(padded), dtype=np.int64)
        for m in markers:
            c += padded.str.count(re.escape(m)).to_numpy()
        counts[lang] = c
    langs = sorted(counts)  # alphabetical → first max wins
    stacked = np.stack([counts[l] for l in langs], axis=1)
    best = np.argmax(stacked, axis=1)  # first occurrence of max = alpha tie-break
    out = np.array(langs, dtype=object)[best]
    out[stacked.max(axis=1) == 0] = "und"
    return out


def fingerprint_md5(texts: pd.Series) -> np.ndarray:
    """Content fingerprint: md5 hex of whitespace-normalized lowercase
    text. SQL: md5(regexp_replace(lower(text),'\\s+',' ','g'))
    (trim applied on both sides)."""
    norm = (
        texts.fillna("").str.lower().str.replace(r"\s+", " ", regex=True).str.strip()
    )
    return np.array(
        [hashlib.md5(s.encode("utf-8")).hexdigest() for s in norm], dtype=object
    )


def rolling_fingerprint(text: str, window: int = 8, mod: int = 1 << 61) -> int:
    """Winnowing-style rolling-hash document fingerprint over tokens:
    min of Rabin-Karp hashes of every `window`-token run (not SQL-
    expressible; checked by unit tests/property tests only)."""
    toks = _WS.split(text.strip()) if text and text.strip() else []
    if not toks:
        return 0
    B = 1000003
    hs = []
    h = 0
    poww = pow(B, window - 1, mod)
    vals = [
        int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in toks
    ]
    for i, v in enumerate(vals):
        h = (h * B + v) % mod
        if i >= window:
            h = (h - vals[i - window] * poww * B) % mod
        if i >= window - 1:
            hs.append(h)
    if not hs:  # shorter than one window: hash the whole prefix
        hs.append(h)
    return min(hs)
