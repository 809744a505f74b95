"""Fuzzy dedup via exact edit distance on blocked candidate pairs.

The classic fuzzy-dedup shape: a cheap blocking key bounds the
quadratic (same `source` here, the same blocking discipline as
dedup.ngram), a length pre-filter prunes most pairs, and the surviving
pairs get an EXACT unit-cost Levenshtein distance — computed by a DP
that is vectorized ACROSS the whole pair batch (one (P, L) uint8
matrix per side; the i/j loops are over the ≤prefix-length grid, every
step an O(P) numpy op), never per-pair Python.

Distances are byte-level; the corpus is ASCII (validated), so this is
exactly DuckDB's character-level levenshtein() and the query has a
full SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..util import col_np


def _encode_prefix(texts, prefix: int):
    """List of strings → (P, prefix) uint8 matrix + lengths."""
    n = len(texts)
    out = np.zeros((n, prefix), dtype=np.uint8)
    lens = np.zeros(n, dtype=np.int64)
    for i, t in enumerate(texts):
        b = (t or "").encode("utf-8")[:prefix]
        lens[i] = len(b)
        out[i, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    return out, lens


def batched_levenshtein(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray
) -> np.ndarray:
    """Exact unit-cost edit distance for P string pairs at once.
    A, B: (P, L) uint8 padded; la, lb: true lengths. The DP advances
    row-by-row over the padded grid; each pair's answer is captured
    from the row matching its own length (padding never contaminates
    the result)."""
    P, L = A.shape
    res = np.empty(P, dtype=np.int64)
    prev = np.tile(np.arange(L + 1, dtype=np.int64), (P, 1))
    done0 = la == 0
    res[done0] = lb[done0]
    for i in range(1, L + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        cost = (A[:, i - 1][:, None] != B).astype(np.int64)  # (P, L)
        # j loop is sequential (cur[:, j-1] dependency), vectorized in P
        for j in range(1, L + 1):
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1),
                prev[:, j - 1] + cost[:, j - 1],
            )
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def levenshtein_pairs(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    block_col: str,
    prefix: int = 64,
    max_len_diff: int = 8,
    max_dist: int = 16,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, lev) for same-block pairs whose text
    prefixes are within ``max_dist`` edits (length pre-filter
    ``max_len_diff``), sorted by (id_a, id_b)."""

    def block_pairs(g: pa.Table) -> pa.Table:
        ids = col_np(g, id_col).astype(np.int64)
        texts = g.column(text_col).to_pylist()
        order = np.argsort(ids)
        ids = ids[order]
        M, lens = _encode_prefix([texts[i] for i in order], prefix)
        n = len(ids)
        if n < 2:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "lev": pa.array([], pa.int64())}
            )
        ia, ib = np.triu_indices(n, 1)
        keep = np.abs(lens[ia] - lens[ib]) <= max_len_diff
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return pa.table(
                {"id_a": pa.array([], pa.int64()),
                 "id_b": pa.array([], pa.int64()),
                 "lev": pa.array([], pa.int64())}
            )
        d = batched_levenshtein(M[ia], lens[ia], M[ib], lens[ib])
        ok = d <= max_dist
        return pa.table(
            {"id_a": pa.array(ids[ia][ok], pa.int64()),
             "id_b": pa.array(ids[ib][ok], pa.int64()),
             "lev": pa.array(d[ok], pa.int64())}
        )

    return (
        ds.select_columns([id_col, text_col, block_col])
        .groupby(block_col)
        .map_groups(block_pairs, batch_format="pyarrow")
        .sort(["id_a", "id_b"])
    )
