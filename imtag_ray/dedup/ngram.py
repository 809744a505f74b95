"""N-gram Jaccard similarity dedup (exact, within-group all-pairs).

For bounded groups (e.g. per-source buckets) computes exact character
n-gram Jaccard for every pair and keeps pairs ≥ threshold. The group
key bounds the quadratic blow-up — the caller picks a partition key
that co-locates plausible duplicates (same source/host/length bucket),
which is the standard blocking strategy at scale.
"""

from __future__ import annotations

import itertools

import numpy as np
import pyarrow as pa
import ray.data


def char_ngrams(text: str, n: int = 3) -> set:
    t = " ".join((text or "").split())
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = char_ngrams(a, n), char_ngrams(b, n)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa) + len(sb) - inter
    return inter / union if union else 1.0


def ngram_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str, group_col: str,
    threshold: float = 0.6, n: int = 3,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, jaccard) for within-group pairs ≥
    threshold, sorted by (id_a, id_b) — distributed end-to-end.
    Exactly mirrored by the DuckDB list_intersect oracle
    (__ray_entry__.oracle_sql['ngram_pairs'])."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        texts = group.column(text_col).to_pylist()
        grams = [char_ngrams(t or "", n) for t in texts]
        order = np.argsort(ids)
        out_a, out_b, out_j = [], [], []
        for i, j in itertools.combinations(order, 2):
            sa, sb = grams[i], grams[j]
            if not sa and not sb:
                jac = 1.0
            else:
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                jac = inter / union if union else 1.0
            if jac >= threshold:
                a, b = ids[i], ids[j]
                if a > b:
                    a, b = b, a
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
        return pa.table(
            {"id_a": pa.array(out_a, pa.int64()),
             "id_b": pa.array(out_b, pa.int64()),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    out = (
        ds.select_columns([id_col, text_col, group_col])
        .groupby(group_col)
        .map_groups(pairs, batch_format="pyarrow")
        .materialize()
    )
    if out.count() == 0:
        # typed pa.Table: Ray's to_pandas() drops columns on zero rows
        return pa.table(
            {"id_a": pa.array([], pa.int64()),
             "id_b": pa.array([], pa.int64()),
             "jaccard": pa.array([], pa.float64())}
        )
    return out.sort(["id_a", "id_b"])
