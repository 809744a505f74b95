"""N-gram Jaccard similarity dedup (exact, within-group all-pairs).

For bounded groups (e.g. per-source buckets) computes exact character
n-gram Jaccard for every pair and keeps pairs ≥ threshold. The group
key bounds the quadratic blow-up — the caller picks a partition key
that co-locates plausible duplicates (same source/host/length bucket),
which is the standard blocking strategy at scale.

The per-group kernel is vectorized (VERDICT r2 #5) with a cost-based
strategy pick instead of a Python set-intersection loop over all
C(G,2) pairs:

- **exploded** (sparse sharing): grams become (gram_id, doc) rows and
  every gram's doc-run emits its co-occurring doc pairs with numpy
  repeat/arange arithmetic; a sparse sum-reduce yields per-pair
  intersection counts. Work is O(Σ_gram C(m_gram, 2)) — the
  output-sensitive bound, ideal for large vocabularies where each
  gram is shared by few docs (real web text).
- **dense** (heavy sharing): when Σ C(m_gram, 2) would exceed ~G²
  (e.g. small alphabets where every gram appears in most docs), the
  intersection matrix is computed as a chunked A·Aᵀ over the
  doc×gram 0/1 incidence — BLAS throughput, exact integer counts
  (chunk width 4096 < 2²⁴ keeps float32 sums exact), O(G²) memory.

Both give |A|+|B|-inter → exact Jaccard; a differential pytest pins
them to the scalar set oracle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..util import sparse_sum_reduce


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


def _empty_pairs() -> pa.Table:
    return pa.table(
        {"id_a": pa.array([], pa.int64()),
         "id_b": pa.array([], pa.int64()),
         "jaccard": pa.array([], pa.float64())}
    )


def _cooccurrence_pairs(docs: np.ndarray, gid: np.ndarray):
    """(gram_id, doc) rows → (a, b, count) positional doc pairs that share
    ≥1 gram, with a < b and count = #shared grams. Fully vectorized:
    within each gram's doc-run (docs sorted ascending), the element at
    run position p pairs as the larger side with the p earlier elements."""
    order = np.lexsort((docs, gid))
    gs, dcs = gid[order], docs[order]
    starts = np.flatnonzero(np.r_[True, gs[1:] != gs[:-1]])
    lens = np.diff(np.r_[starts, len(gs)])
    run_start = np.repeat(starts, lens)
    sec_counts = np.arange(len(gs)) - run_start  # position within run
    T = int(sec_counts.sum())
    if T == 0:
        return (np.empty(0, np.int64),) * 3
    sec = np.repeat(np.arange(len(gs)), sec_counts)
    cum = np.concatenate([[0], np.cumsum(sec_counts)[:-1]])
    off = np.arange(T) - np.repeat(cum, sec_counts)
    fir = np.repeat(run_start, sec_counts) + off
    a, b = dcs[fir], dcs[sec]  # a < b: docs ascend within a run
    G = int(docs.max()) + 1
    key, inter = sparse_sum_reduce(a * G + b, np.ones(T, np.int64))
    return key // G, key % G, inter


def _cooccurrence_dense(docs: np.ndarray, gid: np.ndarray, G: int,
                        chunk: int = 4096):
    """Full upper-triangle (a, b, inter) via chunked A·Aᵀ on the
    doc×gram incidence. Exact: per-chunk float32 sums are integers
    < 2²⁴, accumulated in int64."""
    vocab = int(gid.max()) + 1
    o = np.argsort(gid, kind="stable")
    gid_s, doc_s = gid[o], docs[o]
    inter_mat = np.zeros((G, G), dtype=np.int64)
    bounds = list(range(0, vocab, chunk)) + [vocab]
    cuts = np.searchsorted(gid_s, bounds)
    for i in range(len(bounds) - 1):
        s, e = cuts[i], cuts[i + 1]
        if s == e:
            continue
        lo = bounds[i]
        A = np.zeros((G, bounds[i + 1] - lo), dtype=np.float32)
        A[doc_s[s:e], gid_s[s:e] - lo] = 1.0
        inter_mat += (A @ A.T).astype(np.int64)
    fa, fb = np.triu_indices(G, 1)
    return fa.astype(np.int64), fb.astype(np.int64), inter_mat[fa, fb]


def ngram_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, text_col: str, group_col: str,
    threshold: float = 0.6, n: int = 3,
) -> "ray.data.Dataset":
    """→ Dataset (id_a, id_b, jaccard) for within-group pairs ≥
    threshold, sorted by (id_a, id_b) — distributed end-to-end.
    Exactly mirrored by the DuckDB list_intersect oracle
    (__ray_entry__.oracle_sql['ngram_pairs'])."""

    def pairs(group: pa.Table) -> pa.Table:
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(ids)
        ids = ids[order]
        G = len(ids)
        if G < 2:
            return _empty_pairs()
        texts = group.column(text_col).to_pylist()
        sizes = np.empty(G, dtype=np.int64)
        gram_strs: list = []
        gram_docs: list = []
        for pos in range(G):
            g = char_ngrams(texts[order[pos]] or "", n)
            sizes[pos] = len(g)
            if g:
                gram_strs.extend(g)
                gram_docs.append(np.full(len(g), pos, dtype=np.int64))

        out_a: list = []
        out_b: list = []
        out_j: list = []
        if gram_strs:
            docs = np.concatenate(gram_docs)
            gid = np.unique(np.asarray(gram_strs, dtype=object),
                            return_inverse=True)[1]
            cnts = np.bincount(gid).astype(np.int64)
            emit_volume = int((cnts * (cnts - 1) // 2).sum())
            dense = emit_volume > max(4 * G * G, 1 << 20)
            if dense:
                pa_i, pb_i, inter = _cooccurrence_dense(docs, gid, G)
            else:
                pa_i, pb_i, inter = _cooccurrence_pairs(docs, gid)
            if threshold > 0:
                if dense:  # full triangle came back: drop no-overlap pairs
                    nz = inter > 0
                    pa_i, pb_i, inter = pa_i[nz], pb_i[nz], inter[nz]
                union = sizes[pa_i] + sizes[pb_i] - inter
                jac = inter / np.maximum(union, 1)
                keep = jac >= threshold
                out_a.append(ids[pa_i[keep]])
                out_b.append(ids[pb_i[keep]])
                out_j.append(jac[keep])
            elif dense:
                # full triangle with exact counts already in hand
                union = sizes[pa_i] + sizes[pb_i] - inter
                both_empty = (sizes[pa_i] == 0) & (sizes[pb_i] == 0)
                jac = np.where(both_empty, 1.0, inter / np.maximum(union, 1))
                out_a.append(ids[pa_i])
                out_b.append(ids[pb_i])
                out_j.append(jac)
            else:
                # threshold ≤ 0: ALL pairs qualify, including those that
                # share no gram (jac 0) — materialize the full triangle
                fa, fb = np.triu_indices(G, 1)
                Gk = np.int64(G)
                inter_full = np.zeros(len(fa), dtype=np.int64)
                have = pa_i * Gk + pb_i  # sparse_sum_reduce keys: sorted
                pos = np.searchsorted(have, fa * Gk + fb)
                pos_c = np.minimum(pos, max(len(have) - 1, 0))
                hit = (len(have) > 0) & (have[pos_c] == fa * Gk + fb)
                inter_full[hit] = inter[pos_c[hit]]
                union = sizes[fa] + sizes[fb] - inter_full
                both_empty = (sizes[fa] == 0) & (sizes[fb] == 0)
                jac = np.where(
                    both_empty, 1.0, inter_full / np.maximum(union, 1)
                )
                out_a.append(ids[fa])
                out_b.append(ids[fb])
                out_j.append(jac)
        elif threshold <= 0:
            fa, fb = np.triu_indices(G, 1)
            out_a.append(ids[fa])
            out_b.append(ids[fb])
            out_j.append(np.ones(len(fa)))

        if threshold > 0:
            # pairs of gram-less docs have Jaccard 1.0 by convention
            empt = np.flatnonzero(sizes == 0)
            if len(empt) >= 2 and threshold <= 1.0:
                ea, eb = np.triu_indices(len(empt), 1)
                out_a.append(ids[empt[ea]])
                out_b.append(ids[empt[eb]])
                out_j.append(np.ones(len(ea)))

        if not out_a:
            return _empty_pairs()
        return pa.table(
            {"id_a": pa.array(np.concatenate(out_a), pa.int64()),
             "id_b": pa.array(np.concatenate(out_b), pa.int64()),
             "jaccard": pa.array(
                 np.concatenate(out_j).astype(np.float64), pa.float64()
             )}
        )

    out = (
        ds.select_columns([id_col, text_col, group_col])
        .groupby(group_col)
        .map_groups(pairs, batch_format="pyarrow")
        .materialize()
    )
    if out.count() == 0:
        # typed pa.Table: Ray's to_pandas() drops columns on zero rows
        return _empty_pairs()
    return out.sort(["id_a", "id_b"])
