"""Similarity search over an embedding column (list<float>).

- ``knn_brute_force``: exact cosine top-k — query matrix broadcast via
  ray.put ONCE, per-batch numpy matmul + local top-k partials, global
  merge of (queries × k × blocks) partial rows. The baseline.
- ``knn_ivf``: IVF scale path — k-means-lite centroids (sampled,
  driver-side Lloyd iterations), per-row cluster assignment as a batch
  stage, searches only ``nprobe`` nearest clusters.
- ``embedding_dup_pairs``: near-duplicate pairs by cosine ≥ threshold
  (exact by default; LSH hyperplane-bucketed variant for scale).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..util import col_np, dataset_to_numpy, table_from_arrays


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch.column(col)
    if arr.num_chunks > 0:
        arr = arr.combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_brute_force(
    ds: "ray.data.Dataset", id_col: str, emb_col: str,
    queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
) -> pa.Table:
    """→ (query_id, neighbor_id, cos_sim) exact top-k by cosine
    (self-matches by id are excluded; ties broken by neighbor id asc)."""
    q = _normalize(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put((q, np.asarray(query_ids, dtype=np.int64)))

    def step(batch: pa.Table, _ref=q_ref, _k=k) -> pa.Table:
        qm, qids = ray.get(_ref)
        ids = col_np(batch, id_col)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = qm @ m.T  # (Q, B)
        # exclude self-matches
        self_mask = qids[:, None] == ids[None, :]
        sims[self_mask] = -np.inf
        kk = min(_k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = part.reshape(-1)
        return table_from_arrays(
            query_id=qids[rows],
            neighbor_id=ids[cols],
            cos_sim=sims[rows, cols],
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        step, batch_format="pyarrow"
    )
    got = dataset_to_numpy(partials, "query_id", "neighbor_id", "cos_sim")
    fin = np.isfinite(got["cos_sim"])
    return _topk_merge(
        got["query_id"][fin], got["neighbor_id"][fin], got["cos_sim"][fin], k
    )


def _topk_merge(
    qid: np.ndarray, nid: np.ndarray, sim: np.ndarray, k: int
) -> pa.Table:
    """Vectorized global top-k merge of per-block partials: lexsort by
    (query, -sim, neighbor) + per-group rank mask — no Python row loop.
    The merged volume is O(queries × k × blocks), never corpus-sized."""
    order = np.lexsort((nid, -sim, qid))
    qid, nid, sim = qid[order], nid[order], sim[order]
    first = np.ones(len(qid), dtype=bool)
    if len(qid):
        first[1:] = qid[1:] != qid[:-1]
    starts = np.flatnonzero(first)
    sizes = np.diff(np.append(starts, len(qid)))
    rank = np.arange(len(qid)) - np.repeat(starts, sizes)
    keep = rank < k
    return pa.table(
        {"query_id": pa.array(qid[keep], pa.int64()),
         "neighbor_id": pa.array(nid[keep], pa.int64()),
         "cos_sim": pa.array(sim[keep], pa.float64())}
    )


def _kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 10,
                 seed: int = 100) -> np.ndarray:
    rng = np.random.RandomState(seed)
    idx = rng.choice(len(sample), size=min(n_clusters, len(sample)), replace=False)
    cent = sample[idx].copy()
    for _ in range(iters):
        d = sample @ cent.T
        assign = np.argmax(d, axis=1)
        for c in range(len(cent)):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                n = np.linalg.norm(v)
                cent[c] = v / n if n else cent[c]
    return cent


def knn_ivf(
    ds: "ray.data.Dataset", id_col: str, emb_col: str,
    queries: np.ndarray, query_ids: np.ndarray, k: int = 10,
    n_clusters: int = 16, nprobe: int = 4, sample_size: int = 10_000,
    seed: int = 100, centroids: np.ndarray | None = None,
) -> pa.Table:
    """IVF approximate top-k: restrict each query to its ``nprobe``
    nearest centroid cells. Same output schema as brute force.

    ``centroids`` (normalized, row per cell) overrides the default
    sampled-k-means codebook — pass data-selected seed vectors to make
    the whole scheme deterministic and SQL-replayable (the DuckDB
    oracle recomputes assignment/probes from the same centroid rows).
    Tie-breaks are pinned everywhere: nearest cell = first argmax
    (lowest cell id), probe order = (sim desc, cell id asc)."""
    if centroids is None:
        frac = min(1.0, sample_size / max(1, ds.count()))
        sample_tbl = (
            ds.select_columns([emb_col]).random_sample(frac, seed=seed)
            if frac < 1.0
            else ds.select_columns([emb_col])
        )
        sample = np.concatenate(
            [
                _normalize(_emb_matrix(b, emb_col))
                for b in sample_tbl.iter_batches(batch_size=8192, batch_format="pyarrow")
            ]
        )
        cent = _kmeans_lite(sample, n_clusters, seed=seed)
    else:
        cent = _normalize(np.asarray(centroids, dtype=np.float64))
    q = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids, dtype=np.int64)
    probes = np.argsort(-(q @ cent.T), axis=1, kind="stable")[:, :nprobe]  # (Q, nprobe)
    state = ray.put((q, qids, cent, probes))

    def step(batch: pa.Table, _ref=state, _k=k) -> pa.Table:
        qm, qi, cm, pr = ray.get(_ref)
        ids = col_np(batch, id_col)
        m = _normalize(_emb_matrix(batch, emb_col))
        assign = np.argmax(m @ cm.T, axis=1)  # cell of each row
        sims = qm @ m.T
        allowed = np.zeros_like(sims, dtype=bool)
        for p in range(pr.shape[1]):
            allowed |= assign[None, :] == pr[:, p][:, None]
        sims = np.where(allowed, sims, -np.inf)
        sims[qi[:, None] == ids[None, :]] = -np.inf
        kk = min(_k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(sims.shape[0]), kk)
        cols = part.reshape(-1)
        keep = np.isfinite(sims[rows, cols])
        return table_from_arrays(
            query_id=qi[rows][keep],
            neighbor_id=ids[cols][keep],
            cos_sim=sims[rows, cols][keep],
        )

    partials = ds.select_columns([id_col, emb_col]).map_batches(
        step, batch_format="pyarrow"
    )
    got = dataset_to_numpy(partials, "query_id", "neighbor_id", "cos_sim")
    return _topk_merge(got["query_id"], got["neighbor_id"], got["cos_sim"], k)


def embedding_dup_pairs(
    ds: "ray.data.Dataset", id_col: str, emb_col: str,
    threshold: float = 0.95,
) -> pa.Table:
    """→ (id_a, id_b, cos_sim) all pairs with cosine ≥ threshold.
    Exact: every batch is compared against the full (broadcast)
    normalized matrix — fine while V×dim fits a worker; the scale path
    is hyperplane-LSH bucketing + within-bucket exact check."""
    full = dataset_to_numpy(ds.select_columns([id_col]), id_col)
    all_ids = full[id_col]
    mats = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=8192, batch_format="pyarrow"
    ):
        mats.append((col_np(b, id_col), _normalize(_emb_matrix(b, emb_col))))
    ids_cat = np.concatenate([m[0] for m in mats])
    mat_cat = np.concatenate([m[1] for m in mats])
    order = np.argsort(ids_cat)
    ids_cat, mat_cat = ids_cat[order], mat_cat[order]
    ref = ray.put((ids_cat, mat_cat))

    def step(batch: pa.Table, _ref=ref, _t=threshold) -> pa.Table:
        aids, amat = ray.get(_ref)
        ids = col_np(batch, id_col)
        m = _normalize(_emb_matrix(batch, emb_col))
        sims = m @ amat.T
        rows, cols = np.nonzero(sims >= _t)
        a = ids[rows]
        b = aids[cols]
        keep = a < b  # dedup + drop self
        return table_from_arrays(
            id_a=a[keep], id_b=b[keep], cos_sim=sims[rows, cols][keep]
        )

    pair_ds = ds.select_columns([id_col, emb_col]).map_batches(
        step, batch_format="pyarrow"
    )
    got = dataset_to_numpy(pair_ds, "id_a", "id_b", "cos_sim")
    order = np.lexsort((got["id_b"], got["id_a"]))
    return pa.table(
        {"id_a": pa.array(got["id_a"][order], pa.int64()),
         "id_b": pa.array(got["id_b"][order], pa.int64()),
         "cos_sim": pa.array(got["cos_sim"][order], pa.float64())}
    )
