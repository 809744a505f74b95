"""Similarity search: brute-force exactness vs numpy oracle, IVF recall,
near-dup pairs."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.ann.knn import embedding_dup_pairs, knn_brute_force, knn_ivf


def emb_table(n=400, dim=16, seed=100, n_clusters=5):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3
    labels = rng.randint(0, n_clusters, n)
    X = centers[labels] + rng.randn(n, dim) * 0.5
    # plant two exact-duplicate vectors and one near-dup
    X[7] = X[3]
    X[11] = X[5] + 1e-4
    return (
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(
                    [r.astype(np.float32).tolist() for r in X],
                    type=pa.list_(pa.float32()),
                ),
            }
        ),
        X.astype(np.float64),
    )


def oracle_topk(X, qidx, k):
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    out = {}
    for qi in qidx:
        sims = Xn @ Xn[qi]
        sims[qi] = -np.inf
        order = np.lexsort((np.arange(len(X)), -sims))[:k]
        out[qi] = [(int(j), float(sims[j])) for j in order]
    return out


def test_brute_force_matches_oracle():
    tbl, X = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(4)
    qidx = [0, 3, 7, 42]
    res = knn_brute_force(
        ds, "vec_id", "embedding",
        X[qidx].astype(np.float32),  # stored precision in, like real use
        np.array(qidx), k=5,
    )
    # reconstruct float32-read oracle: engine reads float32 col → float64
    X32 = X.astype(np.float32).astype(np.float64)
    oracle = oracle_topk(X32, qidx, 5)
    by_q = {}
    for q, n, s in zip(
        res["query_id"].to_pylist(), res["neighbor_id"].to_pylist(),
        res["cos_sim"].to_pylist(),
    ):
        by_q.setdefault(q, []).append((n, s))
    for qi in qidx:
        got = by_q[qi]
        want = oracle[qi]
        assert [g[0] for g in got] == [w[0] for w in want]
        for (gn, gs), (wn, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
    # exact duplicate: 7 is a copy of 3 → top neighbor sim ≈ 1
    assert by_q[3][0][0] == 7 and by_q[3][0][1] == pytest.approx(1.0, abs=1e-9)


def test_ivf_recall():
    tbl, X = emb_table(n=600)
    ds = ray.data.from_arrow(tbl).repartition(4)
    qidx = list(range(10))
    X32 = X.astype(np.float32)
    exact = knn_brute_force(ds, "vec_id", "embedding", X32[qidx], np.array(qidx), k=10)
    approx = knn_ivf(
        ds, "vec_id", "embedding", X32[qidx], np.array(qidx),
        k=10, n_clusters=8, nprobe=4,
    )
    def sets(t):
        out = {}
        for q, n in zip(t["query_id"].to_pylist(), t["neighbor_id"].to_pylist()):
            out.setdefault(q, set()).add(n)
        return out
    es, as_ = sets(exact), sets(approx)
    recalls = [len(es[q] & as_.get(q, set())) / len(es[q]) for q in es]
    assert np.mean(recalls) >= 0.8, recalls


def test_embedding_dup_pairs():
    tbl, X = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(3)
    pairs = embedding_dup_pairs(
        ds, "vec_id", "embedding", threshold=0.9999, block_size=64
    ).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert (3, 7) in found   # planted exact duplicate
    assert (5, 11) in found  # planted near duplicate
    # ordering canonical and no self-pairs
    for a, b in found:
        assert a < b


def test_embedding_dup_pairs_block_count_invariance():
    """Block-nested-loop partitioning must not change the result."""
    tbl, X = emb_table(n=200)
    ds = ray.data.from_arrow(tbl).repartition(3)
    a = embedding_dup_pairs(
        ds, "vec_id", "embedding", threshold=0.9, block_size=32
    ).to_pandas()
    b = embedding_dup_pairs(
        ds, "vec_id", "embedding", threshold=0.9, block_size=1000
    ).to_pandas()
    assert list(zip(a["id_a"], a["id_b"])) == list(zip(b["id_a"], b["id_b"]))
    assert np.allclose(a["cos_sim"], b["cos_sim"], atol=1e-12)


def test_embedding_dup_pairs_lsh_subset_of_exact():
    """LSH pairs = exact pairs ∩ bucket collisions: every emitted pair
    must appear in the exact all-pairs output with the same cosine, and
    planted duplicates (cos ≈ 1) must survive bucketing (identical
    vectors share every bucket)."""
    from imtag_ray.ann.knn import embedding_dup_pairs_lsh

    tbl, X = emb_table()
    ds = ray.data.from_arrow(tbl).repartition(3)
    exact = embedding_dup_pairs(
        ds, "vec_id", "embedding", threshold=0.95, block_size=64
    ).to_pandas()
    lsh = embedding_dup_pairs_lsh(
        ds, "vec_id", "embedding", dim=16, threshold=0.95
    ).to_pandas()
    exact_pairs = set(zip(exact["id_a"], exact["id_b"]))
    lsh_pairs = set(zip(lsh["id_a"], lsh["id_b"]))
    assert lsh_pairs <= exact_pairs
    assert (3, 7) in lsh_pairs   # identical vectors always collide
    assert (5, 11) in lsh_pairs  # near-identical: sign flips need a
    # hyperplane within 1e-4 of the vector — none at seed 100


def test_ivf_indexed_matches_masked_ivf():
    """Routed IVF (cell-partitioned index + filter pushdown) must return
    EXACTLY what the scan-and-mask knn_ivf returns given the same
    centroids/probes."""
    from imtag_ray.ann.knn import build_ivf_index, knn_ivf_indexed

    tbl, X = emb_table(n=500)
    ds = ray.data.from_arrow(tbl).repartition(4)
    X32 = X.astype(np.float32)
    qidx = list(range(8))
    # deterministic seed-vector centroids (the oracle-able codebook)
    cent = X32[:12].astype(np.float64)
    a = knn_ivf(
        ds, "vec_id", "embedding", X32[qidx], np.array(qidx),
        k=6, n_clusters=12, nprobe=3, centroids=cent,
    )
    index = build_ivf_index(ds, "vec_id", "embedding", cent)
    b = knn_ivf_indexed(
        index, "vec_id", "embedding", X32[qidx], np.array(qidx), cent,
        k=6, nprobe=3,
    )
    pa_ = a.to_pandas().sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    pb_ = b.to_pandas().sort_values(["query_id", "neighbor_id"]).reset_index(drop=True)
    assert pa_["query_id"].tolist() == pb_["query_id"].tolist()
    assert pa_["neighbor_id"].tolist() == pb_["neighbor_id"].tolist()
    assert np.allclose(pa_["cos_sim"], pb_["cos_sim"], atol=1e-12)
