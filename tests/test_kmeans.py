"""k-means kernel semantics (the sf-table query is oracle-compared in
test_entry; these pin the kernel-level contracts)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.pipelines.kmeans import kmeans_assignments, kmeans_sizes


def _ds(vecs: np.ndarray) -> "ray.data.Dataset":
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(vecs), dtype=np.int64)),
            "embedding": pa.array(
                [list(map(float, v)) for v in vecs], pa.list_(pa.float32())
            ),
        }
    )
    return ray.data.from_arrow(t)


def test_two_blobs_perfect_separation():
    rng = np.random.RandomState(7)
    a = rng.randn(40, 4) * 0.05 + np.array([10, 0, 0, 0])
    b = rng.randn(40, 4) * 0.05 + np.array([-10, 0, 0, 0])
    vecs = np.concatenate([a, b])
    out = (
        kmeans_assignments(_ds(vecs), "vec_id", "embedding", k=2,
                           assign_rounds=3, init_ids=np.array([0, 40]))
        .to_pandas().sort_values("vec_id")
    )
    cl = out["cluster"].to_numpy()
    assert (cl[:40] == 0).all() and (cl[40:] == 1).all()


def test_empty_cluster_keeps_centroid():
    # init centroid 1 is strictly farther from every point than
    # centroid 0 after round 1, so cluster 1 empties and must keep its
    # seed centroid (no NaNs, stable assignment in round 2)
    vecs = np.array([[0.0, 0.0], [0.1, 0.0], [0.2, 0.0], [100.0, 100.0]])
    ds = _ds(vecs[:3])  # only near-origin points; init ids 0 and 1
    out = (
        kmeans_assignments(ds, "vec_id", "embedding", k=2,
                           assign_rounds=2, init_ids=np.array([0, 2]))
        .to_pandas().sort_values("vec_id")
    )
    assert set(out["cluster"]) <= {0, 1}
    assert len(out) == 3


def test_sizes_match_assignments():
    rng = np.random.RandomState(3)
    vecs = rng.randn(60, 8)
    asg = (
        kmeans_assignments(_ds(vecs), "vec_id", "embedding", k=4,
                           assign_rounds=2)
        .to_pandas()["cluster"].value_counts().sort_index()
    )
    sizes = kmeans_sizes(_ds(vecs), "vec_id", "embedding", k=4,
                         assign_rounds=2).to_pandas()
    got = dict(zip(sizes["cluster"], sizes["n_points"]))
    assert got == {int(k): int(v) for k, v in asg.items()}


def test_missing_init_ids_clamp_or_raise():
    """Round 5: init ids that don't exist are dropped (k_eff = found
    count) so k-parameter ops survive corpora smaller than k; only an
    ENTIRELY absent init set still raises."""
    vecs = np.zeros((3, 2))
    out = kmeans_assignments(
        _ds(vecs), "vec_id", "embedding", k=2,
        assign_rounds=1, init_ids=np.array([0, 99]),
    ).to_pandas()
    # one surviving centroid → every vector lands in cluster 0
    assert set(out["cluster"]) == {0}
    with pytest.raises(ValueError, match="init ids not found"):
        kmeans_assignments(_ds(vecs), "vec_id", "embedding", k=2,
                           assign_rounds=1, init_ids=np.array([98, 99]))
