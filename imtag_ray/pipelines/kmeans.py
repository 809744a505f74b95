"""Distributed Lloyd's k-means over an embedding column.

The canonical scalable shape (same partial-aggregation discipline as
the reference's closed-form per-run statistics,
include/imtag_statistics.hpp:68-86, re-expressed over vectors):

- centroids are a k×d matrix — CONSTANT-size state, broadcast once per
  round via ``ray.put`` and read inside every map task (never re-shipped
  per batch, never a shuffle);
- assignment is a per-batch float64 matmul (‖x‖² − 2x·C + ‖C‖², argmin
  with lowest-cluster tie-break);
- the update is a per-batch partial (sum-vector, count) per cluster —
  each batch emits ≤ k rows of d floats, so the reduce handles
  k·num_blocks rows regardless of N. Like the HLL/CMS sketches the
  combined state is O(k·d), driver-resident by design.

Empty clusters keep their previous centroid (matches the SQL oracle's
coalesce on the re-averaged centroid table).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..ann.knn import _emb_matrix
from ..util import col_np, table_from_arrays


def _assign(mat: np.ndarray, cent: np.ndarray) -> np.ndarray:
    """Argmin_c ‖x−c‖² per row; ties → lowest cluster id (np.argmin)."""
    d2 = (
        (mat * mat).sum(axis=1, keepdims=True)
        - 2.0 * (mat @ cent.T)
        + (cent * cent).sum(axis=1)
    )
    return np.argmin(d2, axis=1)


def _init_centroids(
    ds: "ray.data.Dataset", id_col: str, vec_col: str, init_ids: np.ndarray
) -> np.ndarray:
    """Gather the k init vectors (a filter + tiny take — the only rows
    that ever leave the Dataset)."""
    idset = set(int(i) for i in init_ids)

    def pick(t: pa.Table, _ids=idset) -> pa.Table:
        mask = np.isin(col_np(t, id_col), list(_ids))
        return t.filter(pa.array(mask))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    got = {int(r[id_col]): np.asarray(r[vec_col], dtype=np.float64) for r in rows}
    found = [int(i) for i in init_ids if int(i) in got]
    if not found:
        raise ValueError(
            f"k-means init ids not found: {sorted(idset)}"
        )
    # a corpus smaller than k clamps to the init vectors that exist
    # (k_eff = len(found)); full-size corpora are unaffected
    return np.stack([got[i] for i in found])


def kmeans_centroids(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    k: int = 8,
    update_rounds: int = 1,
    init_ids: "np.ndarray | None" = None,
) -> np.ndarray:
    """→ k×d centroid matrix after ``update_rounds`` Lloyd updates from
    the init vectors (the trajectory kmeans_assignments assigns
    against; exposed separately so codebook consumers — PQ / ADC — can
    broadcast the trained centroids)."""
    if init_ids is None:
        init_ids = np.arange(k, dtype=np.int64)
    cent = _init_centroids(ds, id_col, vec_col, np.asarray(init_ids))
    k = len(cent)

    for _ in range(update_rounds):
        cref = ray.put(cent)

        def partial(t: pa.Table, _c=cref, _k=k) -> pa.Table:
            c = ray.get(_c)
            mat = _emb_matrix(t, vec_col)
            a = _assign(mat, c)
            sums = np.zeros((_k, mat.shape[1]))
            np.add.at(sums, a, mat)
            counts = np.bincount(a, minlength=_k).astype(np.int64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(_k, dtype=np.int64)),
                    "vsum": pa.array(list(sums), pa.list_(pa.float64())),
                    "n": pa.array(counts),
                }
            )

        # k·num_blocks rows of constant size — the sketch-reduce shape
        parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[int(r["cluster"])] += np.asarray(r["vsum"])
            counts[int(r["cluster"])] += int(r["n"])
        nz = counts > 0
        cent = cent.copy()
        cent[nz] = sums[nz] / counts[nz, None]
    return cent


def kmeans_assignments(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    k: int = 8,
    assign_rounds: int = 2,
    init_ids: "np.ndarray | None" = None,
) -> "ray.data.Dataset":
    """→ Dataset (id_col, cluster): cluster of every vector after
    ``assign_rounds`` assignment phases with ``assign_rounds − 1``
    centroid updates between them (classic Lloyd, fixed rounds so the
    unrolled SQL oracle replays the exact trajectory)."""
    cent = kmeans_centroids(
        ds, id_col, vec_col, k=k, update_rounds=assign_rounds - 1,
        init_ids=init_ids,
    )
    cref = ray.put(cent)

    def assign_batch(t: pa.Table, _c=cref) -> pa.Table:
        c = ray.get(_c)
        mat = _emb_matrix(t, vec_col)
        return pa.table(
            {
                id_col: t.column(id_col),
                "cluster": pa.array(_assign(mat, c).astype(np.int64)),
            }
        )

    return ds.map_batches(assign_batch, batch_format="pyarrow")


def kmeans_sizes(
    ds: "ray.data.Dataset",
    id_col: str,
    vec_col: str,
    k: int = 8,
    assign_rounds: int = 2,
) -> "ray.data.Dataset":
    """→ Dataset (cluster, n_points): cluster cardinalities of the final
    assignment (k groups — Ray's groupby is fine at this cardinality)."""
    from ray.data.aggregate import Count

    return (
        kmeans_assignments(ds, id_col, vec_col, k, assign_rounds)
        .groupby("cluster")
        .aggregate(Count(alias_name="n_points"))
        .sort("cluster")
    )
