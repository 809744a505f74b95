"""Round-5 scale-route equality: the embedding-corpus ops' forced
IVF (no-driver-matrix) paths must reproduce the broadcast results on
the fixture (VERDICT r4 #1 — gate + Dataset-native large path), and
the approximate setting must behave like IVF (high recall, never
superset-of-k)."""

import numpy as np
import pyarrow as pa
import pytest

from imtag_ray.pipelines import dataops as d

SF = "/root/testdata/sf0.001"


def _tbl(x) -> pa.Table:
    if isinstance(x, pa.Table):
        return x
    return pa.concat_tables(
        [t for t in x.iter_batches(batch_format="pyarrow")],
        promote_options="default",
    )


def _assert_frames_equal(a: pa.Table, b: pa.Table):
    assert a.num_rows == b.num_rows
    b = b.select(a.column_names).cast(a.schema)
    assert a.equals(b), "frames differ"


def test_knn_graph_ivf_exact_when_all_cells_probed():
    b = _tbl(d.embed_knn_graph_q(SF, mode="broadcast"))
    iv = _tbl(d.embed_knn_graph_q(SF, mode="ivf", n_cells=8, nprobe=8))
    _assert_frames_equal(b, iv)


def test_outlier3_ivf_exact_when_all_cells_probed():
    b = _tbl(d.embed_outlier3_q(SF, mode="broadcast"))
    iv = _tbl(d.embed_outlier3_q(SF, mode="ivf", n_cells=8, nprobe=8))
    _assert_frames_equal(b, iv)


def test_hard_negatives_ivf_exact_when_all_cells_probed():
    b = _tbl(d.embed_hard_negatives_q(SF, mode="broadcast"))
    iv = _tbl(d.embed_hard_negatives_q(SF, mode="ivf", n_cells=8, nprobe=8))
    _assert_frames_equal(b, iv)


def test_knn_graph_ivf_approx_recall():
    """nprobe < n_cells: per-query neighbor sets keep ≤ k rows and
    recall vs exact stays high on the well-clustered fixture."""
    exact = _tbl(d.embed_knn_graph_q(SF, mode="broadcast"))
    approx = _tbl(d.embed_knn_graph_q(SF, mode="ivf", n_cells=8, nprobe=3))
    ex = set(zip(exact["query_id"].to_pylist(),
                 exact["neighbor_id"].to_pylist()))
    ap = set(zip(approx["query_id"].to_pylist(),
                 approx["neighbor_id"].to_pylist()))
    # per query at most k rows
    q, c = np.unique(approx["query_id"].to_numpy(), return_counts=True)
    assert c.max() <= 3
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5, recall


def test_gate_defaults_to_broadcast_on_fixture():
    """Auto mode on the bounded fixture picks the exact broadcast
    path (a pa.Table, not a Dataset)."""
    out = d.embed_knn_graph_q(SF)
    assert isinstance(out, pa.Table)
