"""Scale-path finalizations with the driver path forced OFF
(broadcast_max_vertices=0): shuffle-mode CC and PageRank must run
end-to-end with no V-sized driver state and match broadcast mode
exactly (VERDICT r2 item 2)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.cc import (
    canonical_relabel,
    canonical_relabel_ds,
    connected_components,
)
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.sources.synth import named_graph_edges
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy


def nodriver_cfg(**kw):
    return EngineConfig(
        num_partitions=4, broadcast_max_vertices=0, vertex_state="shuffle", **kw
    )


def _labels_ds(raw: np.ndarray, nblocks: int) -> ray.data.Dataset:
    tbl = pa.table(
        {
            "vid": pa.array(np.arange(len(raw), dtype=np.int64)),
            "label": pa.array(raw.astype(np.int64)),
        }
    )
    return ray.data.from_arrow(tbl).repartition(nblocks)


@pytest.mark.parametrize(
    "raw",
    [
        np.array([5, 5, 5, 0, 9, 9, 0, 3]),  # small mixed
        np.zeros(2000, dtype=np.int64),  # one giant component (max skew)
        np.repeat([2, 7, 11], [900, 5, 900]),  # runs spanning many blocks
        np.arange(503),  # all singletons
    ],
)
def test_canonical_relabel_ds_matches_numpy(raw):
    expect = canonical_relabel(raw)
    out = canonical_relabel_ds(_labels_ds(raw, 7))
    res = dataset_to_numpy(out, "vid", "component_id")
    got = np.empty(len(raw), dtype=np.int64)
    got[res["vid"]] = res["component_id"]
    np.testing.assert_array_equal(got, expect)


@pytest.mark.parametrize("name", ["barbell", "two_cliques", "star"])
def test_cc_nodriver_matches_broadcast(name):
    g = build_graph(ray.data.from_arrow(named_graph_edges(name)))
    bc = connected_components(g, EngineConfig(num_partitions=4), mode="broadcast")
    nd = connected_components(g, nodriver_cfg(), mode="shuffle")
    a = dataset_to_numpy(bc, "vid", "component_id")
    b = dataset_to_numpy(nd, "vid", "component_id")
    va = dict(zip(a["vid"], a["component_id"]))
    vb = dict(zip(b["vid"], b["component_id"]))
    assert va == vb


def test_pagerank_nodriver_matches_broadcast():
    tbl = named_graph_edges("barbell")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg_b = EngineConfig(num_partitions=4, pagerank_tol=0, max_iterations=10)
    bc = pagerank(g, cfg_b, mode="broadcast")
    nd = pagerank(g, nodriver_cfg(pagerank_tol=0, max_iterations=10), mode="shuffle")
    a = dataset_to_numpy(bc, "vid", "rank")
    b = dataset_to_numpy(nd, "vid", "rank")
    ra = dict(zip(a["vid"], a["rank"]))
    rb = dict(zip(b["vid"], b["rank"]))
    assert set(ra) == set(rb)
    for v in ra:
        assert rb[v] == pytest.approx(ra[v], abs=1e-12)


def test_pagerank_nodriver_dangling_star():
    # star has a dangling hub: exercises the Dataset-native outdeg init's
    # zero rows surviving the union+groupby
    tbl = named_graph_edges("star")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg_b = EngineConfig(num_partitions=4, pagerank_tol=0, max_iterations=8)
    bc = pagerank(g, cfg_b, mode="broadcast")
    nd = pagerank(g, nodriver_cfg(pagerank_tol=0, max_iterations=8), mode="shuffle")
    a = dataset_to_numpy(bc, "vid", "rank")
    b = dataset_to_numpy(nd, "vid", "rank")
    ra = dict(zip(a["vid"], a["rank"]))
    rb = dict(zip(b["vid"], b["rank"]))
    for v in ra:
        assert rb[v] == pytest.approx(ra[v], abs=1e-12)


# --- round-4 session ops: forced no-driver paths ---------------------------


def test_katz_nodriver_matches_broadcast():
    from imtag_ray.pipelines.traversal import katz_centrality

    g = build_graph(ray.data.from_arrow(named_graph_edges("gnp")))
    bc = katz_centrality(
        g, EngineConfig(num_partitions=4), iterations=6, mode="broadcast"
    ).to_pandas()
    sh = katz_centrality(g, nodriver_cfg(), iterations=6).to_pandas()
    assert dict(zip(bc["url"], bc["score"])) == dict(
        zip(sh["url"], sh["score"])
    )  # dyadic α ⇒ bit equality


def test_lpa_nodriver_matches_broadcast():
    from imtag_ray.pipelines.labelprop import lpa_communities
    from imtag_ray.util import dataset_to_numpy as d2n

    g = build_graph(ray.data.from_arrow(named_graph_edges("barbell")))
    bc = d2n(
        lpa_communities(g, EngineConfig(num_partitions=4), rounds=4,
                        mode="broadcast"),
        "url", "community",
    )
    sh = d2n(lpa_communities(g, nodriver_cfg(), rounds=4), "url", "community")
    assert dict(zip(bc["url"], bc["community"])) == dict(
        zip(sh["url"], sh["community"])
    )


def test_kshells_nodriver_matches_broadcast():
    from imtag_ray.pipelines.traversal import kshells
    from imtag_ray.util import dataset_to_numpy as d2n

    g = build_graph(ray.data.from_arrow(named_graph_edges("gnp")))
    bc = kshells(
        g, EngineConfig(num_partitions=4), k_max=4, rounds=6,
        mode="broadcast",
    )
    sh = kshells(g, nodriver_cfg(), k_max=4, rounds=6)
    b = d2n(bc, "url", "shell")
    s = d2n(sh, "url", "shell")
    assert dict(zip(b["url"], b["shell"])) == dict(zip(s["url"], s["shell"]))


def test_quotient_nodriver_runs():
    """quotient_edges has no driver mode at all — verify it completes
    under the forced-shuffle config and weights sum to E."""
    from imtag_ray.pipelines.labelprop import label_propagation
    from imtag_ray.pipelines.quotient import quotient_edges

    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl), nodriver_cfg())
    labels = label_propagation(
        g, {"https://g.example/v000000": "a", "https://g.example/v000005": "b"},
        nodriver_cfg(),
    ).select_columns(["vid", "label"])
    out = quotient_edges(g, labels, nodriver_cfg())
    t = out if isinstance(out, pa.Table) else pa.concat_tables(
        [x for x in ray.get(out.to_arrow_refs()) if x.num_rows]
    )
    assert sum(t.column("weight").to_pylist()) == tbl.num_rows
