"""Borůvka MSF: both modes vs networkx minimum_spanning_edges (total
weight + forest validity), exact cross-mode equality, fixed-round
partial-forest determinism."""

import networkx as nx
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.msf import boruvka_forest
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy, table_from_arrays

CFG = EngineConfig(num_partitions=4)


def u(i: int) -> str:
    return f"u{i:03d}"


def make(edges):
    tbl = pa.table(
        {"src_url": [u(a) for a, _ in edges],
         "dst_url": [u(b) for _, b in edges]}
    )
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    e = dataset_to_numpy(g.edges, "src", "dst")
    w = (1 + (e["src"] + e["dst"]) % 7).astype(np.int64)
    wed = ray.data.from_arrow(
        table_from_arrays(
            src=e["src"].astype(np.int64),
            dst=e["dst"].astype(np.int64), w=w,
        )
    )
    return g, wed, e, w


def nx_msf_weight(e, w):
    G = nx.Graph()
    for a, b, ww in zip(e["src"], e["dst"], w):
        aa, bb = min(a, b), max(a, b)
        if aa == bb:
            continue
        if G.has_edge(aa, bb):
            G[aa][bb]["weight"] = min(G[aa][bb]["weight"], int(ww))
        else:
            G.add_edge(aa, bb, weight=int(ww))
    return (
        sum(d["weight"]
            for _, _, d in nx.minimum_spanning_edges(G, data=True)),
        G,
    )


CASES = {
    "chain": [(i, i + 1) for i in range(8)],
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
    "two_components": [(0, 1), (1, 2), (2, 0), (5, 6), (6, 7)],
    "k4": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_msf_weight_and_validity(name, mode):
    g, wed, e, w = make(CASES[name])
    df = boruvka_forest(g, wed, CFG, mode=mode).to_pandas()
    want, G = nx_msf_weight(e, w)
    assert int(df["weight"].sum()) == want
    # a spanning forest: acyclic, |edges| = V - #components
    F = nx.Graph()
    F.add_nodes_from(G.nodes)
    for r in df.itertuples():
        F.add_edge(r.url_a, r.url_b)
    assert len(df) == G.number_of_nodes() - nx.number_connected_components(G)
    assert nx.is_forest(F)


def test_msf_random_modes_agree_exactly():
    rng = np.random.default_rng(41)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 50, size=(200, 2))
         if a != b}
    )
    g, wed, e, w = make(edges)
    fb = boruvka_forest(g, wed, CFG, mode="broadcast").to_pandas()
    fs = boruvka_forest(g, wed, CFG, mode="shuffle").to_pandas()
    key = ["url_a", "url_b", "weight"]
    assert (
        fb[key].sort_values(key).reset_index(drop=True).equals(
            fs[key].sort_values(key).reset_index(drop=True)
        )
    )
    want, _ = nx_msf_weight(e, w)
    assert int(fb["weight"].sum()) == want


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_msf_fixed_rounds_partial_is_prefix(mode):
    """rounds=1 output ⊆ converged output (Borůvka only ever adds)."""
    rng = np.random.default_rng(43)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(90, 2))
         if a != b}
    )
    g, wed, _, _ = make(edges)
    part = boruvka_forest(g, wed, CFG, rounds=1, mode=mode).to_pandas()
    full = boruvka_forest(g, wed, CFG, mode=mode).to_pandas()
    ps = {(r.url_a, r.url_b) for r in part.itertuples()}
    fs = {(r.url_a, r.url_b) for r in full.itertuples()}
    assert ps <= fs
    assert len(ps) >= 1


def test_msf_edgeless():
    tbl = pa.table({"src_url": [u(0)], "dst_url": [u(0)]})  # self-loop only
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    wed = ray.data.from_arrow(
        table_from_arrays(
            src=np.array([0], dtype=np.int64),
            dst=np.array([0], dtype=np.int64),
            w=np.array([1], dtype=np.int64),
        )
    )
    df = boruvka_forest(g, wed, CFG, mode="broadcast").to_pandas()
    assert len(df) == 0
