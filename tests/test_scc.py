"""Strongly connected components: both modes vs networkx on directed
fixtures (cycles, DAG chains, bowties, random digraphs), canonical
min-url ids, cross-mode equality."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.scc import strongly_connected_components
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=4)


def u(i: int) -> str:
    return f"u{i:03d}"


def digraph(edges):
    tbl = pa.table(
        {"src_url": [u(a) for a, _ in edges],
         "dst_url": [u(b) for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG), edges


def nx_scc_map(edges):
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from((u(a), u(b)) for a, b in edges)
    out = {}
    for comp in nx.strongly_connected_components(g):
        root = min(comp)
        for v in comp:
            out[v] = root
    return out


def engine_scc_map(graph, mode):
    df = strongly_connected_components(graph, CFG, mode=mode).to_pandas()
    return dict(zip(df["url"], df["scc_url"]))


CASES = {
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
    "chain": [(i, i + 1) for i in range(6)],
    "two_cycles_bridge": (
        [(i, (i + 1) % 4) for i in range(4)]
        + [(4 + i, 4 + (i + 1) % 3) for i in range(3)]
        + [(0, 4)]
    ),
    "bowtie": (
        # in-tendril → core cycle → out-tendril, plus a detached 2-cycle
        [(10, 0), (11, 10)]
        + [(0, 1), (1, 2), (2, 0)]
        + [(2, 20), (20, 21)]
        + [(30, 31), (31, 30)]
    ),
}


def _gnp_edges(n=40, seed=7):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < 0.07
    np.fill_diagonal(m, False)
    a, b = np.nonzero(m)
    return list(zip(a.tolist(), b.tolist()))


CASES["gnp_directed"] = _gnp_edges()


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_broadcast_matches_networkx(name):
    g, edges = digraph(CASES[name])
    assert engine_scc_map(g, "broadcast") == nx_scc_map(edges)


@pytest.mark.parametrize("name", ["cycle", "two_cycles_bridge", "bowtie"])
def test_scc_shuffle_matches_networkx(name):
    g, edges = digraph(CASES[name])
    assert engine_scc_map(g, "shuffle") == nx_scc_map(edges)


def test_scc_modes_agree_random():
    g, edges = digraph(CASES["gnp_directed"])
    assert engine_scc_map(g, "shuffle") == engine_scc_map(g, "broadcast")


def test_scc_chain_needs_linear_rounds_raises_cleanly():
    # a 6-chain condensation needs one peel round per vertex; a budget
    # of 2 must raise, not return partial labels
    g, _ = digraph(CASES["chain"])
    tiny = EngineConfig(num_partitions=4, max_iterations=2)
    with pytest.raises(RuntimeError, match="did not finish"):
        strongly_connected_components(g, tiny, mode="broadcast")
