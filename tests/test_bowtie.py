"""Bowtie decomposition + SCC condensation: both modes vs a networkx
reference (condensation DAG + reachability-set classification) on
directed fixtures, cross-mode equality on a random digraph."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.bowtie import bowtie_decomposition, scc_condensation
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


def nx_reference(edges):
    """Region per url + condensation edge set, from networkx."""
    import networkx as nx

    g = nx.DiGraph()
    g.add_edges_from((u(a), u(b)) for a, b in edges)
    comp_of = {}
    comps = []
    for comp in nx.strongly_connected_components(g):
        root = min(comp)
        comps.append((len(comp), root, comp))
        for v in comp:
            comp_of[v] = root
    cond = {
        (comp_of[a], comp_of[b])
        for a, b in g.edges()
        if comp_of[a] != comp_of[b]
    }
    # core: largest SCC, ties -> smallest canonical id
    comps.sort(key=lambda t: (-t[0], t[1]))
    core = comps[0][2]
    core_root = comps[0][1]
    anc = nx.ancestors(g, core_root) | core
    dsc = nx.descendants(g, core_root) | core
    in_ = anc - core
    out = dsc - core
    f_in = set()
    for v in in_:
        f_in |= nx.descendants(g, v)
    b_out = set()
    for v in out:
        b_out |= nx.ancestors(g, v)
    region = {}
    for v in g.nodes():
        if v in core:
            region[v] = "CORE"
        elif v in in_:
            region[v] = "IN"
        elif v in out:
            region[v] = "OUT"
        elif v in f_in and v in b_out:
            region[v] = "TUBE"
        elif v in f_in:
            region[v] = "TENDRIL_IN"
        elif v in b_out:
            region[v] = "TENDRIL_OUT"
        else:
            region[v] = "DISCONNECTED"
    return region, cond


def engine_region(graph, mode):
    df = bowtie_decomposition(graph, CFG, mode=mode).to_pandas()
    return dict(zip(df["url"], df["region"]))


def engine_cond(graph, mode):
    df = scc_condensation(graph, CFG, mode=mode).to_pandas()
    if df.empty:  # Ray 2.49 to_pandas drops columns from 0-row datasets
        return set()
    return set(zip(df["src_scc_url"], df["dst_scc_url"]))


CASES = {
    # full bowtie: in-tendril -> IN -> core 3-cycle -> OUT -> tendril,
    # a tube IN->OUT bypassing the core, detached 2-cycle
    "bowtie_full": (
        [(10, 0), (11, 10)]                      # IN chain
        + [(0, 1), (1, 2), (2, 0)]               # CORE 3-cycle
        + [(2, 20), (20, 21)]                    # OUT chain
        + [(10, 40), (40, 20)]                   # TUBE via 40
        + [(10, 50)]                             # TENDRIL_IN at 50
        + [(51, 20)]                             # TENDRIL_OUT at 51
        + [(30, 31), (31, 30)]                   # DISCONNECTED 2-cycle
    ),
    "single_cycle": [(i, (i + 1) % 5) for i in range(5)],
    "pure_dag": [(0, 1), (1, 2), (0, 3), (3, 2), (4, 5)],
}


def _gnp_edges(n=40, seed=11):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < 0.06
    np.fill_diagonal(m, False)
    a, b = np.nonzero(m)
    return list(zip(a.tolist(), b.tolist()))


CASES["gnp_directed"] = _gnp_edges()


@pytest.mark.parametrize("name", sorted(CASES))
def test_bowtie_broadcast_matches_networkx(name):
    g, edges = digraph(CASES[name])
    ref_region, _ = nx_reference(edges)
    assert engine_region(g, "broadcast") == ref_region


@pytest.mark.parametrize("name", ["bowtie_full", "pure_dag"])
def test_bowtie_shuffle_matches_networkx(name):
    g, edges = digraph(CASES[name])
    ref_region, _ = nx_reference(edges)
    assert engine_region(g, "shuffle") == ref_region


@pytest.mark.parametrize("name", sorted(CASES))
def test_condensation_broadcast_matches_networkx(name):
    g, edges = digraph(CASES[name])
    _, ref_cond = nx_reference(edges)
    assert engine_cond(g, "broadcast") == ref_cond


def test_condensation_shuffle_matches_networkx():
    g, edges = digraph(CASES["bowtie_full"])
    _, ref_cond = nx_reference(edges)
    assert engine_cond(g, "shuffle") == ref_cond


def test_bowtie_modes_agree_random():
    g, _ = digraph(CASES["gnp_directed"])
    assert engine_region(g, "shuffle") == engine_region(g, "broadcast")


def test_condensation_is_acyclic():
    import networkx as nx

    g, _ = digraph(CASES["gnp_directed"])
    cond = engine_cond(g, "broadcast")
    dag = nx.DiGraph()
    dag.add_edges_from(cond)
    assert nx.is_directed_acyclic_graph(dag)
