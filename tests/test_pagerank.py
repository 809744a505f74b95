"""PageRank: allclose 1e-6 vs networkx at convergence (SURVEY.md §5),
dangling mass, both modes."""

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.sources.synth import named_graph_edges
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy


def nx_pagerank(tbl, alpha=0.85):
    # networkx.pagerank needs scipy (absent here); the oracle replicates
    # its published semantics in dense numpy (imtag_ray.oracle.graphs)
    from imtag_ray.oracle.graphs import pagerank_oracle

    pairs = list(zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist()))
    return pagerank_oracle(pairs, alpha=alpha, tol=1e-12, max_iter=500)


def run_engine(tbl, mode, cfg=None):
    cfg = cfg or EngineConfig(num_partitions=4, pagerank_tol=1e-12, max_iterations=500)
    g = build_graph(ray.data.from_arrow(tbl))
    pr = pagerank(g, cfg, mode=mode)
    out = dataset_to_numpy(pr, "url", "rank")
    return dict(zip([str(u) for u in out["url"]], out["rank"]))


@pytest.mark.parametrize("name", ["cycle", "two_cliques", "barbell"])
def test_pagerank_small_graphs(name):
    tbl = named_graph_edges(name)
    ours = run_engine(tbl, "broadcast")
    theirs = nx_pagerank(tbl)
    assert set(ours) == set(theirs)
    for u in theirs:
        assert ours[u] == pytest.approx(theirs[u], abs=1e-6)
    assert sum(ours.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_shuffle_mode_trajectory():
    """Shuffle (scale-path) mode: a full convergence run would shuffle
    ~170 rounds — instead match the oracle's trajectory exactly after a
    fixed 12 iterations (tol=0 on both sides)."""
    from imtag_ray.oracle.graphs import pagerank_oracle

    tbl = named_graph_edges("two_cliques")
    cfg = EngineConfig(num_partitions=4, pagerank_tol=0, max_iterations=12)
    ours = run_engine(tbl, "shuffle", cfg)
    pairs = list(zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist()))
    theirs = pagerank_oracle(pairs, tol=0, max_iter=12)
    for u in theirs:
        assert ours[u] == pytest.approx(theirs[u], abs=1e-12)


def test_pagerank_star_dangling_hub():
    # directed star: leaves → hub; hub is dangling (no out-links).
    # exercises dangling-mass redistribution and hub in-degree skew.
    tbl = named_graph_edges("star")
    ours = run_engine(tbl, "broadcast")
    theirs = nx_pagerank(tbl)
    for u in theirs:
        assert ours[u] == pytest.approx(theirs[u], abs=1e-6)


def test_pagerank_gnp_vs_networkx():
    tbl = named_graph_edges("gnp")
    ours = run_engine(tbl, "broadcast")
    theirs = nx_pagerank(tbl)
    worst = max(abs(ours[u] - theirs[u]) for u in theirs)
    assert worst < 1e-6


def test_pagerank_modes_agree():
    tbl = named_graph_edges("barbell")
    cfg = EngineConfig(num_partitions=4, pagerank_tol=0, max_iterations=10)
    a = run_engine(tbl, "broadcast", cfg)
    b = run_engine(tbl, "shuffle", cfg)
    c = run_engine(tbl, "blocks", cfg)
    d = run_engine(tbl, "ranges", cfg)
    for u in a:
        assert a[u] == pytest.approx(b[u], abs=1e-12)
        assert a[u] == pytest.approx(c[u], abs=1e-12)
        assert a[u] == pytest.approx(d[u], abs=1e-12)


def test_pagerank_ranges_mode_skewed_graph():
    """Dst-range-partitioned mode on a hub-skewed graph (star): the hub
    lands in one range; results must still match broadcast exactly."""
    tbl = named_graph_edges("star")
    cfg = EngineConfig(num_partitions=8, pagerank_tol=0, max_iterations=8)
    a = run_engine(tbl, "broadcast", cfg)
    d = run_engine(tbl, "ranges", cfg)
    for u in a:
        assert a[u] == pytest.approx(d[u], abs=1e-12)
