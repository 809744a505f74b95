"""Link-prediction / local-structure operators: Adamic–Adar (both
modes, vs a scalar reference), clustering coefficients (vs networkx),
reciprocity, personalized PageRank (vs uniform-restart equivalence and
mass conservation), and the events window functions."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.linkpred import (
    adamic_adar_pairs,
    clustering_coefficients,
    edge_reciprocity,
)
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.sources.synth import named_graph_edges
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)


def _nx_graph(tbl):
    import networkx as nx

    g = nx.Graph()
    g.add_edges_from(
        zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist())
    )
    return g


def _aa_reference(tbl, min_cn=2):
    """Scalar reference: common neighbors + Adamic–Adar per pair."""
    g = _nx_graph(tbl)
    out = {}
    nodes = sorted(g.nodes())
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            common = set(g[a]) & set(g[b])
            if len(common) >= min_cn:
                aa = sum(1.0 / math.log(g.degree(w)) for w in common)
                out[(a, b)] = (len(common), round(aa, 9))
    return out


def _as_pairs(ds):
    df = (
        ds.to_pandas()
        if hasattr(ds, "to_pandas")
        else ds
    )
    return {
        (r.url_a, r.url_b): (int(r.cn), round(float(r.aa), 9))
        for r in df.itertuples()
    }


@pytest.mark.parametrize("name", ["two_cliques", "gnp", "powerlaw"])
def test_adamic_adar_matches_reference(name):
    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    ours = _as_pairs(adamic_adar_pairs(g, CFG, min_cn=2, mode="broadcast"))
    ref = _aa_reference(tbl, min_cn=2)
    assert ours == ref


def test_adamic_adar_modes_agree():
    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    bc = _as_pairs(adamic_adar_pairs(g, CFG, min_cn=2, mode="broadcast"))
    sh = _as_pairs(adamic_adar_pairs(g, CFG, min_cn=2, mode="shuffle"))
    assert bc == sh


@pytest.mark.parametrize("name", ["two_cliques", "gnp"])
def test_clustering_matches_networkx(name):
    import networkx as nx

    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    out = dataset_to_numpy(clustering_coefficients(g, CFG), "url", "lcc")
    ours = {str(u): round(float(v), 9) for u, v in zip(out["url"], out["lcc"])}
    theirs = {
        u: round(c, 9) for u, c in nx.clustering(_nx_graph(tbl)).items()
    }
    assert ours == theirs


def test_reciprocity_known_graph():
    # directed: 0→1, 1→0 (reciprocal), 0→2, 2→3
    edges = pa.table(
        {
            "src_url": ["a", "b", "a", "c"],
            "dst_url": ["b", "a", "c", "d"],
        }
    )
    out = edge_reciprocity(ray.data.from_arrow(edges))
    assert out["n_edges"][0].as_py() == 4
    assert out["n_reciprocal"][0].as_py() == 2
    assert out["reciprocity"][0].as_py() == pytest.approx(0.5)


def test_ppr_uniform_restart_equals_default():
    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    cfg = EngineConfig(num_partitions=4, max_iterations=8, pagerank_tol=0)
    base = dataset_to_numpy(
        pagerank(g, cfg, mode="broadcast").sort("vid"), "rank"
    )["rank"]
    p = np.full(g.num_vertices, 1.0 / g.num_vertices)
    pers = dataset_to_numpy(
        pagerank(g, cfg, mode="broadcast", restart=p).sort("vid"), "rank"
    )["rank"]
    np.testing.assert_allclose(pers, base, rtol=0, atol=1e-12)


def test_ppr_seed_concentration_and_mass():
    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    cfg = EngineConfig(num_partitions=4, max_iterations=20, pagerank_tol=0)
    p = np.zeros(g.num_vertices)
    p[0] = 1.0
    out = dataset_to_numpy(
        pagerank(g, cfg, mode="broadcast", restart=p).sort("vid"),
        "vid", "rank",
    )
    assert out["rank"].sum() == pytest.approx(1.0, abs=1e-9)
    # the seed holds the single largest rank
    assert int(out["vid"][np.argmax(out["rank"])]) == 0


def test_ppr_rejects_uniform_only_kernels():
    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    for m in ("blocks", "ranges"):
        with pytest.raises(ValueError):
            pagerank(g, CFG, mode=m, restart=np.full(g.num_vertices, 0.1))


@pytest.mark.parametrize("name", ["two_cliques", "gnp"])
def test_ppr_shuffle_equals_broadcast(name):
    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    cfg = EngineConfig(num_partitions=4, max_iterations=12, pagerank_tol=0)
    p = np.zeros(g.num_vertices)
    p[0] = 0.75
    p[g.num_vertices - 1] = 0.25
    bc = dataset_to_numpy(
        pagerank(g, cfg, mode="broadcast", restart=p).sort("vid"), "rank"
    )["rank"]
    sh = dataset_to_numpy(
        pagerank(g, cfg, mode="shuffle", restart=p).sort("vid"), "rank"
    )["rank"]
    np.testing.assert_allclose(sh, bc, rtol=0, atol=1e-12)
    # Dataset-form restart (the no-driver input shape) agrees too
    import pyarrow as _pa

    nz = np.flatnonzero(p)
    pds = ray.data.from_arrow(
        _pa.table({"vid": _pa.array(nz, _pa.int64()),
                   "p": _pa.array(p[nz], _pa.float64())})
    )
    shd = dataset_to_numpy(
        pagerank(g, cfg, mode="shuffle", restart=pds).sort("vid"), "rank"
    )["rank"]
    np.testing.assert_allclose(shd, bc, rtol=0, atol=1e-12)


@pytest.mark.parametrize("name", ["two_cliques", "gnp"])
def test_weighted_pagerank_modes_agree(name):
    from imtag_ray.pipelines.pagerank import pagerank_weighted
    from imtag_ray.util import col_np as _cn

    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)

    def weigh(t):
        s, d = _cn(t, "src"), _cn(t, "dst")
        import pyarrow as _pa
        return _pa.table(
            {"src": _pa.array(s, _pa.int64()),
             "dst": _pa.array(d, _pa.int64()),
             "w": _pa.array(1 + (s + d) % 5, _pa.int64())}
        )

    wedges = g.edges.map_batches(weigh, batch_format="pyarrow").materialize()
    cfg = EngineConfig(num_partitions=4, max_iterations=10, pagerank_tol=0)
    bc = dataset_to_numpy(
        pagerank_weighted(g, wedges, cfg, mode="broadcast").sort("vid"),
        "rank",
    )["rank"]
    sh = dataset_to_numpy(
        pagerank_weighted(g, wedges, cfg, mode="shuffle").sort("vid"),
        "rank",
    )["rank"]
    np.testing.assert_allclose(sh, bc, rtol=0, atol=1e-12)


def test_events_windows_invariants():
    from imtag_ray.relational import events_window_funcs

    df = events_window_funcs("/root/testdata/sf0.001").to_pandas()
    assert list(df.columns) == ["event_id", "user_id", "ts", "seq", "gap_us"]
    for _, g in df.groupby("user_id"):
        assert list(g["seq"]) == list(range(1, len(g) + 1))
        assert pd.isna(g["gap_us"].iloc[0])
        if len(g) > 1:
            assert (g["gap_us"].iloc[1:] >= 0).all()
            ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            np.testing.assert_array_equal(
                g["gap_us"].iloc[1:].to_numpy(dtype="int64"), np.diff(ts_us)
            )


def test_edge_jaccard_matches_networkx():
    import networkx as nx
    from imtag_ray.pipelines.linkpred import edge_jaccard

    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    df = edge_jaccard(g, CFG).to_pandas()
    ours = {
        (r.url_a, r.url_b): (int(r.cn), round(float(r.jac), 9))
        for r in df.itertuples()
    }
    nxg = _nx_graph(tbl)
    theirs = {}
    for a, b in nxg.edges():
        a, b = (a, b) if a < b else (b, a)
        cn = len(set(nxg[a]) & set(nxg[b]))
        union = nxg.degree(a) + nxg.degree(b) - cn
        theirs[(a, b)] = (cn, round(cn / union if union else 0.0, 9))
    assert ours == theirs
    # zero-cn edges must be present too
    assert len(ours) == nxg.number_of_edges()


@pytest.mark.parametrize("name", ["two_cliques", "gnp", "powerlaw"])
def test_edge_jaccard_modes_agree(name):
    from imtag_ray.pipelines.linkpred import edge_jaccard

    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)

    def pairs(df):
        return {
            (r.url_a, r.url_b): (int(r.cn), round(float(r.jac), 9))
            for r in df.itertuples()
        }

    bc = pairs(edge_jaccard(g, CFG, mode="broadcast").to_pandas())
    sh = pairs(edge_jaccard(g, CFG, mode="shuffle").to_pandas())
    assert bc == sh
    # the gate itself: broadcast_max_edges=0 forces the no-driver path
    tight = EngineConfig(num_partitions=4, broadcast_max_edges=0)
    auto = pairs(edge_jaccard(g, tight).to_pandas())
    assert auto == bc


@pytest.mark.parametrize("name", ["two_cliques", "gnp", "powerlaw"])
def test_ball2_modes_agree(name):
    from imtag_ray.pipelines.linkpred import ball2_sizes

    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)

    def sizes(df):
        return {r.url: int(r.ball2) for r in df.itertuples()}

    bc = sizes(ball2_sizes(g, CFG, mode="broadcast").to_pandas())
    sh = sizes(ball2_sizes(g, CFG, mode="shuffle").to_pandas())
    assert bc == sh
    tight = EngineConfig(num_partitions=4, broadcast_max_edges=0)
    auto = sizes(ball2_sizes(g, tight).to_pandas())
    assert auto == bc


def test_weighted_pagerank_matches_networkx():
    import networkx as nx
    from imtag_ray.pipelines.pagerank import pagerank_weighted
    from imtag_ray.util import col_np as _cn

    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    # deterministic weights from endpoint vids
    def weigh(t):
        s, d = _cn(t, "src"), _cn(t, "dst")
        import pyarrow as _pa
        return _pa.table(
            {"src": _pa.array(s, _pa.int64()),
             "dst": _pa.array(d, _pa.int64()),
             "w": _pa.array(1 + (s + d) % 5, _pa.int64())}
        )
    wedges = g.edges.map_batches(weigh, batch_format="pyarrow").materialize()
    cfg = EngineConfig(num_partitions=4, max_iterations=200,
                       pagerank_tol=1e-12)
    out = dataset_to_numpy(
        pagerank_weighted(g, wedges, cfg).sort("vid"), "url", "rank"
    )
    # numpy power-iteration reference (networkx.pagerank needs scipy,
    # absent in this container)
    V = g.num_vertices
    wdf = wedges.to_pandas()
    s = np.concatenate([wdf["src"].to_numpy(), wdf["dst"].to_numpy()])
    d = np.concatenate([wdf["dst"].to_numpy(), wdf["src"].to_numpy()])
    w = np.concatenate([wdf["w"].to_numpy(), wdf["w"].to_numpy()]).astype(float)
    strength = np.zeros(V)
    np.add.at(strength, s, w)
    r = np.full(V, 1.0 / V)
    for _ in range(500):
        contrib = np.where(strength > 0, r / np.maximum(strength, 1e-300), 0.0)
        inc = np.zeros(V)
        np.add.at(inc, d, contrib[s] * w)
        dm = r[strength == 0].sum()
        nr = 0.15 / V + 0.85 * (inc + dm / V)
        if np.abs(nr - r).sum() < 1e-14:
            r = nr
            break
        r = nr
    urls = dataset_to_numpy(g.vertices.sort("vid"), "url")["url"]
    ref = {str(u): r[i] for i, u in enumerate(urls)}
    for u, rv in zip(out["url"], out["rank"]):
        assert abs(ref[str(u)] - rv) < 1e-8


def test_customers_without_orders_typed_empty():
    from imtag_ray.relational import customers_without_orders

    out = customers_without_orders("/root/testdata/sf0.001", year=1888)
    # no orders at all in 1888 → every customer qualifies
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    assert list(df.columns) == ["c_custkey"]
    assert len(df) == 150
    out2 = customers_without_orders("/root/testdata/sf0.001", year=1995)
    df2 = out2.to_pandas() if hasattr(out2, "to_pandas") else out2
    assert len(df2) == 34


def test_ball2_approx_matches_scalar_hll_replay_and_accuracy():
    """ball2_sizes_approx must equal a scalar per-vertex HLL replay
    (same splitmix64 hash, same register math) EXACTLY, and sit within
    HLL tolerance of the exact ball2 counts."""
    from imtag_ray.pipelines.linkpred import (
        _hll_parts,
        ball2_sizes,
        ball2_sizes_approx,
    )

    p, m = 10, 1 << 10
    tbl = named_graph_edges("powerlaw")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    approx = {
        r.url: int(r.ball2)
        for r in ball2_sizes_approx(g, CFG, p=p).to_pandas().itertuples()
    }
    exact = {
        r.url: int(r.ball2)
        for r in ball2_sizes(g, CFG).to_pandas().itertuples()
    }
    # scalar replay: per-vertex ball membership -> registers -> estimate
    vres = dataset_to_numpy(g.vertices, "vid", "url")
    urls = dict(zip(vres["vid"].astype(int), vres["url"]))
    eres = dataset_to_numpy(g.edges, "src", "dst")
    adj: dict = {int(v): {int(v)} for v in vres["vid"]}
    for s, d in zip(eres["src"].astype(int), eres["dst"].astype(int)):
        adj[s].add(d)
        adj[d].add(s)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    for v in adj:
        ball = set()
        for w in adj[v]:
            ball |= adj[w]
        members = np.array(sorted(ball), dtype=np.int64)
        j, rho = _hll_parts(members, p)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, j, rho)
        zeros = int((reg == 0).sum())
        z = float(np.ldexp(1.0, -reg).sum())
        e_raw = alpha * m * m / z
        if e_raw <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        else:
            est = e_raw
        u = str(urls[v])
        assert approx[u] == int(np.floor(est + 0.5)), u
        assert len(ball) == exact[u]  # scalar exact agrees with engine
        # HLL accuracy: small balls sit in the near-exact linear regime
        assert abs(approx[u] - exact[u]) <= max(3, 0.15 * exact[u]), (
            u, approx[u], exact[u]
        )


@pytest.mark.parametrize("name", ["two_cliques", "barbell", "gnp"])
def test_rich_club_matches_reference(name):
    from imtag_ray.pipelines.linkpred import rich_club_curve

    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    out = rich_club_curve(g, CFG, max_k=32).to_pandas()

    # scalar reference over the same undirected simple graph
    nxg = _nx_graph(tbl)
    deg = dict(nxg.degree())
    for r in out.itertuples():
        k = int(r.k)
        rich = {v for v, d in deg.items() if d > k}
        n_edges = sum(
            1 for u, v in nxg.edges() if u in rich and v in rich
        )
        assert int(r.n_nodes) == len(rich)
        assert int(r.n_edges) == n_edges
        if len(rich) >= 2:
            phi = 2.0 * n_edges / (len(rich) * (len(rich) - 1.0))
            assert float(r.phi) == pytest.approx(phi, abs=1e-9)
    # every k with ≥2 rich nodes is present, nothing else
    ks = {int(r.k) for r in out.itertuples()}
    expect = {
        k for k in range(32)
        if sum(1 for d in deg.values() if d > k) >= 2
    }
    assert ks == expect


def test_rich_club_monotone_club_shrinks():
    from imtag_ray.pipelines.linkpred import rich_club_curve

    tbl = named_graph_edges("powerlaw")
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    out = rich_club_curve(g, CFG, max_k=64).to_pandas()
    n = out["n_nodes"].to_numpy()
    e = out["n_edges"].to_numpy()
    assert (np.diff(n) <= 0).all() and (np.diff(e) <= 0).all()
    assert ((out["phi"] >= 0) & (out["phi"] <= 1)).all()
