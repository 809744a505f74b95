"""HITS / BFS / k-core: differential vs numpy+networkx references,
broadcast and shuffle modes, and the fixed-round oracle semantics."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.traversal import bfs_distances, hits, kcore
from imtag_ray.sources.synth import gurl, named_graph_edges
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)
SHUF = EngineConfig(num_partitions=4, vertex_state="shuffle")


def graph_and_vids(name):
    tbl = named_graph_edges(name)
    g = build_graph(ray.data.from_arrow(tbl))
    verts = dataset_to_numpy(g.vertices.sort("vid"), "url")
    url_to_vid = {str(u): i for i, u in enumerate(verts["url"])}
    e = dataset_to_numpy(g.edges, "src", "dst")
    return g, tbl, url_to_vid, e["src"], e["dst"]


def hits_ref(src, dst, V, iters):
    h = np.ones(V)
    a = np.ones(V)
    for _ in range(iters):
        a = np.zeros(V)
        np.add.at(a, dst, h[src])
        h2 = np.zeros(V)
        np.add.at(h2, src, a[dst])
        h = h2
    if h.sum() > 0:
        h = h / h.sum()
    if a.sum() > 0:
        a = a / a.sum()
    return h, a


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_hits_matches_numpy_reference(cfg):
    g, _, _, src, dst = graph_and_vids("gnp")
    want_h, want_a = hits_ref(src, dst, g.num_vertices, iters=8)
    out = dataset_to_numpy(hits(g, cfg, iterations=8).sort("vid"),
                           "vid", "hub", "auth")
    assert np.array_equal(out["vid"], np.arange(g.num_vertices))
    np.testing.assert_allclose(out["hub"], want_h, rtol=1e-9, atol=1e-15)
    np.testing.assert_allclose(out["auth"], want_a, rtol=1e-9, atol=1e-15)


def test_hits_modes_agree():
    g, _, _, _, _ = graph_and_vids("barbell")
    b = dataset_to_numpy(hits(g, CFG, iterations=5).sort("vid"), "hub", "auth")
    s = dataset_to_numpy(hits(g, SHUF, iterations=5).sort("vid"), "hub", "auth")
    np.testing.assert_allclose(b["hub"], s["hub"], rtol=1e-12)
    np.testing.assert_allclose(b["auth"], s["auth"], rtol=1e-12)


def bfs_nx(name, seed_vertex):
    import networkx as nx

    tbl = named_graph_edges(name)
    g = nx.Graph()
    g.add_edges_from(
        zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist())
    )
    return nx.single_source_shortest_path_length(g, seed_vertex)


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_bfs_matches_networkx(cfg):
    g, _, _, _, _ = graph_and_vids("barbell")
    want = bfs_nx("barbell", gurl(0))
    out = dataset_to_numpy(
        bfs_distances(g, [gurl(0)], cfg).sort("url"), "url", "dist"
    )
    got = dict(zip([str(u) for u in out["url"]], out["dist"]))
    assert got == want


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_bfs_fixed_rounds_truncates(cfg):
    # rounds=R keeps exactly the vertices within R hops (oracle replay
    # semantics for copart_bfs12)
    g, _, _, _, _ = graph_and_vids("barbell")
    want = {u: d for u, d in bfs_nx("barbell", gurl(0)).items() if d <= 3}
    out = dataset_to_numpy(
        bfs_distances(g, [gurl(0)], cfg, rounds=3).sort("url"), "url", "dist"
    )
    got = dict(zip([str(u) for u in out["url"]], out["dist"]))
    assert got == want


def test_bfs_multi_seed_and_missing_seed():
    g, _, _, _, _ = graph_and_vids("two_cliques")
    out = dataset_to_numpy(
        bfs_distances(g, [gurl(0), gurl(5), "https://nope/"], CFG),
        "url", "dist",
    )
    got = dict(zip([str(u) for u in out["url"]], out["dist"]))
    # both cliques reached from their own seed; all non-seeds distance 1
    assert got[gurl(0)] == 0 and got[gurl(5)] == 0
    assert all(
        d == (0 if u in (gurl(0), gurl(5)) else 1) for u, d in got.items()
    )


def kcore_nx(name, k):
    import networkx as nx

    tbl = named_graph_edges(name)
    g = nx.Graph()
    g.add_edges_from(
        zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist())
    )
    core = nx.k_core(g, k)
    return dict(core.degree())


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
@pytest.mark.parametrize("k", [3, 5])
def test_kcore_matches_networkx(cfg, k):
    g, _, _, _, _ = graph_and_vids("gnp")
    want = kcore_nx("gnp", k)
    out = dataset_to_numpy(
        kcore(g, k, cfg).sort("url"), "url", "core_degree"
    )
    got = dict(zip([str(u) for u in out["url"]], out["core_degree"]))
    assert got == want


def kcore_rounds_ref(pairs, k, rounds):
    """Fixed-round peeling reference (plain Python)."""
    from collections import Counter

    alive = {v for p in pairs for v in p}
    for _ in range(rounds):
        deg = Counter()
        for u, v in pairs:
            if u in alive and v in alive:
                deg[u] += 1
                deg[v] += 1
        nxt = {v for v in alive if deg[v] >= k}
        if nxt == alive:
            break
        alive = nxt
    deg = Counter()
    for u, v in pairs:
        if u in alive and v in alive:
            deg[u] += 1
            deg[v] += 1
    return {v: deg[v] for v in alive}


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_kcore_fixed_rounds_matches_reference(cfg):
    # 1 round of k=6 peeling on the barbell leaves a non-fixpoint set:
    # the fixed-round result must match the replayed trajectory (and
    # survivors isolated by the last peel keep a core_degree=0 row)
    g, tbl, _, _, _ = graph_and_vids("barbell")
    pairs = list(
        zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist())
    )
    for rounds in (1, 2, 4):
        want = kcore_rounds_ref(pairs, 6, rounds)
        out = dataset_to_numpy(
            kcore(g, 6, cfg, rounds=rounds).sort("url"),
            "url", "core_degree",
        )
        got = dict(zip([str(u) for u in out["url"]], out["core_degree"]))
        assert got == want, f"rounds={rounds}"


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_kcore_isolated_survivor_fixed_round(cfg):
    # star, k=2, one round: leaves (deg 1) peel, the hub (deg 1000)
    # survives but is left with no alive neighbor — fixed-round
    # semantics must keep it with core_degree=0 in BOTH modes (the
    # shuffle mode's alive left-join zero-fill)
    g, _, _, _, _ = graph_and_vids("star")
    out = dataset_to_numpy(
        kcore(g, 2, cfg, rounds=1), "url", "core_degree"
    )
    assert dict(zip([str(u) for u in out["url"]], out["core_degree"])) == {
        gurl(0): 0
    }
    # one more round and the isolated hub peels too
    assert kcore(g, 2, cfg, rounds=2).count() == 0


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_kcore_empty_core(cfg):
    # k above the max degree peels everything
    g, _, _, _, _ = graph_and_vids("cycle")
    out = kcore(g, 3, cfg)
    assert out.count() == 0


def test_bfs_nonconvergence_raises():
    g, _, _, _, _ = graph_and_vids("cycle")  # diameter 25
    with pytest.raises(RuntimeError):
        bfs_distances(
            g, [gurl(0)], EngineConfig(num_partitions=4, max_iterations=3)
        )


def test_empty_graph_traversal():
    empty = pa.table(
        {"src_url": pa.array([], pa.string()),
         "dst_url": pa.array([], pa.string())}
    )
    g = build_graph(ray.data.from_arrow(empty))
    assert hits(g, CFG).count() == 0
    assert bfs_distances(g, [gurl(0)], CFG).count() == 0
    assert kcore(g, 2, CFG).count() == 0


def wedges_for(g):
    """Deterministic weights in vid space, reproducible in the test
    reference: w = 1 + (3*src + 5*dst) % 7 over the canonical edges."""
    e = dataset_to_numpy(g.edges, "src", "dst")
    src, dst = e["src"], e["dst"]
    w = (1 + (3 * src + 5 * dst) % 7).astype(np.int64)
    t = pa.table(
        {"src": pa.array(src), "dst": pa.array(dst), "w": pa.array(w)}
    )
    return ray.data.from_arrow(t).repartition(3), src, dst, w


def sssp_nx(g, src, dst, w, seed_vid):
    import networkx as nx

    nxg = nx.Graph()
    for s, d, ww in zip(src, dst, w):
        # undirected: keep the min weight if both directions appear
        if nxg.has_edge(s, d):
            ww = min(ww, nxg[s][d]["weight"])
        nxg.add_edge(int(s), int(d), weight=int(ww))
    import networkx as nx

    return nx.single_source_dijkstra_path_length(nxg, seed_vid)


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_sssp_matches_networkx(cfg):
    from imtag_ray.pipelines.traversal import sssp_distances

    g, _, _, _, _ = graph_and_vids("gnp")
    wedges, src, dst, w = wedges_for(g)
    verts = dataset_to_numpy(g.vertices.sort("vid"), "vid", "url")
    url_of = dict(zip(verts["vid"], [str(u) for u in verts["url"]]))
    want = {
        url_of[v]: d for v, d in sssp_nx(g, src, dst, w, 0).items()
    }
    out = dataset_to_numpy(
        sssp_distances(g, [url_of[0]], wedges, cfg).sort("url"),
        "url", "dist",
    )
    got = dict(zip([str(u) for u in out["url"]], out["dist"]))
    assert got == want


@pytest.mark.parametrize("cfg", [CFG, SHUF], ids=["broadcast", "shuffle"])
def test_sssp_fixed_rounds_truncates(cfg):
    # rounds=1: exactly the seed + its direct neighbors at min edge cost
    from imtag_ray.pipelines.traversal import sssp_distances

    g, _, _, _, _ = graph_and_vids("barbell")
    wedges, src, dst, w = wedges_for(g)
    verts = dataset_to_numpy(g.vertices.sort("vid"), "vid", "url")
    url_of = dict(zip(verts["vid"], [str(u) for u in verts["url"]]))
    want = {url_of[0]: 0}
    for s, d, ww in zip(src, dst, w):
        if s == 0:
            want[url_of[d]] = min(want.get(url_of[d], 10**9), int(ww))
        if d == 0:
            want[url_of[s]] = min(want.get(url_of[s], 10**9), int(ww))
    out = dataset_to_numpy(
        sssp_distances(g, [url_of[0]], wedges, cfg, rounds=1).sort("url"),
        "url", "dist",
    )
    got = dict(zip([str(u) for u in out["url"]], out["dist"]))
    assert got == want


def test_kcore_fixed_round_modes_agree():
    """Broadcast and shuffle k-core must agree row-for-row under
    FIXED-ROUND semantics, including survived-but-isolated vertices
    (kept with core_degree 0 by both: broadcast's post-peel degree
    recompute ≡ shuffle's alive ⟕ degrees zero-fill)."""
    import pyarrow as pa

    cases = [
        # two hubs joined: both survive one k=2 peel, both isolated
        ([("c", "l1"), ("c", "l2"), ("c", "d"), ("d", "m1"), ("d", "m2")],
         2, 1),
        # star + triangle: hub survives isolated, triangle is the core
        ([("c", "l1"), ("c", "l2"), ("c", "l3"),
          ("x", "y"), ("y", "z"), ("x", "z")], 2, 1),
        ([("c", "l1"), ("c", "l2"), ("c", "l3"),
          ("x", "y"), ("y", "z"), ("x", "z")], 2, 2),
        ([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")], 2, 1),
    ]
    for edges, k, rounds in cases:
        tbl = pa.table(
            {"src_url": [a for a, _ in edges],
             "dst_url": [b for _, b in edges]}
        )
        g = build_graph(ray.data.from_arrow(tbl), CFG)
        b = dataset_to_numpy(
            kcore(g, k, CFG, rounds=rounds, mode="broadcast"),
            "url", "core_degree",
        )
        s = dataset_to_numpy(
            kcore(g, k, CFG, rounds=rounds, mode="shuffle"),
            "url", "core_degree",
        )
        assert dict(zip([str(u) for u in b["url"]], b["core_degree"])) == \
            dict(zip([str(u) for u in s["url"]], s["core_degree"])), (
            edges, k, rounds
        )


# --- eigenvector centrality ---------------------------------------------


def _eigen_digraph(edges):
    tbl = pa.table(
        {"src_url": [f"u{a:03d}" for a, _ in edges],
         "dst_url": [f"u{b:03d}" for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG)


def _eigen_ref(edges, iters):
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    vid = {v: i for i, v in enumerate(verts)}
    V = len(verts)
    x = np.ones(V)
    for _ in range(iters):
        nxt = np.zeros(V)
        for a, b in edges:
            nxt[vid[b]] += x[vid[a]]
        x = nxt
    s = x.sum()
    if s > 0:
        x = x / s
    return {f"u{v:03d}": x[vid[v]] for v in verts}


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_eigenvector_matches_power_iteration(mode):
    from imtag_ray.pipelines.traversal import eigenvector_centrality

    rng = np.random.default_rng(29)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2))
         if a != b}
    )
    g = _eigen_digraph(edges)
    df = eigenvector_centrality(g, CFG, iterations=6, mode=mode).to_pandas()
    got = dict(zip(df["url"], df["score"]))
    ref = _eigen_ref(edges, 6)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-12), k


def test_eigenvector_modes_agree_exactly():
    from imtag_ray.pipelines.traversal import eigenvector_centrality

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 1), (0, 3)]
    g = _eigen_digraph(edges)
    b = eigenvector_centrality(g, CFG, iterations=8, mode="broadcast").to_pandas()
    s = eigenvector_centrality(g, CFG, iterations=8, mode="shuffle").to_pandas()
    bm = dict(zip(b["url"], b["score"]))
    sm = dict(zip(s["url"], s["score"]))
    assert bm == sm  # integer-until-normalize ⇒ bit equality


# --- Katz centrality ------------------------------------------------------


def _katz_ref(edges, iters, alpha=0.125):
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    vid = {v: i for i, v in enumerate(verts)}
    V = len(verts)
    x = np.ones(V)
    for _ in range(iters):
        nxt = np.zeros(V)
        for a, b in edges:
            nxt[vid[b]] += x[vid[a]]
        x = 1.0 + alpha * nxt
    x = x / x.sum()
    return {f"u{v:03d}": x[vid[v]] for v in verts}


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_katz_matches_reference(mode):
    from imtag_ray.pipelines.traversal import katz_centrality

    rng = np.random.default_rng(31)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2))
         if a != b}
    )
    g = _eigen_digraph(edges)
    df = katz_centrality(g, CFG, iterations=6, mode=mode).to_pandas()
    got = dict(zip(df["url"], df["score"]))
    ref = _katz_ref(edges, 6)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-15), k


def test_katz_modes_agree_exactly():
    """Dyadic α ⇒ bit equality between broadcast and shuffle modes."""
    from imtag_ray.pipelines.traversal import katz_centrality

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 1), (0, 3), (4, 0)]
    g = _eigen_digraph(edges)
    b = katz_centrality(g, CFG, iterations=8, mode="broadcast").to_pandas()
    s = katz_centrality(g, CFG, iterations=8, mode="shuffle").to_pandas()
    assert dict(zip(b["url"], b["score"])) == dict(zip(s["url"], s["score"]))


def test_katz_rejects_non_dyadic_alpha():
    from imtag_ray.pipelines.traversal import katz_centrality

    g = _eigen_digraph([(0, 1)])
    with pytest.raises(ValueError):
        katz_centrality(g, CFG, alpha=0.1)


# --- sampled-source depth-bounded betweenness ---------------------------


def _bc_graph(edges):
    tbl = pa.table(
        {"src_url": [f"u{a:03d}" for a, _ in edges],
         "dst_url": [f"u{b:03d}" for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG)


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_betweenness_full_matches_networkx(mode):
    """All sources + depth > diameter ⇒ exact Brandes betweenness."""
    import networkx as nx

    from imtag_ray.pipelines.betweenness import betweenness_approx

    rng = np.random.default_rng(3)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 25, size=(80, 2))
         if a != b}
    )
    g = _bc_graph(edges)
    df = betweenness_approx(
        g, CFG, n_sources=g.num_vertices, depth=12, mode=mode
    ).to_pandas()
    got = dict(zip(df["url"], df["bc"]))
    G = nx.DiGraph()
    G.add_nodes_from(f"u{i:03d}" for i in sorted({x for e in edges for x in e}))
    G.add_edges_from((f"u{a:03d}", f"u{b:03d}") for a, b in edges)
    ref = nx.betweenness_centrality(G, normalized=False)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=1e-6), k


def test_betweenness_modes_agree():
    from imtag_ray.pipelines.betweenness import betweenness_approx

    rng = np.random.default_rng(7)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(150, 2))
         if a != b}
    )
    g = _bc_graph(edges)
    b = betweenness_approx(g, CFG, 6, 4, mode="broadcast").to_pandas()
    s = betweenness_approx(g, CFG, 6, 4, mode="shuffle").to_pandas()
    bm = dict(zip(b["url"], b["bc"]))
    sm = dict(zip(s["url"], s["bc"]))
    assert bm.keys() == sm.keys()
    for k in bm:
        assert bm[k] == pytest.approx(sm[k], abs=2e-9), k


def test_betweenness_chain_closed_form():
    """Directed chain u0→…→u5, all sources: bc(v_i) = i·(n-1-i)."""
    from imtag_ray.pipelines.betweenness import betweenness_approx

    n = 6
    edges = [(i, i + 1) for i in range(n - 1)]
    g = _bc_graph(edges)
    df = betweenness_approx(g, CFG, n_sources=n, depth=n, mode="broadcast").to_pandas()
    got = dict(zip(df["url"], df["bc"]))
    for i in range(n):
        assert got[f"u{i:03d}"] == i * (n - 1 - i), i


# --- k-shell decomposition ------------------------------------------------


def _kshell_ref(edges, k_max, rounds):
    """Pure-python fixed-round replay of the kshells contract."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    shell = {v: 0 for v in verts}
    pairs = {tuple(sorted(e)) for e in edges}
    for k in range(1, k_max + 1):
        alive = set(verts)
        for _ in range(rounds):
            deg = {v: 0 for v in alive}
            for a, b in pairs:
                if a in alive and b in alive:
                    deg[a] += 1
                    deg[b] += 1
            alive = {v for v in alive if deg[v] >= k}
        for v in alive:
            shell[v] = k
    return {f"u{v:03d}": s for v, s in shell.items()}


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_kshells_matches_reference(mode):
    from imtag_ray.pipelines.traversal import kshells

    rng = np.random.default_rng(37)
    # canonical unordered pairs — kcore's contract is one edge row per
    # unordered pair (the copart graph shape)
    edges = sorted(
        {tuple(sorted((int(a), int(b))))
         for a, b in rng.integers(0, 24, size=(90, 2)) if a != b}
    )
    g = _eigen_digraph(edges)
    out = kshells(g, CFG, k_max=5, rounds=8, mode=mode)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = dict(zip(df["url"], (int(x) for x in df["shell"])))
    assert got == _kshell_ref(edges, 5, 8)


def test_kshells_matches_networkx_coreness():
    """With rounds ≥ diameter-ish, fixed-round shells equal true
    coreness (capped at k_max) — cross-checked against networkx."""
    import networkx as nx

    from imtag_ray.pipelines.traversal import kshells

    rng = np.random.default_rng(41)
    edges = sorted(
        {tuple(sorted((int(a), int(b))))
         for a, b in rng.integers(0, 20, size=(70, 2)) if a != b}
    )
    g = _eigen_digraph(edges)
    out = kshells(g, CFG, k_max=8, rounds=30)
    df = out.to_pandas() if hasattr(out, "to_pandas") else out
    got = dict(zip(df["url"], (int(x) for x in df["shell"])))
    G = nx.Graph()
    G.add_edges_from(edges)
    core = nx.core_number(G)
    assert got == {f"u{v:03d}": min(c, 8) for v, c in core.items()}


# --- Weisfeiler-Leman refinement -------------------------------------------


def test_wl_matches_reference():
    from imtag_ray.pipelines.wl import wl_colors, wl_reference

    rng = np.random.default_rng(47)
    edges = sorted(
        {tuple(sorted((int(a), int(b))))
         for a, b in rng.integers(0, 20, size=(50, 2)) if a != b}
    )
    g = _eigen_digraph(edges)
    out = wl_colors(g, CFG, rounds=2)
    df = out.to_pandas()
    got = dict(zip(df["url"], df["wl_color"]))
    ref = wl_reference([(f"u{a:03d}", f"u{b:03d}") for a, b in edges], 2)
    assert got == ref


def test_wl_distinguishes_roles():
    """On a star, WL must separate hub from leaves; on a cycle all
    vertices stay one class."""
    from imtag_ray.pipelines.wl import wl_colors

    star = [(0, i) for i in range(1, 6)]
    g = _eigen_digraph(star)
    df = wl_colors(g, CFG, rounds=2).to_pandas()
    colors = dict(zip(df["url"], df["wl_color"]))
    assert len({colors[f"u{i:03d}"] for i in range(1, 6)}) == 1
    assert colors["u000"] != colors["u001"]
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    g2 = _eigen_digraph(cyc)
    df2 = wl_colors(g2, CFG, rounds=3).to_pandas()
    assert df2["wl_color"].nunique() == 1


def test_wl_commutative_same_partition():
    """The commutative multiset hash must induce the SAME color
    partition as the sorted-concat contract (colors differ as
    strings; the equivalence classes must not)."""
    from imtag_ray.pipelines.wl import wl_colors

    rng = np.random.default_rng(53)
    edges = sorted(
        {tuple(sorted((int(a), int(b))))
         for a, b in rng.integers(0, 24, size=(70, 2)) if a != b}
    )
    g = _eigen_digraph(edges)
    for rounds in (1, 2, 3):
        a = wl_colors(g, CFG, rounds=rounds).to_pandas()
        b = wl_colors(
            g, CFG, rounds=rounds, hash_mode="commutative"
        ).to_pandas()

        def partition(df):
            groups = {}
            for u, c in zip(df["url"], df["wl_color"]):
                groups.setdefault(c, set()).add(u)
            return {frozenset(v) for v in groups.values()}

        assert partition(a) == partition(b), rounds


def test_wl_commutative_star_and_cycle():
    from imtag_ray.pipelines.wl import wl_colors

    star = [(0, i) for i in range(1, 8)]
    g = _eigen_digraph(star)
    df = wl_colors(g, CFG, rounds=2, hash_mode="commutative").to_pandas()
    colors = dict(zip(df["url"], df["wl_color"]))
    assert len({colors[f"u{i:03d}"] for i in range(1, 8)}) == 1
    assert colors["u000"] != colors["u001"]
    cyc = [(i, (i + 1) % 6) for i in range(6)]
    g2 = _eigen_digraph(cyc)
    df2 = wl_colors(g2, CFG, rounds=3, hash_mode="commutative").to_pandas()
    assert len(set(df2["wl_color"])) == 1


def test_wl_commutative_block_invariance():
    """Wrapping int64 sums must merge identically across block
    layouts: 1-partition vs 16-partition runs give identical colors
    (the sums overflow 2^64 immediately, so this exercises the wrap
    path on both the numpy partial and Arrow merge sides)."""
    from imtag_ray.config import EngineConfig
    from imtag_ray.pipelines.wl import wl_colors

    rng = np.random.default_rng(59)
    edges = sorted(
        {tuple(sorted((int(a), int(b))))
         for a, b in rng.integers(0, 30, size=(120, 2)) if a != b}
    )
    g = _eigen_digraph(edges)
    a = wl_colors(
        g, EngineConfig(num_partitions=1), rounds=2,
        hash_mode="commutative",
    ).to_pandas()
    b = wl_colors(
        g, EngineConfig(num_partitions=16), rounds=2,
        hash_mode="commutative",
    ).to_pandas()
    assert dict(zip(a["url"], a["wl_color"])) == \
        dict(zip(b["url"], b["wl_color"]))
