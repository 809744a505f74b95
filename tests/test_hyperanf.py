"""HyperANF r-hop neighborhood sizes: both modes vs an exact-replay
reference (BFS ball membership + the same splitmix64 register math) on
directed fixtures, cross-mode equality on a random digraph, and a
relative-error bound vs TRUE ball sizes on a larger graph."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.hyperanf import (
    _ball_coefs,
    _estimate_balls,
    harmonic_centrality_approx,
    hyperanf,
)
from imtag_ray.pipelines.linkpred import _hll_parts
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=4)
P_BITS = 8


def u(i: int) -> str:
    return f"u{i:03d}"


def digraph(edges):
    tbl = pa.table(
        {"src_url": [u(a) for a, _ in edges],
         "dst_url": [u(b) for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG), edges


def reference(edges, radius, p=P_BITS):
    """Exact replay: true ball membership by BFS, then the engine's own
    register hash + estimator over the member-vid sets (vids = rank of
    url among present vertices, matching build_graph's url sort)."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
    m = 1 << p
    out = {}
    for v in verts:
        ball = {v}
        frontier = {v}
        for _ in range(radius):
            nxt = set()
            for w in frontier:
                nxt |= adj[w]
            nxt -= ball
            if not nxt:
                break
            ball |= nxt
            frontier = nxt
        members = np.array(sorted(vid[w] for w in ball), dtype=np.int64)
        j, rho = _hll_parts(members, p)
        reg = np.zeros(m, dtype=np.int64)
        np.maximum.at(reg, j, rho)
        nz = reg != 0
        z = np.ldexp(1.0, -reg[nz]).sum()
        est = _estimate_balls(
            np.array([z]), np.array([int(nz.sum())]), m
        )
        out[u(v)] = int(est[0])
    return out


def engine(graph, mode, radius):
    df = hyperanf(graph, CFG, radius=radius, p=P_BITS, mode=mode).to_pandas()
    return dict(zip(df["url"], df["ball"]))


CASES = {
    "chain": [(i, i + 1) for i in range(8)],
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
    "star_out": [(0, i) for i in range(1, 9)],
    "star_in": [(i, 0) for i in range(1, 9)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("radius", [1, 3])
def test_hyperanf_broadcast_exact_replay(name, radius):
    g, edges = digraph(CASES[name])
    assert engine(g, "broadcast", radius) == reference(edges, radius)


@pytest.mark.parametrize("name", ["chain", "diamond"])
def test_hyperanf_shuffle_exact_replay(name):
    g, edges = digraph(CASES[name])
    assert engine(g, "shuffle", 3) == reference(edges, 3)


def test_hyperanf_modes_agree_random():
    rng = np.random.default_rng(7)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g, _ = digraph(edges)
    assert engine(g, "broadcast", 3) == engine(g, "shuffle", 3)


def test_hyperanf_radius_zero_is_one():
    g, _ = digraph(CASES["chain"])
    assert set(engine(g, "broadcast", 0).values()) == {1}


def _ball_est(members: np.ndarray, p: int) -> int:
    m = 1 << p
    j, rho = _hll_parts(members, p)
    reg = np.zeros(m, dtype=np.int64)
    np.maximum.at(reg, j, rho)
    nz = reg != 0
    z = np.ldexp(1.0, -reg[nz]).sum()
    return int(_estimate_balls(np.array([z]), np.array([int(nz.sum())]), m)[0])


def harmonic_reference(edges, radius, p=P_BITS):
    """Telescoped sum of the per-round integer ball estimates from true
    BFS ball membership — the exact value both modes must produce."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
    coefs = _ball_coefs(radius)
    out = {}
    for v in verts:
        ball, frontier = {v}, {v}
        balls_by_round = []
        for _ in range(radius + 1):
            members = np.array(sorted(vid[w] for w in ball), dtype=np.int64)
            balls_by_round.append(_ball_est(members, p))
            nxt = set().union(*(adj[w] for w in frontier)) - ball
            ball |= nxt
            frontier = nxt
        h = 0.0
        for k in range(radius + 1):
            h = h + coefs[k] * balls_by_round[k]
        out[u(v)] = round(h, 9)
    return out


def engine_harmonic(graph, mode, radius):
    df = harmonic_centrality_approx(
        graph, CFG, radius=radius, p=P_BITS, mode=mode
    ).to_pandas()
    return dict(zip(df["url"], df["harmonic"]))


@pytest.mark.parametrize("name", sorted(CASES))
def test_harmonic_broadcast_exact_replay(name):
    g, edges = digraph(CASES[name])
    got = engine_harmonic(g, "broadcast", 3)
    ref = harmonic_reference(edges, 3)
    assert got.keys() == ref.keys()
    for k in ref:
        assert got[k] == pytest.approx(ref[k], abs=2e-9), k


def test_harmonic_modes_agree_random():
    rng = np.random.default_rng(13)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g, _ = digraph(edges)
    b = engine_harmonic(g, "broadcast", 3)
    s = engine_harmonic(g, "shuffle", 3)
    assert b.keys() == s.keys()
    for k in b:
        assert b[k] == pytest.approx(s[k], abs=2e-9), k


def test_harmonic_chain_values():
    """On the 9-vertex directed chain, balls are exact at p=8 (tiny
    sets hit linear counting): H(v0, r=3) = 1 + 1/2 + 1/3."""
    g, _ = digraph(CASES["chain"])
    got = engine_harmonic(g, "broadcast", 3)
    assert got[u(0)] == pytest.approx(1 + 0.5 + 1 / 3, abs=1e-6)
    assert got[u(8)] == 0.0  # sink: empty forward ball


def test_hyperanf_error_bound_vs_true_balls():
    """~1.04/sqrt(m) standard error: on a 300-vertex random digraph the
    median relative error at p=8 stays inside 3 sigma (~20%)."""
    rng = np.random.default_rng(11)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 300, size=(1200, 2))
         if a != b}
    )
    verts = sorted({a for a, _ in edges} | {b for _, b in edges})
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
    true = {}
    for v in verts:
        ball, frontier = {v}, {v}
        for _ in range(2):
            nxt = set().union(*(adj[w] for w in frontier)) - ball
            if not nxt:
                break
            ball |= nxt
            frontier = nxt
        true[u(v)] = len(ball)
    g, _ = digraph(edges)
    est = engine(g, "broadcast", 2)
    rel = [abs(est[k] - true[k]) / true[k] for k in true]
    assert np.median(rel) < 0.20


# --- neighbourhood function / effective diameter ------------------------


def nf_reference(edges, radius, p=P_BITS):
    """Σ_v per-round integer ball estimates from true BFS membership."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
    nf = [0] * (radius + 1)
    for v in verts:
        ball, frontier = {v}, {v}
        for k in range(radius + 1):
            members = np.array(sorted(vid[w] for w in ball), dtype=np.int64)
            nf[k] += _ball_est(members, p)
            nxt = set().union(*(adj[w] for w in frontier)) - ball
            ball |= nxt
            frontier = nxt
    return nf


def engine_nf(graph, mode, radius):
    from imtag_ray.pipelines.hyperanf import neighbourhood_function

    df = neighbourhood_function(
        graph, CFG, radius=radius, p=P_BITS, mode=mode
    ).to_pandas().sort_values("k")
    return list(df["nf"])


@pytest.mark.parametrize("name", sorted(CASES))
def test_nf_broadcast_exact_replay(name):
    g, edges = digraph(CASES[name])
    assert engine_nf(g, "broadcast", 3) == nf_reference(edges, 3)


def test_nf_modes_agree_random():
    rng = np.random.default_rng(23)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g, _ = digraph(edges)
    assert engine_nf(g, "broadcast", 3) == engine_nf(g, "shuffle", 3)


def test_effective_diameter_chain():
    """9-vertex directed chain, exact balls at p=8: N(k) = Σ_v min(k+1,
    reach_v) is closed-form; the interpolated 0.9-effective diameter
    must equal the hand formula from those integers."""
    from imtag_ray.pipelines.hyperanf import effective_diameter

    g, edges = digraph(CASES["chain"])
    nf = nf_reference(edges, 4)
    t = 0.9 * float(nf[4])
    k0 = next(k for k in range(5) if float(nf[k]) >= t)
    want = (
        0.0 if k0 == 0
        else round((k0 - 1) + (t - nf[k0 - 1]) / (nf[k0] - nf[k0 - 1]), 9)
    )
    got = effective_diameter(g, CFG, radius=4, p=P_BITS).to_pandas()
    assert got["eff_diam"][0] == want


def test_effective_diameter_edgeless_zero():
    from imtag_ray.pipelines.hyperanf import effective_diameter

    tbl = pa.table({"src_url": [u(0)], "dst_url": [u(0)]})
    g = build_graph(ray.data.from_arrow(tbl), CFG)
    got = effective_diameter(g, CFG, radius=3, p=P_BITS).to_pandas()
    assert got["eff_diam"][0] == 0.0
