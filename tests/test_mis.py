"""Deterministic Luby MIS: both modes vs a scalar replay of the same
algorithm, independence + maximality properties at convergence, and
forced-shuffle ≡ broadcast equality."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.mis import _priorities, maximal_independent_set
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=4)
SHUF = EngineConfig(
    num_partitions=4, broadcast_max_vertices=0, broadcast_max_edges=0
)


def u(i: int) -> str:
    return f"u{i:03d}"


def digraph(edges):
    tbl = pa.table(
        {"src_url": [u(a) for a, _ in edges],
         "dst_url": [u(b) for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG)


def reference(edges, rounds):
    """Scalar replay: same priorities, same round rule."""
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    nbrs = {v: set() for v in verts}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    status = {v: -1 for v in verts}
    for k in range(rounds):
        alive = [v for v in verts if status[v] == -1]
        if not alive:
            break
        pri = {
            v: int(_priorities(np.array([vid[v]], dtype=np.int64), k)[0])
            for v in alive
        }
        winners = [
            v for v in alive
            if all(
                status[w] != -1 or pri[v] < pri[w] for w in nbrs[v]
            )
        ]
        removed = set()
        for v in winners:
            removed |= {w for w in nbrs[v] if status[w] == -1}
        removed -= set(winners)
        for v in winners:
            status[v] = 1
        for v in removed:
            status[v] = 0
    return {u(v): s for v, s in status.items()}


def engine(g, mode, rounds):
    df = maximal_independent_set(g, CFG, rounds=rounds, mode=mode).to_pandas()
    return dict(zip(df["url"], df["status"]))


CASES = {
    "chain": [(i, i + 1) for i in range(8)],
    "cycle": [(i, (i + 1) % 6) for i in range(6)],
    "star": [(0, i) for i in range(1, 9)],
    "k4_pendant": [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)],
    "two_isolated_pairs": [(0, 1), (2, 3)],
}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("rounds", [1, 3])
def test_mis_broadcast_exact_replay(name, rounds):
    g = digraph(CASES[name])
    assert engine(g, "broadcast", rounds) == reference(CASES[name], rounds)


@pytest.mark.parametrize("name", ["chain", "k4_pendant"])
def test_mis_shuffle_exact_replay(name):
    g = digraph(CASES[name])
    assert engine(g, "shuffle", 3) == reference(CASES[name], 3)


def test_mis_modes_agree_random():
    rng = np.random.default_rng(31)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g = digraph(edges)
    assert engine(g, "broadcast", 4) == engine(g, "shuffle", 4)


def test_mis_forced_shuffle_config_gate():
    """vertex_state='auto' with zeroed gates must take the shuffle
    path and still match broadcast."""
    edges = CASES["k4_pendant"]
    g = digraph(edges)
    got = maximal_independent_set(g, SHUF, rounds=3).to_pandas()
    want = engine(g, "broadcast", 3)
    assert dict(zip(got["url"], got["status"])) == want


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_mis_converged_is_independent_and_maximal(mode):
    rng = np.random.default_rng(47)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 60, size=(240, 2))
         if a != b}
    )
    g = digraph(edges)
    st = engine(g, mode, None)  # run to convergence
    assert -1 not in st.values()
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(u(a), set()).add(u(b))
        nbrs.setdefault(u(b), set()).add(u(a))
    mis = {v for v, s in st.items() if s == 1}
    for v in mis:  # independent
        assert not (nbrs.get(v, set()) & mis), v
    for v, s in st.items():  # maximal: every 0 has a MIS neighbor
        if s == 0:
            assert nbrs.get(v, set()) & mis, v


def test_mis_isolated_vertices_join():
    g = digraph([(0, 0), (1, 2)])  # self-loop → u0 isolated
    st = engine(g, "broadcast", None)
    assert st[u(0)] == 1


# --- greedy coloring (iterated Luby MIS) --------------------------------


def coloring_reference(edges, colors, rounds):
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    nbrs = {v: set() for v in verts}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    color = {v: -1 for v in verts}
    for c in range(colors):
        status = {v: (-1 if color[v] == -1 else -2) for v in verts}
        for k in range(rounds):
            alive = [v for v in verts if status[v] == -1]
            if not alive:
                break
            rnd = c * rounds + k
            pri = {
                v: int(
                    _priorities(np.array([vid[v]], dtype=np.int64), rnd)[0]
                )
                for v in alive
            }
            winners = [
                v for v in alive
                if all(status[w] != -1 or pri[v] < pri[w] for w in nbrs[v])
            ]
            removed = set()
            for v in winners:
                removed |= {w for w in nbrs[v] if status[w] == -1}
            removed -= set(winners)
            for v in winners:
                status[v] = 1
            for v in removed:
                status[v] = 0
        for v in verts:
            if status[v] == 1:
                color[v] = c
    return {u(v): c for v, c in color.items()}


def engine_coloring(g, mode, colors, rounds):
    from imtag_ray.pipelines.mis import greedy_coloring

    df = greedy_coloring(
        g, CFG, colors=colors, rounds_per_color=rounds, mode=mode
    ).to_pandas()
    return dict(zip(df["url"], df["color"]))


@pytest.mark.parametrize("name", sorted(CASES))
def test_coloring_broadcast_exact_replay(name):
    g = digraph(CASES[name])
    got = engine_coloring(g, "broadcast", 3, 2)
    assert got == coloring_reference(CASES[name], 3, 2)


def test_coloring_shuffle_matches_broadcast():
    rng = np.random.default_rng(53)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g = digraph(edges)
    assert engine_coloring(g, "broadcast", 3, 2) == engine_coloring(
        g, "shuffle", 3, 2
    )


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_coloring_is_proper(mode):
    rng = np.random.default_rng(59)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 60, size=(200, 2))
         if a != b}
    )
    g = digraph(edges)
    col = engine_coloring(g, mode, 4, 3)
    for a, b in edges:
        ca, cb = col[u(a)], col[u(b)]
        if ca >= 0:
            assert ca != cb or cb == -1 or a == b, (a, b, ca, cb)


def test_coloring_chain_fully_colored():
    """A chain is 2-colorable; 3 colors × 3 rounds must color it all."""
    g = digraph(CASES["chain"])
    col = engine_coloring(g, "broadcast", 3, 3)
    assert -1 not in col.values()
    assert max(col.values()) <= 2


# --- handshake maximal matching -----------------------------------------


def matching_reference(edges, rounds):
    verts = sorted({a for a, _ in edges} | {b for _, b in edges}, key=u)
    vid = {v: i for i, v in enumerate(verts)}
    nbrs = {v: set() for v in verts}
    for a, b in edges:
        if a != b:
            nbrs[a].add(b)
            nbrs[b].add(a)
    alive = set(verts)
    pairs = set()
    for k in range(rounds):
        pri = {
            v: int(_priorities(np.array([vid[v]], dtype=np.int64), k)[0])
            for v in verts
        }
        target = {}
        for v in alive:
            cand = [w for w in nbrs[v] if w in alive]
            if cand:
                target[v] = min(cand, key=lambda w: (pri[w], vid[w]))
        new = {
            (min(a, b), max(a, b))
            for a, b in target.items()
            if target.get(b) == a
        }
        pairs |= new
        for a, b in new:
            alive.discard(a)
            alive.discard(b)
    return {(u(a), u(b)) for a, b in pairs}


def engine_matching(g, mode, rounds):
    from imtag_ray.pipelines.matching import maximal_matching

    df = maximal_matching(g, CFG, rounds=rounds, mode=mode).to_pandas()
    return {(r.url_a, r.url_b) for r in df.itertuples()}


@pytest.mark.parametrize("name", sorted(CASES))
@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_matching_exact_replay(name, mode):
    g = digraph(CASES[name])
    assert engine_matching(g, mode, 3) == matching_reference(CASES[name], 3)


def test_matching_modes_agree_random():
    rng = np.random.default_rng(61)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(160, 2))
         if a != b}
    )
    g = digraph(edges)
    assert engine_matching(g, "broadcast", 4) == engine_matching(
        g, "shuffle", 4
    )


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_matching_converged_is_maximal_matching(mode):
    rng = np.random.default_rng(67)
    edges = list(
        {(int(a), int(b)) for a, b in rng.integers(0, 50, size=(200, 2))
         if a != b}
    )
    g = digraph(edges)
    got = engine_matching(g, mode, None)
    seen = {}
    for a, b in got:
        for x in (a, b):
            assert x not in seen, x  # a matching: degree ≤ 1
            seen[x] = True
    # maximal: no edge with both endpoints unmatched
    for a, b in edges:
        if a != b:
            assert u(a) in seen or u(b) in seen, (a, b)
