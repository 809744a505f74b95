"""Deterministic random walks: engine vs a scalar pure-Python replay
(same splitmix64 choice rule), dead-end termination, seed subsets."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.walks import (
    WALK_STEP_K,
    indexed_adjacency,
    random_walks,
)
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=4)

MASK = (1 << 64) - 1


def sm64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return (x ^ (x >> 31)) & MASK


def u(i: int) -> str:
    return f"u{i:03d}"


def digraph(edges):
    tbl = pa.table(
        {"src_url": [u(a) for a, _ in edges],
         "dst_url": [u(b) for _, b in edges]}
    )
    return build_graph(ray.data.from_arrow(tbl), CFG)


def scalar_walks(graph, length):
    """Pure-Python replay on the graph's own vid space."""
    vdf = graph.vertices.to_pandas().sort_values("vid")
    urls = dict(zip(vdf["vid"], vdf["url"]))
    edf = graph.edges.to_pandas()
    adj = {}
    for s, d in zip(edf["src"], edf["dst"]):
        adj.setdefault(int(s), []).append(int(d))
    for s in adj:
        adj[s].sort()
    rows = set()
    for start in urls:
        cur = int(start)
        rows.add((urls[start], 0, urls[cur]))
        for step in range(length):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            h = sm64((cur + step * WALK_STEP_K) & MASK)
            cur = nbrs[h % len(nbrs)]
            rows.add((urls[start], step + 1, urls[cur]))
    return rows


def engine_walks(graph, length, seeds=None):
    df = random_walks(graph, CFG, length=length, seeds=seeds).to_pandas()
    return set(zip(df["start_url"], df["step"], df["url"]))


CASES = {
    "cycle": [(i, (i + 1) % 5) for i in range(5)],
    "chain_deadend": [(0, 1), (1, 2), (2, 3)],
    "fanout": [(0, i) for i in range(1, 8)] + [(i, 0) for i in range(1, 8)],
}


def _gnp_edges(n=30, seed=3):
    rng = np.random.default_rng(seed)
    m = rng.random((n, n)) < 0.12
    np.fill_diagonal(m, False)
    a, b = np.nonzero(m)
    return list(zip(a.tolist(), b.tolist()))


CASES["gnp"] = _gnp_edges()


@pytest.mark.parametrize("name", sorted(CASES))
def test_walks_match_scalar_replay(name):
    g = digraph(CASES[name])
    assert engine_walks(g, 4) == scalar_walks(g, 4)


def test_walks_deadend_truncates():
    g = digraph(CASES["chain_deadend"])
    rows = engine_walks(g, 10)
    # the u003 dead end: a walk from u000 can take at most 3 steps
    assert max(s for (st, s, _) in rows if st == u(0)) == 3


def test_indexed_adjacency_ranks():
    g = digraph(CASES["fanout"])
    df = indexed_adjacency(g, CFG).to_pandas()
    hub = df[df["deg"] == 7].sort_values("idx")
    assert len(hub) == 7
    assert list(hub["idx"]) == list(range(7))
    # dst-vid order == dst-url order (vids are url-sorted)
    assert list(hub["dst"]) == sorted(hub["dst"])


def test_walks_seed_subset():
    g = digraph(CASES["cycle"])
    seeds = g.vertices.select_columns(["vid"]).filter(
        lambda r: r["vid"] < 2
    )
    rows = engine_walks(g, 3, seeds=seeds)
    full = scalar_walks(g, 3)
    starts = {st for (st, _, _) in rows}
    assert len(starts) == 2
    assert rows == {r for r in full if r[0] in starts}
