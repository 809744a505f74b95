"""Sampled-source, depth-bounded betweenness centrality (Brandes,
"A faster algorithm for betweenness centrality", J. Math. Sociol.
2001; sampling per Brandes-Pich 2007) — the standard way to rank
bridge pages on a web graph where exact all-sources betweenness
(O(V·E)) is intractable.

Semantics (deterministic, both modes and the SQL oracle): from the K
lexicographically-smallest source urls, run a forward BFS of at most
``depth`` levels counting shortest paths (sigma), then Brandes'
backward dependency accumulation over the level DAG:

    delta(u) = Σ_{v : u→v, dist(v) = dist(u)+1}
               sigma(u)/sigma(v) · (1 + delta(v))

and bc(v) = Σ_sources delta_s(v) (v ≠ s). Fixing the sources (by url
order) and the depth makes the value a pure function of the graph —
no RNG — which the unrolled SQL oracle replays level by level.
sigma values are exact integers (float64-held); delta sums are the
engine's only order-sensitive float reduction, handled the same way
as the PageRank oracles: both sides round to 9 decimals.

Reference lineage: the forward pass is the same min-monoid frontier
relaxation as traversal.bfs_distances (imtag's update_connectivity
fixpoint, include/imtag.hpp:87); the backward pass generalizes it to
a weighted downstream sum.

Modes:
- ``broadcast``: K×V sigma/dist/delta matrices on the driver; each
  level is one masked scatter over the edge arrays.
- ``shuffle``: BFS state is a (s, v, dist, sigma) Dataset grown one
  level per round (frontier join + bucketed (s,v) sigma sum + tagged
  anti-join against visited); the backward pass walks levels
  descending with one edge join + one bucketed sum per level. No
  driver state beyond per-level scalar counts.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import (
    bucketed_aggregate,
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    dataset_to_numpy,
    table_from_arrays,
)

_EMPTY = pa.table(
    {"url": pa.array([], pa.string()), "bc": pa.array([], pa.float64())}
)


def _pick_mode(graph: Graph, cfg: EngineConfig) -> str:
    if cfg.vertex_state != "auto":
        return cfg.vertex_state
    return (
        "broadcast"
        if graph.num_vertices <= cfg.broadcast_max_vertices
        and graph.num_edges <= cfg.broadcast_max_edges
        else "shuffle"
    )


def _seed_vids(graph: Graph, k: int) -> np.ndarray:
    rows = (
        graph.vertices.select_columns(["vid", "url"])
        .sort("url")
        .limit(k)
        .take_all()
    )
    return np.array([r["vid"] for r in rows], dtype=np.int64)


def betweenness_approx(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    n_sources: int = 8,
    depth: int = 6,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, bc): depth-bounded Brandes betweenness summed
    over the ``n_sources`` lexicographically-smallest source vertices,
    rounded to 9 decimals. EVERY vertex gets a row (0.0 when it lies
    on no counted shortest path)."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        return _bc_shuffle(graph, cfg, n_sources, depth)
    return _bc_broadcast(graph, cfg, n_sources, depth)


def _bc_broadcast(
    graph: Graph, cfg: EngineConfig, n_sources: int, depth: int
) -> "ray.data.Dataset":
    V = graph.num_vertices
    seeds = _seed_vids(graph, n_sources)
    K = len(seeds)
    e = dataset_to_numpy(graph.edges, "src", "dst")
    src = e["src"].astype(np.int64)
    dst = e["dst"].astype(np.int64)

    dist = np.full((K, V), -1, dtype=np.int64)
    sigma = np.zeros((K, V), dtype=np.float64)
    dist[np.arange(K), seeds] = 0
    sigma[np.arange(K), seeds] = 1.0
    for d in range(depth):
        # relax: every edge u→v with dist(u)=d contributes sigma(u)
        # to v if v is new (dist -1) or already at level d+1
        on = dist[:, src] == d  # K×E
        if not on.any():
            break
        new_or_next = (dist[:, dst] == -1) | (dist[:, dst] == d + 1)
        m = on & new_or_next
        ks, es = np.nonzero(m)
        dist[ks, dst[es]] = d + 1
        np.add.at(sigma, (ks, dst[es]), sigma[ks, src[es]])

    delta = np.zeros((K, V), dtype=np.float64)
    for d in range(depth, 0, -1):
        # u at level d-1 → v at level d: accumulate dependency on u
        m = (dist[:, src] == d - 1) & (dist[:, dst] == d)
        ks, es = np.nonzero(m)
        if len(ks) == 0:
            continue
        u, v = src[es], dst[es]
        contrib = sigma[ks, u] / sigma[ks, v] * (1.0 + delta[ks, v])
        np.add.at(delta, (ks, u), contrib)
    delta[np.arange(K), seeds] = 0.0  # v ≠ s
    bc = np.round(delta.sum(axis=0), 9)
    ref = ray.put(bc)

    def attach(t: pa.Table, _r=ref) -> pa.Table:
        b = ray.get(_r)
        return pa.table(
            {"url": t.column("url"),
             "bc": pa.array(b[col_np(t, "vid")], pa.float64())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _bc_shuffle(
    graph: Graph, cfg: EngineConfig, n_sources: int, depth: int
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)
    seeds = _seed_vids(graph, n_sources)
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))

    # levels[d]: Dataset (s, v, sigma) of vertices first reached at
    # depth d from source s; visited: (s, v) tagged accumulator
    lvl0 = ray.data.from_arrow(
        pa.table(
            {"s": pa.array(seeds, pa.int64()),
             "v": pa.array(seeds, pa.int64()),
             "sigma": pa.array(np.ones(len(seeds)), pa.float64())}
        )
    ).materialize()
    levels = [lvl0]
    visited = lvl0.select_columns(["s", "v"]).materialize()
    for d in range(depth):
        if edges is None:
            break
        frontier = levels[-1]
        if frontier.count() == 0:
            break
        # propagate sigma along edges: (s, dst, sigma) summed per (s,dst)
        msgs = compact_nonempty(
            edges.join(
                frontier, join_type="inner", num_partitions=P,
                on=("src",), right_on=("v",),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"s": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "sigma": pa.array([], pa.float64())}
                    )
                    if t.num_rows == 0
                    else table_from_arrays(
                        s=col_np(t, "s").astype(np.int64),
                        v=col_np(t, "dst").astype(np.int64),
                        sigma=col_np(t, "sigma").astype(np.float64),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if msgs is None:
            break
        summed = compact_nonempty(
            bucketed_sum_aggregate(
                msgs, key_cols=["s", "v"], sum_cols=["sigma"],
                num_buckets=n_buckets,
            )
        )
        if summed is None:
            break
        # drop already-visited (s, v): tagged union + bucketed max
        tagged = summed.map_batches(
            lambda t: table_from_arrays(
                s=col_np(t, "s").astype(np.int64),
                v=col_np(t, "v").astype(np.int64),
                sigma=col_np(t, "sigma").astype(np.float64),
                tag=np.zeros(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        ).union(
            visited.map_batches(
                lambda t: table_from_arrays(
                    s=col_np(t, "s").astype(np.int64),
                    v=col_np(t, "v").astype(np.int64),
                    sigma=np.zeros(t.num_rows, dtype=np.float64),
                    tag=np.ones(t.num_rows, dtype=np.int64),
                ),
                batch_format="pyarrow",
            )
        )
        merged = compact_nonempty(
            bucketed_aggregate(
                tagged, key_cols=["s", "v"],
                aggs=[("sigma", "sum", "sigma"), ("tag", "max", "tag")],
                num_buckets=n_buckets,
            )
        )
        if merged is None:
            break
        nxt = compact_nonempty(
            merged.map_batches(
                lambda t: (
                    pa.table(
                        {"s": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "sigma": pa.array([], pa.float64())}
                    )
                    if t.num_rows == 0
                    else table_from_arrays(
                        s=col_np(t, "s").astype(np.int64),
                        v=col_np(t, "v").astype(np.int64),
                        sigma=col_np(t, "sigma").astype(np.float64),
                    ).filter(pc.equal(t.column("tag"), 0))
                ),
                batch_format="pyarrow",
            )
        )
        if nxt is None:
            break
        nxt = nxt.materialize()
        levels.append(nxt)
        visited = visited.union(
            nxt.select_columns(["s", "v"])
        ).materialize()

    # backward pass: delta per (s, v), levels descending
    delta = None  # Dataset (s, v, delta) for the level BELOW (deeper)
    acc = []  # per-level (s, v, delta) results
    for d in range(len(levels) - 1, 0, -1):
        cur = levels[d]  # (s, v, sigma) at depth d
        if delta is not None:
            cur_d = compact_nonempty(
                cur.join(
                    delta.rename_columns({"v": "dv", "s": "ds"}),
                    join_type="left_outer", num_partitions=P,
                    on=("s", "v"), right_on=("ds", "dv"),
                ).map_batches(_fill_delta, batch_format="pyarrow")
            )
        else:
            cur_d = cur.map_batches(
                lambda t: table_from_arrays(
                    s=col_np(t, "s").astype(np.int64),
                    v=col_np(t, "v").astype(np.int64),
                    sigma=col_np(t, "sigma").astype(np.float64),
                    delta=np.zeros(t.num_rows, dtype=np.float64),
                ),
                batch_format="pyarrow",
            )
        cur_d = compact_nonempty(cur_d)
        if cur_d is None:
            delta = None
            continue
        cur_d = cur_d.materialize()
        acc.append(cur_d.select_columns(["s", "v", "delta"]))
        # contributions to the previous level (d-1): join edges by dst
        prev = levels[d - 1]
        up = compact_nonempty(
            edges.join(
                cur_d, join_type="inner", num_partitions=P,
                on=("dst",), right_on=("v",),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"s": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "part": pa.array([], pa.float64())}
                    )
                    if t.num_rows == 0
                    else table_from_arrays(
                        s=col_np(t, "s").astype(np.int64),
                        v=col_np(t, "src").astype(np.int64),
                        part=(1.0 + col_np(t, "delta").astype(np.float64))
                        / col_np(t, "sigma").astype(np.float64),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if up is None:
            delta = None
            continue
        up = compact_nonempty(
            bucketed_sum_aggregate(
                up, key_cols=["s", "v"], sum_cols=["part"],
                num_buckets=n_buckets,
            )
        )
        if up is None:
            delta = None
            continue
        # delta(u) = sigma(u) · Σ parts — attach sigma(u) via the
        # previous level's rows (only vertices AT level d-1 count)
        delta = compact_nonempty(
            prev.join(
                up.rename_columns({"v": "uv", "s": "us"}),
                join_type="inner", num_partitions=P,
                on=("s", "v"), right_on=("us", "uv"),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"s": pa.array([], pa.int64()),
                         "v": pa.array([], pa.int64()),
                         "delta": pa.array([], pa.float64())}
                    )
                    if t.num_rows == 0
                    else table_from_arrays(
                        s=col_np(t, "s").astype(np.int64),
                        v=col_np(t, "v").astype(np.int64),
                        delta=col_np(t, "sigma").astype(np.float64)
                        * col_np(t, "part").astype(np.float64),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if delta is not None:
            delta = delta.materialize()

    # bc(v) = Σ over sources and levels (the source rows, level 0,
    # were never added to acc) — one bucketed sum, zero-filled over V
    verts = graph.vertices.select_columns(["vid", "url"])
    if not acc:
        return verts.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "bc": pa.array(np.zeros(t.num_rows), pa.float64())}
            ),
            batch_format="pyarrow",
        )
    u = acc[0]
    for a in acc[1:]:
        u = u.union(a)
    total = compact_nonempty(
        bucketed_sum_aggregate(
            u.map_batches(
                lambda t: table_from_arrays(
                    v=col_np(t, "v").astype(np.int64),
                    delta=col_np(t, "delta").astype(np.float64),
                ),
                batch_format="pyarrow",
            ),
            key_cols=["v"], sum_cols=["delta"], num_buckets=n_buckets,
        )
    )
    if total is None:
        return verts.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "bc": pa.array(np.zeros(t.num_rows), pa.float64())}
            ),
            batch_format="pyarrow",
        )
    joined = verts.join(
        total, join_type="left_outer", num_partitions=P,
        on=("vid",), right_on=("v",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        dv = np.asarray(
            pc.fill_null(t.column("delta").combine_chunks(), 0.0)
        ).astype(np.float64)
        return pa.table(
            {"url": t.column("url"),
             "bc": pa.array(np.round(dv, 9), pa.float64())}
        )

    return joined.map_batches(fin, batch_format="pyarrow").materialize()


def _fill_delta(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return pa.table(
            {"s": pa.array([], pa.int64()),
             "v": pa.array([], pa.int64()),
             "sigma": pa.array([], pa.float64()),
             "delta": pa.array([], pa.float64())}
        )
    dv = np.asarray(
        pc.fill_null(t.column("delta").combine_chunks(), 0.0)
    ).astype(np.float64)
    return table_from_arrays(
        s=col_np(t, "s").astype(np.int64),
        v=col_np(t, "v").astype(np.int64),
        sigma=col_np(t, "sigma").astype(np.float64),
        delta=dv,
    )
