"""Deterministic Luby maximal independent set over the undirected
graph (Luby, "A simple parallel algorithm for the maximal independent
set problem", SIAM J. Comput. 1986) — the classic symmetry-breaking
primitive a distributed engine needs for scheduling / coloring /
landmark selection on a web graph.

Luby's coin flips are replaced by a REPLAYABLE priority: round k gives
vertex v priority splitmix64(v + k·K) (K = the splitmix64 golden-gamma
increment, the same constant pipelines/walks.py uses for its next-hop
choice). splitmix64 is a bijection and v + k·K is injective in v for a
fixed k, so priorities are DISTINCT within every round — no
tie-breaking rule is needed and the SQL oracle replays the run
bit-exactly via the HUGEINT limb-mulmod expression the walks oracle
already uses. A round:

  winners_k  = { v alive : pri_k(v) < min over alive neighbors }
               (vacuously true for isolated alive vertices)
  removed_k  = alive neighbors of winners_k
  alive_k+1  = alive_k − winners_k − removed_k

Reference lineage: this generalizes imtag's union-find merge-table
symmetry breaking (src/imtag.cpp disjoint_set lt_cmp — the canonical
smaller-label-wins rule) from per-row label merges to whole-graph
round-based selection.

Modes follow the engine convention:

- ``broadcast`` (V ≤ cfg.broadcast_max_vertices): alive/status live in
  driver numpy arrays; each round is two vectorized scatters
  (np.minimum.at for neighbor-min priorities, boolean scatter for
  removals) over the alive-alive edge arrays.
- ``shuffle``: alive vertices and alive-alive edges are Datasets; one
  round = one bucketed neighbor-min aggregation + one left-outer join
  (winners), one edge semi-join (removals), one tagged-union bucketed
  max (alive subtraction), two edge semi-joins (pruning) — no driver
  state beyond per-round scalar counts; priorities are RECOMPUTED from
  vids inside each batch, so no priority column ever shuffles.

``rounds=R`` runs exactly R rounds and labels leftovers status=-1
(fixed-round semantics, what the unrolled SQL oracle replays);
``rounds=None`` runs to convergence (alive empty) within
cfg.max_iterations and raises otherwise. Output: (url, status) with
1 = in the MIS, 0 = dominated (a neighbor won), -1 = undecided.
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
    col_np,
    compact_nonempty,
    dataset_to_numpy,
    table_from_arrays,
)
from .linkpred import _splitmix64

#: round stride for the priority hash input (splitmix64 golden gamma,
#: the constant the walks next-hop hash already uses)
ROUND_K = np.uint64(0x9E3779B97F4A7C15)

_EMPTY = pa.table(
    {"url": pa.array([], pa.string()), "status": pa.array([], pa.int64())}
)


def _priorities(vids: np.ndarray, rnd: int) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = vids.astype(np.uint64) + np.uint64(rnd) * ROUND_K
    return _splitmix64(x)


def _pick_mode(graph: Graph, cfg: EngineConfig) -> str:
    if cfg.vertex_state != "auto":
        return cfg.vertex_state
    return (
        "broadcast"
        if graph.num_vertices <= cfg.broadcast_max_vertices
        and graph.num_edges <= cfg.broadcast_max_edges
        else "shuffle"
    )


def maximal_independent_set(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, status): deterministic Luby MIS over the
    graph's canonical edge rows treated as undirected. status 1 = in
    the MIS, 0 = dominated, -1 = undecided (fixed-round runs only)."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        return _mis_shuffle(graph, cfg, rounds)
    return _mis_broadcast(graph, cfg, rounds)


def _mis_broadcast(
    graph: Graph, cfg: EngineConfig, rounds: int | None
) -> "ray.data.Dataset":
    V = graph.num_vertices
    e = dataset_to_numpy(graph.edges, "src", "dst")
    # both directions once; self-loops never block their own vertex
    keep = e["src"] != e["dst"]
    src = np.concatenate([e["src"][keep], e["dst"][keep]]).astype(np.int64)
    dst = np.concatenate([e["dst"][keep], e["src"][keep]]).astype(np.int64)

    status = np.full(V, -1, dtype=np.int64)
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for k in range(max_rounds):
        alive = status == -1
        if not alive.any():
            converged = True
            break
        pri = _priorities(np.arange(V, dtype=np.int64), k)
        live = alive[src] & alive[dst]
        s, d = src[live], dst[live]
        nbr_min = np.full(V, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(nbr_min, s, pri[d])
        winners = alive & (pri < nbr_min)
        # removed = alive neighbors of winners
        removed = np.zeros(V, dtype=bool)
        removed[d[winners[s]]] = True
        removed &= alive & ~winners
        status[winners] = 1
        status[removed] = 0
    if rounds is None and not converged and (status == -1).any():
        raise RuntimeError(
            f"mis (broadcast) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    ref = ray.put(status)

    def attach(t: pa.Table, _r=ref) -> pa.Table:
        st = ray.get(_r)
        return pa.table(
            {"url": t.column("url"),
             "status": pa.array(st[col_np(t, "vid")], pa.int64())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


_EMPTY_VID = pa.table({"vid": pa.array([], pa.int64())})
_EMPTY_E = pa.table(
    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
)


def _clean_edges(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:  # post-join empties are schema-less
        return _EMPTY_E
    s = col_np(t, "src").astype(np.int64)
    d = col_np(t, "dst").astype(np.int64)
    m = s != d
    return table_from_arrays(src=s[m], dst=d[m])


def clean_edge_ds(edges_ds: "ray.data.Dataset"):
    """Canonical (src, dst) edge Dataset, self-loops dropped, empty
    blocks compacted (None = no edges)."""
    return compact_nonempty(
        edges_ds.select_columns(["src", "dst"]).map_batches(
            _clean_edges, batch_format="pyarrow"
        )
    )


def subtract_vids(alive, gone, n_buckets: int):
    """alive − gone over (vid) Datasets via the engine's tagged-union
    bucketed-max anti-join; returns a compacted materialized Dataset or
    None when empty. Both inputs must be compacted."""

    def tag(v: int):
        def fn(t: pa.Table, _v=v) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     "tag": pa.array([], pa.int64())}
                )
            return table_from_arrays(
                vid=col_np(t, "vid").astype(np.int64),
                tag=np.full(t.num_rows, _v, dtype=np.int64),
            )
        return fn

    tagged = alive.map_batches(tag(0), batch_format="pyarrow").union(
        gone.map_batches(tag(1), batch_format="pyarrow")
    )
    survivors = compact_nonempty(
        bucketed_aggregate(
            tagged, key_cols=["vid"], aggs=[("tag", "max", "tag")],
            num_buckets=n_buckets,
        )
    )
    if survivors is None:
        return None
    out = compact_nonempty(
        survivors.map_batches(
            lambda t: (
                _EMPTY_VID if t.num_rows == 0
                else t.filter(pc.equal(t.column("tag"), 0)).select(["vid"])
            ),
            batch_format="pyarrow",
        )
    )
    return out.materialize() if out is not None else None


def prune_edges(edges, alive, P: int):
    """Edges restricted to alive-alive endpoints (two semi-joins with a
    compaction between — Ray 2.49 fused JoinOperators deadlock on small
    CPU budgets). alive must be compacted non-None."""
    if edges is None:
        return None
    edges = compact_nonempty(
        edges.join(
            alive, join_type="inner", num_partitions=P,
            on=("src",), right_on=("vid",),
        ).map_batches(_clean_edges, batch_format="pyarrow")
    )
    if edges is None:
        return None
    return compact_nonempty(
        edges.join(
            alive, join_type="inner", num_partitions=P,
            on=("dst",), right_on=("vid",),
        ).map_batches(_clean_edges, batch_format="pyarrow")
    )


def luby_round(alive, edges, rnd: int, P: int, n_buckets: int):
    """ONE Luby round over compacted (vid) alive + (src, dst) edges
    (both already restricted to alive): → (winners, removed, new_alive,
    new_edges), each a compacted Dataset or None. Priorities are
    splitmix64(vid + rnd·K), recomputed per batch — nothing but vids
    ever shuffles. See the module docstring for the round rule."""
    if alive is None:
        return None, None, None, None
    if edges is None:
        # every alive vertex is isolated: all win
        return alive, None, None, None

    # neighbor-min priority per alive vertex: emit both directions,
    # bucketed min. uint64→int64 view is NOT order-preserving, so
    # priorities are shifted to the signed domain first (x ^ 2^63 maps
    # uint64 order to int64 order) before Arrow's int64 min.
    def nbr_terms_signed(t: pa.Table, _k=rnd) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()),
                 "npri": pa.array([], pa.int64())}
            )
        s = col_np(t, "src").astype(np.int64)
        d = col_np(t, "dst").astype(np.int64)
        vid = np.concatenate([s, d])
        pri = np.concatenate([_priorities(d, _k), _priorities(s, _k)])
        npri = (pri ^ np.uint64(1 << 63)).view(np.int64)
        return table_from_arrays(vid=vid, npri=npri)

    nbr_min = compact_nonempty(
        bucketed_aggregate(
            edges.map_batches(nbr_terms_signed, batch_format="pyarrow"),
            key_cols=["vid"], aggs=[("npri", "min", "npri")],
            num_buckets=n_buckets,
        )
    )
    if nbr_min is None:
        winners = alive
    else:
        joined = alive.join(
            nbr_min, join_type="left_outer", num_partitions=P,
            on=("vid",), right_on=("vid",),
        )

        def pick(t: pa.Table, _k=rnd) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY_VID
            vid = col_np(t, "vid").astype(np.int64)
            npri_col = t.column("npri").combine_chunks()
            isnull = np.asarray(pc.is_null(npri_col))
            npri = np.asarray(pc.fill_null(npri_col, 0)).astype(np.int64)
            own = (_priorities(vid, _k) ^ np.uint64(1 << 63)).view(np.int64)
            win = isnull | (own < npri)
            return table_from_arrays(vid=vid[win])

        winners = compact_nonempty(
            joined.map_batches(pick, batch_format="pyarrow")
        )
    if winners is None:
        # impossible with distinct priorities unless alive is empty
        return None, None, alive, edges
    winners = winners.materialize()

    # removed = alive neighbors of winners (two directed semi-joins)
    halves = []
    for a, b in (("src", "dst"), ("dst", "src")):
        h = compact_nonempty(
            edges.join(
                winners, join_type="inner", num_partitions=P,
                on=(a,), right_on=("vid",),
            ).map_batches(
                lambda t, _b=b: (
                    _EMPTY_VID if t.num_rows == 0
                    else table_from_arrays(vid=col_np(t, _b).astype(np.int64))
                ),
                batch_format="pyarrow",
            )
        )
        if h is not None:
            halves.append(h)
    removed = None
    if halves:
        u = halves[0]
        for h in halves[1:]:
            u = u.union(h)
        removed = compact_nonempty(
            bucketed_aggregate(
                u.map_batches(
                    lambda t: table_from_arrays(
                        vid=col_np(t, "vid").astype(np.int64),
                        one=np.ones(t.num_rows, dtype=np.int64),
                    ),
                    batch_format="pyarrow",
                ),
                key_cols=["vid"], aggs=[("one", "max", "one")],
                num_buckets=n_buckets,
            )
        )
    if removed is not None:
        removed = removed.select_columns(["vid"]).materialize()

    gone = winners if removed is None else winners.union(removed)
    new_alive = subtract_vids(alive, gone, n_buckets)
    new_edges = (
        prune_edges(edges, new_alive, P) if new_alive is not None else None
    )
    return winners, removed, new_alive, new_edges


def _mis_shuffle(
    graph: Graph, cfg: EngineConfig, rounds: int | None
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)
    edges = clean_edge_ds(graph.edges)
    # alive is ALWAYS compacted (None = empty): every join below uses
    # it as a side, and Ray 2.49 joins lose the schema on empty blocks
    alive = compact_nonempty(graph.vertices.select_columns(["vid"]))
    if alive is not None:
        alive = alive.materialize()
    decided = []  # list of (vid, status) Datasets
    max_rounds = rounds if rounds is not None else cfg.max_iterations

    def with_status(ds, v: int):
        return ds.map_batches(
            lambda t, _v=v: table_from_arrays(
                vid=col_np(t, "vid").astype(np.int64),
                status=np.full(t.num_rows, _v, dtype=np.int64),
            ),
            batch_format="pyarrow",
        )

    converged = False
    for k in range(max_rounds):
        if alive is None:
            converged = True
            break
        winners, removed, alive, edges = luby_round(
            alive, edges, k, P, n_buckets
        )
        if winners is not None:
            decided.append(with_status(winners, 1))
        if removed is not None:
            decided.append(with_status(removed, 0))
    else:
        converged = alive is None
    if rounds is None and not converged:
        raise RuntimeError(
            f"mis (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )

    # assemble (vid, status): decided rows + leftovers at -1
    if decided:
        dec = decided[0]
        for d in decided[1:]:
            dec = dec.union(d)
        dec = compact_nonempty(dec)
    else:
        dec = None
    verts = graph.vertices.select_columns(["vid", "url"])
    if dec is None:
        return verts.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "status": pa.array(
                     np.full(t.num_rows, -1, dtype=np.int64), pa.int64()
                 )}
            ),
            batch_format="pyarrow",
        )
    out = verts.join(
        dec, join_type="left_outer", num_partitions=P,
        on=("vid",), right_on=("vid",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY
        st_col = t.column("status").combine_chunks()
        st = np.asarray(pc.fill_null(st_col, -1)).astype(np.int64)
        return pa.table(
            {"url": t.column("url"), "status": pa.array(st, pa.int64())}
        )

    return out.map_batches(fin, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# greedy distributed graph coloring (iterated Luby MIS)
# ---------------------------------------------------------------------------

_EMPTY_COLOR = pa.table(
    {"url": pa.array([], pa.string()), "color": pa.array([], pa.int64())}
)


def greedy_coloring(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    colors: int = 3,
    rounds_per_color: int = 2,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, color): greedy distributed coloring by iterated
    Luby MIS (the Jones-Plassmann family): color c = the MIS found by
    ``rounds_per_color`` Luby rounds over the still-uncolored subgraph
    (round priority index = c·rounds_per_color + k, so every round's
    priorities differ). Vertices dominated within a color RETURN to
    the pool for the next color; vertices uncolored after ``colors``
    colors get -1 (fixed-budget semantics — what the unrolled SQL
    oracle replays). Adjacent vertices never share a color ≥ 0 (each
    color class is an independent set by construction)."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY_COLOR)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        return _coloring_shuffle(graph, cfg, colors, rounds_per_color)
    return _coloring_broadcast(graph, cfg, colors, rounds_per_color)


def _coloring_broadcast(
    graph: Graph, cfg: EngineConfig, colors: int, rounds_per_color: int
) -> "ray.data.Dataset":
    V = graph.num_vertices
    e = dataset_to_numpy(graph.edges, "src", "dst")
    keep = e["src"] != e["dst"]
    src = np.concatenate([e["src"][keep], e["dst"][keep]]).astype(np.int64)
    dst = np.concatenate([e["dst"][keep], e["src"][keep]]).astype(np.int64)

    color = np.full(V, -1, dtype=np.int64)
    for c in range(colors):
        # status within this color: -1 alive, 1 won (→ color c), 0
        # dominated (returns to pool next color)
        status = np.where(color == -1, -1, -2)
        for k in range(rounds_per_color):
            alive = status == -1
            if not alive.any():
                break
            rnd = c * rounds_per_color + k
            pri = _priorities(np.arange(V, dtype=np.int64), rnd)
            live = alive[src] & alive[dst]
            s, d = src[live], dst[live]
            nbr_min = np.full(V, np.iinfo(np.uint64).max, dtype=np.uint64)
            np.minimum.at(nbr_min, s, pri[d])
            winners = alive & (pri < nbr_min)
            removed = np.zeros(V, dtype=bool)
            removed[d[winners[s]]] = True
            removed &= alive & ~winners
            status[winners] = 1
            status[removed] = 0
        color[status == 1] = c
    ref = ray.put(color)

    def attach(t: pa.Table, _r=ref) -> pa.Table:
        cv = ray.get(_r)
        return pa.table(
            {"url": t.column("url"),
             "color": pa.array(cv[col_np(t, "vid")], pa.int64())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _coloring_shuffle(
    graph: Graph, cfg: EngineConfig, colors: int, rounds_per_color: int
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)
    base_edges = clean_edge_ds(graph.edges)
    if base_edges is not None:
        base_edges = base_edges.materialize()
    uncolored = compact_nonempty(graph.vertices.select_columns(["vid"]))
    if uncolored is not None:
        uncolored = uncolored.materialize()
    colored_parts = []  # (vid, color) Datasets
    for c in range(colors):
        if uncolored is None:
            break
        alive = uncolored
        edges = (
            prune_edges(base_edges, uncolored, P)
            if base_edges is not None else None
        )
        color_winners = []
        for k in range(rounds_per_color):
            if alive is None:
                break
            winners, _removed, alive, edges = luby_round(
                alive, edges, c * rounds_per_color + k, P, n_buckets
            )
            if winners is not None:
                color_winners.append(winners)
        if not color_winners:
            continue
        won = color_winners[0]
        for wds in color_winners[1:]:
            won = won.union(wds)
        won = compact_nonempty(won)
        if won is None:
            continue
        won = won.materialize()
        colored_parts.append(
            won.map_batches(
                lambda t, _c=c: table_from_arrays(
                    vid=col_np(t, "vid").astype(np.int64),
                    color=np.full(t.num_rows, _c, dtype=np.int64),
                ),
                batch_format="pyarrow",
            )
        )
        uncolored = subtract_vids(uncolored, won, n_buckets)

    verts = graph.vertices.select_columns(["vid", "url"])
    if not colored_parts:
        return verts.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "color": pa.array(
                     np.full(t.num_rows, -1, dtype=np.int64), pa.int64()
                 )}
            ),
            batch_format="pyarrow",
        )
    dec = colored_parts[0]
    for d in colored_parts[1:]:
        dec = dec.union(d)
    dec = compact_nonempty(dec)
    out = verts.join(
        dec, join_type="left_outer", num_partitions=P,
        on=("vid",), right_on=("vid",),
    )

    def fin(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _EMPTY_COLOR
        cc = np.asarray(
            pc.fill_null(t.column("color").combine_chunks(), -1)
        ).astype(np.int64)
        return pa.table(
            {"url": t.column("url"), "color": pa.array(cc, pa.int64())}
        )

    return out.map_batches(fin, batch_format="pyarrow").materialize()
