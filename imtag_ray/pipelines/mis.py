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


def _mis_shuffle(
    graph: Graph, cfg: EngineConfig, rounds: int | None
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)
    empty_vid = pa.table({"vid": pa.array([], pa.int64())})
    empty_edges = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )

    def clean_edges(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-join empties are schema-less
            return empty_edges
        s = col_np(t, "src").astype(np.int64)
        d = col_np(t, "dst").astype(np.int64)
        m = s != d
        return table_from_arrays(src=s[m], dst=d[m])

    edges = compact_nonempty(
        graph.edges.select_columns(["src", "dst"]).map_batches(
            clean_edges, batch_format="pyarrow"
        )
    )
    # alive is ALWAYS compacted (None = empty): every join below uses
    # it as a side, and Ray 2.49 joins lose the schema on empty blocks
    alive = compact_nonempty(graph.vertices.select_columns(["vid"]))
    if alive is not None:
        alive = alive.materialize()
    decided = []  # list of (vid, status) Datasets
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for k in range(max_rounds):
        if alive is None:
            converged = True
            break
        if edges is None:
            # every alive vertex is isolated: all join the MIS
            decided.append(
                alive.map_batches(
                    lambda t: table_from_arrays(
                        vid=col_np(t, "vid").astype(np.int64),
                        status=np.ones(t.num_rows, dtype=np.int64),
                    ),
                    batch_format="pyarrow",
                )
            )
            converged = True
            break

        # neighbor-min priority per alive vertex (edges are already
        # alive-alive): emit both directions, bucketed min — priorities
        # recomputed per batch from vids, nothing extra shuffles.
        # uint64→int64 view is NOT order-preserving, so priorities are
        # shifted to the signed domain first (x ^ 2^63 maps uint64
        # order to int64 order) before Arrow's int64 min.
        def nbr_terms_signed(t: pa.Table, _k=k) -> pa.Table:
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

            def pick(t: pa.Table, _k=k) -> pa.Table:
                if t.num_rows == 0:
                    return empty_vid
                vid = col_np(t, "vid").astype(np.int64)
                npri_col = t.column("npri").combine_chunks()
                isnull = np.asarray(pc.is_null(npri_col))
                npri = np.asarray(
                    pc.fill_null(npri_col, 0)
                ).astype(np.int64)
                own = (
                    _priorities(vid, _k) ^ np.uint64(1 << 63)
                ).view(np.int64)
                win = isnull | (own < npri)
                return table_from_arrays(vid=vid[win])

            winners = compact_nonempty(
                joined.map_batches(pick, batch_format="pyarrow")
            )
        if winners is None:
            # no winner this round is impossible with distinct
            # priorities unless alive is empty — guard anyway
            continue
        winners = winners.materialize()
        decided.append(
            winners.map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, "vid").astype(np.int64),
                    status=np.ones(t.num_rows, dtype=np.int64),
                ),
                batch_format="pyarrow",
            )
        )

        # removed = alive neighbors of winners (two directed semi-joins)
        halves = []
        for a, b in (("src", "dst"), ("dst", "src")):
            h = compact_nonempty(
                edges.join(
                    winners, join_type="inner", num_partitions=P,
                    on=(a,), right_on=("vid",),
                ).map_batches(
                    lambda t, _b=b: (
                        empty_vid if t.num_rows == 0
                        else table_from_arrays(
                            vid=col_np(t, _b).astype(np.int64)
                        )
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
            decided.append(
                removed.map_batches(
                    lambda t: table_from_arrays(
                        vid=col_np(t, "vid").astype(np.int64),
                        status=np.zeros(t.num_rows, dtype=np.int64),
                    ),
                    batch_format="pyarrow",
                )
            )

        # alive −= winners ∪ removed (tagged union + bucketed max:
        # the engine's no-join anti-join)
        gone = winners
        if removed is not None:
            gone = gone.union(removed)

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
            alive = None
        else:
            alive = compact_nonempty(
                survivors.map_batches(
                    lambda t: (
                        empty_vid if t.num_rows == 0
                        else t.filter(
                            pc.equal(t.column("tag"), 0)
                        ).select(["vid"])
                    ),
                    batch_format="pyarrow",
                )
            )
            if alive is not None:
                alive = alive.materialize()

        # prune edges to alive-alive (two semi-joins, compaction between
        # — Ray 2.49 fused JoinOperators deadlock on small CPU budgets)
        if alive is None:
            edges = None
        if edges is not None:
            edges = compact_nonempty(
                edges.join(
                    alive, join_type="inner", num_partitions=P,
                    on=("src",), right_on=("vid",),
                ).map_batches(clean_edges, batch_format="pyarrow")
            )
        if edges is not None:
            edges = compact_nonempty(
                edges.join(
                    alive, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).map_batches(clean_edges, batch_format="pyarrow")
            )
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
