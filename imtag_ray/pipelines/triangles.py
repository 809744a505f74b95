"""Per-vertex triangle counting via degree orientation (SURVEY.md §7.1 M5).

Orient each undirected edge from lower to higher (degree, vid) rank —
every triangle then has exactly one "apex" (lowest rank) and is counted
exactly once, and out-neighborhoods are bounded by O(sqrt(E)) on any
graph (arboricity bound), which is the skew control: a hub's huge
neighborhood is never enumerated from the hub side.

Two modes:
- broadcast: oriented CSR + sorted edge-key array shipped once via
  ray.put; each edge batch enumerates wedges (u→v, u→w) vectorized and
  membership-tests (v,w) by binary search. No per-row Python.
- shuffle (scale path): wedges = edges ⋈ edges on the apex, triangles =
  wedges ⋈ edges on (v,w) — two hash-partitioned Dataset.joins, the
  classic 2-round distributed algorithm.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph, degrees
from ..util import col_np, dataset_to_numpy, sparse_sum_reduce, table_from_arrays


def _oriented_edges(graph: Graph, cfg: EngineConfig) -> "ray.data.Dataset":
    """Undirected simple edges oriented low→high (degree, vid) rank.
    Symmetrize + canonical (min,max) dedup + orientation in one pass,
    then a groupby dedup."""
    deg = degrees(graph, "undirected")
    V = graph.num_vertices
    rank = deg.astype(np.int64) * V + np.arange(V, dtype=np.int64)
    rank_ref = ray.put(rank)

    def orient(batch: pa.Table, _ref=rank_ref) -> pa.Table:
        r = ray.get(_ref)
        src = col_np(batch, "src")
        dst = col_np(batch, "dst")
        ne = src != dst
        src = src[ne]
        dst = dst[ne]
        lo = np.where(r[src] < r[dst], src, dst)
        hi = np.where(r[src] < r[dst], dst, src)
        pair = lo * V + hi
        uniq = np.unique(pair)
        return table_from_arrays(u=uniq // V, v=uniq % V)

    return (
        graph.edges.map_batches(orient, batch_format="pyarrow")
        .groupby(["u", "v"])
        .count()
        .select_columns(["u", "v"])
        .materialize()
    )


def _triangles_broadcast(
    oriented: "ray.data.Dataset", V: int, rank: np.ndarray
) -> np.ndarray:
    e = dataset_to_numpy(oriented, "u", "v")
    u = e["u"].astype(np.int64)
    v = e["v"].astype(np.int64)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, u + 1, 1)
    indptr = np.cumsum(indptr)
    edge_keys = u * V + v  # sorted ascending by construction
    state = ray.put((indptr, v, edge_keys, rank))

    def step(batch: pa.Table, _ref=state, _V=V) -> pa.Table:
        indptr, adj, keys, rnk = ray.get(_ref)
        bu = col_np(batch, "u")
        bv = col_np(batch, "v")
        cnt = indptr[bu + 1] - indptr[bu]
        total = int(cnt.sum())
        if total == 0:
            return table_from_arrays(
                vid=np.empty(0, np.int64), tri=np.empty(0, np.int64)
            )
        # flatten candidate out-neighbors w of each edge's apex u
        starts = np.repeat(indptr[bu], cnt)
        offs = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(cnt)[:-1]]), cnt
        )
        w = adj[starts + offs]
        rep_v = np.repeat(bv, cnt)
        rep_u = np.repeat(bu, cnt)
        m = rnk[w] > rnk[rep_v]  # only wedges (v, w) with v lower-ranked
        w, rep_v, rep_u = w[m], rep_v[m], rep_u[m]
        key = rep_v * _V + w
        pos = np.searchsorted(keys, key)
        pos[pos >= len(keys)] = len(keys) - 1 if len(keys) else 0
        hit = keys[pos] == key if len(keys) else np.zeros(0, bool)
        tri_u, tri_v, tri_w = rep_u[hit], rep_v[hit], w[hit]
        allv = np.concatenate([tri_u, tri_v, tri_w])
        k, s = sparse_sum_reduce(allv, np.ones(len(allv), dtype=np.int64))
        return table_from_arrays(vid=k, tri=s)

    agg = (
        oriented.map_batches(step, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("tri", alias_name="tri"))
    )
    out = np.zeros(V, dtype=np.int64)
    res = dataset_to_numpy(agg, "vid", "tri")
    if len(res["vid"]):
        out[res["vid"]] = res["tri"]
    return out


def _triangles_shuffle(
    oriented: "ray.data.Dataset", V: int, rank: np.ndarray, P: int
) -> np.ndarray:
    rank_ref = ray.put(rank)

    # wedges: (u→v) ⋈ (u→w) on apex u, keep rank(v) < rank(w)
    right = oriented.rename_columns({"v": "w"})
    wedges = (
        oriented.join(
            right, join_type="inner", num_partitions=P, on=("u",)
        )
        .map_batches(
            lambda t, _ref=rank_ref: (
                lambda r, vv, ww, uu: table_from_arrays(
                    u=uu[r[vv] < r[ww]], v=vv[r[vv] < r[ww]], w=ww[r[vv] < r[ww]]
                )
            )(ray.get(_ref), col_np(t, "v"), col_np(t, "w"), col_np(t, "u")),
            batch_format="pyarrow",
        )
    )
    # A graph can produce ZERO wedges (e.g. a star oriented leaf→hub);
    # Ray's hash-join aggregator chokes on schema-less empty partitions,
    # so union one impossible sentinel wedge (negative vids never match
    # a closing edge and are dropped in explode()).
    sentinel = ray.data.from_arrow(
        pa.table({"u": pa.array([-1], pa.int64()),
                  "v": pa.array([-1], pa.int64()),
                  "w": pa.array([-1], pa.int64())})
    )
    wedges = wedges.union(sentinel)

    # close the wedge: (v,w) must be an oriented edge
    closing = oriented.rename_columns({"u": "v", "v": "w"})
    tris = wedges.join(
        closing, join_type="inner", num_partitions=P, on=("v", "w")
    )

    def explode(batch: pa.Table) -> pa.Table:
        ok = pa.compute.greater_equal(batch["u"], 0)
        batch = batch.filter(ok)
        uu = col_np(batch, "u")
        vv = col_np(batch, "v")
        ww = col_np(batch, "w")
        allv = np.concatenate([uu, vv, ww])
        k, s = sparse_sum_reduce(allv, np.ones(len(allv), dtype=np.int64))
        return table_from_arrays(vid=k, tri=s)

    agg = (
        tris.map_batches(explode, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("tri", alias_name="tri"))
    )
    out = np.zeros(V, dtype=np.int64)
    res = dataset_to_numpy(agg, "vid", "tri")
    if len(res["vid"]):
        out[res["vid"]] = res["tri"]
    return out


def triangle_counts(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, triangles) — undirected simple-graph
    per-vertex triangle membership counts (networkx.triangles semantics)."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "triangles": pa.array([], pa.int64())}
            )
        )
    if mode is None:
        # the broadcast path's CSR + sorted edge-key state is O(E), so the
        # auto pick must gate on EDGE count (VERDICT r2 #3) — vertex_state
        # only forces shuffle when the user explicitly asked for it
        if cfg.vertex_state == "shuffle":
            mode = "shuffle"
        elif cfg.vertex_state == "broadcast":
            mode = "broadcast"
        else:
            mode = (
                "broadcast"
                if graph.num_edges <= cfg.broadcast_max_edges
                else "shuffle"
            )
    deg = degrees(graph, "undirected")
    V = graph.num_vertices
    rank = deg.astype(np.int64) * V + np.arange(V, dtype=np.int64)
    oriented = _oriented_edges(graph, cfg)
    if mode == "broadcast":
        tri = _triangles_broadcast(oriented, V, rank)
    else:
        tri = _triangles_shuffle(oriented, V, rank, cfg.num_partitions)

    ref = ray.put(tri)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        t = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column("triangles", pa.array(t[vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")
