"""Per-vertex triangle counting via degree orientation (SURVEY.md §7.1 M5).

Orient each undirected edge from lower to higher (degree, vid) rank —
every triangle then has exactly one "apex" (lowest rank) and is counted
exactly once, and out-neighborhoods are bounded by O(sqrt(E)) on any
graph (arboricity bound), which is the skew control: a hub's huge
neighborhood is never enumerated from the hub side.

Two modes:
- broadcast: oriented CSR + sorted edge-key array shipped once via
  ray.put; each edge batch enumerates wedges (u→v, u→w) vectorized and
  membership-tests (v,w) by binary search. No per-row Python. E-sized
  broadcast state → gated on cfg.broadcast_max_edges.
- shuffle (scale path, NO driver vertex/edge state): degrees come from
  degree_dataset (a Dataset), orientation and the wedge filter carry
  the head's degree as a column through two hash joins, triangles close
  with a third join, and per-vertex counts attach to urls via a
  vid-unique join — the classic 2-round distributed algorithm with
  O(1) driver memory.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph, degree_dataset, degrees
from ..util import bucketed_sum_aggregate, col_np, dataset_to_numpy, sparse_sum_reduce, table_from_arrays


def _oriented_edges(graph: Graph, cfg: EngineConfig) -> "ray.data.Dataset":
    """Undirected simple edges oriented low→high (degree, vid) rank.
    Symmetrize + canonical (min,max) dedup + orientation in one pass,
    then a groupby dedup. (Broadcast-mode variant: V-sized rank array
    via ray.put.)"""
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

    # bucketed distinct — oriented-edge cardinality is E (see
    # util.bucketed_sum_aggregate for why groupby(u,v) must not see it)
    return bucketed_sum_aggregate(
        graph.edges.map_batches(orient, batch_format="pyarrow"),
        key_cols=["u", "v"], sum_cols=[],
    ).materialize()


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

    agg = bucketed_sum_aggregate(
        oriented.map_batches(step, batch_format="pyarrow"),
        key_cols=["vid"], sum_cols=["tri"],
    )
    out = np.zeros(V, dtype=np.int64)
    res = dataset_to_numpy(agg, "vid", "tri")
    if len(res["vid"]):
        out[res["vid"]] = res["tri"]
    return out


def _oriented_edges_nodriver(
    graph: Graph, cfg: EngineConfig
) -> "ray.data.Dataset":
    """(u, v, vdeg) oriented low→high (degree, vid) rank with degrees
    attached by two hash joins instead of a V-sized broadcast. vdeg (the
    HEAD's degree) rides along so the wedge rank-filter downstream needs
    no lookup. Joins are materialized per the Ray 2.49 multi-join fusion
    deadlock workaround."""
    P = cfg.num_partitions
    V = graph.num_vertices
    deg = degree_dataset(graph, "undirected", col="sdeg").materialize()
    e = graph.edges.select_columns(["src", "dst"])
    e1 = e.join(
        deg, join_type="inner", num_partitions=P,
        on=("src",), right_on=("vid",),
    ).materialize()
    e2 = e1.join(
        deg.rename_columns({"vid": "vid2", "sdeg": "ddeg"}),
        join_type="inner", num_partitions=P,
        on=("dst",), right_on=("vid2",),
    )

    def orient(t: pa.Table, _V=V) -> pa.Table:
        src = col_np(t, "src")
        dst = col_np(t, "dst")
        sd = col_np(t, "sdeg")
        dd = col_np(t, "ddeg")
        ne = src != dst
        src, dst, sd, dd = src[ne], dst[ne], sd[ne], dd[ne]
        # (deg, vid) rank comparison without forming deg*V+vid on the
        # driver: src is apex iff (sd, src) < (dd, dst)
        src_lo = (sd < dd) | ((sd == dd) & (src < dst))
        u = np.where(src_lo, src, dst)
        v = np.where(src_lo, dst, src)
        vdeg = np.where(src_lo, dd, sd)
        # within-batch dedup combiner on (u, v); vdeg is functionally
        # dependent on v so it can join the group key
        key = u * _V + v
        uniq, idx = np.unique(key, return_index=True)
        return table_from_arrays(
            u=uniq // _V, v=uniq % _V, vdeg=vdeg[idx]
        )

    return bucketed_sum_aggregate(
        e2.map_batches(orient, batch_format="pyarrow"),
        key_cols=["u", "v", "vdeg"], sum_cols=[],
    ).materialize()


def _triangles_shuffle(
    graph: Graph, cfg: EngineConfig
) -> "ray.data.Dataset":
    """→ Dataset (vid, triangles) covering ALL vertices; O(1) driver
    state (VERDICT r2: the scale path must not materialize E or V on
    the driver)."""
    P = cfg.num_partitions
    oriented = _oriented_edges_nodriver(graph, cfg)

    # wedges: (u→v) ⋈ (u→w) on apex u, keep rank(v) < rank(w) via the
    # carried head degrees
    right = oriented.rename_columns({"v": "w", "vdeg": "wdeg"})
    wedges = (
        oriented.join(
            right, join_type="inner", num_partitions=P, on=("u",)
        )
        .map_batches(
            lambda t: (
                lambda uu, vv, ww, vd, wd: (
                    lambda m: table_from_arrays(u=uu[m], v=vv[m], w=ww[m])
                )((vd < wd) | ((vd == wd) & (vv < ww)))
            )(
                col_np(t, "u"), col_np(t, "v"), col_np(t, "w"),
                col_np(t, "vdeg"), col_np(t, "wdeg"),
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # zero rows for every vertex union triangle counts → one groupby:
    # every vertex appears exactly once, no null-handling (and no
    # int→float coercion) from a left-outer join
    zeros = graph.vertices.select_columns(["vid"]).map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid"),
            triangles=np.zeros(t.num_rows, dtype=np.int64),
        ),
        batch_format="pyarrow",
    )

    # A graph can produce ZERO wedges (e.g. a star oriented leaf→hub):
    # the materialized Dataset is then schema-less and Ray 2.49's hash
    # join rejects it ("No match ... FieldRef"), so short-circuit — no
    # wedge means no triangle, the zeros ARE the answer (count() is free
    # on the materialized wedges).
    if wedges.count() == 0:
        return zeros.materialize()

    # close the wedge: (v,w) must be an oriented edge
    closing = oriented.select_columns(["u", "v"]).rename_columns(
        {"u": "v", "v": "w"}
    )
    tris = wedges.join(
        closing, join_type="inner", num_partitions=P, on=("v", "w")
    )

    def explode(batch: pa.Table) -> pa.Table:
        uu = col_np(batch, "u")
        vv = col_np(batch, "v")
        ww = col_np(batch, "w")
        allv = np.concatenate([uu, vv, ww])
        k, s = sparse_sum_reduce(allv, np.ones(len(allv), dtype=np.int64))
        return table_from_arrays(vid=k, triangles=s)

    return bucketed_sum_aggregate(
        zeros.union(tris.map_batches(explode, batch_format="pyarrow")),
        key_cols=["vid"], sum_cols=["triangles"],
    ).materialize()


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
    if mode == "shuffle":
        # no-driver end-to-end: counts stay a Dataset; attach urls via a
        # vid-unique hash join
        counts = _triangles_shuffle(graph, cfg)
        return (
            graph.vertices.join(
                counts, join_type="inner", num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "triangles"])
            .materialize()
        )

    deg = degrees(graph, "undirected")
    V = graph.num_vertices
    rank = deg.astype(np.int64) * V + np.arange(V, dtype=np.int64)
    oriented = _oriented_edges(graph, cfg)
    tri = _triangles_broadcast(oriented, V, rank)

    ref = ray.put(tri)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        t = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column("triangles", pa.array(t[vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")
