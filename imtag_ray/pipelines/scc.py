"""Strongly connected components over the DIRECTED edge table — the
web-graph bowtie primitive (Broder et al., "Graph structure in the
web", WWW 2000) the undirected CC operator can't express.

Algorithm: forward-min coloring + backward confirmation with peeling
(the coloring SCC of Orzan's thesis / Hong et al.'s distributed
variants, re-expressed as the engine's per-round edge scans):

1. color(v) = min active vid that reaches v (forward min-label
   propagation, the directed analogue of ``cc``'s hash-min rounds,
   accelerated by the same pointer jumping — color values are
   themselves vids, and "u reaches v" composes).
2. roots r are vertices with color(r) == r; the set confirmed this
   round is {v : color(v) = r and v →* r through vertices of color r}
   (backward flag propagation restricted to equal colors). That set is
   EXACTLY SCC(r), and r is the minimum vid of the SCC (any smaller
   mutual-reach vid would have colored r).
3. confirmed SCCs peel off; repeat on the remaining active subgraph.
   SCCs are removed whole, so reachability within the active subgraph
   never splits a component.

Output ids are min-member vids ≡ min-member urls (vids are url-sorted
by build_graph), so the canonical id is order-independent — the same
``compressed_freeze``-style determinism as cc.canonical_relabel
(ref src/disjoint_set.hpp:73-96).

Modes (config.vertex_state, like cc/pagerank): broadcast keeps
(color, reached, active) as V-sized plasma arrays; shuffle keeps them
as a Dataset state table exchanged through vid-keyed joins + bucketed
aggregations — the no-driver scale path. Outer peel rounds are bounded
by cfg.max_iterations (a DAG-chain condensation needs depth-many
rounds; web graphs are shallow); inner fixpoints terminate naturally.
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
    sparse_min_reduce,
    table_from_arrays,
)


def _pick_mode(graph: Graph, cfg: EngineConfig) -> str:
    if cfg.vertex_state != "auto":
        return cfg.vertex_state
    return (
        "broadcast"
        if graph.num_vertices <= cfg.broadcast_max_vertices
        else "shuffle"
    )


# ---------------------------------------------------------------------------
# broadcast mode
# ---------------------------------------------------------------------------


def _scc_broadcast(graph: Graph, cfg: EngineConfig, on_round=None) -> np.ndarray:
    V = graph.num_vertices
    edges = graph.edges
    vidx = np.arange(V, dtype=np.int64)
    scc = np.full(V, -1, dtype=np.int64)
    active = np.ones(V, dtype=bool)

    for outer in range(cfg.max_iterations):
        if not active.any():
            return scc
        # -- forward min coloring within the active subgraph ------------
        color = np.where(active, vidx, vidx)  # inactive: self (inert)
        while True:  # ≤ O(log diameter) with pointer jumping
            cref = ray.put(color)
            aref = ray.put(active)

            def fwd(batch: pa.Table, _c=cref, _a=aref) -> pa.Table:
                c = ray.get(_c)
                a = ray.get(_a)
                src = col_np(batch, "src")
                dst = col_np(batch, "dst")
                m = a[src] & a[dst]
                cs = c[src[m]]
                vd = dst[m]
                imp = cs < c[vd]
                k, v = sparse_min_reduce(vd[imp], cs[imp])
                return table_from_arrays(vid=k, cand=v)

            n_upd = 0
            for b in edges.map_batches(fwd, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                n_upd += b.num_rows
                np.minimum.at(color, col_np(b, "vid"), col_np(b, "cand"))
            if n_upd == 0:
                break
            # pointer jumping: color[v] is a vid that reaches v, so
            # color[color[v]] reaches v too — composition shortcuts
            # chains exactly as in cc broadcast mode
            while True:
                nxt = np.minimum(color, color[color])
                if np.array_equal(nxt, color):
                    break
                color = nxt
        # -- backward confirmation within equal colors ------------------
        reached = active & (color == vidx)  # roots
        while True:  # ≤ SCC diameter rounds
            rref = ray.put(reached)
            cref = ray.put(color)
            aref = ray.put(active)

            def back(batch: pa.Table, _r=rref, _c=cref, _a=aref) -> pa.Table:
                r = ray.get(_r)
                c = ray.get(_c)
                a = ray.get(_a)
                src = col_np(batch, "src")
                dst = col_np(batch, "dst")
                m = (
                    a[src] & a[dst] & r[dst] & ~r[src]
                    & (c[src] == c[dst])
                )
                return table_from_arrays(vid=np.unique(src[m]))

            n_new = 0
            for b in edges.map_batches(back, batch_format="pyarrow").iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                vids = col_np(b, "vid")
                fresh = ~reached[vids]
                n_new += int(fresh.sum())
                reached[vids] = True
            if n_new == 0:
                break
        scc[reached] = color[reached]
        active &= ~reached
        if on_round is not None:
            on_round(outer, scc)
    if active.any():
        raise RuntimeError(
            f"strongly_connected_components (broadcast) did not finish "
            f"within max_iterations={cfg.max_iterations} peel rounds; "
            f"raise cfg.max_iterations (condensation-DAG depth bound)"
        )
    return scc


# ---------------------------------------------------------------------------
# shuffle mode (Dataset state — the no-driver scale path)
# ---------------------------------------------------------------------------


_EMPTY_VID = pa.table({"vid": pa.array([], pa.int64())})
_EMPTY_ASSIGNED = pa.table(
    {"vid": pa.array([], pa.int64()), "scc": pa.array([], pa.int64())}
)


def _to_vid_scc_self(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid").astype(np.int64),
            scc=col_np(t, "vid").astype(np.int64),
        ),
        batch_format="pyarrow",
    )


def _scc_shuffle(
    graph: Graph, cfg: EngineConfig, on_round=None
) -> "ray.data.Dataset":
    """Dataset-state peeling: per outer round the ACTIVE-active edge
    set is carved with two semi-joins (the _kcore_shuffle shape), the
    forward coloring is hash-min relaxation + cc's pointer-jumping
    message exchange over a (vid, label) table, and the backward
    confirmation is a flag Dataset grown by color-matched joins. No
    V-sized driver state; per-key aggregations are bucketed.
    → Dataset (vid, scc)."""
    from .cc import _label_sum, _shortcut_labels

    P = cfg.num_partitions
    edges0 = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    # every join input below must go through compact_nonempty (empty
    # FIRST blocks silence Ray 2.49's one-shot join schema broadcast)
    active = compact_nonempty(graph.vertices.select_columns(["vid"]))
    if active is None:  # unreachable: caller guards num_vertices > 0
        active = ray.data.from_arrow(_EMPTY_VID)
    assigned: "ray.data.Dataset | None" = None

    def add_assigned(part: "ray.data.Dataset"):
        nonlocal assigned
        part = compact_nonempty(part)
        if part is None:
            return
        assigned = (
            part.materialize()
            if assigned is None
            else assigned.union(part).materialize()
        )

    if edges0 is None:  # edgeless graph: all singletons
        return _to_vid_scc_self(active).materialize()

    for outer in range(cfg.max_iterations):
        if active.count() == 0:
            break
        # active-active edges (two semi-joins, compaction between —
        # Ray 2.49 fused JoinOperators deadlock on small CPU budgets)
        ae = compact_nonempty(
            edges0.join(
                active, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).select_columns(["src", "dst"])
        )
        if ae is not None:
            ae = compact_nonempty(
                ae.join(
                    active, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).select_columns(["src", "dst"])
            )
        if ae is None:
            # no active edge anywhere: every active vertex is a
            # singleton SCC — finish in one shot
            add_assigned(_to_vid_scc_self(active))
            active = ray.data.from_arrow(_EMPTY_VID)
            break

        # -- forward min coloring over the active subgraph --------------
        lab = compact_nonempty(
            active.map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, "vid").astype(np.int64),
                    label=col_np(t, "vid").astype(np.int64),
                ),
                batch_format="pyarrow",
            )
        )
        prev_sum = _label_sum(lab)
        while True:
            cands = compact_nonempty(
                ae.join(
                    lab, join_type="inner", num_partitions=P,
                    on=("src",), right_on=("vid",),
                ).map_batches(
                    lambda t: (
                        pa.table(
                            {"vid": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64())}
                        )
                        if t.num_rows == 0  # post-join empties: schema-less
                        else table_from_arrays(
                            vid=col_np(t, "dst").astype(np.int64),
                            label=col_np(t, "label").astype(np.int64),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            merged = cands.union(lab) if cands is not None else lab
            relaxed = compact_nonempty(
                bucketed_aggregate(
                    merged, key_cols=["vid"],
                    aggs=[("label", "min", "label")],
                )
            )
            # pointer jumping between relaxations (labels are vids of
            # active vertices whose rows exist in the table — the same
            # groupby message exchange cc's shuffle mode uses)
            lab, cur_sum = _shortcut_labels(relaxed, P)
            lab = compact_nonempty(lab)
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum

        # -- roots + backward confirmation ------------------------------
        def roots_of(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return _EMPTY_VID
            vid = col_np(t, "vid").astype(np.int64)
            return table_from_arrays(vid=vid[vid == col_np(t, "label")])

        reached = compact_nonempty(
            lab.map_batches(roots_of, batch_format="pyarrow")
        )
        # roots always exist (the min active vid of any color class is
        # its own color), so reached is non-None here
        reached = reached.materialize()
        prev_n = reached.count()
        while True:
            # dst-side info: label + reached flag per edge target
            flagged = compact_nonempty(
                lab.join(
                    reached.map_batches(
                        lambda t: table_from_arrays(
                            rv=col_np(t, "vid").astype(np.int64),
                            flag=np.ones(t.num_rows, dtype=np.int8),
                        ),
                        batch_format="pyarrow",
                    ),
                    join_type="left_outer", num_partitions=P,
                    on=("vid",), right_on=("rv",),
                ).map_batches(
                    lambda t: (
                        pa.table(
                            {"vid": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "flag": pa.array([], pa.int8())}
                        )
                        if t.num_rows == 0
                        else table_from_arrays(
                            vid=col_np(t, "vid").astype(np.int64),
                            label=col_np(t, "label").astype(np.int64),
                            flag=np.asarray(
                                pc.fill_null(
                                    t.column("flag").combine_chunks(), 0
                                )
                            ).astype(np.int8),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            msgs = compact_nonempty(
                ae.join(
                    flagged, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).map_batches(
                    lambda t: (
                        pa.table(
                            {"vid": pa.array([], pa.int64()),
                             "dcolor": pa.array([], pa.int64())}
                        )
                        if t.num_rows == 0
                        else (lambda keep, s, c: table_from_arrays(
                            vid=s[keep], dcolor=c[keep]
                        ))(
                            col_np(t, "flag").astype(bool),
                            col_np(t, "src").astype(np.int64),
                            col_np(t, "label").astype(np.int64),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            if msgs is None:
                break
            # distinct (src, dst-color) then keep only color matches
            dmsgs = compact_nonempty(
                bucketed_aggregate(
                    msgs, key_cols=["vid", "dcolor"],
                    aggs=[("dcolor", "count", "__n")],
                ).select_columns(["vid", "dcolor"])
            )
            hits = compact_nonempty(
                dmsgs.join(
                    lab.rename_columns({"vid": "lv"}),
                    join_type="inner", num_partitions=P,
                    on=("vid",), right_on=("lv",),
                ).map_batches(
                    lambda t: (
                        _EMPTY_VID
                        if t.num_rows == 0
                        else (lambda keep, v: table_from_arrays(
                            vid=v[keep]
                        ))(
                            col_np(t, "dcolor").astype(np.int64)
                            == col_np(t, "label").astype(np.int64),
                            col_np(t, "vid").astype(np.int64),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            if hits is None:
                break
            reached = compact_nonempty(
                bucketed_aggregate(
                    reached.union(hits), key_cols=["vid"],
                    aggs=[("vid", "count", "__n")],
                ).select_columns(["vid"])
            ).materialize()
            cur_n = reached.count()
            if cur_n == prev_n:
                break
            prev_n = cur_n

        # -- confirm reached vertices: scc = color; peel them ------------
        conf = lab.join(
            reached, join_type="inner", num_partitions=P,
            on=("vid",), right_on=("vid",),
        ).map_batches(
            lambda t: (
                _EMPTY_ASSIGNED
                if t.num_rows == 0
                else table_from_arrays(
                    vid=col_np(t, "vid").astype(np.int64),
                    scc=col_np(t, "label").astype(np.int64),
                )
            ),
            batch_format="pyarrow",
        )
        add_assigned(conf)
        # active \ reached via left-outer flag filter (no anti-join op)
        nxt_active = compact_nonempty(
            active.join(
                reached.map_batches(
                    lambda t: table_from_arrays(
                        rv=col_np(t, "vid").astype(np.int64),
                        flag=np.ones(t.num_rows, dtype=np.int8),
                    ),
                    batch_format="pyarrow",
                ),
                join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("rv",),
            ).map_batches(
                lambda t: (
                    _EMPTY_VID
                    if t.num_rows == 0
                    else table_from_arrays(
                        vid=col_np(t, "vid").astype(np.int64)[
                            np.asarray(
                                pc.fill_null(
                                    t.column("flag").combine_chunks(), 0
                                )
                            ).astype(np.int8)
                            == 0
                        ]
                    )
                ),
                batch_format="pyarrow",
            )
        )
        active = (
            nxt_active.materialize()
            if nxt_active is not None
            else ray.data.from_arrow(_EMPTY_VID)
        )
        if on_round is not None:
            on_round(outer, assigned)

    if active.count():
        raise RuntimeError(
            f"strongly_connected_components (shuffle) did not finish "
            f"within max_iterations={cfg.max_iterations} peel rounds; "
            f"raise cfg.max_iterations (condensation-DAG depth bound)"
        )
    if assigned is None:
        return ray.data.from_arrow(_EMPTY_ASSIGNED)
    return assigned


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def strongly_connected_components(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
    on_round=None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, scc_url): scc_url is the lexicographically
    smallest url in the vertex's strongly connected component (min-vid
    member ≡ min-url member — vids are url-sorted), the same canonical
    order-independent labeling scheme as connected_components."""
    empty = pa.table(
        {"vid": pa.array([], pa.int64()), "url": pa.array([], pa.string()),
         "scc_url": pa.array([], pa.string())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    P = cfg.num_partitions
    if mode == "shuffle":
        labels = compact_nonempty(_scc_shuffle(graph, cfg, on_round=on_round))
        if labels is None:
            return ray.data.from_arrow(empty)
        # attach the min-member URL with vid-keyed joins (no V-sized
        # driver array on the scale path)
        verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
        withv = compact_nonempty(
            labels.join(
                verts, join_type="inner", num_partitions=P,
                on=("vid",), right_on=("vid",),
            )
        )
        return withv.join(
            verts.rename_columns({"vid": "rvid", "url": "scc_url"}),
            join_type="inner", num_partitions=P,
            on=("scc",), right_on=("rvid",),
        ).select_columns(["vid", "url", "scc_url"]).materialize()
    scc = _scc_broadcast(graph, cfg, on_round=on_round)
    urls = graph.urls_array()
    ref = ray.put(urls[scc])

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        s = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column(
            "scc_url", pa.array(s[vid], pa.string())
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")
