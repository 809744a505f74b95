"""Borůvka minimum spanning forest over a weighted undirected edge
Dataset (Borůvka 1926; the textbook distributed MST — one round =
every component picks its lightest incident cross edge, components
merge, #components at least halves, so ≤ ⌈log₂V⌉ rounds total).

Determinism without distinct weights: the per-component argmin orders
edges by the TOTAL key (w, lo, hi) (lo < hi the edge's canonical vid
pair), so ties break identically everywhere — engine broadcast mode,
engine shuffle mode, and the SQL oracle (which replays the same key in
part-key space; vid order == url order == part-key order for the
copart tables, so the selected edge SETS coincide). With a total
order on edges the selected forest is unique, and cycles are
impossible within a round for the classic reason: a cycle of chosen
edges would need two different edges each strictly minimal over the
shared cut.

Reference lineage: the per-round merge IS imtag's union-find
``lt_cmp`` merge table (src/imtag.cpp disjoint_set) — smaller label
wins — applied to component labels instead of scanline run labels;
the within-round closure reuses pipelines/cc.py's pointer-jumping
hash-min exchange verbatim.

Modes:

- ``broadcast`` (gated on broadcast_max_vertices/edges): comp labels
  in a driver numpy array; per round one lexsort argmin + an
  in-memory hash-min/pointer-jump merge loop.
- ``shuffle``: comp is a (vid, c) Dataset; per round two label joins
  tag each edge with its endpoint components, a 256-bucket
  lexsort-first-per-run argmin selects each component's edge, and the
  merge relabel runs cc's Dataset-state hash-min (+ pointer jumping)
  over the ≤(#components) selected label pairs to convergence — full
  within-round merging, which the forest-correctness argument above
  requires. No driver state beyond per-round scalar sums.

``rounds=R`` runs exactly R rounds (fixed-round semantics for the SQL
oracle; the output is the partial forest selected so far);
``rounds=None`` runs until no cross edges remain (the full MSF) within
cfg.max_iterations and raises otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
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
from .cc import _label_sum, _shortcut_labels

_EMPTY = pa.table(
    {"url_a": pa.array([], pa.string()),
     "url_b": pa.array([], pa.string()),
     "weight": pa.array([], pa.int64())}
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


def boruvka_forest(
    graph: Graph,
    wedges: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url_a, url_b, weight), url_a < url_b: the (partial,
    after ``rounds``; full, when converged) minimum spanning forest of
    the weighted undirected edge Dataset ``wedges`` (src, dst, w int64
    in the graph's vid space)."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        forest = _msf_shuffle(graph, wedges, cfg, rounds)
    else:
        forest = _msf_broadcast(graph, wedges, cfg, rounds)
    if forest is None:
        return ray.data.from_arrow(_EMPTY)
    # vids → urls (two small joins against the vertex table)
    P = cfg.num_partitions
    verts = graph.vertices.select_columns(["vid", "url"])
    out = compact_nonempty(
        forest.join(
            verts.rename_columns({"url": "url_a"}),
            join_type="inner", num_partitions=P,
            on=("lo",), right_on=("vid",),
        )
    )
    if out is None:
        return ray.data.from_arrow(_EMPTY)
    out = compact_nonempty(
        out.join(
            verts.rename_columns({"url": "url_b"}),
            join_type="inner", num_partitions=P,
            on=("hi",), right_on=("vid",),
        )
    )
    if out is None:
        return ray.data.from_arrow(_EMPTY)
    return out.select_columns(["url_a", "url_b", "weight"]).materialize()


def _canon_wedges(wedges: "ray.data.Dataset"):
    """(src, dst, w) → (lo, hi, w) with lo < hi; self-loops dropped."""

    def canon(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        s = col_np(t, "src").astype(np.int64)
        d = col_np(t, "dst").astype(np.int64)
        w = col_np(t, "w").astype(np.int64)
        m = s != d
        s, d, w = s[m], d[m], w[m]
        return table_from_arrays(
            lo=np.minimum(s, d), hi=np.maximum(s, d), w=w
        )

    return compact_nonempty(wedges.map_batches(canon, batch_format="pyarrow"))


def _msf_broadcast(
    graph: Graph, wedges: "ray.data.Dataset", cfg: EngineConfig,
    rounds: int | None,
):
    V = graph.num_vertices
    cw = _canon_wedges(wedges)
    if cw is None:
        return None
    e = dataset_to_numpy(cw, "lo", "hi", "w")
    lo, hi, w = (
        e["lo"].astype(np.int64),
        e["hi"].astype(np.int64),
        e["w"].astype(np.int64),
    )
    comp = np.arange(V, dtype=np.int64)
    sel_mask = np.zeros(len(lo), dtype=bool)
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for _ in range(max_rounds):
        cu, cv = comp[lo], comp[hi]
        cross = cu != cv
        if not cross.any():
            converged = True
            break
        idx = np.flatnonzero(cross)
        # each side's component nominates; argmin by (w, lo, hi)
        call = np.concatenate([cu[idx], cv[idx]])
        eall = np.concatenate([idx, idx])
        order = np.lexsort((hi[eall], lo[eall], w[eall], call))
        cs = call[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = cs[1:] != cs[:-1]
        chosen = eall[order][first]
        sel_mask[chosen] = True
        # merge on the selected label pairs: hash-min + pointer
        # jumping to convergence (labels only decrease)
        la, lb = cu[chosen], cv[chosen]
        lbl = comp.copy()  # label over vid-space label ids
        while True:
            m = np.minimum(lbl[la], lbl[lb])
            before = lbl.sum()
            np.minimum.at(lbl, la, m)
            np.minimum.at(lbl, lb, m)
            lbl = lbl[lbl]  # pointer jump
            if lbl.sum() == before:
                break
        comp = lbl[comp]
    if rounds is None and not converged:
        raise RuntimeError(
            f"boruvka_forest (broadcast) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    if not sel_mask.any():
        return None
    return ray.data.from_arrow(
        pa.table(
            {"lo": pa.array(lo[sel_mask], pa.int64()),
             "hi": pa.array(hi[sel_mask], pa.int64()),
             "weight": pa.array(w[sel_mask], pa.int64())}
        )
    )


def _msf_shuffle(
    graph: Graph, wedges: "ray.data.Dataset", cfg: EngineConfig,
    rounds: int | None,
):
    from ..util import _mix_to_bucket

    P = cfg.num_partitions
    cw = _canon_wedges(wedges)
    if cw is None:
        return None
    cw = cw.materialize()
    comp = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"), c=col_np(t, "vid")
            ),
            batch_format="pyarrow",
        )
    ).materialize()
    forest_parts = []
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for _ in range(max_rounds):
        # tag each edge with endpoint components (two joins, compacted)
        tagged = compact_nonempty(
            cw.join(
                comp.rename_columns({"c": "ca"}),
                join_type="inner", num_partitions=P,
                on=("lo",), right_on=("vid",),
            )
        )
        if tagged is None:
            converged = True
            break
        tagged = compact_nonempty(
            tagged.join(
                comp.rename_columns({"c": "cb"}),
                join_type="inner", num_partitions=P,
                on=("hi",), right_on=("vid",),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64()),
                         "w": pa.array([], pa.int64()),
                         "ca": pa.array([], pa.int64()),
                         "cb": pa.array([], pa.int64())}
                    )
                    if t.num_rows == 0
                    else table_from_arrays(
                        lo=col_np(t, "lo"), hi=col_np(t, "hi"),
                        w=col_np(t, "w"), ca=col_np(t, "ca"),
                        cb=col_np(t, "cb"),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if tagged is None:
            converged = True
            break

        # cross edges only; nominate per endpoint component
        def nominate(t: pa.Table) -> pa.Table:
            empty = pa.table(
                {"c": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.int64()),
                 "hi": pa.array([], pa.int64()),
                 "ca": pa.array([], pa.int64()),
                 "cb": pa.array([], pa.int64())}
            )
            if t.num_rows == 0:
                return empty
            lo = col_np(t, "lo").astype(np.int64)
            hi = col_np(t, "hi").astype(np.int64)
            w = col_np(t, "w").astype(np.int64)
            ca = col_np(t, "ca").astype(np.int64)
            cb = col_np(t, "cb").astype(np.int64)
            m = ca != cb
            if not m.any():
                return empty
            lo, hi, w, ca, cb = lo[m], hi[m], w[m], ca[m], cb[m]
            return table_from_arrays(
                c=np.concatenate([ca, cb]),
                w=np.concatenate([w, w]),
                lo=np.concatenate([lo, lo]),
                hi=np.concatenate([hi, hi]),
                ca=np.concatenate([ca, ca]),
                cb=np.concatenate([cb, cb]),
            )

        noms = compact_nonempty(
            tagged.map_batches(nominate, batch_format="pyarrow")
        )
        if noms is None:  # no cross edge anywhere: forest complete
            converged = True
            break

        # per-component argmin by (w, lo, hi): 256-bucket lexsort +
        # first-per-run (the indexed_adjacency pattern). A map-side
        # within-batch argmin first bounds the shuffle at
        # ≤ #components-per-batch rows.
        def batch_argmin(t: pa.Table) -> pa.Table:
            c = col_np(t, "c").astype(np.int64)
            w = col_np(t, "w").astype(np.int64)
            lo = col_np(t, "lo").astype(np.int64)
            hi = col_np(t, "hi").astype(np.int64)
            ca = col_np(t, "ca").astype(np.int64)
            cb = col_np(t, "cb").astype(np.int64)
            order = np.lexsort((hi, lo, w, c))
            cs = c[order]
            first = np.ones(len(cs), dtype=bool)
            if len(cs):
                first[1:] = cs[1:] != cs[:-1]
            keep = order[first]
            return table_from_arrays(
                c=c[keep], w=w[keep], lo=lo[keep], hi=hi[keep],
                ca=ca[keep], cb=cb[keep],
            )

        def bucketize(t: pa.Table) -> pa.Table:
            return t.append_column("__bucket", pa.array(
                _mix_to_bucket([col_np(t, "c").astype(np.int64)], 256)
            ))

        sel = compact_nonempty(
            noms.map_batches(batch_argmin, batch_format="pyarrow")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(batch_argmin, batch_format="pyarrow")
        )
        if sel is None:
            converged = True
            break
        sel = sel.materialize()

        # the round's forest edges: distinct (lo, hi, w)
        fe = compact_nonempty(
            bucketed_aggregate(
                sel.map_batches(
                    lambda t: table_from_arrays(
                        lo=col_np(t, "lo"), hi=col_np(t, "hi"),
                        weight=col_np(t, "w"),
                    ),
                    batch_format="pyarrow",
                ),
                key_cols=["lo", "hi"],
                aggs=[("weight", "min", "weight")],
            )
        )
        if fe is not None:
            forest_parts.append(fe.materialize())

        # merge: hash-min over the selected (ca, cb) label pairs to a
        # fixpoint (cc's Dataset-state exchange + pointer jumping);
        # the label universe is the distinct labels touched by sel
        pairs = sel.map_batches(
            lambda t: table_from_arrays(a=col_np(t, "ca"), b=col_np(t, "cb")),
            batch_format="pyarrow",
        ).materialize()
        labels = compact_nonempty(
            bucketed_aggregate(
                pairs.map_batches(
                    lambda t: table_from_arrays(
                        vid=np.concatenate(
                            [col_np(t, "a"), col_np(t, "b")]
                        ),
                        label=np.concatenate(
                            [col_np(t, "a"), col_np(t, "b")]
                        ),
                    ),
                    batch_format="pyarrow",
                ),
                key_cols=["vid"], aggs=[("label", "min", "label")],
            )
        ).materialize()
        prev_sum = _label_sum(labels)
        for _inner in range(cfg.max_iterations):
            by_a = (
                pairs.join(
                    labels, join_type="inner", num_partitions=P,
                    on=("a",), right_on=("vid",),
                )
                .select_columns(["b", "label"])
                .rename_columns({"b": "vid"})
            )
            by_b = (
                pairs.join(
                    labels, join_type="inner", num_partitions=P,
                    on=("b",), right_on=("vid",),
                )
                .select_columns(["a", "label"])
                .rename_columns({"a": "vid"})
            )
            labels = compact_nonempty(
                bucketed_aggregate(
                    by_a.union(by_b).union(labels),
                    key_cols=["vid"], aggs=[("label", "min", "label")],
                )
            ).materialize()
            labels, cur_sum = _shortcut_labels(labels, P)
            labels = compact_nonempty(labels)
            if labels is None:  # cannot happen (labels ⊇ pair endpoints)
                break
            labels = labels.materialize()
            if cur_sum == prev_sum:
                break
            prev_sum = cur_sum

        # comp ← merged labels (only labels in the map change)
        def apply_map(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     "c": pa.array([], pa.int64())}
                )
            import pyarrow.compute as pc

            lbl = t.column("label").combine_chunks()
            new = np.asarray(pc.fill_null(lbl, -1)).astype(np.int64)
            old = col_np(t, "c").astype(np.int64)
            return table_from_arrays(
                vid=col_np(t, "vid").astype(np.int64),
                c=np.where(new >= 0, new, old),
            )

        comp = (
            compact_nonempty(
                comp.join(
                    labels.rename_columns({"vid": "lv"}),
                    join_type="left_outer", num_partitions=P,
                    on=("c",), right_on=("lv",),
                ).map_batches(apply_map, batch_format="pyarrow")
            )
        ).materialize()
    if rounds is None and not converged:
        raise RuntimeError(
            f"boruvka_forest (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    if not forest_parts:
        return None
    out = forest_parts[0]
    for p_ in forest_parts[1:]:
        out = out.union(p_)
    return out
