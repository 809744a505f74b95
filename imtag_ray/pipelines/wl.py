"""Weisfeiler–Leman (1-WL) color refinement over the link graph.

The canonical graph-fingerprinting / role-discovery primitive (graph
isomorphism screening, structural role equivalence, GNN expressivity
baseline): every vertex starts colored with its degree and each round
re-colors it with a hash of (own color | sorted multiset of neighbor
colors). Vertices with identical colors after r rounds are
indistinguishable by any r-layer message-passing computation.

This generalizes the reference's canonical relabel (compressed_freeze,
src/imtag.cpp:78-103 — a 0-round color partition by component) to
iterated neighborhood-structure partitions.

Determinism contract: colors are md5 hex strings; the neighbor multiset
is joined sorted with ',' and separated from the own color by '|', so a
SQL oracle replays every round bit-exactly (DuckDB md5 == hashlib md5;
string_agg ORDER BY == Python sorted on ASCII hex).

Scale shape: one state join onto a both-direction edge view per round,
then a 256-bucket vid-partitioned sort-aggregate (pandas groupby-join
inside each coarse bucket — never a V-cardinality Ray groupby), then a
V-row left-outer join applying the hash.

Two hash modes (round 10 — the hub-degree caveat is closed):

- ``hash_mode="concat"`` (default, the SQL-replayable contract): the
  neighbor multiset is the sorted ','-joined color string — Θ(deg(v))
  state at hubs, bit-exactly replayed by the DuckDB oracle.
- ``hash_mode="commutative"`` (the web-scale path): the multiset is
  summarized by TWO independent wrapping sums of per-neighbor
  splitmix64 mixes plus the count — a 128-bit-equivalent commutative
  multiset hash that needs O(1) per-vertex state at ANY degree and
  reduces with plain bucketed SUM aggregation (no per-vertex sort, no
  string concat). Colors differ from concat mode as strings, but the
  color PARTITION is identical modulo hash collisions (tested).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph, degree_dataset
from ..util import _mix_to_bucket, col_np, compact_nonempty, table_from_arrays


def wl_colors(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int = 2,
    hash_mode: str = "concat",
) -> "ray.data.Dataset | pa.Table":
    """→ Dataset (vid, url, wl_color) after ``rounds`` of 1-WL
    refinement from degree colors (wl_color is a 32-hex md5 string in
    ``concat`` mode — round 0 colors are the decimal degree strings —
    or a 16-hex splitmix64 state in ``commutative`` mode; see module
    docstring for the trade-off)."""
    if hash_mode == "commutative":
        return _wl_colors_commutative(graph, cfg, rounds)
    empty = pa.table(
        {"vid": pa.array([], pa.int64()),
         "url": pa.array([], pa.string()),
         "wl_color": pa.array([], pa.string())}
    )
    if graph.num_vertices == 0:
        return empty
    P = cfg.num_partitions

    deg = degree_dataset(graph, "undirected")
    state = deg.map_batches(
        lambda t: pa.table(
            {"vid": t.column("vid"),
             "color": pa.array(
                 [str(int(d)) for d in col_np(t, "degree")], pa.string()
             )}
        ),
        batch_format="pyarrow",
    ).materialize()

    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    sym = None
    if edges is not None:
        rev = edges.map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "dst"), dst=col_np(t, "src")
            ),
            batch_format="pyarrow",
        )
        sym = compact_nonempty(edges.union(rev).materialize())

    for _ in range(rounds):
        if sym is None:
            nbrs = None
        else:
            msgs = sym.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).map_batches(
                lambda t: pa.table(
                    {"vid": t.column("dst"), "color": t.column("color")}
                ),
                batch_format="pyarrow",
            )

            def vid_bucket(t: pa.Table) -> pa.Table:
                return t.append_column("__bucket", pa.array(
                    _mix_to_bucket([col_np(t, "vid").astype(np.int64)], 256)
                ))

            def gather(g: pa.Table) -> pa.Table:
                df = pd.DataFrame(
                    {"vid": col_np(g, "vid"),
                     "color": np.asarray(g.column("color"), dtype=object)}
                )
                agg = (
                    df.sort_values(["vid", "color"], kind="stable")
                    .groupby("vid", sort=True)["color"]
                    .agg(",".join)
                )
                return pa.table(
                    {"vid": pa.array(agg.index.to_numpy(np.int64)),
                     "nb": pa.array(agg.to_numpy(dtype=object), pa.string())}
                )

            nbrs = compact_nonempty(
                msgs.map_batches(vid_bucket, batch_format="pyarrow")
                .groupby("__bucket")
                .map_groups(gather, batch_format="pyarrow")
                .materialize()
            )

        def recolor(t: pa.Table) -> pa.Table:
            own = np.asarray(t.column("color"), dtype=object)
            if "nb" in t.column_names:
                nb = np.asarray(t.column("nb"), dtype=object)
            else:
                nb = np.full(t.num_rows, None, dtype=object)
            out = [
                hashlib.md5(
                    f"{o}|{'' if b is None else b}".encode()
                ).hexdigest()
                for o, b in zip(own, nb)
            ]
            return pa.table(
                {"vid": t.column("vid"),
                 "color": pa.array(out, pa.string())}
            )

        if nbrs is None:
            state = state.map_batches(
                recolor, batch_format="pyarrow"
            ).materialize()
        else:
            state = (
                state.join(
                    nbrs, join_type="left_outer", num_partitions=P,
                    on=("vid",), right_on=("vid",),
                )
                .map_batches(recolor, batch_format="pyarrow")
                .materialize()
            )

    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    if verts is None:
        return empty
    return (
        verts.join(
            state, join_type="inner", num_partitions=P,
            on=("vid",), right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"vid": t.column("vid"), "url": t.column("url"),
                 "wl_color": t.column("color")}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )


def _wl_colors_commutative(
    graph: Graph, cfg: EngineConfig, rounds: int
) -> "ray.data.Dataset | pa.Table":
    """1-WL with an order-free multiset hash: per-vertex state is ONE
    int64 color; each round reduces neighbors with two wrapping sums
    of independent splitmix64 mixes + a count (bucketed SUM
    aggregation — no Θ(deg) sort/concat, hub-degree safe), then
    recolors with a fixed splitmix64 combine. numpy and Arrow both
    wrap int64 sums mod 2^64, so partials merge identically across
    any block layout (tested by block-count invariance)."""
    from ..util import bucketed_sum_aggregate
    from .linkpred import _splitmix64

    empty = pa.table(
        {"vid": pa.array([], pa.int64()),
         "url": pa.array([], pa.string()),
         "wl_color": pa.array([], pa.string())}
    )
    if graph.num_vertices == 0:
        return empty
    P = cfg.num_partitions
    C2 = np.uint64(0xD6E8FEB86659FD93)  # second-mix tweak constant

    deg = degree_dataset(graph, "undirected")
    state = deg.map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid").astype(np.int64),
            color=_splitmix64(
                col_np(t, "degree").astype(np.int64).view(np.uint64)
            ).view(np.int64),
        ),
        batch_format="pyarrow",
    ).materialize()

    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    sym = None
    if edges is not None:
        rev = edges.map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "dst"), dst=col_np(t, "src")
            ),
            batch_format="pyarrow",
        )
        sym = compact_nonempty(edges.union(rev).materialize())

    def msg_partial(t: pa.Table) -> pa.Table:
        """Per-batch partial multiset sums keyed by destination vid."""
        vid = col_np(t, "dst").astype(np.int64)
        c = col_np(t, "color").astype(np.int64).view(np.uint64)
        h1 = _splitmix64(c)
        with np.errstate(over="ignore"):
            h2 = _splitmix64(c * C2)
        order = np.argsort(vid, kind="stable")
        vid = vid[order]
        uniq, starts = np.unique(vid, return_index=True)
        with np.errstate(over="ignore"):
            s1 = np.add.reduceat(h1[order], starts)
            s2 = np.add.reduceat(h2[order], starts)
        cnt = np.diff(np.append(starts, len(vid)))
        return table_from_arrays(
            vid=uniq, s1=s1.view(np.int64), s2=s2.view(np.int64),
            cnt=cnt.astype(np.int64),
        )

    def recolor(t: pa.Table) -> pa.Table:
        own = col_np(t, "color").astype(np.int64).view(np.uint64)
        n = len(own)

        def _col(name):
            # fill nulls on the Arrow side: int64→float NaN round-trips
            # would corrupt full-range 64-bit hash sums
            if name in t.column_names:
                import pyarrow.compute as pc

                return pc.fill_null(t.column(name), 0).to_numpy(
                    zero_copy_only=False
                ).astype(np.int64).view(np.uint64)
            return np.zeros(n, dtype=np.uint64)

        s1, s2, cnt = _col("s1"), _col("s2"), _col("cnt")
        with np.errstate(over="ignore"):
            h = _splitmix64(own)
            h = _splitmix64(h + s1)
            h = _splitmix64(h + s2)
            h = _splitmix64(h + cnt)
        return table_from_arrays(
            vid=col_np(t, "vid").astype(np.int64),
            color=h.view(np.int64),
        )

    for _ in range(rounds):
        if sym is None:
            state = state.map_batches(
                recolor, batch_format="pyarrow"
            ).materialize()
            continue
        nbrs = compact_nonempty(bucketed_sum_aggregate(
            sym.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).map_batches(msg_partial, batch_format="pyarrow"),
            key_cols=["vid"], sum_cols=["s1", "s2", "cnt"],
        ))
        if nbrs is None:
            state = state.map_batches(
                recolor, batch_format="pyarrow"
            ).materialize()
            continue
        state = (
            state.join(
                nbrs.materialize(), join_type="left_outer",
                num_partitions=P, on=("vid",), right_on=("vid",),
            )
            .map_batches(recolor, batch_format="pyarrow")
            .materialize()
        )

    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    if verts is None:
        return empty
    return (
        verts.join(
            state, join_type="inner", num_partitions=P,
            on=("vid",), right_on=("vid",),
        )
        .map_batches(
            lambda t: pa.table(
                {"vid": t.column("vid"), "url": t.column("url"),
                 "wl_color": pa.array(
                     [format(x, "016x") for x in
                      col_np(t, "color").astype(np.int64).view(np.uint64)],
                     pa.string(),
                 )}
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )


def wl_reference(pairs, rounds: int = 2) -> dict:
    """Pure-python 1-WL replay with identical semantics (tests only)."""
    from collections import defaultdict

    adj = defaultdict(set)
    verts = set()
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
        verts.update((a, b))
    color = {v: str(len(adj[v])) for v in verts}
    for _ in range(rounds):
        new = {}
        for v in verts:
            nb = ",".join(sorted(color[u] for u in adj[v]))
            new[v] = hashlib.md5(f"{color[v]}|{nb}".encode()).hexdigest()
        color = new
    return color
