"""Deterministic random-walk sampling over the directed graph — the
graph-embedding / corpus-sampling primitive (DeepWalk, Perozzi et al.
KDD 2014; node2vec, Grover & Leskovec KDD 2016): fixed-length walks
from seed vertices, one row per visited (walk, step, url).

Walks are DETERMINISTIC replayable pseudo-random: at state (cur, step)
the next hop is neighbor number ``splitmix64(cur + step·K) mod
out_deg(cur)`` in dst-vid order (vids are url-sorted, so the order is
content-defined, not partition-defined). That makes the operator
exactly replayable by a SQL oracle (the splitmix64 HUGEINT limb-mulmod
replay shared with the HLL oracles) and by a resumed run — no RNG
state to checkpoint, the same property the engine's stratified sampler
uses (hash-threshold, pipelines/scoring.py).

Scale shape: the per-step exchange is one join of the walk-state table
against the indexed adjacency on cur = src (moves Σ out_deg(cur) rows
— bounded by E per step when walking from every vertex, i.e. one
PageRank-iteration's worth of traffic), then a vectorized idx filter.
The indexed adjacency (src, idx, dst, deg) is built once with a
256-bucket hash partition + per-bucket lexsort (all edges of a src
co-locate in its bucket), NOT a per-src groupby (V distinct groups).
No V-sized driver state in either direction; walk state is always a
Dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import col_np, compact_nonempty, table_from_arrays

#: step-mix constant (golden-ratio odd constant, same family as the
#: splitmix64 increment) — the SQL oracle replays it literally
WALK_STEP_K = 0x9E3779B97F4A7C15

_EMPTY_WALKS = pa.table(
    {"start_url": pa.array([], pa.string()),
     "step": pa.array([], pa.int64()),
     "url": pa.array([], pa.string())}
)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    from .linkpred import _splitmix64 as _sm

    return _sm(x)


def indexed_adjacency(
    graph: Graph, cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """→ Dataset (src, idx, dst, deg): the out-adjacency with each
    neighbor's rank in dst-vid order and the source's out-degree.
    Built by hash-bucketing on src (256 coarse buckets → one lexsort +
    run-length pass per bucket), so no V-cardinality groupby."""
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    empty = pa.table(
        {"src": pa.array([], pa.int64()), "idx": pa.array([], pa.int64()),
         "dst": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
    )
    if edges is None:
        return ray.data.from_arrow(empty)
    n_buckets = 256

    def bucketize(t: pa.Table) -> pa.Table:
        src = col_np(t, "src").astype(np.int64)
        h = _splitmix64(src.view(np.uint64) if src.dtype == np.int64
                        else src.astype(np.uint64))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64))
        )

    def index_bucket(g: pa.Table) -> pa.Table:
        src = col_np(g, "src").astype(np.int64)
        dst = col_np(g, "dst").astype(np.int64)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        bound = np.ones(len(src), dtype=bool)
        if len(src):
            bound[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(bound)
        run_id = np.cumsum(bound) - 1
        idx = np.arange(len(src), dtype=np.int64) - starts[run_id]
        lens = np.diff(np.append(starts, len(src)))
        deg = lens[run_id].astype(np.int64)
        return table_from_arrays(src=src, idx=idx, dst=dst, deg=deg)

    return (
        edges.map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(index_bucket, batch_format="pyarrow")
        .materialize()
    )


def random_walks(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    length: int = 4,
    seeds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """→ Dataset (start_url, step, url): every visited position of a
    ``length``-step deterministic walk from each seed vertex (default:
    every vertex). step 0 is the seed itself; a walk that reaches a
    vertex with no out-edges simply ends (fewer rows). The next hop
    from (cur, step) is the ``splitmix64(cur + step·K) mod deg``-th
    out-neighbor in dst-vid order."""
    P = cfg.num_partitions
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY_WALKS)
    adj = compact_nonempty(indexed_adjacency(graph, cfg))
    if seeds is None:
        seeds = graph.vertices.select_columns(["vid"])

    state = compact_nonempty(
        seeds.map_batches(
            lambda t: table_from_arrays(
                wid=col_np(t, "vid").astype(np.int64),
                cur=col_np(t, "vid").astype(np.int64),
            ),
            batch_format="pyarrow",
        )
    )
    if state is None:
        return ray.data.from_arrow(_EMPTY_WALKS)
    state = state.materialize()

    def visited_of(ds, step_no: int):
        return ds.map_batches(
            lambda t, _s=step_no: table_from_arrays(
                wid=col_np(t, "wid").astype(np.int64),
                step=np.full(t.num_rows, _s, dtype=np.int64),
                v=col_np(t, "cur").astype(np.int64),
            ),
            batch_format="pyarrow",
        )

    visited = visited_of(state, 0)
    empty_state = pa.table(
        {"wid": pa.array([], pa.int64()), "cur": pa.array([], pa.int64())}
    )

    for step in range(length):
        if adj is None:
            break

        def hop(t: pa.Table, _step=step) -> pa.Table:
            if t.num_rows == 0:  # post-join empties are schema-less
                return empty_state
            # "src" == the walker's cur (the join key; the right key
            # column does not survive Ray's join output)
            cur = col_np(t, "src").astype(np.int64)
            idx = col_np(t, "idx").astype(np.int64)
            deg = col_np(t, "deg").astype(np.int64)
            with np.errstate(over="ignore"):
                h = _splitmix64(
                    cur.view(np.uint64)
                    + np.uint64(_step) * np.uint64(WALK_STEP_K)
                )
            keep = idx == (h % deg.astype(np.uint64)).astype(np.int64)
            return table_from_arrays(
                wid=col_np(t, "wid").astype(np.int64)[keep],
                cur=col_np(t, "dst").astype(np.int64)[keep],
            )

        nxt = compact_nonempty(
            adj.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("cur",),
            ).map_batches(hop, batch_format="pyarrow")
        )
        if nxt is None:
            state = None
            break
        state = nxt.materialize()
        visited = visited.union(visited_of(state, step + 1))

    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    out = compact_nonempty(
        visited.join(
            verts.rename_columns({"vid": "wv", "url": "start_url"}),
            join_type="inner", num_partitions=P,
            on=("wid",), right_on=("wv",),
        )
    )
    return out.join(
        verts.rename_columns({"vid": "vv"}),
        join_type="inner", num_partitions=P,
        on=("v",), right_on=("vv",),
    ).select_columns(["start_url", "step", "url"]).materialize()
