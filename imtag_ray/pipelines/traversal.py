"""HITS, BFS hop distance, and k-core peeling over the link graph.

Three further link-graph analytics built on the same two-mode
machinery as pipelines.cc / pipelines.pagerank (broadcast V-array
state vs Dataset shuffle state; mode picked by ``EngineConfig.
vertex_state`` / ``broadcast_max_vertices``). All three generalize the
reference's iterate-until-fixpoint relaxation over the merge table
(src/disjoint_set.hpp:36-63) from min-label to other monoids:

- **HITS** (Kleinberg): hub/authority power iteration — two scatter-add
  halves per round (the sum-monoid analogue of PageRank's single half).
- **BFS**: min-monoid relaxation of ``dist+1`` messages from a seed set
  (hash-min CC with distance payload instead of component label).
- **k-core**: iterative peeling — the alive set shrinks monotonically,
  like the reference's remove_components + dense relabel loop
  (src/morphology.cpp) iterated to a fixpoint.

Fixed-round semantics: every op takes ``rounds``; when set, exactly
that many synchronous rounds run (converging earlier is a no-op) so a
DuckDB oracle can replay the identical trajectory (the copart_bfs12 /
copart_kcore3 / doc_hits8 queries). ``rounds=None`` iterates to the
fixpoint under ``cfg.max_iterations``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min, Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import (
    bucketed_aggregate,
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    dataset_to_numpy,
    sparse_min_reduce,
    sparse_sum_reduce,
    table_from_arrays,
)

_INF = np.iinfo(np.int64).max


def _pick_mode(graph: Graph, cfg: EngineConfig) -> str:
    if cfg.vertex_state != "auto":
        return cfg.vertex_state
    return (
        "broadcast"
        if graph.num_vertices <= cfg.broadcast_max_vertices
        else "shuffle"
    )


def _sym_edges(graph: Graph):
    """Both-direction edge view (one materialized Dataset, built per
    call site once) so undirected rounds need ONE state join per round
    instead of two (two joins per streaming plan is the documented
    Ray 2.49 deadlock shape). Compacted for join safety
    (util.compact_nonempty); None when the graph has no edges."""
    edges = graph.edges.select_columns(["src", "dst"])
    rev = edges.map_batches(
        lambda t: table_from_arrays(
            src=col_np(t, "dst"), dst=col_np(t, "src")
        ),
        batch_format="pyarrow",
    )
    return compact_nonempty(edges.union(rev))


# ---------------------------------------------------------------------------
# HITS
# ---------------------------------------------------------------------------


def _hits_broadcast(graph: Graph, cfg: EngineConfig, iterations: int):
    V = graph.num_vertices
    edges = graph.edges
    hub = np.ones(V, dtype=np.float64)
    auth = np.ones(V, dtype=np.float64)

    def scatter(src_col: str, dst_col: str, vec: np.ndarray) -> np.ndarray:
        ref = ray.put(vec)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            s = col_np(batch, src_col)
            d = col_np(batch, dst_col)
            k, p = sparse_sum_reduce(d, v[s])
            return table_from_arrays(vid=k, part=p)

        out = np.zeros(V, dtype=np.float64)
        for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            np.add.at(out, col_np(b, "vid"), col_np(b, "part"))
        return out

    for _ in range(iterations):
        # classic order: authorities from OLD hubs, hubs from NEW
        # authorities; no per-iteration normalization (a scalar factor —
        # normalizing once at the end yields the identical direction and
        # keeps the SQL oracle a plain unrolled join chain)
        auth = scatter("src", "dst", hub)
        hub = scatter("dst", "src", auth)
    hs, as_ = hub.sum(), auth.sum()
    if hs > 0:
        hub = hub / hs
    if as_ > 0:
        auth = auth / as_
    return hub, auth


def _hits_shuffle(
    graph: Graph, cfg: EngineConfig, iterations: int
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    state = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"),
                hub=np.ones(t.num_rows, dtype=np.float64),
                auth=np.ones(t.num_rows, dtype=np.float64),
            ),
            batch_format="pyarrow",
        )
    )

    def zero_out(state, out_col):
        """No deliverable messages: the scatter target column is all 0."""

        def z(t: pa.Table) -> pa.Table:
            cols = {
                "vid": col_np(t, "vid"),
                "hub": col_np(t, "hub"),
                "auth": col_np(t, "auth"),
            }
            cols[out_col] = np.zeros(t.num_rows, dtype=np.float64)
            return table_from_arrays(**cols)

        return state.map_batches(z, batch_format="pyarrow").materialize()

    if edges is None:  # no edges: every score scatters to 0
        return zero_out(zero_out(state, "auth"), "hub")

    def half(state, join_on, emit_key, src_field, out_col):
        """One scatter half: sum state[src_field] over edges grouped by
        the opposite endpoint, write into state[out_col]. Both join
        inputs and the groupby output are compacted (a zero-row first
        block silences Ray 2.49's one-shot join schema broadcast —
        util.compact_nonempty)."""
        msgs = (
            edges.join(
                state, join_type="inner", num_partitions=P,
                on=(join_on,), right_on=("vid",),
            )
            .map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, emit_key), part=col_np(t, src_field)
                ),
                batch_format="pyarrow",
            )
            # map-side combiner: ≤1 row per target per block pre-shuffle
            .map_batches(
                lambda t: table_from_arrays(
                    **dict(
                        zip(
                            ("vid", "part"),
                            sparse_sum_reduce(
                                col_np(t, "vid"), col_np(t, "part")
                            ),
                        )
                    )
                ),
                batch_format="pyarrow",
            )
        )
        # bucketed, NOT groupby(vid): V distinct groups
        msgs = compact_nonempty(
            bucketed_sum_aggregate(msgs, key_cols=["vid"], sum_cols=["part"])
        )
        if msgs is None:  # nothing scattered anywhere this half
            return zero_out(state, out_col)

        def update(t: pa.Table) -> pa.Table:
            part = t.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(
                np.where(part == None, 0.0, part).astype(np.float64)  # noqa: E711
            )
            cols = {
                "vid": col_np(t, "vid"),
                "hub": col_np(t, "hub"),
                "auth": col_np(t, "auth"),
            }
            cols[out_col] = part
            return table_from_arrays(**cols)

        return compact_nonempty(
            state.join(
                msgs, join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("vid",),
            ).map_batches(update, batch_format="pyarrow")
        )

    for _ in range(iterations):
        state = half(state, "src", "dst", "hub", "auth")
        state = half(state, "dst", "src", "auth", "hub")

    sums = state.map_batches(
        lambda t: table_from_arrays(
            hs=np.array([col_np(t, "hub").sum()]),
            as_=np.array([col_np(t, "auth").sum()]),
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("hs", alias_name="hs"), Sum("as_", alias_name="as_"))
    hs = float(sums["hs"]) or 1.0
    as_ = float(sums["as_"]) or 1.0
    return state.map_batches(
        lambda t, _h=hs, _a=as_: table_from_arrays(
            vid=col_np(t, "vid"),
            hub=col_np(t, "hub") / _h,
            auth=col_np(t, "auth") / _a,
        ),
        batch_format="pyarrow",
    ).materialize()


def hits(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    iterations: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, hub, auth); each score vector sums to 1."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "hub": pa.array([], pa.float64()),
                 "auth": pa.array([], pa.float64())}
            )
        )
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        state = _hits_shuffle(graph, cfg, iterations)
        return (
            compact_nonempty(graph.vertices).join(
                state, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "hub", "auth"])
            .materialize()
        )
    hub, auth = _hits_broadcast(graph, cfg, iterations)
    ref = ray.put(np.stack([hub, auth]))

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        ha = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column(
            "hub", pa.array(ha[0][vid])
        ).append_column("auth", pa.array(ha[1][vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# eigenvector centrality (power iteration on A^T, deferred normalization)
# ---------------------------------------------------------------------------


def eigenvector_centrality(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    iterations: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, score): K power-iteration rounds of
    x ← Aᵀx from x = 1 (score(v) sums x(u) over in-edges u→v — the
    directed eigenvector centrality HITS's auth half computes against
    a co-evolving hub vector; here the single-vector classic). No
    per-iteration normalization (a scalar factor): ONE L1 normalize at
    the end, so the SQL oracle is a plain unrolled join chain — the
    same deferred-normalization contract as hits()."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64())}
            )
        )
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        state = _eigen_shuffle(graph, cfg, iterations)
        return (
            compact_nonempty(graph.vertices).join(
                state, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "score"])
            .materialize()
        )
    x = _eigen_broadcast(graph, cfg, iterations)
    ref = ray.put(x)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        xv = ray.get(_ref)
        vid = col_np(batch, "vid")
        return pa.table(
            {"vid": batch.column("vid"), "url": batch.column("url"),
             "score": pa.array(xv[vid], pa.float64())}
        )

    return graph.vertices.select_columns(["vid", "url"]).map_batches(
        attach, batch_format="pyarrow"
    )


def _eigen_broadcast(
    graph: Graph, cfg: EngineConfig, iterations: int
) -> np.ndarray:
    V = graph.num_vertices
    x = np.ones(V, dtype=np.float64)
    for _ in range(iterations):
        ref = ray.put(x)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            s = col_np(batch, "src")
            d = col_np(batch, "dst")
            k, p = sparse_sum_reduce(d, v[s])
            return table_from_arrays(vid=k, part=p)

        out = np.zeros(V, dtype=np.float64)
        for b in graph.edges.map_batches(
            step, batch_format="pyarrow"
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            np.add.at(out, col_np(b, "vid"), col_np(b, "part"))
        x = out
    s = x.sum()
    return x / s if s > 0 else x


def _eigen_shuffle(
    graph: Graph, cfg: EngineConfig, iterations: int
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    state = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"),
                score=np.ones(t.num_rows, dtype=np.float64),
            ),
            batch_format="pyarrow",
        )
    )

    def zeros(st):
        return st.map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"),
                score=np.zeros(t.num_rows, dtype=np.float64),
            ),
            batch_format="pyarrow",
        ).materialize()

    if edges is None:
        return zeros(state)
    for _ in range(iterations):
        msgs = (
            edges.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, "dst"), part=col_np(t, "score")
                ),
                batch_format="pyarrow",
            )
            # map-side combiner: ≤1 row per target per block pre-shuffle
            .map_batches(
                lambda t: table_from_arrays(
                    **dict(
                        zip(
                            ("vid", "part"),
                            sparse_sum_reduce(
                                col_np(t, "vid"), col_np(t, "part")
                            ),
                        )
                    )
                ),
                batch_format="pyarrow",
            )
        )
        msgs = compact_nonempty(
            bucketed_sum_aggregate(msgs, key_cols=["vid"], sum_cols=["part"])
        )
        if msgs is None:
            state = zeros(state)
            continue

        def update(t: pa.Table) -> pa.Table:
            part = t.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(
                np.where(part == None, 0.0, part).astype(np.float64)  # noqa: E711
            )
            return table_from_arrays(vid=col_np(t, "vid"), score=part)

        state = compact_nonempty(
            state.join(
                msgs, join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("vid",),
            ).map_batches(update, batch_format="pyarrow")
        )
    tot = state.map_batches(
        lambda t: table_from_arrays(
            s=np.array([col_np(t, "score").sum()])
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("s", alias_name="s"))
    s = float(tot["s"]) or 1.0
    return state.map_batches(
        lambda t, _s=s: table_from_arrays(
            vid=col_np(t, "vid"), score=col_np(t, "score") / _s
        ),
        batch_format="pyarrow",
    ).materialize()


# ---------------------------------------------------------------------------
# Katz centrality (truncated walk series, dyadic attenuation)
# ---------------------------------------------------------------------------


def katz_centrality(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    iterations: int = 8,
    alpha: float = 0.125,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, score): K rounds of the Katz recurrence
    x ← 1 + α·Aᵀx from x = 1 (β = 1), then ONE L1 normalize — the
    truncated walk series Σ_k α^k (Aᵀ)^k 1 truncated at K.

    α must be a negative power of two (default 1/8): every
    intermediate is then a dyadic rational exactly representable in
    float64, so batch/summation order cannot perturb the result and
    the unrolled SQL oracle replays it bit-exactly — the same
    deferred-normalization exactness contract as
    eigenvector_centrality above. Same broadcast/shuffle gate as every
    vertex-state op (_pick_mode); the shuffle mode keeps x as a
    Dataset column, never a driver array.
    """
    m = np.log2(alpha)
    if not (alpha > 0 and m == np.floor(m)):
        raise ValueError(f"alpha must be a power of two, got {alpha}")
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "score": pa.array([], pa.float64())}
            )
        )
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        state = _katz_shuffle(graph, cfg, iterations, alpha)
        return (
            compact_nonempty(graph.vertices).join(
                state, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "score"])
            .materialize()
        )
    x = _katz_broadcast(graph, cfg, iterations, alpha)
    ref = ray.put(x)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        xv = ray.get(_ref)
        vid = col_np(batch, "vid")
        return pa.table(
            {"vid": batch.column("vid"), "url": batch.column("url"),
             "score": pa.array(xv[vid], pa.float64())}
        )

    return graph.vertices.select_columns(["vid", "url"]).map_batches(
        attach, batch_format="pyarrow"
    )


def _katz_broadcast(
    graph: Graph, cfg: EngineConfig, iterations: int, alpha: float
) -> np.ndarray:
    V = graph.num_vertices
    x = np.ones(V, dtype=np.float64)
    for _ in range(iterations):
        ref = ray.put(x)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            v = ray.get(_ref)
            s = col_np(batch, "src")
            d = col_np(batch, "dst")
            k, p = sparse_sum_reduce(d, v[s])
            return table_from_arrays(vid=k, part=p)

        out = np.zeros(V, dtype=np.float64)
        for b in graph.edges.map_batches(
            step, batch_format="pyarrow"
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            np.add.at(out, col_np(b, "vid"), col_np(b, "part"))
        x = 1.0 + alpha * out
    s = x.sum()
    return x / s if s > 0 else x


def _katz_shuffle(
    graph: Graph, cfg: EngineConfig, iterations: int, alpha: float
) -> "ray.data.Dataset":
    """Dataset-state Katz rounds: per-round inner join edges⋈state on
    src, scatter to dst with a map-side combiner, ONE bucketed sum,
    then a left-outer join back onto the vertex set applying the
    affine 1 + α·msg update (vertices with no in-edges stay at 1)."""
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    ones = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"),
                score=np.ones(t.num_rows, dtype=np.float64),
            ),
            batch_format="pyarrow",
        )
    )
    state = ones
    if edges is None:
        return state.materialize()
    for _ in range(iterations):
        msgs = (
            edges.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(
                lambda t: table_from_arrays(
                    **dict(
                        zip(
                            ("vid", "part"),
                            sparse_sum_reduce(
                                col_np(t, "dst"), col_np(t, "score")
                            ),
                        )
                    )
                ),
                batch_format="pyarrow",
            )
        )
        msgs = compact_nonempty(
            bucketed_sum_aggregate(msgs, key_cols=["vid"], sum_cols=["part"])
        )
        if msgs is None:
            state = ones.materialize()
            continue

        def update(t: pa.Table, _a=alpha) -> pa.Table:
            part = t.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(
                np.where(part == None, 0.0, part).astype(np.float64)  # noqa: E711
            )
            return table_from_arrays(
                vid=col_np(t, "vid"), score=1.0 + _a * part
            )

        state = compact_nonempty(
            ones.join(
                msgs, join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("vid",),
            ).map_batches(update, batch_format="pyarrow")
        )
    tot = state.map_batches(
        lambda t: table_from_arrays(
            s=np.array([col_np(t, "score").sum()])
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("s", alias_name="s"))
    s = float(tot["s"]) or 1.0
    return state.map_batches(
        lambda t, _s=s: table_from_arrays(
            vid=col_np(t, "vid"), score=col_np(t, "score") / _s
        ),
        batch_format="pyarrow",
    ).materialize()


# ---------------------------------------------------------------------------
# BFS hop distance
# ---------------------------------------------------------------------------


def _seed_vids(graph: Graph, seed_urls) -> np.ndarray:
    """Seed urls → vids via a filtered vertex scan (seed set is tiny;
    never a driver dict of all urls — same shape as labelprop's
    _resolve_seeds)."""
    seed_set = pa.array(sorted(set(seed_urls)), type=pa.string())

    def find(t: pa.Table, _set=seed_set) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["url"], value_set=_set)).select(["vid"])

    vids = [
        r["vid"]
        for r in graph.vertices.map_batches(
            find, batch_format="pyarrow"
        ).take_all()
    ]
    return np.asarray(sorted(vids), dtype=np.int64)


def _bfs_broadcast(
    graph: Graph, cfg: EngineConfig, seeds: np.ndarray,
    rounds: int | None, directed: bool,
) -> np.ndarray:
    V = graph.num_vertices
    dist = np.full(V, _INF, dtype=np.int64)
    dist[seeds] = 0
    edges = graph.edges
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for _ in range(max_rounds):
        ref = ray.put(dist)

        def step(batch: pa.Table, _ref=ref, _dir=directed) -> pa.Table:
            d = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            if _dir:
                keys, vals = dst, d[src]
            else:
                keys = np.concatenate([dst, src])
                vals = np.concatenate([d[src], d[dst]])
            fin = vals != _INF
            k, v = sparse_min_reduce(keys[fin], vals[fin] + 1)
            return table_from_arrays(vid=k, cand=v)

        n_updates = 0
        for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            vid = col_np(b, "vid")
            cand = col_np(b, "cand")
            m = cand < dist[vid]
            n_updates += int(m.sum())
            np.minimum.at(dist, vid[m], cand[m])
        if n_updates == 0:
            converged = True
            break
    if rounds is None and not converged:
        raise RuntimeError(
            f"bfs_distances did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    return dist


def _bfs_shuffle(
    graph: Graph, cfg: EngineConfig, seeds: np.ndarray,
    rounds: int | None, directed: bool,
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    edges = (
        compact_nonempty(graph.edges.select_columns(["src", "dst"]))
        if directed
        else _sym_edges(graph)
    )
    seed_set = set(int(s) for s in seeds)
    seed_arr = np.asarray(sorted(seed_set), dtype=np.int64)

    def init(t: pa.Table, _s=seed_arr) -> pa.Table:
        vid = col_np(t, "vid")
        d = np.full(len(vid), _INF, dtype=np.int64)
        d[np.isin(vid, _s)] = 0
        return table_from_arrays(vid=vid, dist=d)

    state = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            init, batch_format="pyarrow"
        )
    )
    if edges is None:  # no edges: only the seeds are reachable
        return state

    max_rounds = rounds if rounds is not None else cfg.max_iterations

    def relax(t: pa.Table) -> pa.Table:
        # map-side combiner: ≤1 candidate per dst per block pre-shuffle
        d = col_np(t, "dist")
        dst = col_np(t, "dst")
        fin = d != _INF
        kk, v = sparse_min_reduce(dst[fin], d[fin] + 1)
        return table_from_arrays(vid=kk, cand=v)

    converged = False
    for _ in range(max_rounds):
        msgs = (
            edges.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(relax, batch_format="pyarrow")
        )
        # bucketed, NOT groupby(vid): V distinct groups
        msgs = compact_nonempty(
            bucketed_aggregate(
                msgs, key_cols=["vid"], aggs=[("cand", "min", "cand")]
            )
        )
        if msgs is None:  # nothing relaxed: fixpoint reached
            converged = True
            break

        def update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            old = col_np(t, "dist")
            # int64-safe null fill (a float round-trip would corrupt
            # the INT64_MAX sentinel)
            cand = np.asarray(
                pc.fill_null(t.column("cand").combine_chunks(), _INF)
            ).astype(np.int64)
            new = np.minimum(old, cand)
            return table_from_arrays(
                vid=col_np(t, "vid"), dist=new,
                changed=(new != old).astype(np.int64),
            )

        joined = compact_nonempty(
            state.join(
                msgs, join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("vid",),
            ).map_batches(update, batch_format="pyarrow")
        )
        n_changed = int(joined.aggregate(Sum("changed", alias_name="c"))["c"])
        state = compact_nonempty(joined.drop_columns(["changed"]))
        if n_changed == 0:
            converged = True
            break
    if rounds is None and not converged:
        raise RuntimeError(
            f"bfs_distances (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    return state


def bfs_distances(
    graph: Graph,
    seed_urls,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    directed: bool = False,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """Min-hop distance from ``seed_urls`` → Dataset (url, dist) over
    REACHED vertices only (unreachable vertices are absent, matching
    what a transitive-closure SQL oracle produces). With ``rounds=R``
    exactly R synchronous relaxation rounds run, so only vertices at
    distance ≤ R appear."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "dist": pa.array([], pa.int64())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    seeds = _seed_vids(graph, seed_urls)
    if len(seeds) == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        state = _bfs_shuffle(graph, cfg, seeds, rounds, directed)
        reached = compact_nonempty(
            state.map_batches(
                lambda t: t.filter(
                    pa.array(col_np(t, "dist") != _INF)
                ),
                batch_format="pyarrow",
            )
        )
        if reached is None:  # possible only if the seed rows vanished
            return ray.data.from_arrow(empty)
        return (
            compact_nonempty(graph.vertices).join(
                reached, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["url", "dist"])
            .materialize()
        )
    dist = _bfs_broadcast(graph, cfg, seeds, rounds, directed)
    ref = ray.put(dist)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        d = ray.get(_ref)
        vid = col_np(batch, "vid")
        dv = d[vid]
        m = dv != _INF
        return pa.table(
            {"url": batch.column("url").filter(pa.array(m)),
             "dist": pa.array(dv[m])}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# k-core peeling
# ---------------------------------------------------------------------------


def _kcore_broadcast(
    graph: Graph, cfg: EngineConfig, k: int, rounds: int | None
) -> np.ndarray:
    """→ int64 per-vertex array: alive-internal degree for members of
    the k-core (after peeling), -1 for peeled vertices."""
    V = graph.num_vertices
    alive = np.ones(V, dtype=bool)
    edges = graph.edges
    max_rounds = rounds if rounds is not None else cfg.max_iterations

    def alive_degrees(alive: np.ndarray) -> np.ndarray:
        ref = ray.put(alive)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            a = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            m = a[src] & a[dst]
            keys = np.concatenate([src[m], dst[m]])
            kk, s = sparse_sum_reduce(
                keys, np.ones(len(keys), dtype=np.int64)
            )
            return table_from_arrays(vid=kk, c=s)

        deg = np.zeros(V, dtype=np.int64)
        for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            np.add.at(deg, col_np(b, "vid"), col_np(b, "c"))
        return deg

    converged = False
    deg = alive_degrees(alive)
    for _ in range(max_rounds):
        nxt = alive & (deg >= k)
        if np.array_equal(nxt, alive):
            converged = True
            break
        alive = nxt
        deg = alive_degrees(alive)
    if rounds is None and not converged:
        raise RuntimeError(
            f"kcore did not converge within max_iterations={cfg.max_iterations}"
        )
    # deg is over the FINAL alive set here: recomputed after the last
    # peel (loop tail) or unchanged at the fixpoint (break)
    return np.where(alive, deg, -1)


def _kcore_shuffle(
    graph: Graph, cfg: EngineConfig, k: int, rounds: int | None
) -> "ray.data.Dataset":
    """Scale path: the iterated state is the shrinking alive-alive EDGE
    Dataset (peeling deletes vertices, so the edge set only shrinks —
    each round is one degree groupby + two semi-join filters, all
    distributed)."""
    P = cfg.num_partitions
    empty_edges_t = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    if edges is None:  # edgeless graph: every vertex peels at k >= 1
        edges = ray.data.from_arrow(empty_edges_t)
    max_rounds = rounds if rounds is not None else cfg.max_iterations

    def edge_degrees(edges, col="c") -> "ray.data.Dataset":
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # post-join empties are schema-less
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     col: pa.array([], pa.int64())}
                )
            keys = np.concatenate([col_np(t, "src"), col_np(t, "dst")])
            kk, s = sparse_sum_reduce(
                keys, np.ones(len(keys), dtype=np.int64)
            )
            return table_from_arrays(**{"vid": kk, col: s})

        # bucketed, NOT groupby(vid): V distinct groups
        return bucketed_sum_aggregate(
            edges.map_batches(partial, batch_format="pyarrow"),
            key_cols=["vid"], sum_cols=[col],
        )

    def at_least_k(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-groupby empties are schema-less too
            return pa.table({"vid": pa.array([], pa.int64())})
        return t.filter(pa.array(col_np(t, "c") >= k)).select(["vid"])

    converged = False
    alive = None
    n_alive_prev = -1
    empty_edges = pa.table(
        {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())}
    )
    for _ in range(max_rounds):
        # compact_nonempty everywhere a Dataset feeds a join: a
        # zero-row first block silences Ray 2.49's one-shot join schema
        # broadcast (util.compact_nonempty)
        alive = compact_nonempty(
            edge_degrees(edges).map_batches(
                at_least_k, batch_format="pyarrow"
            )
        )
        n_alive = alive.count() if alive is not None else 0
        if n_alive == n_alive_prev:
            converged = True
            break
        n_alive_prev = n_alive
        if n_alive == 0:
            alive = ray.data.from_arrow(
                pa.table({"vid": pa.array([], pa.int64())})
            )
            edges = ray.data.from_arrow(empty_edges)
            converged = True
            break
        # two semi-joins with a compaction (= materialize) between them
        # (Ray 2.49: fused JoinOperators deadlock on small CPU budgets)
        edges = compact_nonempty(
            edges.join(
                alive, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).select_columns(["src", "dst"])
        )
        if edges is not None:
            edges = compact_nonempty(
                edges.join(
                    alive, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).select_columns(["src", "dst"])
            )
        if edges is None:  # no edge survived; next round peels the rest
            edges = ray.data.from_arrow(empty_edges)
    if rounds is None and not converged:
        raise RuntimeError(
            f"kcore (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    if alive is None:  # max_rounds == 0: no peeling
        alive = graph.vertices.select_columns(["vid"]).materialize()
    # final core degrees over the surviving edge set, zero-filled over
    # the alive set: a vertex that survived the last peel but lost all
    # neighbors to it (possible under fixed-round semantics) keeps a
    # core_degree=0 row, matching broadcast mode and the SQL oracle
    if edges.count() == 0:
        # the last peel consumed every edge: all survivors are isolated
        # (skip the join — an all-empty right side is schema-less)
        return alive.map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"),
                core_degree=np.zeros(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        ).materialize()
    deg = compact_nonempty(edge_degrees(edges, col="core_degree"))
    joined = alive.join(
        deg, join_type="left_outer", num_partitions=P,
        on=("vid",), right_on=("vid",),
    )

    def fill0(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        if t.num_rows == 0:  # post-join empty blocks are schema-less
            return pa.table(
                {"vid": pa.array([], pa.int64()),
                 "core_degree": pa.array([], pa.int64())}
            )
        cd = np.asarray(
            pc.fill_null(t.column("core_degree").combine_chunks(), 0)
        ).astype(np.int64)
        return table_from_arrays(vid=col_np(t, "vid"), core_degree=cd)

    return joined.map_batches(fill0, batch_format="pyarrow").materialize()


def kcore(
    graph: Graph,
    k: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """k-core members after iterative peeling → Dataset
    (url, core_degree) where core_degree is the vertex's degree within
    the surviving subgraph. Treats the graph as undirected over its
    canonical (deduplicated) edge rows. ``rounds=R`` runs exactly R
    peel rounds (fixed-round semantics for the SQL oracle replay)."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "core_degree": pa.array([], pa.int64())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        deg = _kcore_shuffle(graph, cfg, k, rounds)
        if deg.count() == 0:  # empty core: skip the empty-side join
            return ray.data.from_arrow(empty)
        # Survived-but-isolated vertices (possible under fixed-round
        # semantics: a vertex passes the last peel, then loses every
        # neighbor to it) are KEPT with core_degree 0 in both modes:
        # _kcore_shuffle's final alive ⟕ degrees join zero-fills them,
        # matching broadcast's post-peel degree recompute (pinned by
        # tests/test_traversal.py::test_kcore_fixed_round_modes_agree).
        return (
            compact_nonempty(graph.vertices).join(
                compact_nonempty(deg), join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["url", "core_degree"])
            .materialize()
        )
    core = _kcore_broadcast(graph, cfg, k, rounds)
    ref = ray.put(core)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        vid = col_np(batch, "vid")
        cv = c[vid]
        m = cv >= 0
        return pa.table(
            {"url": batch.column("url").filter(pa.array(m)),
             "core_degree": pa.array(cv[m])}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def kshells(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    k_max: int = 6,
    rounds: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset | pa.Table":
    """k-shell decomposition under fixed-round semantics → Dataset
    (url, shell) where shell(v) = max k in 1..k_max such that v
    survives ``rounds`` peel rounds of k-core peeling (0 if none — the
    coreness number when every peel converges within ``rounds``).

    Scale shape: k_max independent kcore() peels (each inherits the
    broadcast/shuffle gate), their member sets tagged with k, unioned,
    and reduced with ONE bucketed max over url — membership tables are
    ≤ V rows each, never driver-materialized."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "shell": pa.array([], pa.int64())}
    )
    if graph.num_vertices == 0:
        return empty
    tagged = []
    for k in range(1, k_max + 1):
        mem = kcore(graph, k, cfg, rounds=rounds, mode=mode)

        def tag(t: pa.Table, _k=k) -> pa.Table:
            return pa.table(
                {"url": t.column("url"),
                 "shell": pa.array(
                     np.full(t.num_rows, _k, dtype=np.int64), pa.int64()
                 )}
            )

        tagged.append(
            mem.select_columns(["url"]).map_batches(
                tag, batch_format="pyarrow"
            )
        )
    base = graph.vertices.select_columns(["url"]).map_batches(
        lambda t: pa.table(
            {"url": t.column("url"),
             "shell": pa.array(
                 np.zeros(t.num_rows, dtype=np.int64), pa.int64()
             )}
        ),
        batch_format="pyarrow",
    )
    allmem = base
    for part in tagged:
        allmem = allmem.union(part)
    out = bucketed_aggregate(
        allmem, key_cols=["url"], aggs=[("shell", "max", "shell")]
    )
    return compact_nonempty(out) or empty


# ---------------------------------------------------------------------------
# weighted single-source shortest paths (min-plus relaxation)
# ---------------------------------------------------------------------------


def _sssp_broadcast(
    graph: Graph, cfg: EngineConfig, seeds: np.ndarray,
    wedges: "ray.data.Dataset", rounds: int | None,
) -> np.ndarray:
    V = graph.num_vertices
    dist = np.full(V, _INF, dtype=np.int64)
    dist[seeds] = 0
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for _ in range(max_rounds):
        ref = ray.put(dist)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            w = col_np(batch, "w")
            # undirected: relax both directions; finite-source only
            # (INF + w overflows int64)
            keys = np.concatenate([dst, src])
            base = np.concatenate([d[src], d[dst]])
            ww = np.concatenate([w, w])
            fin = base != _INF
            k, v = sparse_min_reduce(keys[fin], base[fin] + ww[fin])
            return table_from_arrays(vid=k, cand=v)

        n_updates = 0
        for b in wedges.map_batches(
            step, batch_format="pyarrow"
        ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            vid = col_np(b, "vid")
            cand = col_np(b, "cand")
            m = cand < dist[vid]
            n_updates += int(m.sum())
            np.minimum.at(dist, vid[m], cand[m])
        if n_updates == 0:
            converged = True
            break
    if rounds is None and not converged:
        raise RuntimeError(
            f"sssp_distances did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    return dist


def _sssp_shuffle(
    graph: Graph, cfg: EngineConfig, seeds: np.ndarray,
    wedges: "ray.data.Dataset", rounds: int | None,
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    # one both-direction weighted view so each round needs one join
    rev = wedges.map_batches(
        lambda t: table_from_arrays(
            src=col_np(t, "dst"), dst=col_np(t, "src"), w=col_np(t, "w")
        ),
        batch_format="pyarrow",
    )
    edges = compact_nonempty(wedges.union(rev))
    seed_arr = np.asarray(sorted(set(int(s) for s in seeds)), dtype=np.int64)

    def init(t: pa.Table, _s=seed_arr) -> pa.Table:
        vid = col_np(t, "vid")
        d = np.full(len(vid), _INF, dtype=np.int64)
        d[np.isin(vid, _s)] = 0
        return table_from_arrays(vid=vid, dist=d)

    state = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            init, batch_format="pyarrow"
        )
    )
    if edges is None:  # no edges: only the seeds are reachable
        return state

    max_rounds = rounds if rounds is not None else cfg.max_iterations

    def relax(t: pa.Table) -> pa.Table:
        d = col_np(t, "dist")
        dst = col_np(t, "dst")
        w = col_np(t, "w")
        fin = d != _INF
        kk, v = sparse_min_reduce(dst[fin], d[fin] + w[fin])
        return table_from_arrays(vid=kk, cand=v)

    converged = False
    for _ in range(max_rounds):
        msgs = compact_nonempty(
            bucketed_aggregate(
                edges.join(
                    state, join_type="inner", num_partitions=P,
                    on=("src",), right_on=("vid",),
                ).map_batches(relax, batch_format="pyarrow"),
                key_cols=["vid"], aggs=[("cand", "min", "cand")],
            )
        )
        if msgs is None:  # nothing relaxed: fixpoint
            converged = True
            break

        def update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            old = col_np(t, "dist")
            cand = np.asarray(
                pc.fill_null(t.column("cand").combine_chunks(), _INF)
            ).astype(np.int64)
            new = np.minimum(old, cand)
            return table_from_arrays(
                vid=col_np(t, "vid"), dist=new,
                changed=(new != old).astype(np.int64),
            )

        joined = compact_nonempty(
            state.join(
                msgs, join_type="left_outer", num_partitions=P,
                on=("vid",), right_on=("vid",),
            ).map_batches(update, batch_format="pyarrow")
        )
        n_changed = int(joined.aggregate(Sum("changed", alias_name="c"))["c"])
        state = compact_nonempty(joined.drop_columns(["changed"]))
        if n_changed == 0:
            converged = True
            break
    if rounds is None and not converged:
        raise RuntimeError(
            f"sssp_distances (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    return state


def sssp_distances(
    graph: Graph,
    seed_urls,
    wedges: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """Weighted min-plus shortest-path distance from ``seed_urls`` over
    an undirected weighted edge Dataset (src, dst, w int64; vid space)
    → Dataset (url, dist) over REACHED vertices. ``rounds=R`` relaxes
    exactly R synchronous rounds, i.e. min cost over paths of ≤ R
    edges (the bounded recursive-CTE oracle's trajectory). Same
    Bellman-Ford-style relaxation as bfs_distances with dist+w messages
    instead of dist+1 (the reference's fixpoint relaxation generalized
    to the tropical semiring)."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "dist": pa.array([], pa.int64())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    seeds = _seed_vids(graph, seed_urls)
    if len(seeds) == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        state = _sssp_shuffle(graph, cfg, seeds, wedges, rounds)
        reached = compact_nonempty(
            state.map_batches(
                lambda t: t.filter(pa.array(col_np(t, "dist") != _INF)),
                batch_format="pyarrow",
            )
        )
        if reached is None:
            return ray.data.from_arrow(empty)
        return (
            compact_nonempty(graph.vertices).join(
                reached, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["url", "dist"])
            .materialize()
        )
    dist = _sssp_broadcast(graph, cfg, seeds, wedges, rounds)
    ref = ray.put(dist)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        d = ray.get(_ref)
        vid = col_np(batch, "vid")
        dv = d[vid]
        m = dv != _INF
        return pa.table(
            {"url": batch.column("url").filter(pa.array(m)),
             "dist": pa.array(dv[m])}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def densest_members(
    graph: Graph, cfg: EngineConfig = DEFAULT_CONFIG, rounds: int = 2
) -> "ray.data.Dataset":
    """The surviving dense-core vertex set after ``rounds`` Bahmani
    ε = 1/2 peels (densest_census's trajectory) → (url, core_degree):
    members of the round-`rounds` subgraph with their internal degree.
    Same Dataset-state peel; the final set joins vertices for urls."""
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    V_t = graph.num_vertices
    E_t = graph.num_edges if edges is not None else 0
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "core_degree": pa.array([], pa.int64())}
    )

    def edge_degrees(eds) -> "ray.data.Dataset":
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     "c": pa.array([], pa.int64())}
                )
            keys = np.concatenate([col_np(t, "src"), col_np(t, "dst")])
            kk, s = sparse_sum_reduce(keys, np.ones(len(keys), np.int64))
            return table_from_arrays(vid=kk, c=s)

        return bucketed_sum_aggregate(
            eds.map_batches(partial, batch_format="pyarrow"),
            key_cols=["vid"], sum_cols=["c"],
        )

    alive = None
    for _ in range(rounds):
        if V_t == 0 or edges is None:
            return ray.data.from_arrow(empty)
        nv, ne = V_t, E_t

        def survives(t: pa.Table, _nv=nv, _ne=ne) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"vid": pa.array([], pa.int64())})
            keep = col_np(t, "c") * _nv > 3 * _ne
            return pa.table({"vid": t.column("vid").filter(pa.array(keep))})

        alive = compact_nonempty(
            edge_degrees(edges).map_batches(survives, batch_format="pyarrow")
        )
        if alive is None:
            return ray.data.from_arrow(empty)
        V_t = alive.count()
        edges = compact_nonempty(
            edges.join(
                alive, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).select_columns(["src", "dst"])
        )
        if edges is not None:
            edges = compact_nonempty(
                edges.join(
                    alive, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).select_columns(["src", "dst"])
            )
        E_t = edges.count() if edges is not None else 0
    if alive is None:  # rounds == 0
        return ray.data.from_arrow(empty)
    deg = (
        compact_nonempty(edge_degrees(edges)) if edges is not None else None
    )
    withdeg = alive
    if deg is not None:
        withdeg = alive.join(
            deg.rename_columns({"vid": "dv"}),
            join_type="left_outer", num_partitions=P,
            on=("vid",), right_on=("dv",),
        )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cd = (
            pc.fill_null(t.column("c").cast(pa.int64()), 0)
            if "c" in t.schema.names
            else pa.array(np.zeros(t.num_rows, np.int64))
        )
        return pa.table({"vid": t["vid"], "core_degree": cd})

    labeled = compact_nonempty(
        withdeg.map_batches(finish, batch_format="pyarrow")
    )
    if labeled is None:
        return ray.data.from_arrow(empty)
    return (
        compact_nonempty(graph.vertices).join(
            labeled, join_type="inner", num_partitions=P,
            on=("vid",), right_on=("vid",),
        )
        .select_columns(["url", "core_degree"])
        .sort("url")
    )


def densest_census(
    graph: Graph, cfg: EngineConfig = DEFAULT_CONFIG, rounds: int = 4
) -> pa.Table:
    """Distributed densest-subgraph greedy peeling census (Bahmani,
    Kumar & Vassilvitskii, VLDB 2012 — the MapReduce (2+2ε)-approx of
    Charikar's peel): each round removes EVERY vertex whose degree is
    ≤ 2(1+ε)·density; with ε = 1/2 the survivor test is the exact
    integer predicate deg(v)·|V_t| > 3·|E_t| (no float density
    anywhere). → (rnd, n_vertices, n_edges) per round while the
    subgraph is non-empty: the density trajectory whose max-density
    prefix is the approximate densest subgraph. Edges are treated as
    undirected (degree = endpoint multiplicity over the canonical
    dedup'd edge rows).

    Scale shape: the iterated state is the shrinking alive-vertex and
    alive-alive-edge DATASETS (kcore's peel exchange — one bucketed
    degree aggregation + two semi-joins per round); the driver holds
    two integers per round. O(log V) rounds suffice at any scale
    (Bahmani Thm 2), so `rounds` is a census horizon, not a cap tune.
    """
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    V_t, E_t = graph.num_vertices, graph.num_edges if edges is not None else 0
    out_r, out_v, out_e = [], [], []

    def edge_degrees(eds) -> "ray.data.Dataset":
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:  # post-join empties are schema-less
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     "c": pa.array([], pa.int64())}
                )
            keys = np.concatenate([col_np(t, "src"), col_np(t, "dst")])
            kk, s = sparse_sum_reduce(keys, np.ones(len(keys), np.int64))
            return table_from_arrays(vid=kk, c=s)

        return bucketed_sum_aggregate(
            eds.map_batches(partial, batch_format="pyarrow"),
            key_cols=["vid"], sum_cols=["c"],
        )

    for r in range(rounds):
        if V_t == 0:
            break
        out_r.append(r)
        out_v.append(V_t)
        out_e.append(E_t)
        if edges is None:
            V_t, E_t = 0, 0
            continue
        nv, ne = V_t, E_t

        def survives(t: pa.Table, _nv=nv, _ne=ne) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"vid": pa.array([], pa.int64())})
            keep = col_np(t, "c") * _nv > 3 * _ne
            return pa.table({"vid": t.column("vid").filter(pa.array(keep))})

        alive = compact_nonempty(
            edge_degrees(edges).map_batches(survives, batch_format="pyarrow")
        )
        if alive is None:
            V_t, E_t, edges = 0, 0, None
            continue
        V_t = alive.count()
        # two semi-joins with a compaction (= materialize) between them
        # (Ray 2.49: fused JoinOperators deadlock on small CPU budgets)
        edges = compact_nonempty(
            edges.join(
                alive, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            ).select_columns(["src", "dst"])
        )
        if edges is not None:
            edges = compact_nonempty(
                edges.join(
                    alive, join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("vid",),
                ).select_columns(["src", "dst"])
            )
        E_t = edges.count() if edges is not None else 0

    return pa.table(
        {"rnd": pa.array(out_r, pa.int64()),
         "n_vertices": pa.array(out_v, pa.int64()),
         "n_edges": pa.array(out_e, pa.int64())}
    )
