"""PageRank — power iteration with dangling-mass redistribution.

Engine mapping (SURVEY.md §7.1 M4): per-iteration contributions are a
``map_batches`` over the edge table with a WITHIN-BATCH combiner
(sparse per-dst partial sums), then a small ``groupby(dst).sum``
shuffle. The combiner is the skew treatment: a hub destination
receives at most one row per edge block instead of one per in-edge,
so the final aggregate sees ≤ #blocks rows per hot key — the salted
partial/final split of SURVEY.md §4.1 with salt = block id.

Formula (matches networkx.pagerank on an unweighted simple DiGraph):
    r' = (1-d)/V + d * (Σ_in r[src]/outdeg[src] + dangling_mass/V)
Convergence: L1 < V * tol (networkx's criterion) and L∞ < tol; float64
throughout (SURVEY.md §7.4).

Modes: broadcast (numpy rank vector via ray.put per round; ≤~10^8
vertices/node) and shuffle (rank as a Dataset joined to edges each
round — the 10^12-vertex path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph, degrees
from ..util import (
    bucketed_sum_aggregate,
    col_np,
    dataset_to_numpy,
    sparse_sum_reduce,
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


def _pr_broadcast(
    graph: Graph, cfg: EngineConfig, on_iter=None, ckpt=None, restart=None
) -> np.ndarray:
    V = graph.num_vertices
    d = cfg.pagerank_damping
    outdeg = degrees(graph, "out").astype(np.float64)
    dangling = outdeg == 0
    # restart: optional personalization distribution p (V floats, Σp=1).
    # Teleport AND dangling mass follow p (networkx convention); the
    # uniform path below keeps its original scalar form bit-for-bit so
    # cross-mode exactness tests stay valid.
    p = None if restart is None else np.asarray(restart, dtype=np.float64)
    ranks = (
        np.full(V, 1.0 / V, dtype=np.float64) if p is None else p.copy()
    )
    edges = graph.edges

    start_iter = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ranks = ckpt.load_arrays(m, "rank")["rank"]
            start_iter = m["iteration"] + 1

    for it in range(start_iter, cfg.max_iterations):
        contrib = np.zeros(V, dtype=np.float64)
        nz = outdeg > 0
        contrib[nz] = ranks[nz] / outdeg[nz]
        ref = ray.put(contrib)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            k, s = sparse_sum_reduce(dst, c[src])
            return table_from_arrays(vid=k, part=s)

        partials = edges.map_batches(step, batch_format="pyarrow")
        incoming = np.zeros(V, dtype=np.float64)
        if V <= cfg.broadcast_max_vertices // max(cfg.num_partitions, 1):
            # vertex state fits comfortably: stream ≤V-row partials
            # straight to the driver and scatter-add (no second shuffle)
            for b in partials.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                np.add.at(incoming, col_np(b, "vid"), col_np(b, "part"))
        else:
            agg = bucketed_sum_aggregate(
                partials, key_cols=["vid"], sum_cols=["part"]
            )
            res = dataset_to_numpy(agg, "vid", "part")
            incoming[res["vid"]] = res["part"]

        dangling_mass = float(ranks[dangling].sum())
        if p is None:
            new = (1.0 - d) / V + d * (incoming + dangling_mass / V)
        else:
            new = (1.0 - d) * p + d * (incoming + dangling_mass * p)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        if ckpt is not None and cfg.checkpoint_every and (
            (it + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_arrays(it, {"rank": ranks}, {"delta_l1": delta})
        if on_iter is not None:
            on_iter(it, ranks, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return ranks


def _pr_shuffle(
    graph: Graph, cfg: EngineConfig, on_iter=None, ckpt=None
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    V = graph.num_vertices
    d = cfg.pagerank_damping

    # Dataset-native outdeg init (no driver V-array); dangling vertices
    # keep outdeg 0 via degree_dataset's zero rows
    from ..stages.graph_build import degree_dataset

    deg_ds = degree_dataset(graph, "out", col="outdeg")
    state = deg_ds.map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid"),
            rank=np.full(t.num_rows, 1.0 / V),
            outdeg=col_np(t, "outdeg").astype(np.float64),
        ),
        batch_format="pyarrow",
    ).materialize()
    start_iter = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            state = ray.data.read_parquet(
                m["path"], columns=["vid", "rank", "outdeg"]
            ).materialize()
            start_iter = m["iteration"] + 1
    edges = graph.edges.select_columns(["src", "dst"])

    for it in range(start_iter, cfg.max_iterations):
        # dangling mass: small aggregate over the state table
        def dang(batch: pa.Table) -> pa.Table:
            r = col_np(batch, "rank")
            od = col_np(batch, "outdeg")
            return table_from_arrays(m=np.array([r[od == 0].sum()]))

        dm_tbl = state.map_batches(dang, batch_format="pyarrow").aggregate(
            Sum("m", alias_name="m")
        )
        dangling_mass = float(dm_tbl["m"])

        contribs = (
            edges.join(
                state, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, "dst"),
                    part=col_np(t, "rank") / col_np(t, "outdeg"),
                ),
                batch_format="pyarrow",
            )
            # map-side combiner: ≤1 row per dst per block before shuffle
            .map_batches(
                lambda t: table_from_arrays(
                    *(),
                    **dict(
                        zip(
                            ("vid", "part"),
                            sparse_sum_reduce(col_np(t, "vid"), col_np(t, "part")),
                        )
                    ),
                ),
                batch_format="pyarrow",
            )
        )
        # bucketed, NOT groupby(vid): V distinct groups
        contribs = bucketed_sum_aggregate(
            contribs, key_cols=["vid"], sum_cols=["part"]
        )

        base = (1.0 - d) / V + d * dangling_mass / V

        def update(batch: pa.Table, _base=base, _d=d) -> pa.Table:
            old = col_np(batch, "rank")
            part = batch.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(np.where(part == None, 0.0, part).astype(np.float64))  # noqa: E711
            new = _base + _d * part
            out = table_from_arrays(
                vid=col_np(batch, "vid"),
                rank=new,
                outdeg=col_np(batch, "outdeg"),
                delta=np.abs(new - old),
            )
            return out

        joined = state.join(
            contribs, join_type="left_outer", num_partitions=P,
            on=("vid",), right_on=("vid",),
        ).map_batches(update, batch_format="pyarrow")
        joined = joined.materialize()
        delta = float(joined.aggregate(Sum("delta", alias_name="s"))["s"])
        state = joined.drop_columns(["delta"]).materialize()
        if ckpt is not None and cfg.checkpoint_every and (
            (it + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_dataset(it, state, metrics={"delta_l1": delta})
        if on_iter is not None:
            on_iter(it, state, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return state


@ray.remote
def _block_partial_sliced(block: pa.Table, contrib: np.ndarray, V: int,
                          bounds: np.ndarray):
    """Dense per-block dst-sums, returned as P vertex-range slices
    (Ray multi-return) so the reduction can be range-parallel."""
    src = col_np(block, "src")
    dst = col_np(block, "dst")
    # NOT chunked like _range_partial: the dense V-length result is the
    # dominant allocation here, and chunking would re-allocate it per
    # chunk (bincount minlength=V) — strictly worse
    dense = np.bincount(dst, weights=contrib[src], minlength=V)
    return tuple(dense[bounds[i]: bounds[i + 1]] for i in range(len(bounds) - 1))


@ray.remote
def _slice_sum(*parts: np.ndarray) -> np.ndarray:
    out = parts[0].copy()
    for p in parts[1:]:
        out += p
    return out


def _pr_blocks(
    graph: Graph, cfg: EngineConfig, on_iter=None, ckpt=None,
) -> np.ndarray:
    """Low-latency iteration engine: raw Ray tasks over the SAME
    materialized Arrow edge blocks the Dataset holds (zero-copy object
    store reads), dense per-block bincount partials, and a
    RANGE-SLICED reduction: every partial is returned as P vertex-range
    slices; P slice-sum tasks each aggregate one range across all
    blocks in parallel (a static range-partitioned shuffle — the same
    exchange a multi-node cluster would run, minus the network).

    Same math as _pr_broadcast (summation order differs within float64
    rounding). This is the path the Dataset API can't express
    efficiently — per-iteration latency is ~tasks, not a fresh streaming
    execution; the Dataset modes remain the semantic reference.
    """
    V = graph.num_vertices
    d = cfg.pagerank_damping
    outdeg = degrees(graph, "out").astype(np.float64)
    dangling = outdeg == 0
    nz = outdeg > 0
    ranks = np.full(V, 1.0 / V, dtype=np.float64)
    blocks = graph.edge_blocks()
    P = max(1, min(cfg.num_partitions, V // 4096 + 1))
    bounds = np.linspace(0, V, P + 1).astype(np.int64)

    start_iter = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ranks = ckpt.load_arrays(m, "rank")["rank"]
            start_iter = m["iteration"] + 1

    for it in range(start_iter, cfg.max_iterations):
        contrib = np.zeros(V, dtype=np.float64)
        contrib[nz] = ranks[nz] / outdeg[nz]
        contrib_ref = ray.put(contrib)
        part_refs = [
            _block_partial_sliced.options(
                num_returns=P if P > 1 else None
            ).remote(b, contrib_ref, V, bounds)
            for b in blocks
        ]
        if P == 1:
            # single range: task's one return is the 1-tuple itself
            incoming = np.zeros(V)
            for t in ray.get(part_refs):
                incoming += t[0]
        else:
            slice_refs = [
                _slice_sum.remote(*[pr[p] for pr in part_refs])
                for p in range(P)
            ]
            incoming = (
                np.concatenate(ray.get(slice_refs))
                if slice_refs
                else np.zeros(V)
            )
        dangling_mass = float(ranks[dangling].sum())
        new = (1.0 - d) / V + d * (incoming + dangling_mass / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        if ckpt is not None and cfg.checkpoint_every and (
            (it + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_arrays(it, {"rank": ranks}, {"delta_l1": delta})
        if on_iter is not None:
            on_iter(it, ranks, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return ranks


def _csc_part(src: np.ndarray, dst_sorted: np.ndarray) -> dict:
    """Run-compress a dst-SORTED edge slice into the per-partition CSC
    block form: src per edge + one (dst, run-start) entry per distinct
    dst. Cuts the per-iteration edge scan from (src+dst) 16B/edge to
    8B/edge + ~16B/distinct-dst, and lets the iteration kernel use
    add.reduceat over runs instead of bincount.

    (Id narrowing to int32 was also A/B-tested here and measured ~20%
    SLOWER — np.bincount casts to intp per call — which motivated this
    run compression instead.)"""
    if len(dst_sorted) == 0:
        return {"src": src, "dst_u": dst_sorted,
                "starts": np.empty(0, dtype=np.int64)}
    b = np.empty(len(dst_sorted), dtype=bool)
    b[0] = True
    np.not_equal(dst_sorted[1:], dst_sorted[:-1], out=b[1:])
    starts = np.flatnonzero(b)
    return {"src": src, "dst_u": dst_sorted[starts], "starts": starts}


@ray.remote
def _split_block_by_dst_range(block: pa.Table, bounds: np.ndarray):
    """One-time layout shuffle: split an edge block into P run-compressed
    CSC sub-blocks clustered by dst range (the static range partitioning
    a multi-node exchange would use — the north star's "per-partition
    CSR blocks" laid out along the exchange axis)."""
    src = col_np(block, "src")
    dst = col_np(block, "dst")
    order = np.argsort(dst, kind="stable")
    src, dst = src[order], dst[order]
    cuts = np.searchsorted(dst, bounds[1:-1])
    src_parts = np.split(src, cuts)
    dst_parts = np.split(dst, cuts)
    return tuple(_csc_part(s, d) for s, d in zip(src_parts, dst_parts))


@ray.remote
def _range_partial(contrib_ref, lo: int, hi: int, *parts) -> np.ndarray:
    """Sum contributions INTO one owned dst range only — the task's
    output is (hi-lo) floats, not V (VERDICT #3: cut per-iteration
    exchange volume P-fold vs dense per-block partials)."""
    contrib = contrib_ref
    n = hi - lo
    acc = np.zeros(n, dtype=np.float64)
    # all paths are CHUNKED: a monolithic pass over a multi-10M-edge
    # part materializes contrib[src] temporaries of 100+ MB, which the
    # allocator mmaps fresh each call — page-fault thrash measured 27x
    # slower than cache-sized chunks on this host
    CH = 1 << 21
    for part in parts:
        if isinstance(part, dict) and "starts" in part:
            # run-compressed CSC block: per-run add.reduceat
            src, dst_u, starts = part["src"], part["dst_u"], part["starts"]
            E = len(src)
            if E == 0:
                continue
            nruns = len(starts)
            # chunk on RUN boundaries so each reduceat sees whole runs
            rch = max(1, (nruns * CH) // max(E, 1))
            for r0 in range(0, nruns, rch):
                r1 = min(r0 + rch, nruns)
                e0 = int(starts[r0])
                e1 = int(starts[r1]) if r1 < nruns else E
                w = contrib[src[e0:e1]]
                acc[dst_u[r0:r1] - lo] += np.add.reduceat(
                    w, starts[r0:r1] - e0
                )
            continue
        if isinstance(part, pa.Table):  # pre-grouped Arrow edge slab
            src, dst = col_np(part, "src"), col_np(part, "dst")
        else:
            src, dst = part["src"], part["dst"]
        for s0 in range(0, len(dst), CH):
            sl = slice(s0, s0 + CH)
            acc += np.bincount(
                dst[sl] - lo, weights=contrib[src[sl]], minlength=n
            )
    return acc


def _pr_ranges(
    graph: Graph, cfg: EngineConfig, on_iter=None, ckpt=None,
    groups_per_range: int = 2,
) -> np.ndarray:
    """Dst-range-partitioned iteration engine (the scale path's static
    exchange): edges are laid out ONCE clustered by destination range;
    every iteration runs one task per (range, block-group) that emits
    ONLY its owned V/P-slice, and a per-range sum completes the
    exchange. Per-iteration exchange volume is groups×V floats — P×
    smaller than dense per-block partials — which is exactly the
    traffic shape of a range-partitioned multi-node shuffle.

    Same math as _pr_broadcast (summation order differs within float64
    rounding)."""
    V = graph.num_vertices
    d = cfg.pagerank_damping
    outdeg = degrees(graph, "out").astype(np.float64)
    dangling = outdeg == 0
    nz = outdeg > 0
    ranks = np.full(V, 1.0 / V, dtype=np.float64)
    P = max(1, min(cfg.num_partitions, V // 4096 + 1))
    bounds = np.linspace(0, V, P + 1).astype(np.int64)

    # one-time dst-range layout (the analogue of writing the CSR
    # blocks) — memoized on the Graph so repeated runs reuse it
    cache_key = ("dst_ranges", P)
    per_range = graph._layout_cache.get(cache_key)
    if per_range is None:
        blocks = graph.edge_blocks()
        if P == 1:
            per_range = [list(blocks)]  # one range owns everything
        else:
            split_refs = [
                _split_block_by_dst_range.options(num_returns=P).remote(
                    b, bounds
                )
                for b in blocks
            ]
            per_range = [[refs[p] for refs in split_refs] for p in range(P)]
        graph._layout_cache[cache_key] = per_range
    G = max(1, min(groups_per_range, len(per_range[0])))

    start_iter = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            ranks = ckpt.load_arrays(m, "rank")["rank"]
            start_iter = m["iteration"] + 1

    for it in range(start_iter, cfg.max_iterations):
        contrib = np.zeros(V, dtype=np.float64)
        contrib[nz] = ranks[nz] / outdeg[nz]
        contrib_ref = ray.put(contrib)
        out_refs = []
        for p in range(P):
            lo, hi = int(bounds[p]), int(bounds[p + 1])
            prefs = per_range[p]
            gsize = -(-len(prefs) // G)
            grp_refs = [
                _range_partial.remote(
                    contrib_ref, lo, hi, *prefs[g : g + gsize]
                )
                for g in range(0, len(prefs), gsize)
            ]
            out_refs.append(
                grp_refs[0] if len(grp_refs) == 1
                else _slice_sum.remote(*grp_refs)
            )
        incoming = np.concatenate(ray.get(out_refs)) if out_refs else np.zeros(V)
        dangling_mass = float(ranks[dangling].sum())
        new = (1.0 - d) / V + d * (incoming + dangling_mass / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        if ckpt is not None and cfg.checkpoint_every and (
            (it + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_arrays(it, {"rank": ranks}, {"delta_l1": delta})
        if on_iter is not None:
            on_iter(it, ranks, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return ranks


def pagerank_weighted(
    graph: Graph,
    wedges: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    on_iter=None,
) -> "ray.data.Dataset":
    """Weighted PageRank (broadcast kernel): per-edge contribution
    r[src]·w/strength[src] with strength = Σ outgoing weights; teleport
    and dangling mass uniform. ``wedges`` is the CANONICAL undirected
    weighted edge Dataset (src, dst, w; vid space) — symmetrized here.
    → Dataset (vid, url, rank)."""
    V = graph.num_vertices
    if V == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}
            )
        )
    d = cfg.pagerank_damping

    def both(t: pa.Table) -> pa.Table:
        s, dd = col_np(t, "src"), col_np(t, "dst")
        w = col_np(t, "w").astype(np.float64)
        return table_from_arrays(
            src=np.concatenate([s, dd]).astype(np.int64),
            dst=np.concatenate([dd, s]).astype(np.int64),
            w=np.concatenate([w, w]),
        )

    edges = wedges.map_batches(both, batch_format="pyarrow").materialize()

    # weighted out-strength (V-sized driver array — broadcast budget,
    # same class as the broadcast rank vector)
    strength = np.zeros(V, dtype=np.float64)
    for b in edges.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        np.add.at(strength, col_np(b, "src"), col_np(b, "w"))
    dangling = strength == 0.0

    ranks = np.full(V, 1.0 / V, dtype=np.float64)
    for it in range(cfg.max_iterations):
        contrib = np.zeros(V, dtype=np.float64)
        nz = ~dangling
        contrib[nz] = ranks[nz] / strength[nz]
        ref = ray.put(contrib)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            w = col_np(batch, "w")
            k, s = sparse_sum_reduce(dst, c[src] * w)
            return table_from_arrays(vid=k, part=s)

        incoming = np.zeros(V, dtype=np.float64)
        for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            np.add.at(incoming, col_np(b, "vid"), col_np(b, "part"))
        dangling_mass = float(ranks[dangling].sum())
        new = (1.0 - d) / V + d * (incoming + dangling_mass / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        if on_iter is not None:
            on_iter(it, ranks, delta)
        if delta < V * cfg.pagerank_tol:
            break

    ref = ray.put(ranks)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        r = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column("rank", pa.array(r[vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def pagerank(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
    on_iter=None,
    restart: "np.ndarray | None" = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, rank), float64, Σrank ≈ 1.

    ``restart`` personalizes: a V-length teleport distribution p
    (personalized PageRank — teleport and dangling mass land on p
    instead of uniform). Broadcast mode only; the vector is V-sized
    driver state, same budget class as the broadcast rank vector."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}
            )
        )
    if restart is not None:
        mode = mode or "broadcast"
        if mode != "broadcast":
            raise ValueError(
                "personalized PageRank (restart=) is broadcast-mode only"
            )
    mode = mode or _pick_mode(graph, cfg)
    ckpt = None
    if cfg.checkpoint_dir and cfg.checkpoint_every:
        from ..state.checkpoint import CheckpointManager, graph_fingerprint

        ckpt = CheckpointManager(
            cfg.checkpoint_dir, "pagerank", graph_fingerprint(graph),
            num_partitions=cfg.num_partitions,
        )
    if mode == "broadcast":
        ranks = _pr_broadcast(
            graph, cfg, on_iter=on_iter, ckpt=ckpt, restart=restart
        )
    elif mode == "blocks":
        ranks = _pr_blocks(graph, cfg, on_iter=on_iter, ckpt=ckpt)
    elif mode == "ranges":
        ranks = _pr_ranges(graph, cfg, on_iter=on_iter, ckpt=ckpt)
    elif mode == "shuffle":
        state = _pr_shuffle(graph, cfg, on_iter=on_iter, ckpt=ckpt)
        if graph.num_vertices > cfg.broadcast_max_vertices:
            # scale path end-to-end: attach urls by a vid-unique hash
            # join — the rank vector never lands on the driver
            return (
                graph.vertices.join(
                    state.select_columns(["vid", "rank"]),
                    join_type="inner", num_partitions=cfg.num_partitions,
                    on=("vid",), right_on=("vid",),
                )
                .select_columns(["vid", "url", "rank"])
                .materialize()
            )
        res = dataset_to_numpy(state, "vid", "rank")
        ranks = np.empty(graph.num_vertices, dtype=np.float64)
        ranks[res["vid"]] = res["rank"]
    else:
        raise ValueError(mode)

    ref = ray.put(ranks)

    def attach(batch: pa.Table, _ref=ref) -> pa.Table:
        r = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column("rank", pa.array(r[vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")
