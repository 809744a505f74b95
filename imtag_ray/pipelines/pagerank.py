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
    graph: Graph, cfg: EngineConfig, on_iter=None, ckpt=None,
    restart_ds: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Dataset-state power iteration (the 10^12-vertex path).

    ``restart_ds`` personalizes: a (vid, p) Dataset carrying the
    teleport distribution as a STATE COLUMN — teleport and dangling
    mass land on p per vertex, and the rank vector, teleport vector
    and outdeg all live in the shuffled state table (never on the
    driver). The uniform path keeps its original scalar-base form
    bit-for-bit so cross-mode exactness tests stay valid."""
    P = cfg.num_partitions
    V = graph.num_vertices
    d = cfg.pagerank_damping
    personalized = restart_ds is not None
    state_cols = ["vid", "rank", "outdeg"] + (["p"] if personalized else [])

    # Dataset-native outdeg init (no driver V-array); dangling vertices
    # keep outdeg 0 via degree_dataset's zero rows
    from ..stages.graph_build import degree_dataset

    deg_ds = degree_dataset(graph, "out", col="outdeg")
    if personalized:
        from ..util import compact_nonempty

        # missing (vid, p) rows mean p = 0; rank starts at p
        joined0 = compact_nonempty(deg_ds).join(
            compact_nonempty(
                restart_ds.map_batches(
                    lambda t: table_from_arrays(
                        pv=col_np(t, "vid").astype(np.int64),
                        p=col_np(t, "p").astype(np.float64),
                    ),
                    batch_format="pyarrow",
                )
            ),
            join_type="left_outer", num_partitions=P,
            on=("vid",), right_on=("pv",),
        )

        def init_p(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"vid": pa.array([], pa.int64()),
                     "rank": pa.array([], pa.float64()),
                     "outdeg": pa.array([], pa.float64()),
                     "p": pa.array([], pa.float64())}
                )
            import pyarrow.compute as pc

            p = np.asarray(
                pc.fill_null(t.column("p").combine_chunks(), 0.0)
            ).astype(np.float64)
            return table_from_arrays(
                vid=col_np(t, "vid").astype(np.int64),
                rank=p.copy(),
                outdeg=col_np(t, "outdeg").astype(np.float64),
                p=p,
            )

        state = joined0.map_batches(
            init_p, batch_format="pyarrow"
        ).materialize()
    else:
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
                m["path"], columns=state_cols
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
                state.select_columns(["vid", "rank", "outdeg"]),
                join_type="inner", num_partitions=P,
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

        def update(batch: pa.Table, _base=base, _d=d, _dm=dangling_mass,
                   _pers=personalized) -> pa.Table:
            old = col_np(batch, "rank")
            part = batch.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(np.where(part == None, 0.0, part).astype(np.float64))  # noqa: E711
            if _pers:
                p = col_np(batch, "p").astype(np.float64)
                new = (1.0 - _d) * p + _d * (part + _dm * p)
            else:
                new = _base + _d * part
            cols = dict(
                vid=col_np(batch, "vid"),
                rank=new,
                outdeg=col_np(batch, "outdeg"),
            )
            if _pers:
                cols["p"] = p
            cols["delta"] = np.abs(new - old)
            return table_from_arrays(**cols)

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


def _symmetrize_weighted(wedges: "ray.data.Dataset") -> "ray.data.Dataset":
    def both(t: pa.Table) -> pa.Table:
        s, dd = col_np(t, "src"), col_np(t, "dst")
        w = col_np(t, "w").astype(np.float64)
        return table_from_arrays(
            src=np.concatenate([s, dd]).astype(np.int64),
            dst=np.concatenate([dd, s]).astype(np.int64),
            w=np.concatenate([w, w]),
        )

    return wedges.map_batches(both, batch_format="pyarrow").materialize()


def _strength_dataset(
    graph: Graph, edges: "ray.data.Dataset", cfg: EngineConfig
) -> "ray.data.Dataset":
    """(vid, strength) for ALL vertices (zero rows included) — the
    weighted analogue of degree_dataset: per-block combiner partials,
    one bucketed sum, no driver pass over the edge table."""

    def partial(t: pa.Table) -> pa.Table:
        k, s = sparse_sum_reduce(
            col_np(t, "src").astype(np.int64),
            col_np(t, "w").astype(np.float64),
        )
        return table_from_arrays(vid=k, strength=s)

    zeros = graph.vertices.select_columns(["vid"]).map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid").astype(np.int64),
            strength=np.zeros(t.num_rows, dtype=np.float64),
        ),
        batch_format="pyarrow",
    )
    return bucketed_sum_aggregate(
        zeros.union(edges.map_batches(partial, batch_format="pyarrow")),
        key_cols=["vid"], sum_cols=["strength"],
    )


def _wpr_broadcast(
    graph: Graph, edges: "ray.data.Dataset", cfg: EngineConfig, on_iter=None
) -> np.ndarray:
    V = graph.num_vertices
    d = cfg.pagerank_damping
    # weighted out-strength: distributed bucketed sum, then ONE V-sized
    # driver landing (broadcast budget — same class as the rank vector)
    sres = dataset_to_numpy(
        _strength_dataset(graph, edges, cfg), "vid", "strength"
    )
    strength = np.zeros(V, dtype=np.float64)
    strength[sres["vid"].astype(np.int64)] = sres["strength"]
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
    return ranks


def _wpr_shuffle(
    graph: Graph, edges: "ray.data.Dataset", cfg: EngineConfig, on_iter=None
) -> "ray.data.Dataset":
    """Dataset-state weighted power iteration (the scale path): state
    is (vid, rank, strength), contributions are the edge-state join
    scaled by w/strength — _pr_shuffle's scaffolding with strength in
    place of outdeg."""
    P = cfg.num_partitions
    V = graph.num_vertices
    d = cfg.pagerank_damping

    state = _strength_dataset(graph, edges, cfg).map_batches(
        lambda t: table_from_arrays(
            vid=col_np(t, "vid").astype(np.int64),
            rank=np.full(t.num_rows, 1.0 / V),
            strength=col_np(t, "strength").astype(np.float64),
        ),
        batch_format="pyarrow",
    ).materialize()

    for it in range(cfg.max_iterations):
        def dang(batch: pa.Table) -> pa.Table:
            r = col_np(batch, "rank")
            st = col_np(batch, "strength")
            return table_from_arrays(m=np.array([r[st == 0.0].sum()]))

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
                    part=col_np(t, "rank")
                    * col_np(t, "w")
                    / col_np(t, "strength"),
                ),
                batch_format="pyarrow",
            )
            .map_batches(
                lambda t: table_from_arrays(
                    *(),
                    **dict(
                        zip(
                            ("vid", "part"),
                            sparse_sum_reduce(
                                col_np(t, "vid"), col_np(t, "part")
                            ),
                        )
                    ),
                ),
                batch_format="pyarrow",
            )
        )
        contribs = bucketed_sum_aggregate(
            contribs, key_cols=["vid"], sum_cols=["part"]
        )

        base = (1.0 - d) / V + d * dangling_mass / V

        def update(batch: pa.Table, _base=base, _d=d) -> pa.Table:
            old = col_np(batch, "rank")
            part = batch.column("part").to_numpy(zero_copy_only=False)
            part = np.nan_to_num(np.where(part == None, 0.0, part).astype(np.float64))  # noqa: E711
            new = _base + _d * part
            return table_from_arrays(
                vid=col_np(batch, "vid"),
                rank=new,
                strength=col_np(batch, "strength"),
                delta=np.abs(new - old),
            )

        joined = state.join(
            contribs, join_type="left_outer", num_partitions=P,
            on=("vid",), right_on=("vid",),
        ).map_batches(update, batch_format="pyarrow").materialize()
        delta = float(joined.aggregate(Sum("delta", alias_name="s"))["s"])
        state = joined.drop_columns(["delta"]).materialize()
        if on_iter is not None:
            on_iter(it, state, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return state


def pagerank_weighted(
    graph: Graph,
    wedges: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    on_iter=None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """Weighted PageRank: per-edge contribution r[src]·w/strength[src]
    with strength = Σ outgoing weights; teleport and dangling mass
    uniform. ``wedges`` is the CANONICAL undirected weighted edge
    Dataset (src, dst, w; vid space) — symmetrized here.
    → Dataset (vid, url, rank).

    Modes (config.vertex_state semantics, like unweighted pagerank):
    broadcast holds the rank/strength vectors as V-sized driver/plasma
    arrays; shuffle keeps them as a Dataset joined to edges per round —
    the no-driver scale path."""
    V = graph.num_vertices
    if V == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}
            )
        )
    mode = mode or _pick_mode(graph, cfg)
    edges = _symmetrize_weighted(wedges)

    if mode == "shuffle":
        state = _wpr_shuffle(graph, edges, cfg, on_iter=on_iter)
        if V > cfg.broadcast_max_vertices:
            # scale path end-to-end: vid-keyed url join, rank never
            # lands on the driver
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
        ranks = np.empty(V, dtype=np.float64)
        ranks[res["vid"].astype(np.int64)] = res["rank"]
    else:
        ranks = _wpr_broadcast(graph, edges, cfg, on_iter=on_iter)

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
    restart: "np.ndarray | ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, rank), float64, Σrank ≈ 1.

    ``restart`` personalizes (personalized PageRank — teleport and
    dangling mass land on p instead of uniform): either a V-length
    numpy distribution (broadcast-budget driver state) or a (vid, p)
    Dataset with p ≥ 0 rows (missing vids mean 0) — the no-driver
    form the shuffle mode carries as a state column at scale. Either
    form works with either mode; the blocks/ranges kernels are
    uniform-teleport only."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(
            pa.table(
                {"vid": pa.array([], pa.int64()),
                 "url": pa.array([], pa.string()),
                 "rank": pa.array([], pa.float64())}
            )
        )
    mode = mode or _pick_mode(graph, cfg)
    if restart is not None and mode in ("blocks", "ranges"):
        raise ValueError(
            "personalized PageRank (restart=) needs broadcast or "
            "shuffle mode; the blocks/ranges kernels are uniform-only"
        )
    ckpt = None
    if cfg.checkpoint_dir and cfg.checkpoint_every:
        from ..state.checkpoint import CheckpointManager, graph_fingerprint

        # personalized runs checkpoint under their own algorithm name:
        # a uniform-run checkpoint must never resume into a PPR run
        # (different fixpoint, and the shuffle state schema differs)
        ckpt = CheckpointManager(
            cfg.checkpoint_dir,
            "pagerank" if restart is None else "ppr",
            graph_fingerprint(graph),
            num_partitions=cfg.num_partitions,
        )
    if mode == "broadcast":
        if restart is not None and not isinstance(restart, np.ndarray):
            res = dataset_to_numpy(restart, "vid", "p")
            rv = np.zeros(graph.num_vertices, dtype=np.float64)
            rv[res["vid"].astype(np.int64)] = res["p"]
            restart = rv
        ranks = _pr_broadcast(
            graph, cfg, on_iter=on_iter, ckpt=ckpt, restart=restart
        )
    elif mode == "blocks":
        ranks = _pr_blocks(graph, cfg, on_iter=on_iter, ckpt=ckpt)
    elif mode == "ranges":
        ranks = _pr_ranges(graph, cfg, on_iter=on_iter, ckpt=ckpt)
    elif mode == "shuffle":
        restart_ds = None
        if restart is not None:
            if isinstance(restart, np.ndarray):
                nz = np.flatnonzero(restart)
                restart_ds = ray.data.from_arrow(
                    pa.table(
                        {"vid": pa.array(nz.astype(np.int64), pa.int64()),
                         "p": pa.array(
                             restart[nz].astype(np.float64), pa.float64()
                         )}
                    )
                )
            else:
                restart_ds = restart
        state = _pr_shuffle(
            graph, cfg, on_iter=on_iter, ckpt=ckpt, restart_ds=restart_ds
        )
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
