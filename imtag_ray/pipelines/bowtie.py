"""Web-graph bowtie decomposition and SCC condensation — the classic
macro-structure analysis of a crawl graph (Broder et al., "Graph
structure in the web", WWW 2000): the giant strongly connected CORE,
the IN set that reaches it, the OUT set it reaches, TUBEs from IN to
OUT that bypass the core, TENDRILs hanging off IN / leading into OUT,
and DISCONNECTED debris. This is what imtag's component labeling
(ref src/disjoint_set.hpp, src/SegmentImageImpl.cpp:95-131) becomes
when the lattice is replaced by a directed trillion-edge web graph.

Both operators compose the engine's existing primitives:
``strongly_connected_components`` for the SCC labeling, then
set-reachability fixpoints (forward/backward flag propagation — the
unrestricted form of scc's backward confirmation rounds). Modes follow
the engine convention: broadcast keeps V-sized numpy flags in plasma
(``ray.put`` once per round, zero-copy in every task); shuffle keeps
every set as a vid Dataset grown by join rounds + bucketed distincts —
the no-driver 10^12-vertex scale path.

Closure rounds are diameter-bounded: web graphs are shallow (the
Broder crawl's directed diameter is ~16-28 within the core), and both
modes raise past ``cfg.max_iterations`` rounds rather than silently
returning a partial closure.
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
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    table_from_arrays,
)
from .scc import _pick_mode, _scc_broadcast, _scc_shuffle

REGIONS = (
    "CORE", "IN", "OUT", "TUBE", "TENDRIL_IN", "TENDRIL_OUT", "DISCONNECTED"
)

_EMPTY_VID = pa.table({"vid": pa.array([], pa.int64())})


# ---------------------------------------------------------------------------
# reachability closures (set fixpoints)
# ---------------------------------------------------------------------------


def _closure_broadcast(
    edges: "ray.data.Dataset",
    seed: np.ndarray,
    forward: bool,
    cfg: EngineConfig,
    what: str,
) -> np.ndarray:
    """Boolean closure of ``seed`` under edge relation (forward: along
    src→dst; backward: against it). One edge scan per round; rounds ≤
    graph diameter (raise past cfg.max_iterations)."""
    flag = seed.copy()
    if not flag.any():
        return flag
    for _ in range(cfg.max_iterations):
        fref = ray.put(flag)

        def step(batch: pa.Table, _f=fref, _fw=forward) -> pa.Table:
            f = ray.get(_f)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            if _fw:
                new = dst[f[src] & ~f[dst]]
            else:
                new = src[f[dst] & ~f[src]]
            return table_from_arrays(vid=np.unique(new))

        n_new = 0
        for b in edges.map_batches(step, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            vids = col_np(b, "vid")
            fresh = ~flag[vids]
            n_new += int(fresh.sum())
            flag[vids] = True
        if n_new == 0:
            return flag
    raise RuntimeError(
        f"bowtie closure ({what}) did not converge within "
        f"max_iterations={cfg.max_iterations} rounds; raise "
        f"cfg.max_iterations (bound = graph diameter)"
    )


def _distinct_vids(ds: "ray.data.Dataset") -> "ray.data.Dataset | None":
    return compact_nonempty(
        bucketed_aggregate(
            ds, key_cols=["vid"], aggs=[("vid", "count", "__n")]
        ).select_columns(["vid"])
    )


def _closure_shuffle(
    edges: "ray.data.Dataset | None",
    seeds: "ray.data.Dataset | None",
    forward: bool,
    cfg: EngineConfig,
    what: str,
) -> "ray.data.Dataset | None":
    """Dataset-state closure: the reached set is a (vid) Dataset grown
    by one edge semi-join + bucketed distinct per round (the
    unrestricted form of scc._scc_shuffle's backward confirmation).
    Returns None for an empty closure. Every join input passes through
    compact_nonempty (Ray 2.49 one-shot join schema broadcast)."""
    seeds = compact_nonempty(seeds) if seeds is not None else None
    if seeds is None:
        return None
    reached = seeds.materialize()
    if edges is None:
        return reached
    on_col, emit_col = ("src", "dst") if forward else ("dst", "src")
    prev_n = reached.count()
    for _ in range(cfg.max_iterations):
        hits = compact_nonempty(
            edges.join(
                reached, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=(on_col,), right_on=("vid",),
            ).map_batches(
                lambda t, _c=emit_col: (
                    _EMPTY_VID
                    if t.num_rows == 0  # post-join empties: schema-less
                    else table_from_arrays(
                        vid=col_np(t, _c).astype(np.int64)
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if hits is None:
            return reached
        reached = _distinct_vids(reached.union(hits)).materialize()
        cur_n = reached.count()
        if cur_n == prev_n:
            return reached
        prev_n = cur_n
    raise RuntimeError(
        f"bowtie closure ({what}, shuffle) did not converge within "
        f"max_iterations={cfg.max_iterations} rounds; raise "
        f"cfg.max_iterations (bound = graph diameter)"
    )


# ---------------------------------------------------------------------------
# SCC condensation
# ---------------------------------------------------------------------------


def scc_condensation(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """Condensation DAG of the directed graph → Dataset
    (src_scc_url, dst_scc_url): one row per DISTINCT inter-SCC edge,
    each endpoint named by its SCC's canonical min-url id (the
    ``compressed_freeze``-style labeling scc shares with cc). The
    condensation is what the web's macro structure is read from — it
    is always a DAG, and its edges are what bowtie TUBEs/TENDRILs
    traverse."""
    empty = pa.table(
        {"src_scc_url": pa.array([], pa.string()),
         "dst_scc_url": pa.array([], pa.string())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    P = cfg.num_partitions
    if mode == "broadcast":
        scc = _scc_broadcast(graph, cfg)
        sref = ray.put(scc)
        urls = graph.urls_array()
        uref = ray.put(urls)

        def contract(t: pa.Table, _s=sref, _u=uref) -> pa.Table:
            s = ray.get(_s)
            u = ray.get(_u)
            a = s[col_np(t, "src")]
            b = s[col_np(t, "dst")]
            m = a != b
            return table_from_arrays(s=a[m], d=b[m])

        pairs = compact_nonempty(
            bucketed_aggregate(
                graph.edges.map_batches(contract, batch_format="pyarrow"),
                key_cols=["s", "d"], aggs=[("s", "count", "__n")],
            ).select_columns(["s", "d"])
        )
        if pairs is None:
            return ray.data.from_arrow(empty)

        def name(t: pa.Table, _u=uref) -> pa.Table:
            u = ray.get(_u)
            return pa.table(
                {"src_scc_url": pa.array(u[col_np(t, "s")], pa.string()),
                 "dst_scc_url": pa.array(u[col_np(t, "d")], pa.string())}
            )

        return pairs.map_batches(name, batch_format="pyarrow")

    # shuffle: everything by vid-keyed joins — no V-sized driver state
    labels = compact_nonempty(_scc_shuffle(graph, cfg))
    if labels is None:
        return ray.data.from_arrow(empty)
    labels = labels.materialize()
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    if edges is None:
        return ray.data.from_arrow(empty)
    tagged = compact_nonempty(
        edges.join(
            labels.rename_columns({"vid": "sv", "scc": "s"}),
            join_type="inner", num_partitions=P,
            on=("src",), right_on=("sv",),
        ).select_columns(["dst", "s"])
    )
    # (materialized compaction between the two joins: Ray 2.49 fused
    # JoinOperators deadlock on small CPU budgets)
    tagged = compact_nonempty(
        tagged.join(
            labels.rename_columns({"vid": "dv", "scc": "d"}),
            join_type="inner", num_partitions=P,
            on=("dst",), right_on=("dv",),
        ).map_batches(
            lambda t: (
                pa.table({"s": pa.array([], pa.int64()),
                          "d": pa.array([], pa.int64())})
                if t.num_rows == 0
                else (lambda s, d: table_from_arrays(
                    s=s[s != d], d=d[s != d]
                ))(
                    col_np(t, "s").astype(np.int64),
                    col_np(t, "d").astype(np.int64),
                )
            ),
            batch_format="pyarrow",
        )
    )
    if tagged is None:
        return ray.data.from_arrow(empty)
    pairs = compact_nonempty(
        bucketed_aggregate(
            tagged, key_cols=["s", "d"], aggs=[("s", "count", "__n")]
        ).select_columns(["s", "d"])
    )
    if pairs is None:
        return ray.data.from_arrow(empty)
    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    named = compact_nonempty(
        pairs.join(
            verts.rename_columns({"vid": "sv", "url": "src_scc_url"}),
            join_type="inner", num_partitions=P,
            on=("s",), right_on=("sv",),
        )
    )
    return named.join(
        verts.rename_columns({"vid": "dv", "url": "dst_scc_url"}),
        join_type="inner", num_partitions=P,
        on=("d",), right_on=("dv",),
    ).select_columns(["src_scc_url", "dst_scc_url"]).materialize()


# ---------------------------------------------------------------------------
# bowtie decomposition
# ---------------------------------------------------------------------------


def bowtie_decomposition(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, region), region ∈ REGIONS. CORE is the largest
    SCC (ties → smallest canonical id, so the choice is deterministic
    and order-independent); IN reaches CORE, OUT is reached from it;
    among the remainder, TUBE is reachable from IN and reaches OUT,
    TENDRIL_IN only the former, TENDRIL_OUT only the latter,
    DISCONNECTED neither."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "region": pa.array([], pa.string())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "broadcast":
        return _bowtie_broadcast(graph, cfg)
    return _bowtie_shuffle(graph, cfg)


def _bowtie_broadcast(graph: Graph, cfg: EngineConfig) -> "ray.data.Dataset":
    V = graph.num_vertices
    edges = graph.edges
    scc = _scc_broadcast(graph, cfg)
    sizes = np.bincount(scc, minlength=V)
    best = sizes.max()
    core_id = int(np.flatnonzero(sizes == best).min())
    core = scc == core_id

    f_core = _closure_broadcast(edges, core, True, cfg, "OUT")
    b_core = _closure_broadcast(edges, core, False, cfg, "IN")
    in_ = b_core & ~core
    out = f_core & ~core
    f_in = _closure_broadcast(edges, in_, True, cfg, "from-IN")
    b_out = _closure_broadcast(edges, out, False, cfg, "to-OUT")

    rest = ~core & ~in_ & ~out
    region = np.full(V, REGIONS.index("DISCONNECTED"), dtype=np.int8)
    region[core] = REGIONS.index("CORE")
    region[in_] = REGIONS.index("IN")
    region[out] = REGIONS.index("OUT")
    region[rest & f_in & b_out] = REGIONS.index("TUBE")
    region[rest & f_in & ~b_out] = REGIONS.index("TENDRIL_IN")
    region[rest & ~f_in & b_out] = REGIONS.index("TENDRIL_OUT")
    rref = ray.put(region)
    names = np.asarray(REGIONS, dtype=object)

    def attach(batch: pa.Table, _r=rref, _n=names) -> pa.Table:
        r = ray.get(_r)
        return pa.table(
            {"url": batch.column("url"),
             "region": pa.array(_n[r[col_np(batch, "vid")]], pa.string())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _bowtie_shuffle(graph: Graph, cfg: EngineConfig) -> "ray.data.Dataset":
    """No-driver path: SCC labels stay a Dataset; the core id is found
    from the (scc, size) aggregate via tiny per-batch partial maxima
    (O(#blocks) driver rows, never O(V)); the five sets are vid
    Datasets; the final classification is one bit-union aggregate plus
    a left join against the vertex table."""
    P = cfg.num_partitions
    labels = compact_nonempty(_scc_shuffle(graph, cfg))
    labels = labels.materialize()
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))

    # core = argmax SCC size, ties → min scc id: bucketed size count,
    # then per-batch (max size, min id) partials → one tiny driver pass
    sizes = bucketed_aggregate(
        labels.map_batches(
            lambda t: table_from_arrays(
                scc=col_np(t, "scc").astype(np.int64)
            ),
            batch_format="pyarrow",
        ),
        key_cols=["scc"], aggs=[("scc", "count", "n")],
    )

    def partial_best(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"scc": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        s = col_np(t, "scc").astype(np.int64)
        n = col_np(t, "n").astype(np.int64)
        m = n.max()
        cand = s[n == m].min()
        return table_from_arrays(scc=np.array([cand]), n=np.array([m]))

    best_n, core_id = -1, -1
    for b in sizes.map_batches(
        partial_best, batch_format="pyarrow"
    ).iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for s, n in zip(col_np(b, "scc"), col_np(b, "n")):
            if n > best_n or (n == best_n and s < core_id):
                best_n, core_id = int(n), int(s)

    def members_of(label: int):
        return compact_nonempty(
            labels.map_batches(
                lambda t, _l=label: table_from_arrays(
                    vid=col_np(t, "vid").astype(np.int64)[
                        col_np(t, "scc").astype(np.int64) == _l
                    ]
                ),
                batch_format="pyarrow",
            )
        )

    core = members_of(core_id)
    f_core = _closure_shuffle(edges, core, True, cfg, "OUT")
    b_core = _closure_shuffle(edges, core, False, cfg, "IN")

    def minus(a, b):
        """a \\ b via a left-outer flag join (no anti-join operator)."""
        a = compact_nonempty(a)
        if a is None:
            return None
        b = compact_nonempty(b)
        if b is None:
            return a
        return compact_nonempty(
            a.join(
                b.map_batches(
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

    in_ = minus(b_core, core)
    out = minus(f_core, core)
    f_in = _closure_shuffle(edges, in_, True, cfg, "from-IN")
    b_out = _closure_shuffle(edges, out, False, cfg, "to-OUT")

    # bit-union: CORE=1, IN=2, OUT=4, F_IN=8, B_OUT=16 (each source set
    # has distinct vids, so per-set rows are unique and sum ≡ OR)
    def tag(ds, bit):
        if ds is None:
            return None
        ds = compact_nonempty(ds)
        if ds is None:
            return None
        return ds.map_batches(
            lambda t, _b=bit: table_from_arrays(
                vid=col_np(t, "vid").astype(np.int64),
                bits=np.full(t.num_rows, _b, dtype=np.int64),
            ),
            batch_format="pyarrow",
        )

    parts = [
        t for t in (
            tag(core, 1), tag(in_, 2), tag(out, 4),
            tag(f_in, 8), tag(b_out, 16),
        ) if t is not None
    ]
    names = np.asarray(REGIONS, dtype=object)

    def classify(t: pa.Table, _n=names) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"url": pa.array([], pa.string()),
                 "region": pa.array([], pa.string())}
            )
        bits = np.asarray(
            pc.fill_null(t.column("bits").combine_chunks(), 0)
        ).astype(np.int64)
        r = np.full(len(bits), REGIONS.index("DISCONNECTED"), dtype=np.int8)
        rest = bits & 7 == 0
        r[bits & 1 != 0] = REGIONS.index("CORE")
        r[bits & 2 != 0] = REGIONS.index("IN")
        r[bits & 4 != 0] = REGIONS.index("OUT")
        r[rest & (bits & 8 != 0) & (bits & 16 != 0)] = REGIONS.index("TUBE")
        r[rest & (bits & 8 != 0) & (bits & 16 == 0)] = (
            REGIONS.index("TENDRIL_IN")
        )
        r[rest & (bits & 8 == 0) & (bits & 16 != 0)] = (
            REGIONS.index("TENDRIL_OUT")
        )
        return pa.table(
            {"url": t.column("url"),
             "region": pa.array(_n[r], pa.string())}
        )

    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    if not parts:
        joined = verts.map_batches(
            lambda t: t.append_column(
                "bits", pa.array(np.zeros(t.num_rows, dtype=np.int64))
            ),
            batch_format="pyarrow",
        )
        return joined.map_batches(classify, batch_format="pyarrow")
    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    bitsum = compact_nonempty(
        bucketed_sum_aggregate(union, key_cols=["vid"], sum_cols=["bits"])
    )
    joined = verts.join(
        bitsum.rename_columns({"vid": "bv"}),
        join_type="left_outer", num_partitions=P,
        on=("vid",), right_on=("bv",),
    )
    return joined.map_batches(classify, batch_format="pyarrow").materialize()


# ---------------------------------------------------------------------------
# condensation DAG depth layering
# ---------------------------------------------------------------------------


def condensation_depths(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int = 4,
) -> "ray.data.Dataset":
    """Longest-path layering of the SCC condensation DAG → Dataset
    (scc_url, depth): depth 0 at source SCCs (no incoming inter-SCC
    edge), and depth(v) after R rounds of the monotone Bellman
    relaxation depth(v) ← max(depth(v), max over u→v of depth(u)+1).
    Fixed-round semantics (both the engine and the oracle run exactly
    ``rounds`` relaxations), so the result is well-defined even when R
    is below the DAG's true depth. The topological-level table a crawl
    scheduler reads frontier tiers from.

    Scale shape: the condensation is typically orders of magnitude
    smaller than the graph, but it is still a Dataset here — each round
    is ONE hash join (edges ⋈ depths on src) + ONE bucketed max by dst
    + ONE left-outer merge. No driver-resident component table."""
    from .scc import strongly_connected_components

    P = cfg.num_partitions
    empty = pa.table(
        {"scc_url": pa.array([], pa.string()),
         "depth": pa.array([], pa.int64())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    labels = compact_nonempty(
        strongly_connected_components(graph, cfg).select_columns(
            ["scc_url"])
    )
    if labels is None:
        return ray.data.from_arrow(empty)
    comps = compact_nonempty(
        bucketed_aggregate(
            labels, key_cols=["scc_url"],
            aggs=[("scc_url", "count", "__n")],
        ).select_columns(["scc_url"])
    )
    if comps is None:
        return ray.data.from_arrow(empty)
    comps = comps.materialize()
    cond = compact_nonempty(scc_condensation(graph, cfg))

    def zero(t: pa.Table) -> pa.Table:
        return pa.table(
            {"scc_url": t.column("scc_url").cast(pa.string()),
             "depth": pa.array(np.zeros(t.num_rows, np.int64))}
        )

    depth = comps.map_batches(zero, batch_format="pyarrow").materialize()
    if cond is None:
        return depth.sort("scc_url")
    cond = cond.materialize()
    for _ in range(rounds):
        inc = compact_nonempty(
            cond.join(
                depth.rename_columns({"scc_url": "su", "depth": "sd"}),
                join_type="inner", num_partitions=P,
                on=("src_scc_url",), right_on=("su",),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"scc_url": pa.array([], pa.string()),
                         "idep": pa.array([], pa.int64())}
                    )
                    if t.num_rows == 0
                    else pa.table(
                        {"scc_url": t.column("dst_scc_url").cast(
                            pa.string()),
                         "idep": pa.array(
                             col_np(t, "sd").astype(np.int64) + 1)}
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if inc is None:
            break
        incmax = compact_nonempty(
            bucketed_aggregate(
                inc, key_cols=["scc_url"],
                aggs=[("idep", "max", "idep")],
            )
        )
        if incmax is None:
            break

        def merge(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"scc_url": pa.array([], pa.string()),
                     "depth": pa.array([], pa.int64())}
                )
            d = col_np(t, "depth").astype(np.int64)
            i = pc.fill_null(
                t.column("idep").cast(pa.int64()), 0
            ).to_numpy(zero_copy_only=False)
            return pa.table(
                {"scc_url": t.column("scc_url").cast(pa.string()),
                 "depth": pa.array(np.maximum(d, i))}
            )

        depth = compact_nonempty(
            depth.join(
                incmax.rename_columns({"scc_url": "iu"}),
                join_type="left_outer", num_partitions=P,
                on=("scc_url",), right_on=("iu",),
            ).map_batches(merge, batch_format="pyarrow")
        )
        if depth is None:
            return ray.data.from_arrow(empty)
        depth = depth.materialize()
    return depth.sort("scc_url")
