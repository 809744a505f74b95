"""Connected components — the engine's heart, grafted from the
reference's union-find CCL.

Semantics mirrored from /root/reference:
- ``disjoint_set::unite`` with ``lt_cmp`` ("smaller root wins",
  src/disjoint_set.hpp:22-27,125-137) ≡ hash-min propagation: every
  vertex repeatedly adopts the smallest label among itself and its
  neighbors. Both compute the same fixpoint: label(v) = min vid in
  v's component.
- ``compressed_freeze`` (dense final labels in first-appearance scan
  order, src/disjoint_set.hpp:73-96) ≡ canonical dense relabel by
  component min-url rank. Because build_graph assigns vids in sorted
  url order, min vid == vid of min url, so the relabel is a pure
  integer ranking and is deterministic under ANY block order.
- the reference's deliberately non-atomic path-halving writeback
  (src/disjoint_set.hpp:54-64) ≡ driver-side pointer jumping between
  rounds (labels[labels] until fixpoint) — shortcuts long chains so
  rounds ~ O(log diameter), not O(diameter) (cf. "Finding connected
  components in map-reduce in logarithmic rounds", ICDE 2013).

Two execution modes (config.vertex_state):
- **broadcast**: per-vertex labels live in a numpy array, ``ray.put``
  once per round, read zero-copy (plasma shared memory) by every edge
  task; per-batch combiner emits only IMPROVING candidates; one small
  ``groupby.min`` merges partials. Right up to ~10^8 vertices/node.
- **shuffle**: labels are a Dataset co-joined to edges by hash each
  round — the 10^12-vertex scale path; convergence detected via the
  strictly-decreasing label sum (labels only ever decrease, so equal
  consecutive sums ⇔ fixpoint) without a second join.
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
    col_np,
    dataset_to_numpy,
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


def _cc_broadcast(
    graph: Graph, cfg: EngineConfig, on_round=None, ckpt=None,
    init: np.ndarray | None = None,
) -> np.ndarray:
    V = graph.num_vertices
    # warm start (incremental CC): any labeling where label[v] is a
    # member of v's component with label[v] <= v and label[root] == root
    # is a valid upper bound of the fixpoint — hash-min only decreases
    labels = (
        np.arange(V, dtype=np.int64) if init is None
        else np.asarray(init, dtype=np.int64).copy()
    )
    edges = graph.edges

    start_round = 0
    converged = False
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            labels = ckpt.load_arrays(m, "label")["label"]
            start_round = m["iteration"] + 1
            # only a checkpoint that RECORDED convergence short-circuits;
            # a run that previously raised 'did not converge' left its
            # last periodic checkpoint without the flag, and resuming it
            # must keep iterating (or raise again), never silently
            # return possibly-wrong labels
            if m.get("metrics", {}).get("converged"):
                return labels
    for rnd in range(start_round, cfg.max_iterations):
        ref = ray.put(labels)

        def step(batch: pa.Table, _ref=ref) -> pa.Table:
            # Relax on component ROOTS, not vertices: an edge whose
            # endpoints have different labels proposes uniting the two
            # label-roots (bigger root adopts smaller). With driver-side
            # pointer jumping this contracts whole components per round —
            # union-by-min over a distributed edge scan, O(log diameter)
            # rounds (vs O(diameter) for per-vertex hash-min).
            lab = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            ls = lab[src]
            ld = lab[dst]
            ne = ls != ld
            ls = ls[ne]
            ld = ld[ne]
            keys = np.maximum(ls, ld)
            vals = np.minimum(ls, ld)
            k, v = sparse_min_reduce(keys, vals)
            return table_from_arrays(vid=k, cand=v)

        partials = edges.map_batches(step, batch_format="pyarrow")
        if V <= cfg.broadcast_max_vertices // max(cfg.num_partitions, 1):
            # stream ≤V-row per-block partials to the driver, scatter-min
            n_updates = 0
            for b in partials.iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            ):
                n_updates += b.num_rows
                np.minimum.at(labels, col_np(b, "vid"), col_np(b, "cand"))
            if n_updates == 0:
                converged = True
                break  # no improving edge anywhere → converged
        else:
            agg = bucketed_aggregate(
                partials, key_cols=["vid"],
                aggs=[("cand", "min", "cand")],
            )
            res = dataset_to_numpy(agg, "vid", "cand")
            if len(res["vid"]) == 0:
                converged = True
                break
            np.minimum.at(labels, res["vid"], res["cand"])
        # pointer jumping: labels always point at a member of the same
        # component with a smaller-or-equal vid, so composition is sound
        while True:
            nxt = labels[labels]
            if np.array_equal(nxt, labels):
                break
            labels = nxt
        if ckpt is not None and cfg.checkpoint_every and (
            (rnd + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_arrays(rnd, {"label": labels})
        if on_round is not None:
            on_round(rnd, labels)
    if not converged:
        raise RuntimeError(
            f"connected_components (broadcast) did not converge within "
            f"max_iterations={cfg.max_iterations}; raise cfg.max_iterations"
        )
    if ckpt is not None and cfg.checkpoint_every:
        # final checkpoint carries the converged flag — the only kind a
        # resume may short-circuit on (the break above skips the
        # periodic write, so without this the flag would never land)
        ckpt.write_arrays(rnd, {"label": labels}, {"converged": True})
    return labels


# ---------------------------------------------------------------------------
# shuffle mode (scale path)
# ---------------------------------------------------------------------------


def _label_sum(labels_ds: "ray.data.Dataset") -> int:
    out = labels_ds.aggregate(Sum("label", alias_name="s"))
    return int(out["s"])


def _hop_messages(t: pa.Table) -> pa.Table:
    """(vid, label) rows → message rows for one pointer-jump hop:
    every vertex REQUESTS its label's label (key = label, val = vid,
    kind 0) and PROVIDES its own label (key = vid, val = label, kind 1)."""
    vid = col_np(t, "vid")
    lab = col_np(t, "label")
    return table_from_arrays(
        key=np.concatenate([lab, vid]),
        val=np.concatenate([vid, lab]),
        kind=np.concatenate(
            [np.zeros(len(vid), dtype=np.int8), np.ones(len(vid), dtype=np.int8)]
        ),
    )


def _hop_resolve(group: pa.Table) -> pa.Table:
    """Group for key w: the provider row carries label[w]; every
    requester v (with label[v] == w) adopts it → (v, label[w])."""
    kind = col_np(group, "kind")
    val = col_np(group, "val")
    prov = val[kind == 1]
    req = val[kind == 0]
    if len(prov) == 0 or len(req) == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    return table_from_arrays(
        vid=req, label=np.full(len(req), prov[0], dtype=np.int64)
    )


def _hop_resolve_block(g: pa.Table) -> pa.Table:
    """Many keys at once (one coarse hash bucket): the vectorized form
    of _hop_resolve — per-key map_groups paid Ray's per-group overhead
    V times. Each key has at most one provider row (key = that vid)."""
    key = col_np(g, "key").astype(np.int64)
    val = col_np(g, "val").astype(np.int64)
    kind = col_np(g, "kind").astype(np.int8)
    order = np.lexsort((kind, key))
    k, v, kd = key[order], val[order], kind[order]
    n = len(k)
    if n == 0:
        return pa.table(
            {"vid": pa.array([], pa.int64()), "label": pa.array([], pa.int64())}
        )
    bound = np.ones(n, dtype=bool)
    bound[1:] = k[1:] != k[:-1]
    seg = np.cumsum(bound) - 1
    nseg = int(seg[-1]) + 1
    prov_mask = kd == 1
    prov_label = np.full(nseg, -1, dtype=np.int64)
    prov_label[seg[prov_mask]] = v[prov_mask]
    has_prov = np.zeros(nseg, dtype=bool)
    has_prov[seg[prov_mask]] = True
    req_mask = (kd == 0) & has_prov[seg]
    return table_from_arrays(vid=v[req_mask], label=prov_label[seg[req_mask]])


def _shortcut_labels(
    labels: "ray.data.Dataset", P: int, max_hops: int = 60
) -> tuple["ray.data.Dataset", int]:
    """Distributed pointer jumping: label ← label[label] until fixpoint.

    Every label value is itself a vid with label[w] ≤ w, so composition
    only ever decreases labels; equal consecutive label sums ⇔ no chain
    left to shortcut. Each hop halves the remaining chain depth (the
    Dataset-state analogue of broadcast mode's in-memory
    ``labels[labels]`` loop), keeping total rounds O(log diameter).

    Implemented as a groupby message-passing exchange rather than a
    self-join: Ray's hash-join emits schema-less empty partitions under
    heavy key skew (e.g. a converged star where every label is 0),
    which poisons downstream joins; groupby handles the same skew fine.
    """
    from ..util import _mix_to_bucket

    def key_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__bucket", pa.array(
            _mix_to_bucket([col_np(t, "key").astype(np.int64)], 256)
        ))

    cur_sum = _label_sum(labels)
    for _ in range(max_hops):
        labels = (
            labels.map_batches(_hop_messages, batch_format="pyarrow")
            .map_batches(key_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_hop_resolve_block, batch_format="pyarrow")
            .materialize()
        )
        nxt_sum = _label_sum(labels)
        if nxt_sum == cur_sum:
            break
        cur_sum = nxt_sum
    return labels, cur_sum


def _cc_shuffle(
    graph: Graph, cfg: EngineConfig, on_round=None, ckpt=None,
    init_labels: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    P = cfg.num_partitions
    labels = (
        init_labels.materialize()
        if init_labels is not None
        else graph.vertices.select_columns(["vid"])
        .map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"), label=col_np(t, "vid")
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )
    start_round = 0
    converged = False
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            labels = ray.data.read_parquet(m["path"], columns=["vid", "label"])
            labels = labels.materialize()
            start_round = m["iteration"] + 1
            # short-circuit ONLY on a recorded converged flag (see
            # _cc_broadcast — a periodic checkpoint from a run that
            # later raised must resume iterating, not return)
            if m.get("metrics", {}).get("converged"):
                return labels
    prev_sum = _label_sum(labels)
    edges = graph.edges.select_columns(["src", "dst"])

    for rnd in range(start_round, cfg.max_iterations):
        by_src = (
            edges.join(
                labels, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .select_columns(["dst", "label"])
            .rename_columns({"dst": "vid"})
        )
        by_dst = (
            edges.join(
                labels, join_type="inner", num_partitions=P,
                on=("dst",), right_on=("vid",),
            )
            .select_columns(["src", "label"])
            .rename_columns({"src": "vid"})
        )
        candidates = by_src.union(by_dst).union(labels)
        labels = bucketed_aggregate(
            candidates, key_cols=["vid"],
            aggs=[("label", "min", "label")],
        ).materialize()
        # pointer jumping between relaxation rounds (mirrors the
        # broadcast mode); without it, chain-shaped components need
        # O(diameter) rounds and silently mislabel past max_iterations.
        labels, cur_sum = _shortcut_labels(labels, P)
        if ckpt is not None and cfg.checkpoint_every and (
            (rnd + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_dataset(rnd, labels, metrics={"label_sum": cur_sum})
        if on_round is not None:
            on_round(rnd, labels)
        if cur_sum == prev_sum:
            converged = True
            break  # labels are monotone non-increasing → fixpoint
        prev_sum = cur_sum
    if not converged:
        raise RuntimeError(
            f"connected_components (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}; raise cfg.max_iterations"
        )
    if ckpt is not None and cfg.checkpoint_every:
        ckpt.write_dataset(
            rnd, labels, metrics={"label_sum": cur_sum, "converged": True}
        )
    return labels


# ---------------------------------------------------------------------------
# canonical relabel + public API
# ---------------------------------------------------------------------------


def canonical_relabel(raw_labels: np.ndarray) -> np.ndarray:
    """Dense component ids 0..M-1 ranked by component min-vid (== min-url
    because vids are url-sorted). The distributed-safe analogue of
    compressed_freeze's first-appearance order (src/disjoint_set.hpp:73-96)."""
    uniq = np.unique(raw_labels)  # sorted ascending = min-url order
    return np.searchsorted(uniq, raw_labels).astype(np.int64)


def canonical_relabel_ds(labels_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed canonical relabel: (vid, label) → (vid, component_id)
    with NO V-sized driver state (the 10^12-vertex path).

    Dense rank by sorted label without a skewed join: global sort on
    label (Ray's range partitioner splits runs of equal labels across
    blocks, so a giant component cannot become one straggler block),
    then per-block (n_distinct, first, last) — P tuples to the driver —
    a P-length prefix sum with a one-unit correction wherever a label
    run spans a block boundary, and a block-local ``np.unique`` relabel.
    Driver work and memory are O(P), not O(V)."""
    s = labels_ds.sort("label").materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _stats(t: pa.Table):
        if t.num_rows == 0:  # post-sort empty blocks can be SCHEMA-LESS
            return (0, None, None)
        lab = col_np(t, "label")
        # block is sorted: distinct count = boundary count
        nd = 1 + int(np.count_nonzero(lab[1:] != lab[:-1]))
        return (nd, int(lab[0]), int(lab[-1]))

    stats = ray.get([_stats.remote(r) for r in refs])
    starts: list[int] = []
    run = 0
    prev_last = None
    for nd, first, last in stats:
        dup = 1 if (nd > 0 and prev_last is not None and first == prev_last) else 0
        starts.append(run - dup)
        run += nd - dup
        if nd > 0:
            prev_last = last

    @ray.remote(num_cpus=0.25)
    def _relabel(t: pa.Table, start: int) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"vid": pa.array([], pa.int64()),
                 "component_id": pa.array([], pa.int64())}
            )
        lab = col_np(t, "label")
        vid = col_np(t, "vid")
        # sorted block: unique() order == appearance order == rank order
        _, inv = np.unique(lab, return_inverse=True)
        return table_from_arrays(
            vid=vid, component_id=(inv + start).astype(np.int64)
        )

    out_refs = [_relabel.remote(r, int(st)) for r, st in zip(refs, starts)]
    return ray.data.from_arrow_refs(out_refs)


def connected_components(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
    on_round=None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, component_id) with canonical dense component
    ids; exact-conformant to the reference's CCL under the lattice
    encoding (tests/test_cc_lattice.py)."""
    mode = mode or _pick_mode(graph, cfg)
    ckpt = None
    if cfg.checkpoint_dir and cfg.checkpoint_every:
        from ..state.checkpoint import CheckpointManager, graph_fingerprint

        ckpt = CheckpointManager(
            cfg.checkpoint_dir, "cc", graph_fingerprint(graph),
            num_partitions=cfg.num_partitions,
        )
    if mode == "broadcast":
        raw = _cc_broadcast(graph, cfg, on_round=on_round, ckpt=ckpt)
        return _output_from_raw(graph, raw)
    elif mode == "shuffle":
        labels_ds = _cc_shuffle(graph, cfg, on_round=on_round, ckpt=ckpt)
        return _output_from_labels_ds(graph, cfg, labels_ds)
    raise ValueError(mode)


def _output_from_raw(graph: Graph, raw: np.ndarray) -> "ray.data.Dataset":
    comp = canonical_relabel(raw)
    comp_ref = ray.put(comp)

    def attach(batch: pa.Table, _ref=comp_ref) -> pa.Table:
        c = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column("component_id", pa.array(c[vid]))

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _output_from_labels_ds(
    graph: Graph, cfg: EngineConfig, labels_ds: "ray.data.Dataset"
) -> "ray.data.Dataset":
    if graph.num_vertices > cfg.broadcast_max_vertices:
        # scale path end-to-end: distributed dense relabel, then a
        # vid-unique hash join to attach urls — no O(V) driver array
        comp_ds = canonical_relabel_ds(labels_ds)
        return (
            graph.vertices.join(
                comp_ds, join_type="inner",
                num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "component_id"])
            .materialize()
        )
    res = dataset_to_numpy(labels_ds, "vid", "label")
    raw = np.empty(graph.num_vertices, dtype=np.int64)
    raw[res["vid"]] = res["label"]
    return _output_from_raw(graph, raw)


def connected_components_urls(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, root_url): component membership keyed by URL,
    labeled by the component's canonical min-url. This is the
    RESUMABLE form — vid-free, so it survives vertex renumbering when
    the next crawl adds pages — that connected_components_incremental
    consumes as its warm start. (vids are assigned in url sort order,
    so the min-vid label IS the min-url member.)"""
    mode = mode or _pick_mode(graph, cfg)
    if mode == "broadcast":
        raw = _cc_broadcast(graph, cfg)
        ref = ray.put(raw)

        def attach(t: pa.Table, _ref=ref) -> pa.Table:
            lab = ray.get(_ref)
            return table_from_arrays(
                vid=col_np(t, "vid"), label=lab[col_np(t, "vid")]
            )

        labels_ds = graph.vertices.select_columns(["vid"]).map_batches(
            attach, batch_format="pyarrow"
        )
    else:
        labels_ds = _cc_shuffle(graph, cfg)
    from ..util import compact_nonempty

    _EMPTY_UR = pa.table(
        {"url": pa.array([], pa.string()),
         "root_url": pa.array([], pa.string())}
    )
    labels_c = compact_nonempty(labels_ds.materialize())
    roots = compact_nonempty(
        graph.vertices.map_batches(
            lambda t: pa.table(
                {"label": t.column("vid").cast(pa.int64()),
                 "root_url": t.column("url")}
            ),
            batch_format="pyarrow",
        ).materialize()
    )
    verts = compact_nonempty(graph.vertices.materialize())
    if labels_c is None or roots is None or verts is None:
        return ray.data.from_arrow(_EMPTY_UR)
    first = compact_nonempty(
        labels_c.join(
            roots, join_type="inner", num_partitions=cfg.num_partitions,
            on=("label",),
        ).materialize()  # two fused JoinOperators can deadlock (Ray 2.49)
    )
    if first is None:
        return ray.data.from_arrow(_EMPTY_UR)
    return first.join(
        verts, join_type="inner",
        num_partitions=cfg.num_partitions, on=("vid",),
    ).select_columns(["url", "root_url"])


def connected_components_incremental(
    graph: Graph,
    prior: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
    on_round=None,
) -> "ray.data.Dataset":
    """Warm-started connected components — the distributed analogue of
    the reference's per-frame incremental relabel (SegmentImageImpl
    caches its merge table and update() re-labels against it,
    src/SegmentImageImpl.cpp:27-31): re-running CC on the next crawl's
    graph starts from the previous crawl's labels, so only merges
    induced by the DELTA edges iterate.

    ``graph`` must be an ADDITIVE superset of the graph that produced
    ``prior`` (edges and vertices added, none removed — removals make
    prior labels over-merged and stale). ``prior`` is the url-keyed
    (url, root_url) output of connected_components_urls; urls absent
    from it (new pages) start as their own components. The result is
    EXACTLY connected_components(graph): warm labels are valid upper
    bounds of the hash-min fixpoint, so convergence target is
    unchanged — only the round count shrinks.

    Output contract matches connected_components: (vid, url,
    component_id) with canonical dense ids."""
    from ..util import compact_nonempty

    mode = mode or _pick_mode(graph, cfg)
    v = graph.vertices  # (vid, url)
    pri = compact_nonempty(
        prior.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "root_url": t.column("root_url")}
            ),
            batch_format="pyarrow",
        ).materialize()
    )
    if pri is None:
        return connected_components(graph, cfg, mode=mode, on_round=on_round)
    root_vids = compact_nonempty(
        v.map_batches(
            lambda t: pa.table(
                {"root_url": t.column("url"),
                 "root_vid": t.column("vid").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ).materialize()
    )
    tagged = compact_nonempty(
        pri.join(
            root_vids, join_type="inner",
            num_partitions=cfg.num_partitions, on=("root_url",),
        ).materialize()
    )
    v_c = compact_nonempty(v.materialize())
    if tagged is None:
        return connected_components(graph, cfg, mode=mode, on_round=on_round)
    known = tagged.join(
        v_c, join_type="right_outer",
        num_partitions=cfg.num_partitions,
        on=("url",), right_on=("url",),
    )

    def init_of(t: pa.Table) -> pa.Table:
        vid = col_np(t, "vid").astype(np.int64)
        rv = t.column("root_vid").to_numpy(zero_copy_only=False)
        lab = np.where(_pd_isnull(rv), vid, rv).astype(np.int64)
        return table_from_arrays(vid=vid, label=lab)

    init_labels = compact_nonempty(
        known.map_batches(init_of, batch_format="pyarrow").materialize()
    )
    if init_labels is None:
        return connected_components(graph, cfg, mode=mode, on_round=on_round)

    if mode == "broadcast":
        res = dataset_to_numpy(init_labels, "vid", "label")
        init = np.arange(graph.num_vertices, dtype=np.int64)
        init[res["vid"]] = res["label"]
        raw = _cc_broadcast(graph, cfg, on_round=on_round, init=init)
        return _output_from_raw(graph, raw)
    labels_ds = _cc_shuffle(
        graph, cfg, on_round=on_round, init_labels=init_labels
    )
    return _output_from_labels_ds(graph, cfg, labels_ds)


def _pd_isnull(a) -> np.ndarray:
    import pandas as pd

    return pd.isnull(a)


def labels_urls_from_components(
    comp: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """(vid|url, component_id) component table → the url-keyed
    resumable form (url, root_url) WITHOUT re-running CC: one bucketed
    min-url per component (component cardinality ≤ V) + one
    component-keyed join back. This is how a job derives the labels the
    NEXT crawl delta warm-starts from, from the output it already
    wrote."""
    from ..util import compact_nonempty

    c = compact_nonempty(
        comp.select_columns(["url", "component_id"]).materialize()
    )
    if c is None:
        return ray.data.from_arrow(
            pa.table({"url": pa.array([], pa.string()),
                      "root_url": pa.array([], pa.string())})
        )
    roots = compact_nonempty(
        bucketed_aggregate(
            c, key_cols=["component_id"], aggs=[("url", "min", "root_url")]
        )
    )
    return c.join(
        roots, join_type="inner", num_partitions=cfg.num_partitions,
        on=("component_id",),
    ).select_columns(["url", "root_url"])


def component_sizes(cc: "ray.data.Dataset") -> "ray.data.Dataset":
    """(component_id, size) — the analogue of per-component npixels
    (include/imtag_statistics.hpp:59-66)."""
    from ..util import bucketed_aggregate

    # bucketed: component cardinality is V in the worst case (all
    # singletons) — see util.bucketed_aggregate
    return bucketed_aggregate(
        cc, key_cols=["component_id"],
        aggs=[("component_id", "count", "size")],
    )
