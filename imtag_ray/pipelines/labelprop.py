"""Semi-supervised label propagation (SURVEY.md §7.1 M5).

Reuses the hash-min machinery of connected components with a
mode-update rule instead of min (ref mapping: disjoint_set's policy
point ``label_cmp_func``, src/disjoint_set.hpp:30-34 — the propagation
rule is pluggable; CC uses min, LP uses most-frequent-with-min-tiebreak).

Semantics (deterministic, synchronous):
- seed vertices are clamped to their seed label forever
- every round, each non-seed vertex adopts the most frequent label
  among its labeled neighbors (undirected); ties → lexicographically
  smallest label; no labeled neighbor → unchanged
- converges when no vertex changes (or max_iterations)

Two execution modes (mirroring pipelines.cc):
- **broadcast**: per-vertex label-code numpy array shipped via ray.put
  per round; per-batch combiner pre-counts (vid, label) votes. Right
  up to ~10^8 vertices/node.
- **shuffle** (scale path): state is a Dataset joined to edges each
  round; the winner argmax runs as a distributed map_groups and
  convergence is a changed-row aggregate — no V-sized driver state.

The engine result is differentially tested against a pure-Python
reference loop with identical semantics (tests/test_labelprop_triangles.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Max, Min, Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import (
    bucketed_aggregate,
    bucketed_sum_aggregate,
    col_np,
    dataset_to_numpy,
    table_from_arrays,
)

UNLABELED = -1


def _resolve_seeds(graph: Graph, seeds: dict, code: dict):
    """Seed urls → (vids, codes) via a filtered vertex scan (the seed
    set is tiny; never build a driver dict of ALL urls)."""
    seed_set = pa.array(sorted(seeds.keys()), type=pa.string())

    def find_seeds(t: pa.Table, _set=seed_set) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["url"], value_set=_set)).select(
            ["vid", "url"]
        )

    url_to_vid = {
        r["url"]: r["vid"]
        for r in graph.vertices.map_batches(
            find_seeds, batch_format="pyarrow"
        ).take_all()
    }
    vids, codes = [], []
    for u, s in seeds.items():
        vid = url_to_vid.get(u)
        if vid is not None:
            vids.append(vid)
            codes.append(code[s])
    order = np.argsort(np.asarray(vids, dtype=np.int64))
    return (
        np.asarray(vids, dtype=np.int64)[order],
        np.asarray(codes, dtype=np.int64)[order],
    )


def _canon_edges(graph: Graph) -> "ray.data.Dataset":
    """DISTINCT undirected (min,max) pairs before voting: web link
    graphs commonly contain both (u,v) and (v,u), and counting a
    neighbor's vote once per directed row would double it (diverging
    from the documented most-frequent-among-NEIGHBORS semantics and
    from label_propagation_reference's set-based adjacency)."""
    V = graph.num_vertices

    def canon(t: pa.Table, _V=V) -> pa.Table:
        src = col_np(t, "src")
        dst = col_np(t, "dst")
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        key = np.unique(lo.astype(np.int64) * _V + hi)
        return table_from_arrays(src=key // _V, dst=key % _V)

    # bucketed distinct — canonical-edge cardinality is E
    return bucketed_sum_aggregate(
        graph.edges.select_columns(["src", "dst"]).map_batches(
            canon, batch_format="pyarrow"
        ),
        key_cols=["src", "dst"], sum_cols=[],
    ).materialize()


def _lp_broadcast(
    graph: Graph, edges: "ray.data.Dataset",
    seed_vids: np.ndarray, seed_codes: np.ndarray,
    L: int, cfg: EngineConfig, ckpt=None,
) -> np.ndarray:
    V = graph.num_vertices
    lab = np.full(V, UNLABELED, dtype=np.int64)
    is_seed = np.zeros(V, dtype=bool)
    lab[seed_vids] = seed_codes
    is_seed[seed_vids] = True

    start_round = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            lab = ckpt.load_arrays(m, "label")["label"]
            start_round = m["iteration"] + 1

    for rnd in range(start_round, cfg.max_iterations):
        ref = ray.put(lab)

        def step(batch: pa.Table, _ref=ref, _L=L) -> pa.Table:
            labels = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            # undirected: each endpoint votes for the other; a self-loop
            # contributes ONE self-vote (set-adjacency semantics)
            m = src != dst
            voters = np.concatenate([labels[src], labels[dst[m]]])
            targets = np.concatenate([dst, src[m]])
            ok = voters != UNLABELED
            key = targets[ok] * _L + voters[ok]  # (vid,label) composite
            uniq, counts = np.unique(key, return_counts=True)
            return table_from_arrays(
                vid=uniq // _L, label=uniq % _L, cnt=counts.astype(np.int64)
            )

        # bucketed — (vid,label) cardinality is up to E
        agg = bucketed_sum_aggregate(
            edges.map_batches(step, batch_format="pyarrow"),
            key_cols=["vid", "label"], sum_cols=["cnt"],
        )
        res = dataset_to_numpy(agg, "vid", "label", "cnt")
        if len(res["vid"]) == 0:
            break  # no labeled vote anywhere → fixpoint
        # argmax with (count desc, label asc) tie-break: sort rows by
        # (vid asc, cnt desc, label asc) and take the first per vid
        order = np.lexsort((res["label"], -res["cnt"], res["vid"]))
        vids = res["vid"][order]
        labs = res["label"][order]
        first = np.ones(len(vids), dtype=bool)
        first[1:] = vids[1:] != vids[:-1]
        winner_vid = vids[first]
        winner_lab = labs[first]

        new = lab.copy()
        upd = ~is_seed[winner_vid]
        new[winner_vid[upd]] = winner_lab[upd]
        changed = int((new != lab).sum())
        lab = new
        if ckpt is not None and cfg.checkpoint_every and (
            (rnd + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_arrays(rnd, {"label": lab}, metrics={"changed": changed})
        if changed == 0:
            break
    return lab


def _winner_of_group(group: pa.Table) -> pa.Table:
    """Vote rows of ONE vid → its winning label (count desc, label asc)."""
    lab = col_np(group, "label")
    cnt = col_np(group, "cnt")
    order = np.lexsort((lab, -cnt))
    return pa.table(
        {"vid": group.column("vid").slice(0, 1),
         "winner": pa.array([int(lab[order[0]])], pa.int64())}
    )


def _winners_of_block(g: pa.Table) -> pa.Table:
    """Vote rows of MANY vids (one coarse hash bucket) → winning label
    per vid (count desc, label asc) in one vectorized lexsort — the
    many-group form of _winner_of_group."""
    vid = col_np(g, "vid").astype(np.int64)
    lab = col_np(g, "label").astype(np.int64)
    cnt = col_np(g, "cnt").astype(np.int64)
    order = np.lexsort((lab, -cnt, vid))
    v, l = vid[order], lab[order]
    first = np.ones(len(v), dtype=bool)
    first[1:] = v[1:] != v[:-1]
    return pa.table(
        {"vid": pa.array(v[first], pa.int64()),
         "winner": pa.array(l[first], pa.int64())}
    )


def _lp_shuffle(
    graph: Graph, edges: "ray.data.Dataset",
    seed_vids: np.ndarray, seed_codes: np.ndarray,
    L: int, cfg: EngineConfig, ckpt=None,
) -> "ray.data.Dataset":
    """Scale path: (vid, label, is_seed) state Dataset; votes via two
    edge⋈state hash joins (materialized per the Ray 2.49 multi-join
    fusion deadlock workaround); winner per vid via map_groups (≤L rows
    per group); winners applied to state through a union + groupby
    encode/decode exchange (no join — see the in-loop comment);
    convergence via a changed-row aggregate."""
    from ..util import sparse_sum_reduce

    P = cfg.num_partitions
    sv_ref = ray.put(seed_vids)
    sc_ref = ray.put(seed_codes)

    def init(t: pa.Table) -> pa.Table:
        sv = ray.get(sv_ref)
        sc = ray.get(sc_ref)
        vid = col_np(t, "vid")
        lab = np.full(len(vid), UNLABELED, dtype=np.int64)
        seed = np.zeros(len(vid), dtype=np.int8)
        if len(sv):
            pos = np.searchsorted(sv, vid)
            pos_c = np.minimum(pos, len(sv) - 1)
            hit = sv[pos_c] == vid
            lab[hit] = sc[pos_c[hit]]
            seed[hit] = 1
        return table_from_arrays(vid=vid, label=lab, is_seed=seed)

    state = (
        graph.vertices.select_columns(["vid"])
        .map_batches(init, batch_format="pyarrow")
        .materialize()
    )
    start_round = 0
    if ckpt is not None:
        m = ckpt.latest()
        if m is not None:
            state = ray.data.read_parquet(
                m["path"], columns=["vid", "label", "is_seed"]
            ).materialize()
            start_round = m["iteration"] + 1

    for rnd in range(start_round, cfg.max_iterations):
        lab_side = state.select_columns(["vid", "label"])
        by_src = (
            edges.join(
                lab_side, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(
                # src votes for dst (self-loop: one self-vote)
                lambda t: table_from_arrays(
                    vid=col_np(t, "dst"), vote=col_np(t, "label")
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

        def dst_votes(t: pa.Table) -> pa.Table:
            src = col_np(t, "src")
            dst = col_np(t, "dst")
            lab = col_np(t, "label")
            m = src != dst  # no double self-vote
            return table_from_arrays(vid=src[m], vote=lab[m])

        by_dst = (
            edges.join(
                lab_side, join_type="inner", num_partitions=P,
                on=("dst",), right_on=("vid",),
            )
            .map_batches(dst_votes, batch_format="pyarrow")
            .materialize()
        )

        def combine(t: pa.Table, _L=L) -> pa.Table:
            vid = col_np(t, "vid")
            vote = col_np(t, "vote")
            ok = vote != UNLABELED
            k, c = sparse_sum_reduce(
                vid[ok] * _L + vote[ok], np.ones(int(ok.sum()), np.int64)
            )
            return table_from_arrays(vid=k // _L, label=k % _L, cnt=c)

        votes = bucketed_sum_aggregate(
            by_src.union(by_dst).map_batches(combine, batch_format="pyarrow"),
            key_cols=["vid", "label"], sum_cols=["cnt"],
        )
        # winner per vid, one coarse bucket at a time (vid-cardinality
        # map_groups paid Ray's per-group overhead V times)
        from ..util import _mix_to_bucket

        def vid_bucket(t: pa.Table) -> pa.Table:
            return t.append_column("__bucket", pa.array(
                _mix_to_bucket([col_np(t, "vid").astype(np.int64)], 256)
            ))

        winners = (
            votes.map_batches(vid_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_winners_of_block, batch_format="pyarrow")
            .materialize()
        )
        if winners.count() == 0:
            # no labeled vote anywhere (e.g. no seed matched a vertex):
            # nothing can ever change
            break

        # Apply winners to state via a union + groupby MESSAGE EXCHANGE,
        # not a join: map_groups' underlying sort emits SCHEMA-LESS
        # empty blocks (round-3 gotcha) that ArrowInvalid a join's right
        # side, while a groupby just drops them (same workaround as
        # cc._shortcut_labels). Encoding — state row carries
        # (old label, is_seed) in the low bits, a winner row lands
        # strictly above every state row, so per vid Min = old state and
        # Max = winner-if-any:
        #   enc_state  = (label + OFF) * 2 + is_seed   (label >= -1)
        #   enc_winner = W + winner + OFF,  W > max enc_state
        OFF = 2
        W = 2 * (L + OFF) + 4

        def enc_state(t: pa.Table) -> pa.Table:
            return table_from_arrays(
                vid=col_np(t, "vid"),
                enc=(col_np(t, "label") + OFF) * 2 + col_np(t, "is_seed"),
            )

        def enc_winner(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "winner" not in t.column_names:
                return pa.table({"vid": pa.array([], pa.int64()),
                                 "enc": pa.array([], pa.int64())})
            return table_from_arrays(
                vid=col_np(t, "vid"), enc=W + col_np(t, "winner") + OFF
            )

        def decode(t: pa.Table) -> pa.Table:
            lo = col_np(t, "lo")
            hi = col_np(t, "hi")
            old = lo // 2 - OFF
            seed = (lo & 1).astype(np.int8)
            new = np.where((seed == 0) & (hi >= W), hi - W - OFF, old)
            return table_from_arrays(
                vid=col_np(t, "vid"), label=new.astype(np.int64),
                is_seed=seed, changed=(new != old).astype(np.int64),
            )

        joined = (
            bucketed_aggregate(
                state.map_batches(enc_state, batch_format="pyarrow")
                .union(winners.map_batches(enc_winner, batch_format="pyarrow")),
                key_cols=["vid"],
                aggs=[("enc", "min", "lo"), ("enc", "max", "hi")],
            )
            .map_batches(decode, batch_format="pyarrow")
            .materialize()
        )
        changed = int(joined.aggregate(Sum("changed", alias_name="s"))["s"] or 0)
        state = joined.drop_columns(["changed"]).materialize()
        if ckpt is not None and cfg.checkpoint_every and (
            (rnd + 1) % cfg.checkpoint_every == 0
        ):
            ckpt.write_dataset(rnd, state, metrics={"changed": changed})
        if changed == 0:
            break
    return state


def label_propagation(
    graph: Graph,
    seeds: dict[str, str],
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, label) — label '' for never-labeled vertices."""
    vocab = sorted(set(seeds.values()))
    code = {s: i for i, s in enumerate(vocab)}
    L = max(len(vocab), 1)

    if mode is None:
        if cfg.vertex_state in ("broadcast", "shuffle"):
            mode = cfg.vertex_state
        else:
            mode = (
                "broadcast"
                if graph.num_vertices <= cfg.broadcast_max_vertices
                else "shuffle"
            )

    seed_vids, seed_codes = _resolve_seeds(graph, seeds, code)
    edges = _canon_edges(graph)

    ckpt = None
    if cfg.checkpoint_dir and cfg.checkpoint_every:
        import hashlib

        from ..state.checkpoint import CheckpointManager, graph_fingerprint

        # LP state depends on the seed assignment as much as on the
        # graph — fold a seeds digest into the lineage fingerprint so a
        # checkpoint is never resumed under a different seeding.
        seed_digest = hashlib.sha256(
            repr(sorted(seeds.items())).encode()
        ).hexdigest()[:16]
        ckpt = CheckpointManager(
            cfg.checkpoint_dir, "labelprop",
            f"{graph_fingerprint(graph)}-seeds{seed_digest}",
            cfg.num_partitions,
        )

    if mode == "broadcast":
        lab = _lp_broadcast(graph, edges, seed_vids, seed_codes, L, cfg, ckpt)
        out_labels = np.array([""] + vocab, dtype=object)[lab + 1]
        lab_ref = ray.put(out_labels)

        def attach(batch: pa.Table, _ref=lab_ref) -> pa.Table:
            lbl = ray.get(_ref)
            vid = col_np(batch, "vid")
            return batch.append_column(
                "label", pa.array([str(x) for x in lbl[vid]], type=pa.string())
            )

        return graph.vertices.map_batches(attach, batch_format="pyarrow")
    elif mode == "shuffle":
        state = _lp_shuffle(graph, edges, seed_vids, seed_codes, L, cfg, ckpt)
        vocab_arr = pa.array([""] + vocab, pa.string())

        def decode(t: pa.Table, _vocab=vocab_arr) -> pa.Table:
            lab = col_np(t, "label") + 1
            return pa.table(
                {"vid": t.column("vid"),
                 "label": _vocab.take(pa.array(lab))}
            )

        # vid-unique hash join to attach urls — no driver V-array
        return (
            graph.vertices.join(
                state.map_batches(decode, batch_format="pyarrow"),
                join_type="inner", num_partitions=cfg.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["vid", "url", "label"])
            .materialize()
        )
    raise ValueError(mode)


def lpa_communities(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int = 4,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """UNSEEDED label-propagation community detection (classic LPA,
    Raghavan et al.): every vertex starts labeled with its own vid and
    ``rounds`` synchronous rounds run the same deterministic update as
    the seeded variant — adopt the most frequent neighbor label, ties
    broken by the smallest label; a vertex with no votes keeps its
    label. Converging early is a no-op (fixpoint replays unchanged),
    so a fixed-round SQL oracle can replay the trajectory exactly.

    → Dataset (vid, url, community) where community is the winning
    label's URL (the vid space is engine-internal; URLs are the stable
    public names). Same broadcast/shuffle split as the seeded variant;
    the label alphabet is V-sized here, so the composite (vid, label)
    vote keys stay two-column through the bucketed aggregation on the
    scale path."""
    V = graph.num_vertices
    empty = pa.table(
        {"vid": pa.array([], pa.int64()),
         "url": pa.array([], pa.string()),
         "community": pa.array([], pa.string())}
    )
    if V == 0:
        return ray.data.from_arrow(empty)
    if mode is None:
        if cfg.vertex_state in ("broadcast", "shuffle"):
            mode = cfg.vertex_state
        else:
            mode = (
                "broadcast"
                if V <= cfg.broadcast_max_vertices
                else "shuffle"
            )
    edges = _canon_edges(graph)
    if mode == "shuffle":
        state = _lpa_shuffle(graph, edges, cfg, rounds)
    else:
        lab = _lpa_broadcast(graph, edges, cfg, rounds)
        ref = ray.put(lab)

        def attach(t: pa.Table, _ref=ref) -> pa.Table:
            lv = ray.get(_ref)
            vid = col_np(t, "vid")
            return table_from_arrays(vid=vid, label=lv[vid])

        state = graph.vertices.select_columns(["vid"]).map_batches(
            attach, batch_format="pyarrow"
        )
    # label vid → url: two bounded hash joins against the vertex table
    from ..util import compact_nonempty

    verts = compact_nonempty(graph.vertices.select_columns(["vid", "url"]))
    if verts is None:
        return ray.data.from_arrow(empty)
    lab_urls = verts.rename_columns({"vid": "label", "url": "community"})
    out = (
        compact_nonempty(state.select_columns(["vid", "label"]))
        .join(
            verts, join_type="inner", num_partitions=cfg.num_partitions,
            on=("vid",), right_on=("vid",),
        )
        .materialize()
        .join(
            lab_urls, join_type="inner",
            num_partitions=cfg.num_partitions,
            on=("label",), right_on=("label",),
        )
        .select_columns(["vid", "url", "community"])
        .materialize()
    )
    return out


def _lpa_broadcast(
    graph: Graph, edges: "ray.data.Dataset", cfg: EngineConfig, rounds: int
) -> np.ndarray:
    V = graph.num_vertices
    lab = np.arange(V, dtype=np.int64)
    for _ in range(rounds):
        ref = ray.put(lab)

        def step(batch: pa.Table, _ref=ref, _V=V) -> pa.Table:
            labels = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            m = src != dst  # self-loop contributes one self-vote
            voters = np.concatenate([labels[src], labels[dst[m]]])
            targets = np.concatenate([dst, src[m]])
            key = targets * _V + voters
            uniq, counts = np.unique(key, return_counts=True)
            return table_from_arrays(
                vid=uniq // _V, label=uniq % _V,
                cnt=counts.astype(np.int64),
            )

        agg = bucketed_sum_aggregate(
            edges.map_batches(step, batch_format="pyarrow"),
            key_cols=["vid", "label"], sum_cols=["cnt"],
        )
        res = dataset_to_numpy(agg, "vid", "label", "cnt")
        if len(res["vid"]) == 0:
            break
        order = np.lexsort((res["label"], -res["cnt"], res["vid"]))
        vids = res["vid"][order]
        labs = res["label"][order]
        first = np.ones(len(vids), dtype=bool)
        first[1:] = vids[1:] != vids[:-1]
        new = lab.copy()
        new[vids[first]] = labs[first]
        if np.array_equal(new, lab):
            break  # fixpoint: remaining rounds are no-ops
        lab = new
    return lab


def _lpa_shuffle(
    graph: Graph, edges: "ray.data.Dataset", cfg: EngineConfig, rounds: int
) -> "ray.data.Dataset":
    """Dataset-state LPA rounds — the seeded _lp_shuffle's exchange
    with the V-sized label alphabet and no seed clamping."""
    from ..util import _mix_to_bucket, sparse_sum_reduce

    P = cfg.num_partitions
    V = graph.num_vertices

    state = (
        graph.vertices.select_columns(["vid"])
        .map_batches(
            lambda t: table_from_arrays(
                vid=col_np(t, "vid"), label=col_np(t, "vid")
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    for _ in range(rounds):
        lab_side = state.select_columns(["vid", "label"])
        by_src = (
            edges.join(
                lab_side, join_type="inner", num_partitions=P,
                on=("src",), right_on=("vid",),
            )
            .map_batches(
                lambda t: table_from_arrays(
                    vid=col_np(t, "dst"), vote=col_np(t, "label")
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )

        def dst_votes(t: pa.Table) -> pa.Table:
            src = col_np(t, "src")
            dst = col_np(t, "dst")
            lab = col_np(t, "label")
            m = src != dst
            return table_from_arrays(vid=src[m], vote=lab[m])

        by_dst = (
            edges.join(
                lab_side, join_type="inner", num_partitions=P,
                on=("dst",), right_on=("vid",),
            )
            .map_batches(dst_votes, batch_format="pyarrow")
            .materialize()
        )

        def combine(t: pa.Table, _V=V) -> pa.Table:
            vid = col_np(t, "vid")
            vote = col_np(t, "vote")
            k, c = sparse_sum_reduce(
                vid * _V + vote, np.ones(len(vid), np.int64)
            )
            return table_from_arrays(vid=k // _V, label=k % _V, cnt=c)

        votes = bucketed_sum_aggregate(
            by_src.union(by_dst).map_batches(
                combine, batch_format="pyarrow"
            ),
            key_cols=["vid", "label"], sum_cols=["cnt"],
        )

        def vid_bucket(t: pa.Table) -> pa.Table:
            return t.append_column("__bucket", pa.array(
                _mix_to_bucket([col_np(t, "vid").astype(np.int64)], 256)
            ))

        winners = (
            votes.map_batches(vid_bucket, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(_winners_of_block, batch_format="pyarrow")
            .materialize()
        )
        if winners.count() == 0:
            break

        # state/winner message exchange (same encode trick as
        # _lp_shuffle; labels here are >= 0 so OFF = 1 suffices)
        OFF = 1
        W = 2 * (V + OFF) + 4

        def enc_state(t: pa.Table) -> pa.Table:
            return table_from_arrays(
                vid=col_np(t, "vid"),
                enc=(col_np(t, "label") + OFF) * 2,
            )

        def enc_winner(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "winner" not in t.column_names:
                return pa.table({"vid": pa.array([], pa.int64()),
                                 "enc": pa.array([], pa.int64())})
            return table_from_arrays(
                vid=col_np(t, "vid"), enc=W + col_np(t, "winner") + OFF
            )

        def decode(t: pa.Table) -> pa.Table:
            lo = col_np(t, "lo")
            hi = col_np(t, "hi")
            old = lo // 2 - OFF
            new = np.where(hi >= W, hi - W - OFF, old)
            return table_from_arrays(
                vid=col_np(t, "vid"), label=new.astype(np.int64),
                changed=(new != old).astype(np.int64),
            )

        joined = (
            bucketed_aggregate(
                state.map_batches(enc_state, batch_format="pyarrow")
                .union(
                    winners.map_batches(enc_winner, batch_format="pyarrow")
                ),
                key_cols=["vid"],
                aggs=[("enc", "min", "lo"), ("enc", "max", "hi")],
            )
            .map_batches(decode, batch_format="pyarrow")
            .materialize()
        )
        changed = int(
            joined.aggregate(Sum("changed", alias_name="s"))["s"] or 0
        )
        state = joined.drop_columns(["changed"]).materialize()
        if changed == 0:
            break
    return state


def label_propagation_reference(
    edges: list[tuple[str, str]],
    seeds: dict[str, str],
    max_iterations: int = 100,
) -> dict[str, str]:
    """Pure-Python oracle with identical semantics (tests only)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    verts = set()
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
        verts.update((s, d))
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(max_iterations):
        new = dict(lab)
        for v in verts:
            if v in seeds:
                continue
            votes = Counter(
                lab[n] for n in adj[v] if lab[n] is not None
            )
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0]
        if new == lab:
            break
        lab = new
    return {v: (s if s is not None else "") for v, s in lab.items()}
