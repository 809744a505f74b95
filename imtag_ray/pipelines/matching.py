"""Deterministic distributed maximal matching over the undirected
graph (the "handshake" algorithm: Israeli-Itai 1986 family) — each
alive vertex points at its minimum-priority alive neighbor; an edge
whose endpoints point at each other is MATCHED; matched vertices
leave; repeat. Converges to a maximal matching in O(log V) expected
rounds; matched pairs are the symmetric primitive behind distributed
coarsening (multilevel partitioners), load pairing, and the
merge-step of Borůvka-style algorithms.

Priorities are the engine's replayable splitmix64(vid + round·K)
(pipelines/mis.py:_priorities — bijection ⇒ distinct within a round,
so the argmin neighbor is unique and no tie rule is needed) and the
SQL oracle replays every round bit-exactly with the same HUGEINT
limb-mulmod expression.

Reference lineage: mutual-minimum pairing is exactly imtag's
union-find merge policy (lt_cmp — smaller wins) restricted to
degree-1 hooks, i.e. the matching special case of the disjoint_set
merge table (src/imtag.cpp).

Modes follow the engine convention:
- ``broadcast``: numpy argmin scatter per round (two passes: min
  priority per vertex, then the unique neighbor achieving it).
- ``shuffle``: per round one 256-bucket lexsort-first-per-run argmin
  (the msf selection kernel) over the alive-alive edges emitted both
  directions, one renamed self-join for mutuality, then the shared
  mis.subtract_vids / mis.prune_edges anti-join and pruning — no
  driver state.

``rounds=R`` runs exactly R rounds (fixed-round semantics for the
oracle); ``rounds=None`` runs until no alive edge remains and raises
past cfg.max_iterations. Output: (url_a, url_b) matched pairs with
url_a < url_b (vid order).
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
    col_np,
    compact_nonempty,
    dataset_to_numpy,
    table_from_arrays,
)
from .mis import (
    _pick_mode,
    _priorities,
    clean_edge_ds,
    prune_edges,
    subtract_vids,
)

_EMPTY = pa.table(
    {"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string())}
)


def maximal_matching(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    rounds: int | None = None,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url_a, url_b): deterministic handshake maximal
    matching over the graph's canonical edges treated as undirected."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY)
    mode = mode or _pick_mode(graph, cfg)
    if mode == "shuffle":
        pairs = _matching_shuffle(graph, cfg, rounds)
    else:
        pairs = _matching_broadcast(graph, cfg, rounds)
    if pairs is None:
        return ray.data.from_arrow(_EMPTY)
    P = cfg.num_partitions
    verts = graph.vertices.select_columns(["vid", "url"])
    out = compact_nonempty(
        pairs.join(
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
    return out.select_columns(["url_a", "url_b"]).materialize()


def _matching_broadcast(
    graph: Graph, cfg: EngineConfig, rounds: int | None
):
    V = graph.num_vertices
    e = dataset_to_numpy(graph.edges, "src", "dst")
    keep = e["src"] != e["dst"]
    src = np.concatenate([e["src"][keep], e["dst"][keep]]).astype(np.int64)
    dst = np.concatenate([e["dst"][keep], e["src"][keep]]).astype(np.int64)

    alive = np.ones(V, dtype=bool)
    mlo: list = []
    mhi: list = []
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for k in range(max_rounds):
        live = alive[src] & alive[dst]
        if not live.any():
            converged = True
            break
        s, d = src[live], dst[live]
        pri = _priorities(np.arange(V, dtype=np.int64), k)
        nbr_min = np.full(V, np.iinfo(np.uint64).max, dtype=np.uint64)
        np.minimum.at(nbr_min, s, pri[d])
        # the unique neighbor achieving the min (priorities distinct)
        target = np.full(V, -1, dtype=np.int64)
        hit = pri[d] == nbr_min[s]
        target[s[hit]] = d[hit]
        u = np.flatnonzero(target >= 0)
        mutual = target[target[u]] == u
        a = u[mutual]
        b = target[a]
        first = a < b  # each matched pair appears from both sides
        a, b = a[first], b[first]
        mlo.append(a)
        mhi.append(b)
        alive[a] = False
        alive[b] = False
    if rounds is None and not converged:
        # re-check: the loop may have exhausted the budget exactly when
        # the matching became maximal
        live = alive[src] & alive[dst]
        if live.any():
            raise RuntimeError(
                f"maximal_matching (broadcast) did not converge within "
                f"max_iterations={cfg.max_iterations}"
            )
    if not mlo:
        return None
    lo = np.concatenate(mlo)
    hi = np.concatenate(mhi)
    return ray.data.from_arrow(
        pa.table(
            {"lo": pa.array(lo, pa.int64()), "hi": pa.array(hi, pa.int64())}
        )
    )


def _matching_shuffle(
    graph: Graph, cfg: EngineConfig, rounds: int | None
):
    from ..util import _mix_to_bucket

    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)
    edges = clean_edge_ds(graph.edges)
    alive = compact_nonempty(graph.vertices.select_columns(["vid"]))
    if alive is not None:
        alive = alive.materialize()
    if edges is not None and alive is not None:
        edges = prune_edges(edges, alive, P)
    matched_parts = []
    max_rounds = rounds if rounds is not None else cfg.max_iterations
    converged = False
    for k in range(max_rounds):
        if edges is None or alive is None:
            converged = True
            break

        # each alive endpoint nominates its min-(pri, vid) neighbor:
        # emit both directions with the neighbor's SIGNED priority,
        # 256-bucket lexsort-first-per-run argmin (msf kernel)
        def nominate(t: pa.Table, _k=k) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"u": pa.array([], pa.int64()),
                     "npri": pa.array([], pa.int64()),
                     "v": pa.array([], pa.int64())}
                )
            s = col_np(t, "src").astype(np.int64)
            d = col_np(t, "dst").astype(np.int64)
            u = np.concatenate([s, d])
            v = np.concatenate([d, s])
            pri = (_priorities(v, _k) ^ np.uint64(1 << 63)).view(np.int64)
            return table_from_arrays(u=u, npri=pri, v=v)

        def argmin_bucket(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"u": pa.array([], pa.int64()),
                     "npri": pa.array([], pa.int64()),
                     "v": pa.array([], pa.int64())}
                )
            u = col_np(t, "u").astype(np.int64)
            npri = col_np(t, "npri").astype(np.int64)
            v = col_np(t, "v").astype(np.int64)
            order = np.lexsort((v, npri, u))
            us = u[order]
            firstm = np.ones(len(us), dtype=bool)
            if len(us):
                firstm[1:] = us[1:] != us[:-1]
            kp = order[firstm]
            return table_from_arrays(u=u[kp], npri=npri[kp], v=v[kp])

        def bucketize(t: pa.Table) -> pa.Table:
            return t.append_column("__bucket", pa.array(
                _mix_to_bucket([col_np(t, "u").astype(np.int64)], 256)
            ))

        targets = compact_nonempty(
            edges.map_batches(nominate, batch_format="pyarrow")
            .map_batches(argmin_bucket, batch_format="pyarrow")
            .map_batches(bucketize, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(argmin_bucket, batch_format="pyarrow")
        )
        if targets is None:
            converged = True
            break
        targets = targets.select_columns(["u", "v"]).materialize()

        # mutual pairs: self-join target(u→v) with target(v→u), u < v
        other = targets.rename_columns({"u": "ou", "v": "ov"})
        mutual = compact_nonempty(
            targets.join(
                other, join_type="inner", num_partitions=P,
                on=("u", "v"), right_on=("ov", "ou"),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"lo": pa.array([], pa.int64()),
                         "hi": pa.array([], pa.int64())}
                    )
                    if t.num_rows == 0
                    else (
                        lambda u, v: table_from_arrays(
                            lo=u[u < v], hi=v[u < v]
                        )
                    )(
                        col_np(t, "u").astype(np.int64),
                        col_np(t, "v").astype(np.int64),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if mutual is None:
            # no mutual pair: with distinct priorities this means the
            # alive edge set is empty next round too — but an alive
            # graph ALWAYS has a mutual pair (the globally-min-priority
            # alive vertex and its target), so this only happens when
            # no alive edge existed
            converged = True
            break
        mutual = mutual.materialize()
        matched_parts.append(mutual)
        gone = compact_nonempty(
            mutual.map_batches(
                lambda t: table_from_arrays(
                    vid=np.concatenate(
                        [col_np(t, "lo"), col_np(t, "hi")]
                    ).astype(np.int64)
                ),
                batch_format="pyarrow",
            )
        )
        if gone is not None:
            alive = subtract_vids(alive, gone, n_buckets)
        edges = (
            prune_edges(edges, alive, P) if alive is not None else None
        )
    else:
        converged = edges is None
    if rounds is None and not converged:
        raise RuntimeError(
            f"maximal_matching (shuffle) did not converge within "
            f"max_iterations={cfg.max_iterations}"
        )
    if not matched_parts:
        return None
    out = matched_parts[0]
    for p_ in matched_parts[1:]:
        out = out.union(p_)
    return out
