"""k-truss decomposition (fixed peel rounds) — iterated per-edge
support peeling, fully Dataset-native.

Each round recomputes per-edge support (triangles through the edge)
WITHIN the currently-alive subgraph and drops edges with support
< k−2: the distributed analogue of the reference's iterative
morphology peels (remove_components → relabel, src/morphology.cpp) at
edge granularity. Per round: one vid-space wedge self-join (volume
Σ deg², the same shape as linkpred._ej_shuffle), one bucketed pair
count, one hash join back onto the alive edge set — no driver-resident
edge state at any point, two-column (a, b) int64 keys throughout (no
a·V+b arithmetic, overflow-safe at any V).

Fixed ``rounds`` (like traversal.kcore) so an unrolled SQL oracle can
replay the exact trajectory; real deployments loop until a round
removes nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import (
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    table_from_arrays,
)

_EMPTY_TRUSS = pa.table(
    {"url_a": pa.array([], pa.string()), "url_b": pa.array([], pa.string()),
     "support": pa.array([], pa.int64())}
)


def _pair_cn(alive: "ray.data.Dataset", P: int, num_buckets: int):
    """Common-neighbor counts within the alive subgraph → Dataset
    (a, b, cn) for every 2-path-connected pair (a < b)."""

    def both(t: pa.Table) -> pa.Table:
        a, b = col_np(t, "a"), col_np(t, "b")
        return table_from_arrays(
            s=np.concatenate([a, b]).astype(np.int64),
            d=np.concatenate([b, a]).astype(np.int64),
        )

    und = compact_nonempty(alive.map_batches(both, batch_format="pyarrow"))
    if und is None:
        return None
    wedges = compact_nonempty(
        und.join(
            und.rename_columns({"s": "s2", "d": "d2"}),
            join_type="inner", num_partitions=P,
            on=("s",), right_on=("s2",),
        )
    )
    if wedges is None:
        return None

    def orient(t: pa.Table) -> pa.Table:
        a = col_np(t, "d").astype(np.int64)
        b = col_np(t, "d2").astype(np.int64)
        keep = a < b
        return table_from_arrays(a=a[keep], b=b[keep])

    return compact_nonempty(
        bucketed_sum_aggregate(
            wedges.map_batches(orient, batch_format="pyarrow"),
            key_cols=["a", "b"], sum_cols=[],
            num_buckets=num_buckets, count_col="cn",
        )
    )


def _attach_support(alive, cn_ds, P: int):
    """alive (a, b) ⟕ cn → (a, b, support), 0-filled."""
    if cn_ds is None:
        return alive.map_batches(
            lambda t: table_from_arrays(
                a=col_np(t, "a").astype(np.int64),
                b=col_np(t, "b").astype(np.int64),
                support=np.zeros(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        )
    joined = alive.join(
        cn_ds.rename_columns({"a": "ka", "b": "kb"}),
        join_type="left_outer", num_partitions=P,
        on=("a", "b"), right_on=("ka", "kb"),
    )

    def fill(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-join empties can be schema-less
            return pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "support": pa.array([], pa.int64())}
            )
        if "cn" in t.column_names:
            sup = np.asarray(
                pc.fill_null(t.column("cn").combine_chunks(), 0)
            ).astype(np.int64)
        else:
            sup = np.zeros(t.num_rows, dtype=np.int64)
        return table_from_arrays(
            a=col_np(t, "a").astype(np.int64),
            b=col_np(t, "b").astype(np.int64),
            support=sup,
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def _wedge_cn_numpy(a: np.ndarray, b: np.ndarray, V: int):
    """Per-pair common-neighbor counts of the subgraph (a, b) — sorted
    unique a·V+b wedge keys + counts (V² < 2^63 guarded by the caller's
    broadcast gate)."""
    s = np.concatenate([a, b])
    d = np.concatenate([b, a])
    order = np.lexsort((d, s))
    s, d = s[order], d[order]
    indptr = np.zeros(V + 1, dtype=np.int64)
    np.add.at(indptr, s + 1, 1)
    indptr = np.cumsum(indptr)
    cnt = np.diff(indptr)
    MAX_WEDGES = 1 << 24
    parts: list = []
    for c in np.unique(cnt):
        if c < 2:
            continue
        ws = np.flatnonzero(cnt == c)
        npairs = int(c * (c - 1) // 2)
        rows = max(1, MAX_WEDGES // npairs)
        ia, ib = np.triu_indices(int(c), 1)
        for lo in range(0, len(ws), rows):
            sel = ws[lo : lo + rows]
            nb = d[indptr[sel][:, None] + np.arange(int(c))[None, :]]
            parts.append(nb[:, ia].ravel() * V + nb[:, ib].ravel())
    if not parts:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    keys, counts = np.unique(np.concatenate(parts), return_counts=True)
    return keys, counts.astype(np.int64)


def _truss_broadcast(graph, k: int, rounds: int, cfg: EngineConfig):
    """Driver-kernel mode for gated-small graphs (E ≤
    cfg.broadcast_max_edges AND V under the int64 pair-key bound, the
    same gate family as linkpred._ej_broadcast): the whole peel loop is
    vectorized numpy — one wedge bincount per round, zero exchanges."""
    from ..util import dataset_to_numpy
    from .linkpred import _url_lookup_ref

    V = graph.num_vertices
    e = dataset_to_numpy(graph.edges, "src", "dst")
    a = np.minimum(e["src"], e["dst"]).astype(np.int64)
    b = np.maximum(e["src"], e["dst"]).astype(np.int64)

    def support_of(a, b):
        keys, counts = _wedge_cn_numpy(a, b, V)
        ek = a * V + b
        pos = np.searchsorted(keys, ek)
        sup = np.zeros(len(ek), dtype=np.int64)
        if len(keys):
            pos = np.clip(pos, 0, len(keys) - 1)
            hit = keys[pos] == ek
            sup[hit] = counts[pos[hit]]
        return sup

    for _ in range(rounds):
        if len(a) == 0:
            return _EMPTY_TRUSS
        keep = support_of(a, b) >= k - 2
        a, b = a[keep], b[keep]
    if len(a) == 0:
        return _EMPTY_TRUSS
    sup = support_of(a, b)
    urls = ray.get(_url_lookup_ref(graph))
    order = np.lexsort((b, a))
    a, b, sup = a[order], b[order], sup[order]
    return pa.table(
        {
            "url_a": pa.array(urls[a], pa.string()),
            "url_b": pa.array(urls[b], pa.string()),
            "support": pa.array(sup, pa.int64()),
        }
    )


def ktruss_edges(
    graph,
    k: int = 4,
    rounds: int = 3,
    cfg: EngineConfig = DEFAULT_CONFIG,
    mode: str | None = None,
) -> "ray.data.Dataset | pa.Table":
    """→ (url_a, url_b, support): edges surviving ``rounds`` peels of
    support < k−2, with support recomputed within the FINAL surviving
    subgraph (so the row set and values are closed under the output).

    Size-gated like the other wedge kernels: broadcast (driver numpy
    peel loop) below cfg.broadcast_max_edges with V² < 2^63, else the
    Dataset-native shuffle rounds."""
    if k < 3:
        raise ValueError("k-truss needs k >= 3 (k-2 >= 1)")
    if mode is None:
        mode = (
            "broadcast"
            if (
                graph.num_edges <= cfg.broadcast_max_edges
                and graph.num_vertices < (1 << 31)
            )
            else "shuffle"
        )
    if mode == "broadcast":
        return _truss_broadcast(graph, k, rounds, cfg)
    P = cfg.num_partitions
    NB = max(P * 32, 256)

    def canon(t: pa.Table) -> pa.Table:
        a = col_np(t, "src").astype(np.int64)
        b = col_np(t, "dst").astype(np.int64)
        return table_from_arrays(a=np.minimum(a, b), b=np.maximum(a, b))

    alive = compact_nonempty(
        graph.edges.map_batches(canon, batch_format="pyarrow")
    )
    for _ in range(rounds):
        if alive is None:
            return _EMPTY_TRUSS
        cn_ds = _pair_cn(alive, P, NB)
        supported = _attach_support(alive, cn_ds, P)
        alive = compact_nonempty(
            supported.map_batches(
                lambda t, _m=k - 2: t.filter(
                    pc.greater_equal(t.column("support"), _m)
                ).select(["a", "b"]),
                batch_format="pyarrow",
            ).materialize()
        )

    if alive is None:
        return _EMPTY_TRUSS
    # final support within the surviving subgraph
    final = compact_nonempty(
        _attach_support(alive, _pair_cn(alive, P, NB), P)
    )
    if final is None:
        return _EMPTY_TRUSS
    verts = graph.vertices.select_columns(["vid", "url"])
    wa = compact_nonempty(
        final.join(
            verts.rename_columns({"vid": "va", "url": "url_a"}),
            join_type="inner", num_partitions=P,
            on=("a",), right_on=("va",),
        )
    )
    if wa is None:
        return _EMPTY_TRUSS
    return wa.join(
        verts.rename_columns({"vid": "vb", "url": "url_b"}),
        join_type="inner", num_partitions=P,
        on=("b",), right_on=("vb",),
    ).select_columns(["url_a", "url_b", "support"])
