"""End-to-end near-duplicate document selection: MinHash-LSH pairs →
min-label clustering → canonical-per-cluster keep set.

This is the composition a 100-TB training-data pipeline actually runs
(find near-dups, then DROP all but one per duplicate cluster), built
from the engine's own pieces: `dedup.minhash.minhash_dup_pairs` for
the pair graph and the same hash-min message-passing rounds as
`pipelines.cc` (the reference's disjoint_set relaxation,
src/disjoint_set.hpp:36-63, over the dup-pair graph instead of the
merge table).

Fixed-round semantics (like pipelines.traversal): `rounds=R` runs
exactly R synchronous hash-min rounds so the DuckDB oracle can replay
the identical trajectory with an unrolled CTE chain. After R rounds a
doc's label is the min doc_id within R hops of it in the pair graph;
near-dup clusters are tiny in practice (diameter ≪ R), and the
fixed-round form keeps the oracle exact regardless.

Everything is Dataset-native: both-direction edges, per-round
inner-join + map-side sparse-min combiner + Min groupby, left-outer
update join — no driver-side vertex arrays (the pair graph at 100 TB
can itself be huge).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from ..util import (
    col_np,
    compact_nonempty,
    sparse_min_reduce,
    table_from_arrays,
)
from .minhash import (
    DEFAULT_BANDS,
    DEFAULT_NUM_PERM,
    DEFAULT_SEED,
    DEFAULT_SHINGLE_K,
    minhash_dup_pairs,
)


def minlabel_clusters(
    pairs: "ray.data.Dataset",
    rounds: int = 6,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Hash-min over the undirected pair graph (columns id_a, id_b) →
    Dataset (doc_id, lbl) for every doc that appears in a pair, where
    lbl = min doc_id within `rounds` hops."""
    base = pairs.select_columns(["id_a", "id_b"])
    # compact_nonempty on every join input: a zero-row first block
    # silences Ray 2.49's one-shot schema broadcast and the join dies
    # on skew-emptied partitions (util.compact_nonempty)
    edges = compact_nonempty(
        base.union(
            base.map_batches(
                lambda t: table_from_arrays(
                    id_a=col_np(t, "id_b"), id_b=col_np(t, "id_a")
                ),
                batch_format="pyarrow",
            )
        )
    )

    def init(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-groupby empties are schema-less
            return pa.table(
                {"v": pa.array([], pa.int64()),
                 "lbl": pa.array([], pa.int64())}
            )
        v = col_np(t, "id_a")
        return table_from_arrays(v=v, lbl=v.copy())

    state = compact_nonempty(
        edges.select_columns(["id_a"])
        .map_batches(
            lambda t: table_from_arrays(id_a=np.unique(col_np(t, "id_a"))),
            batch_format="pyarrow",
        )
        .groupby("id_a")
        .aggregate(Count(alias_name="_c"))  # distinct vertices
        .map_batches(init, batch_format="pyarrow")
    )
    # (vertex cardinality here is the dup-pair graph's vertex count —
    # usually small; the relaxation aggregate below is bucketed anyway)

    def relax(t: pa.Table) -> pa.Table:
        # map-side combiner: ≤1 candidate per target per block
        k, v = sparse_min_reduce(col_np(t, "id_b"), col_np(t, "lbl"))
        return table_from_arrays(v=k, cand=v)

    for _ in range(rounds):
        from ..util import bucketed_aggregate

        msgs = compact_nonempty(
            bucketed_aggregate(
                edges.join(
                    state, join_type="inner",
                    num_partitions=num_partitions,
                    on=("id_a",), right_on=("v",),
                ).map_batches(relax, batch_format="pyarrow"),
                key_cols=["v"], aggs=[("cand", "min", "cand")],
            )
        )
        if msgs is None:  # no deliverable message anywhere: fixpoint
            break

        def update(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lbl = col_np(t, "lbl")
            cand = np.asarray(
                pc.fill_null(
                    t.column("cand").combine_chunks(), np.iinfo(np.int64).max
                )
            ).astype(np.int64)
            return table_from_arrays(
                v=col_np(t, "v"), lbl=np.minimum(lbl, cand)
            )

        state = compact_nonempty(
            state.join(
                msgs, join_type="left_outer",
                num_partitions=num_partitions, on=("v",), right_on=("v",),
            )
            .map_batches(update, batch_format="pyarrow")
        )
    return state.map_batches(
        lambda t: table_from_arrays(doc_id=col_np(t, "v"), lbl=col_np(t, "lbl")),
        batch_format="pyarrow",
    )


def near_dedup_keep(
    ds: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
    rounds: int = 6,
    num_perm: int = DEFAULT_NUM_PERM,
    bands: int = DEFAULT_BANDS,
    shingle_k: int = DEFAULT_SHINGLE_K,
    seed: int = DEFAULT_SEED,
    num_partitions: int = 8,
    driver_cluster_max_pairs: int = 5_000_000,
) -> "ray.data.Dataset":
    """Keep set after near-dup clustering → Dataset (id_col,) sorted:
    every doc whose min-label after `rounds` hash-min rounds over the
    MinHash pair graph equals its own id (docs in no pair trivially
    keep themselves). The dropped docs are exactly the non-canonical
    members of each near-dup cluster.

    The pair graph is only the DUPLICATES, usually a tiny fraction of
    the corpus — when it fits (≤ driver_cluster_max_pairs), the
    hash-min rounds run as one vectorized numpy kernel and the drop set
    broadcasts into a filter (6 distributed rounds on a small pair set
    are pure scheduling overhead; same size-gated auto pattern as
    pipelines.triangles). Both paths implement the identical
    synchronous fixed-round trajectory (pinned by a pytest)."""
    ids = ds.select_columns([id_col])
    pairs = minhash_dup_pairs(
        ds, id_col, text_col, threshold=threshold, num_perm=num_perm,
        bands=bands, shingle_k=shingle_k, seed=seed,
        num_partitions=num_partitions,
    )
    if isinstance(pairs, pa.Table):  # typed empty: nothing to drop
        return ids.sort(id_col)
    if pairs.count() <= driver_cluster_max_pairs:
        from ..util import dataset_to_numpy

        e = dataset_to_numpy(pairs, "id_a", "id_b")
        drop = _minlabel_drop_numpy(e["id_a"], e["id_b"], rounds)
        if len(drop) == 0:
            return ids.sort(id_col)
        ref = ray.put(drop)

        def keep(t: pa.Table, _ref=ref) -> pa.Table:
            d = ray.get(_ref)
            vals = col_np(t, id_col)
            return t.filter(pa.array(~np.isin(vals, d)))

        return ids.map_batches(keep, batch_format="pyarrow").sort(id_col)
    labels = minlabel_clusters(pairs, rounds, num_partitions).materialize()
    dropped = labels.map_batches(
        lambda t: t.filter(
            pa.array(col_np(t, "doc_id") != col_np(t, "lbl"))
        ).select(["doc_id"]),
        batch_format="pyarrow",
    ).materialize()
    if dropped.count() == 0:
        return ids.sort(id_col)
    # anti-join: left-outer against the dropped set, keep null matches
    # (both sides compacted — util.compact_nonempty)
    marked = compact_nonempty(
        dropped.map_batches(
            lambda t: table_from_arrays(
                doc_id=col_np(t, "doc_id"),
                drop=np.ones(t.num_rows, dtype=np.int64),
            ),
            batch_format="pyarrow",
        )
    )
    ids = compact_nonempty(ids)

    def keep_unmatched(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # post-join empties are schema-less
            return pa.table({id_col: pa.array([], pa.int64())})
        return t.filter(t.column("drop").is_null()).select([id_col])

    return (
        ids.join(
            marked, join_type="left_outer", num_partitions=num_partitions,
            on=(id_col,), right_on=("doc_id",),
        )
        .map_batches(keep_unmatched, batch_format="pyarrow")
        .sort(id_col)
    )


def _minlabel_drop_numpy(
    id_a: np.ndarray, id_b: np.ndarray, rounds: int
) -> np.ndarray:
    """Vectorized replica of minlabel_clusters' synchronous trajectory:
    `rounds` rounds of lbl_v ← min(lbl_v, min over neighbors of their
    PREVIOUS label) → ids whose final label differs from themselves."""
    ids = np.unique(np.concatenate([id_a, id_b]))
    ia = np.searchsorted(ids, id_a)
    ib = np.searchsorted(ids, id_b)
    src = np.concatenate([ia, ib])
    dst = np.concatenate([ib, ia])
    lbl = ids.copy()
    for _ in range(rounds):
        msg = np.full(len(ids), np.iinfo(np.int64).max, dtype=np.int64)
        np.minimum.at(msg, dst, lbl[src])
        lbl = np.minimum(lbl, msg)
    return ids[lbl != ids]
