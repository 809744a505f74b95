"""Per-partition CSR block layout (north_star: 'repartitions edges into
per-partition CSR blocks').

The reference keeps the run table in two clustered orders at once
(``segments_by_row`` row-clustered + ``components`` label-clustered,
src/SegmentImageImpl.hpp:16-29). The engine analogue: the edge table
hash-partitioned by src with each partition compressed to CSR
(``src_ids`` sorted unique sources, ``indptr`` offsets, ``indices``
destinations) — the layout iterative algorithms actually want, built
once and reused across runs.

Each CSR block is ONE Arrow row (list columns), so the set of blocks is
itself a Dataset: it checkpoints with ``write_parquet``, shuffles, and
map_batches like any other table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph, degrees
from ..util import col_np

CSR_SCHEMA = pa.schema(
    [
        ("part", pa.int32()),
        ("src_ids", pa.large_list(pa.int64())),
        ("indptr", pa.large_list(pa.int64())),
        ("indices", pa.large_list(pa.int64())),
    ]
)


def build_csr_blocks(
    graph: Graph, cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """edges → Dataset of P CSR blocks, hash-partitioned by src.

    One groupby(part) shuffle; each group is compressed to (src_ids,
    indptr, indices) with src_ids sorted — deterministic under any
    block arrival order."""
    P = cfg.num_partitions

    def add_part(t: pa.Table) -> pa.Table:
        src = col_np(t, "src")
        part = (src % P).astype(np.int32)  # vids are dense → modulo is a
        # uniform hash; at web scale use a salted hash of the id instead
        return pa.table(
            {"part": pa.array(part), "src": t["src"], "dst": t["dst"]}
        )

    def _one_row_list(arr: np.ndarray) -> pa.LargeListArray:
        # zero-copy single-row large_list wrapping the numpy buffer
        return pa.LargeListArray.from_arrays(
            pa.array([0, len(arr)], pa.int64()),
            pa.array(arr.astype(np.int64, copy=False)),
        )

    def to_csr(group: pa.Table) -> pa.Table:
        src = col_np(group, "src")
        dst = col_np(group, "dst")
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        src_ids, counts = np.unique(src, return_counts=True)
        indptr = np.concatenate([[0], np.cumsum(counts)])
        part = int(group.column("part")[0].as_py()) if group.num_rows else -1
        return pa.table(
            {
                "part": pa.array([part], pa.int32()),
                "src_ids": _one_row_list(src_ids),
                "indptr": _one_row_list(indptr),
                "indices": _one_row_list(dst),
            }
        )

    return (
        graph.edges.select_columns(["src", "dst"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(to_csr, batch_format="pyarrow")
        .materialize()
    )


def _list_row_np(row_tbl: pa.Table, name: str) -> np.ndarray:
    """Zero-copy numpy view of a single-row list column: read the flat
    values buffer through the list offsets — never ``.as_py()`` (which
    boxed millions of ints per block per iteration, VERDICT #6)."""
    col = row_tbl.column(name)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False)
    values = col.values.to_numpy(zero_copy_only=False)
    return values[offsets[0] : offsets[-1]]


def _csr_arrays(row_tbl: pa.Table):
    return (
        _list_row_np(row_tbl, "src_ids"),
        _list_row_np(row_tbl, "indptr"),
        _list_row_np(row_tbl, "indices"),
    )


def pagerank_csr(
    graph: Graph,
    csr_blocks: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    on_iter=None,
) -> np.ndarray:
    """Power iteration over CSR blocks: contributions are expanded with
    ``np.repeat`` over the run-length structure (the same closed-form-
    over-compressed-groups trick as the reference's centroid,
    include/imtag_statistics.hpp:68-86) — no per-edge src gather.
    Results match pipelines.pagerank to float64 rounding."""
    V = graph.num_vertices
    d = cfg.pagerank_damping
    outdeg = degrees(graph, "out").astype(np.float64)
    dangling = outdeg == 0
    nz = outdeg > 0
    ranks = np.full(V, 1.0 / V, dtype=np.float64)

    for it in range(cfg.max_iterations):
        contrib = np.zeros(V, dtype=np.float64)
        contrib[nz] = ranks[nz] / outdeg[nz]
        ref = ray.put(contrib)

        def step(block: pa.Table, _ref=ref, _V=V) -> pa.Table:
            c = ray.get(_ref)
            src_ids, indptr, indices = _csr_arrays(block)
            per_src = c[src_ids]
            expanded = np.repeat(per_src, np.diff(indptr))
            dense = np.bincount(indices, weights=expanded, minlength=_V)
            nzv = np.flatnonzero(dense)
            return pa.table(
                {"vid": pa.array(nzv, pa.int64()),
                 "part_sum": pa.array(dense[nzv], pa.float64())}
            )

        incoming = np.zeros(V, dtype=np.float64)
        partials = csr_blocks.map_batches(step, batch_format="pyarrow", batch_size=1)
        for b in partials.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            np.add.at(incoming, col_np(b, "vid"), col_np(b, "part_sum"))

        dangling_mass = float(ranks[dangling].sum())
        new = (1.0 - d) / V + d * (incoming + dangling_mass / V)
        delta = float(np.abs(new - ranks).sum())
        ranks = new
        if on_iter is not None:
            on_iter(it, ranks, delta)
        if delta < V * cfg.pagerank_tol:
            break
    return ranks
