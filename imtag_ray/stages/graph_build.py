"""Graph build: (src_url, dst_url) edge table → integer-id graph tables.

Reference mapping (SURVEY.md §2.2/§2.5): the reference assigns globally
unique dense labels to runs in row-major scan order after parallel
extraction (src/SegmentImageImpl_Scanline.cpp:88-95). Here the vertex-id
dictionary is built the distributed way: distinct urls (hash shuffle) →
global sort → contiguous ids via block-offset prefix sums
(util.zip_with_index). Because ids are assigned in SORTED url order,
``min(vid) over a component == vid of min(url)`` — which makes the
canonical min-url relabeling (ref compressed_freeze,
src/disjoint_set.hpp:73-96) a pure integer operation downstream.

Capacity guard mirrors the reference's label-overflow throw
(src/SegmentImageImpl.cpp:85-91): vertex count must fit the configured
vid dtype.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import (
    bucketed_sum_aggregate,
    col_np,
    table_from_arrays,
    zip_with_index,
)


@dataclass
class Graph:
    """Integer-id graph. ``vertices``: (vid:int64, url:string) with vids
    dense 0..V-1 in lexicographic url order. ``edges``: (src:int64,
    dst:int64, weight:int64) deduplicated directed edges (weight = raw
    multiplicity). Both are materialized Datasets (the reference's
    cached-run-table pattern, include/imtag.hpp:87)."""

    vertices: "ray.data.Dataset"
    edges: "ray.data.Dataset"
    num_vertices: int
    num_edges: int
    #: memoized degree arrays per direction (the reference's cached-state
    #: pattern: re-running an algorithm must not recompute the run table)
    _deg_cache: dict = field(default_factory=dict, repr=False, compare=False)
    #: memoized physical layouts (e.g. dst-range-partitioned edge refs),
    #: keyed by layout parameters — built once, reused across runs
    _layout_cache: dict = field(default_factory=dict, repr=False, compare=False)

    # -- driver-side numpy views (vertex-state-sized only, never edges) ----
    def urls_array(self) -> np.ndarray:
        from ..util import dataset_to_numpy

        out = dataset_to_numpy(self.vertices.sort("vid"), "url")
        return out["url"]

    def edge_blocks(self) -> list:
        """Object refs of the materialized edge blocks (Arrow tables) for
        the block-iteration fast path. Blocks stay in the object store;
        tasks read them zero-copy."""
        return list(self.edges.to_arrow_refs())


def check_capacity(num_vertices: int, vid_dtype: str) -> None:
    """Mirrors the reference's label-overflow throw
    (src/SegmentImageImpl.cpp:85-91): refuse to label more vertices than
    the configured id dtype can hold."""
    limit = 2**32 if vid_dtype == "uint32" else 2**63
    if num_vertices >= limit:
        raise OverflowError(
            f"{num_vertices} vertices exceed configured vid dtype {vid_dtype}"
        )


def _dedup_batch(batch: pa.Table) -> pa.Table:
    """Within-batch edge dedup (map-side combiner before the groupby)."""
    src = col_np(batch, "src")
    dst = col_np(batch, "dst")
    pairs = np.stack([src, dst], axis=1)
    uniq, counts = np.unique(pairs, axis=0, return_counts=True)
    return table_from_arrays(
        src=uniq[:, 0], dst=uniq[:, 1], weight=counts.astype(np.int64)
    )


# Per-worker-process cache for the broadcast vocabulary index: Ray
# reuses worker processes across tasks, so the pandas hash index is
# built once per worker (the stateful-stage pattern WITHOUT paying
# actor-pool startup — plain tasks stay elastic).
_VOCAB_INDEX_CACHE: dict = {}


def _vocab_index(vocab_ref):
    import pandas as pd

    key = vocab_ref.hex()
    idx = _VOCAB_INDEX_CACHE.get(key)
    if idx is None:
        idx = pd.Index(ray.get(vocab_ref))
        _VOCAB_INDEX_CACHE.clear()  # one vocabulary at a time per worker
        _VOCAB_INDEX_CACHE[key] = idx
    return idx


def make_url_mapper(vocab_ref, cols=(("src_url", "src"), ("dst_url", "dst"))):
    """Stateless map_batches fn: url columns → vid columns via the
    broadcast sorted vocabulary (vectorized hash lookups)."""

    def url_to_id(batch: pa.Table) -> pa.Table:
        idx = _vocab_index(vocab_ref)
        out = {}
        for in_col, out_col in cols:
            col = batch.column(in_col)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            # Arrow string array → object ndarray directly (no to_pylist
            # round-trip); get_indexer is a vectorized hash lookup
            vals = idx.get_indexer(col.to_numpy(zero_copy_only=False))
            if len(vals) and vals.min() < 0:
                raise KeyError(f"url missing from vocabulary in {in_col}")
            out[out_col] = vals.astype(np.int64)
        return table_from_arrays(**out)

    return url_to_id


def _both_endpoints(batch: pa.Table) -> pa.Table:
    urls = pa.concat_arrays(
        [
            batch.column("src_url").combine_chunks(),
            batch.column("dst_url").combine_chunks(),
        ]
    )
    # within-batch dedup combiner
    return pa.table({"url": urls.unique()})


def build_vertices(
    edges_urls: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Distinct urls over both endpoints → sorted → dense vids
    (distributed scale path).

    distinct is a shuffle groupby (scales); the sort is the one
    all-to-all this stage needs; id assignment is block-local after a
    P-length prefix sum (no driver data pass)."""
    urls = edges_urls.map_batches(_both_endpoints, batch_format="pyarrow")
    # bucketed distinct — url cardinality is V (see bucketed_sum_aggregate)
    distinct = bucketed_sum_aggregate(urls, key_cols=["url"], sum_cols=[])
    vertices = zip_with_index(distinct.sort("url"), index_name="vid")
    return vertices.select_columns(["vid", "url"]).materialize()


def collect_vocab(
    edges_urls: "ray.data.Dataset", cap: int
) -> "np.ndarray | None":
    """Fast-path vocabulary: stream per-batch-unique urls to the driver,
    dedup with Arrow's C++ hash unique (NOT a Python set — string
    hashing in Python was the slowest part of the build stage), sort
    once. Returns None (caller falls back to the distributed path)
    when the distinct count exceeds ``cap``. Streamed volume is the
    per-batch uniques, not the raw edge list."""
    chunks: list = []
    total = 0
    per_batch = edges_urls.map_batches(_both_endpoints, batch_format="pyarrow")
    for b in per_batch.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        col = b.column("url")
        chunks.extend(col.chunks if isinstance(col, pa.ChunkedArray) else [col])
        total += len(col)
        if total > 2 * cap:  # compress before deciding
            u = pa.chunked_array(chunks).unique()
            chunks, total = [u], len(u)
            if total > cap:
                return None
    if not chunks:
        return np.empty(0, dtype=object)
    uniq = pa.chunked_array(chunks).unique()
    if len(uniq) > cap:
        return None
    arr = uniq.to_numpy(zero_copy_only=False)
    arr.sort()
    return arr


def build_graph(
    edges_urls: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    vertices: "ray.data.Dataset | None" = None,
) -> Graph:
    """Full graph build: vertex dictionary, url→vid mapping, exact edge
    dedup (SURVEY.md §2.7 — extraction emits duplicate (src,dst) pairs),
    capacity guard.

    Dictionary strategy: driver collect+sort under ``driver_vocab_max``
    distinct urls (one streaming pass; the vocabulary is broadcast
    anyway for the map-side join), else the distributed
    distinct→sort→zip_with_index path."""
    vocab: "np.ndarray | None" = None
    if vertices is None:
        vocab = collect_vocab(edges_urls, cfg.driver_vocab_max)
        if vocab is None:
            vertices = build_vertices(edges_urls, cfg)
        else:
            num_vertices = len(vocab)
            vertices = ray.data.from_arrow(
                pa.table(
                    {
                        "vid": pa.array(
                            np.arange(num_vertices, dtype=np.int64)
                        ),
                        "url": pa.array(vocab.tolist(), pa.string()),
                    }
                )
            ).repartition(max(1, min(cfg.num_partitions, num_vertices // 4096 + 1))).materialize()
    if vocab is None:
        num_vertices = vertices.count()
    else:
        num_vertices = len(vocab)
    check_capacity(num_vertices, cfg.vid_dtype)

    if num_vertices <= cfg.broadcast_max_vertices:
        # broadcast map-side join: ship the sorted dictionary once via
        # ray.put; lookups are vectorized and cached per worker process
        if vocab is None:
            from ..util import dataset_to_numpy

            vocab = dataset_to_numpy(vertices.sort("vid"), "url")["url"]
            vocab = np.array([str(u) for u in vocab], dtype=object)
        vocab_ref = ray.put(vocab)
        ids = edges_urls.map_batches(
            make_url_mapper(vocab_ref), batch_format="pyarrow"
        )
    else:
        # scale path: two hash-partitioned shuffle joins on url
        P = cfg.num_partitions
        ids = (
            edges_urls.join(
                vertices, join_type="inner", num_partitions=P,
                on=("src_url",), right_on=("url",),
            )
            .rename_columns({"vid": "src"})
            .join(
                vertices, join_type="inner", num_partitions=P,
                on=("dst_url",), right_on=("url",),
            )
            .rename_columns({"vid": "dst"})
            .select_columns(["src", "dst"])
        )

    # bucketed, NOT groupby(src,dst): distinct-edge cardinality is E
    # and Ray's groupby pays per-distinct-group overhead
    # (util.bucketed_sum_aggregate)
    deduped = bucketed_sum_aggregate(
        ids.map_batches(_dedup_batch, batch_format="pyarrow"),
        key_cols=["src", "dst"], sum_cols=["weight"],
        num_buckets=max(cfg.num_partitions * 32, 256),
    )
    edges = deduped.materialize()
    return Graph(
        vertices=vertices,
        edges=edges,
        num_vertices=num_vertices,
        num_edges=edges.count(),
    )


def degree_dataset(
    graph: Graph, direction: str = "out", col: str = "degree"
) -> "ray.data.Dataset":
    """(vid, degree) for ALL vertices (zero-degree included) as a
    Dataset — the no-driver-state analogue of ``degrees``: zero rows
    for every vertex union per-block partial counts, one groupby-sum.
    No skew concern: each vid appears ≤ #blocks+1 times pre-shuffle."""
    from ..util import sparse_sum_reduce

    def partial(batch: pa.Table) -> pa.Table:
        src = col_np(batch, "src")
        dst = col_np(batch, "dst")
        if direction == "out":
            keys = src
        elif direction == "in":
            keys = dst
        else:
            keys = np.concatenate([src, dst])
        k, s = sparse_sum_reduce(keys, np.ones(len(keys), dtype=np.int64))
        return table_from_arrays(**{"vid": k, col: s})

    zeros = graph.vertices.select_columns(["vid"]).map_batches(
        lambda t: table_from_arrays(
            **{"vid": col_np(t, "vid"),
               col: np.zeros(t.num_rows, dtype=np.int64)}
        ),
        batch_format="pyarrow",
    )
    # bucketed, NOT groupby(vid): V distinct groups
    return bucketed_sum_aggregate(
        zeros.union(graph.edges.map_batches(partial, batch_format="pyarrow")),
        key_cols=["vid"], sum_cols=[col],
    )


def degrees(graph: Graph, direction: str = "out") -> np.ndarray:
    """Per-vertex degree (distinct neighbors) as a driver numpy array of
    length V (vertex-state-sized). direction: out | in | undirected.
    Memoized per graph."""
    cached = graph._deg_cache.get(direction)
    if cached is not None:
        return cached

    def partial(batch: pa.Table) -> pa.Table:
        src = col_np(batch, "src")
        dst = col_np(batch, "dst")
        if direction == "out":
            keys = src
        elif direction == "in":
            keys = dst
        else:
            keys = np.concatenate([src, dst])
        from ..util import sparse_sum_reduce

        k, s = sparse_sum_reduce(keys, np.ones(len(keys), dtype=np.int64))
        return table_from_arrays(vid=k, deg=s)

    agg = bucketed_sum_aggregate(
        graph.edges.map_batches(partial, batch_format="pyarrow"),
        key_cols=["vid"], sum_cols=["deg"],
    )
    out = np.zeros(graph.num_vertices, dtype=np.int64)
    from ..util import dataset_to_numpy

    res = dataset_to_numpy(agg, "vid", "deg")
    if len(res["vid"]):
        out[res["vid"].astype(np.int64)] = res["deg"]
    graph._deg_cache[direction] = out
    return out
