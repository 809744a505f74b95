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

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..util import col_np, table_from_arrays, zip_with_index


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


class _UrlToId:
    """Actor-pool stage: map url columns → vid columns via a broadcast
    dictionary (ray.put once, built into a Python dict once per ACTOR in
    __init__ — never per batch)."""

    def __init__(self, vocab_ref, cols: tuple = (("src_url", "src"), ("dst_url", "dst"))):
        urls = ray.get(vocab_ref)
        self._map = {u: i for i, u in enumerate(urls)}
        self._cols = cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {}
        m = self._map
        for in_col, out_col in self._cols:
            vals = batch.column(in_col).to_pylist()
            out[out_col] = np.fromiter(
                (m[v] for v in vals), dtype=np.int64, count=len(vals)
            )
        return table_from_arrays(**out)


def build_vertices(
    edges_urls: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """Distinct urls over both endpoints → sorted → dense vids.

    distinct is a hash-shuffle groupby (scales); the sort is the one
    all-to-all this stage needs; id assignment is block-local after a
    P-length prefix sum (no driver data pass)."""

    def both_endpoints(batch: pa.Table) -> pa.Table:
        urls = pa.concat_arrays(
            [
                batch.column("src_url").combine_chunks(),
                batch.column("dst_url").combine_chunks(),
            ]
        )
        # within-batch dedup combiner
        return pa.table({"url": urls.unique()})

    urls = edges_urls.map_batches(both_endpoints, batch_format="pyarrow")
    distinct = urls.groupby("url").count().select_columns(["url"])
    vertices = zip_with_index(distinct.sort("url"), index_name="vid")
    return vertices.select_columns(["vid", "url"]).materialize()


def build_graph(
    edges_urls: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
    vertices: "ray.data.Dataset | None" = None,
) -> Graph:
    """Full graph build: vertex dictionary, url→vid mapping, exact edge
    dedup (SURVEY.md §2.7 — extraction emits duplicate (src,dst) pairs),
    capacity guard."""
    if vertices is None:
        vertices = build_vertices(edges_urls, cfg)
    num_vertices = vertices.count()
    check_capacity(num_vertices, cfg.vid_dtype)

    if num_vertices <= cfg.broadcast_max_vertices:
        # broadcast map-side join: ship the dictionary once via ray.put
        from ..util import dataset_to_numpy

        urls_sorted = dataset_to_numpy(vertices.sort("vid"), "url")["url"]
        vocab_ref = ray.put([str(u) for u in urls_sorted])
        ids = edges_urls.map_batches(
            _UrlToId,
            fn_constructor_args=(vocab_ref,),
            batch_format="pyarrow",
            concurrency=cfg.extract_concurrency,
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

    deduped = (
        ids.map_batches(_dedup_batch, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .aggregate(Sum("weight", alias_name="weight"))
    )
    edges = deduped.materialize()
    return Graph(
        vertices=vertices,
        edges=edges,
        num_vertices=num_vertices,
        num_edges=edges.count(),
    )


def degrees(graph: Graph, direction: str = "out") -> np.ndarray:
    """Per-vertex degree (distinct neighbors) as a driver numpy array of
    length V (vertex-state-sized). direction: out | in | undirected."""

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

    agg = (
        graph.edges.map_batches(partial, batch_format="pyarrow")
        .groupby("vid")
        .aggregate(Sum("deg", alias_name="deg"))
    )
    out = np.zeros(graph.num_vertices, dtype=np.int64)
    from ..util import dataset_to_numpy

    res = dataset_to_numpy(agg, "vid", "deg")
    out[res["vid"]] = res["deg"]
    return out
