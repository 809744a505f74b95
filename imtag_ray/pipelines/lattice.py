"""Lattice conformance operators — the reference's morphology/statistics
surface re-expressed over vertex/label tables (SURVEY.md §2.5/§2.7).

These run on pixel-lattice graphs (vertex per foreground pixel,
``url = px://RRRRR/CCCCC``) and mirror, operator for operator:

- ``invert``            → src/morphology.cpp:101-142 (per-row interval
                          complement → fresh CROSS components)
- ``hole_adjacencies``  → src/morphology.cpp:264-312 (bipartite land×hole
                          adjacency matrix)
- ``remove_components`` → src/morphology.cpp:190-232 (drop by label,
                          dense re-relabel of survivors preserving order)
- ``npixels/bounding_box/centroid``
                        → include/imtag_statistics.hpp:59-66,41-57,68-86
- ``to_label_image`` / ``to_mask_image``
                        → src/morphology.cpp:9-35,95-99 (dense pivots,
                          used as round-trip checks)
- ``khop_expand``       → the intended semantics of the reference's dead
                          ``dilate`` (src/morphology.cpp:144-170,
                          SURVEY.md §2.11 defect #2) as a k-hop frontier
                          expansion over the graph

All are Dataset pipelines; the label source is pipelines.cc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources.synth import lattice_edges, lattice_vertices, pixel_url
from ..stages.graph_build import build_graph, build_vertices
from ..util import col_np, dataset_to_numpy, table_from_arrays


def lattice_cc(
    img: np.ndarray, connectivity: str = "cross",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    """Foreground CCL of a binary image via the graph engine →
    (vid, url, component_id) with parsed (row, col) columns."""
    from .cc import connected_components

    edges = ray.data.from_arrow(lattice_edges(img, connectivity))
    urls = lattice_vertices(img)
    vocab = ray.data.from_arrow(
        pa.table({"src_url": urls, "dst_url": urls})
    )
    vertices = build_vertices(edges.union(vocab), cfg)
    graph = build_graph(edges, cfg, vertices=vertices)
    cc = connected_components(graph, cfg)

    def parse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # px://RRRRR/CCCCC → (row, col) via Arrow slice+cast kernels
        rows = pc.cast(pc.utf8_slice_codeunits(t["url"], 5, 10), pa.int64())
        cols = pc.cast(pc.utf8_slice_codeunits(t["url"], 11, 16), pa.int64())
        return t.append_column("row", rows).append_column("col", cols)

    return cc.map_batches(parse, batch_format="pyarrow")


_OFFSETS = {
    "cross": [(0, 1), (1, 0)],
    "eight": [(0, 1), (1, 0), (1, 1), (1, -1)],
    "horizontal": [(0, 1)],
}


def mask_graph(
    mask: np.ndarray, connectivity: str = "cross",
    cfg: EngineConfig = DEFAULT_CONFIG,
):
    """Vectorized big-image path: binary mask → integer-vid lattice
    Graph with NO per-pixel Python loops (the px:// string fixtures in
    sources.synth are for small conformance tests; this is the path
    that scales to the reference's 3840×2160 canonical input and
    beyond).

    Vids are dense ranks of foreground pixels in row-major scan order,
    so min-vid per component == first foreground pixel in scan order —
    the reference's compressed_freeze first-appearance semantics
    (src/disjoint_set.hpp:73-96) hold by construction. The url column
    is the zero-padded linear pixel index (lexicographic == scan
    order), built with Arrow kernels.
    """
    import pyarrow.compute as pc

    from ..stages.graph_build import Graph, check_capacity

    R, C = mask.shape
    lin = np.flatnonzero(mask.ravel())  # sorted = row-major scan order
    V = len(lin)
    check_capacity(V, cfg.vid_dtype)
    width = max(len(str(R * C)), 1)

    srcs, dsts = [], []
    for dr, dc in _OFFSETS[connectivity]:
        a_r0, a_r1 = max(0, -dr), R - max(0, dr)
        a_c0, a_c1 = max(0, -dc), C - max(0, dc)
        a = mask[a_r0:a_r1, a_c0:a_c1]
        b = mask[a_r0 + dr : a_r1 + dr, a_c0 + dc : a_c1 + dc]
        rr, cc = np.nonzero(a & b)
        lin_a = (rr + a_r0) * C + (cc + a_c0)
        lin_b = (rr + a_r0 + dr) * C + (cc + a_c0 + dc)
        srcs.append(np.searchsorted(lin, lin_a))
        dsts.append(np.searchsorted(lin, lin_b))
    src = np.concatenate(srcs) if srcs else np.empty(0, dtype=np.int64)
    dst = np.concatenate(dsts) if dsts else np.empty(0, dtype=np.int64)

    edges_tbl = pa.table(
        {
            "src": pa.array(src.astype(np.int64)),
            "dst": pa.array(dst.astype(np.int64)),
            "weight": pa.array(np.ones(len(src), dtype=np.int64)),
        }
    )
    url = pc.utf8_lpad(
        pc.cast(pa.array(lin.astype(np.int64)), pa.string()), width, padding="0"
    )
    verts_tbl = pa.table(
        {"vid": pa.array(np.arange(V, dtype=np.int64)), "url": url}
    )
    P = max(1, cfg.num_partitions)
    vertices = ray.data.from_arrow(verts_tbl).repartition(P).materialize()
    edges = ray.data.from_arrow(edges_tbl).repartition(P).materialize()
    return Graph(
        vertices=vertices, edges=edges, num_vertices=V, num_edges=len(src)
    )


def invert_image(img: np.ndarray) -> np.ndarray:
    """Complement of the foreground set (ref includes borders: every
    background pixel inside the R×C frame becomes foreground,
    src/morphology.cpp:101-142)."""
    return ~img


def component_stats(cc: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-component npixels / bounding box / centroid, computed as
    algebraic aggregates over the label table (the reference computes
    the same values from runs with closed forms; same results).
    Bounding box is half-open on right/bottom (imtag_statistics.hpp:8-26)."""

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "component_id": t["component_id"],
                "row": t["row"],
                "col": t["col"],
                "row_sum": t["row"],
                "col_sum": t["col"],
            }
        )

    from ..util import bucketed_aggregate

    # bucketed: component cardinality is pixel-count-sized worst case
    agg = bucketed_aggregate(
        cc.map_batches(partial, batch_format="pyarrow"),
        key_cols=["component_id"],
        aggs=[
            ("component_id", "count", "npixels"),
            ("row", "min", "top"),
            ("col", "min", "left"),
            ("row", "max", "bottom_incl"),
            ("col", "max", "right_incl"),
            ("row_sum", "sum", "row_sum"),
            ("col_sum", "sum", "col_sum"),
        ],
    )

    def finish(t: pa.Table) -> pa.Table:
        n = col_np(t, "npixels").astype(np.float64)
        return pa.table(
            {
                "component_id": t["component_id"],
                "npixels": t["npixels"],
                "top": t["top"],
                "left": t["left"],
                "bottom": pa.array(col_np(t, "bottom_incl") + 1),
                "right": pa.array(col_np(t, "right_incl") + 1),
                "centroid_row": pa.array(col_np(t, "row_sum") / n),
                "centroid_col": pa.array(col_np(t, "col_sum") / n),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("component_id")


def _label_images(img: np.ndarray, cfg: EngineConfig):
    lands = dataset_to_numpy(lattice_cc(img, "cross", cfg), "row", "col", "component_id")
    holes = dataset_to_numpy(lattice_cc(~img, "cross", cfg), "row", "col", "component_id")
    R, C = img.shape
    land_lab = np.full((R, C), -1, dtype=np.int64)
    land_lab[lands["row"], lands["col"]] = lands["component_id"]
    hole_lab = np.full((R, C), -1, dtype=np.int64)
    hole_lab[holes["row"], holes["col"]] = holes["component_id"]
    n_l = int(lands["component_id"].max()) + 1 if len(lands["component_id"]) else 0
    n_h = int(holes["component_id"].max()) + 1 if len(holes["component_id"]) else 0
    return land_lab, hole_lab, n_l, n_h


def _row_runs(lab_row: np.ndarray):
    """Run starts + labels of foreground (label ≥ 0) runs in one row —
    the engine analogue of a segments_by_row scanline."""
    fg = lab_row >= 0
    if not fg.any():
        return np.empty(0, np.int64), np.empty(0, np.int64)
    d = np.diff(fg.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    if fg[0]:
        starts = np.concatenate([[0], starts])
    return starts, lab_row[starts]


def hole_adjacencies(
    img: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """STRICT replica of the reference's hole_adjacencies
    (src/morphology.cpp:264-312): per scanline, land run i is paired
    with water run i (runs interleave by construction of invert), plus
    the one-offset pairing picked by which side's first run starts
    earlier. The reference NEVER records vertical-only adjacencies (a
    land row directly above a hole row with no shared-row contact) —
    neither does this; see hole_adjacencies_full for the full
    4-neighbor generalization. Matrix matches the worked example at
    src/morphology.cpp:234-263 ([[1,0],[1,1],[1,0]])."""
    land_lab, hole_lab, n_l, n_h = _label_images(img, cfg)
    adj = np.zeros((n_l, n_h), dtype=bool)
    for r in range(img.shape[0]):
        ls, ll = _row_runs(land_lab[r])
        ws, wl = _row_runs(hole_lab[r])
        n = min(len(ls), len(ws))
        if n == 0:
            continue
        adj[ll[:n], wl[:n]] = True
        if n > 1:
            if ls[0] > ws[0]:
                adj[ll[: n - 1], wl[1:n]] = True
            else:
                adj[ll[1:n], wl[: n - 1]] = True
    return adj


def hole_adjacencies_full(
    img: np.ndarray, cfg: EngineConfig = DEFAULT_CONFIG
) -> np.ndarray:
    """Full 4-neighbor bipartite land×hole adjacency — the intended-
    semantics GENERALIZATION of the reference's row-pairing heuristic
    (which misses vertical-only contacts): adjacency = ANY 4-neighbor
    pixel pair spanning the two sets. Superset of hole_adjacencies."""
    land_lab, hole_lab, n_l, n_h = _label_images(img, cfg)
    R, C = img.shape
    adj = np.zeros((n_l, n_h), dtype=bool)
    for dr, dc in ((0, 1), (1, 0)):
        a = land_lab[: R - dr, : C - dc]
        b = hole_lab[dr:, dc:]
        m = (a >= 0) & (b >= 0)
        adj[a[m], b[m]] = True
        a = hole_lab[: R - dr, : C - dc]
        b = land_lab[dr:, dc:]
        m = (a >= 0) & (b >= 0)
        adj[b[m], a[m]] = True
    return adj


def remove_components(
    cc: "ray.data.Dataset", drop_ids: "list[int] | np.ndarray"
) -> "ray.data.Dataset":
    """Drop components by id and densely relabel survivors preserving
    rank order — the broadcast-anti-join + relabel of
    src/morphology.cpp:190-232 (order preservation via rank over the
    remaining ids, not arrival order)."""
    drop = np.unique(np.asarray(list(drop_ids), dtype=np.int64))
    drop_ref = ray.put(drop)

    def f(t: pa.Table, _ref=drop_ref) -> pa.Table:
        d = ray.get(_ref)
        comp = col_np(t, "component_id")
        keep = ~np.isin(comp, d)
        t = t.filter(pa.array(keep))
        comp = col_np(t, "component_id")
        # dense re-rank: old id minus how many dropped ids precede it
        shift = np.searchsorted(d, comp)
        return t.set_column(
            t.schema.get_field_index("component_id"),
            "component_id",
            pa.array(comp - shift),
        )

    return cc.map_batches(f, batch_format="pyarrow")


def small_component_filter(
    cc: "ray.data.Dataset", min_pixels: int
) -> "ray.data.Dataset":
    """The demo composition (test/imtag_test.cpp:129-136): find components
    with npixels < threshold, remove them, dense-relabel survivors."""
    from ..util import bucketed_aggregate

    sizes = dataset_to_numpy(
        bucketed_aggregate(
            cc, key_cols=["component_id"],
            aggs=[("component_id", "count", "n")],
        ),
        "component_id", "n",
    )
    drop = sizes["component_id"][sizes["n"] < min_pixels]
    return remove_components(cc, drop)


def to_label_image(
    cc_np: dict, shape: tuple, background: int = 0,
    inc_labels_for_background_0: bool = True,
) -> np.ndarray:
    """Dense label raster from a collected label table (conformance
    sink, ref src/morphology.cpp:9-35): labels +1 when background is 0."""
    off = 1 if inc_labels_for_background_0 else 0
    out = np.full(shape, background, dtype=np.int64)
    out[cc_np["row"], cc_np["col"]] = cc_np["component_id"] + off
    return out


def to_mask_image(cc_np: dict, shape: tuple) -> np.ndarray:
    """Binary mask from the label table — lossless inverse of extraction
    (ref src/morphology.cpp:95-99); the round-trip property test."""
    out = np.zeros(shape, dtype=bool)
    out[cc_np["row"], cc_np["col"]] = True
    return out


def khop_expand(
    graph, seed_vids: np.ndarray, k: int,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> np.ndarray:
    """k-hop frontier expansion (intended ``dilate`` semantics): returns
    the vid set within k undirected hops of the seeds. Each hop is one
    edge scan with a broadcast membership bitmap."""
    member = np.zeros(graph.num_vertices, dtype=bool)
    member[np.asarray(seed_vids, dtype=np.int64)] = True
    for _ in range(k):
        ref = ray.put(member)

        def hop(t: pa.Table, _ref=ref) -> pa.Table:
            m = ray.get(_ref)
            src = col_np(t, "src")
            dst = col_np(t, "dst")
            new = np.concatenate([dst[m[src] & ~m[dst]], src[m[dst] & ~m[src]]])
            return table_from_arrays(vid=np.unique(new))

        found = dataset_to_numpy(
            graph.edges.map_batches(hop, batch_format="pyarrow"), "vid"
        )["vid"]
        if len(found) == 0:
            break
        member[found] = True
    return np.flatnonzero(member)
