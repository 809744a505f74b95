"""Driver-facing query pipelines over the sf_dir tables.

Each function takes ``sf_dir`` and returns a Dataset / pyarrow Table
whose column names match its DuckDB oracle in __ray_entry__.oracle_sql.
Graph inputs are derived deterministically from the TPC-H-ish tables:

- **copart graph**: undirected edges between parts co-occurring in the
  same order (SQL-expressible self-join) — exercises degree/top-k/
  triangles/PageRank.
- **geo graph**: customer→nation, supplier→nation, nation→region star
  edges — small diameter, known components (one per region) for the CC
  oracle's recursive-CTE closure.
- **doc pages**: each document wrapped as an HTML page whose anchors
  follow sources.synth.doc_link_targets — the full extract→normalize→
  dedup pipeline checked against a pure-SQL reconstruction of the
  formula (DuckDB never parses HTML).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import EngineConfig
from ..sources.synth import pages_from_documents
from ..stages.extract import link_extract_fn, text_extract_fn
from ..stages.graph_build import Graph, build_graph, degrees
from ..util import col_np, dataset_to_numpy, table_from_arrays

QCFG = EngineConfig(num_partitions=8, extract_concurrency=4)


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    from ..util import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def url_col(prefix: str, keys, width: int) -> pa.Array:
    """Vectorized '<prefix><zero-padded key>' column (pyarrow kernels —
    no per-row f-string loop). lpad keeps lexicographic url order ==
    numeric key order, so canonical min-url component ids follow
    numeric ids."""
    arr = keys if isinstance(keys, (pa.Array, pa.ChunkedArray)) else pa.array(
        np.asarray(keys)
    )
    padded = pc.utf8_lpad(pc.cast(arr, pa.string()), width, padding="0")
    out = pc.binary_join_element_wise(prefix, padded, "")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def part_url(keys: np.ndarray) -> pa.Array:
    return url_col("part://", keys, 9)


# ---------------------------------------------------------------------------
# copart graph
# ---------------------------------------------------------------------------


# Per-session caches: several queries share the same derived graph; the
# driver runs all queries in one Ray session, so materialized datasets
# (object-store refs) stay valid. Mirrors the reference's cached-run-
# table reuse across algorithm runs (include/imtag.hpp:87).
_EDGE_URLS_CACHE: dict = {}
_PK_PAIRS_CACHE: dict = {}
_GRAPH_CACHE: dict = {}


def copart_pk_pairs(sf_dir: str) -> "ray.data.Dataset":
    """Distinct undirected co-purchase pairs in PART-KEY space
    (pk_a < pk_b), via a hash-partitioned self-join of lineitem on the
    order key + ONE bucketed distinct (pair cardinality is E)."""
    cached = _PK_PAIRS_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    from ..util import compact_nonempty

    li = compact_nonempty(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"])
    )
    if li is None:  # empty lineitem: typed empty pair table
        out = ray.data.from_arrow(pa.table(
            {"pk_a": pa.array([], pa.int64()),
             "pk_b": pa.array([], pa.int64())}
        )).materialize()
        _PK_PAIRS_CACHE[sf_dir] = out
        return out
    right = li.rename_columns({"l_partkey": "p2"})
    pairs = li.join(
        right, join_type="inner", num_partitions=QCFG.num_partitions,
        on=("l_orderkey",),
    )

    def canon(t: pa.Table) -> pa.Table:
        a = col_np(t, "l_partkey")
        b = col_np(t, "p2")
        m = a < b
        key = a[m].astype(np.int64) * (1 << 32) + b[m]
        uniq = np.unique(key)
        return table_from_arrays(pk_a=uniq >> 32, pk_b=uniq & ((1 << 32) - 1))

    from ..util import bucketed_sum_aggregate

    dedup = bucketed_sum_aggregate(
        pairs.map_batches(canon, batch_format="pyarrow"),
        key_cols=["pk_a", "pk_b"], sum_cols=[],
    ).materialize()
    _PK_PAIRS_CACHE[sf_dir] = dedup
    return dedup


def copart_edge_urls(sf_dir: str) -> "ray.data.Dataset":
    """Distinct undirected co-purchase pairs (src_url < dst_url), in
    the engine's url vocabulary (see copart_pk_pairs)."""
    cached = _EDGE_URLS_CACHE.get(sf_dir)
    if cached is not None:
        return cached
    dedup = copart_pk_pairs(sf_dir)

    def to_urls(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_url": part_url(col_np(t, "pk_a")),
                "dst_url": part_url(col_np(t, "pk_b")),
            }
        )

    out = dedup.map_batches(to_urls, batch_format="pyarrow").materialize()
    _EDGE_URLS_CACHE[sf_dir] = out
    return out


def copart_weighted_q(sf_dir: str) -> "ray.data.Dataset":
    """WEIGHTED bipartite projection: undirected co-purchase pairs with
    multiplicity → (src_url, dst_url, weight = #orders containing both
    parts). The weighted form of copart_edges (projection weights are
    what similarity/backbone-extraction algorithms consume). One
    hash-partitioned self-join + ONE bucketed pair count — pair
    cardinality is E so Ray's groupby never sees it raw."""
    from ..util import bucketed_sum_aggregate, compact_nonempty

    li = compact_nonempty(bucketed_sum_aggregate(
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_partkey"]),
        key_cols=["l_orderkey", "l_partkey"], sum_cols=[],
    ))  # distinct (order, part): weight counts ORDERS, not lineitem rows
    if li is None:
        return ray.data.from_arrow(pa.table(
            {"src_url": pa.array([], pa.string()),
             "dst_url": pa.array([], pa.string()),
             "weight": pa.array([], pa.int64())}
        ))
    right = li.rename_columns({"l_partkey": "p2"})
    pairs = li.join(
        right, join_type="inner", num_partitions=QCFG.num_partitions,
        on=("l_orderkey",),
    )

    def canon(t: pa.Table) -> pa.Table:
        a = col_np(t, "l_partkey")
        b = col_np(t, "p2")
        m = a < b
        key = a[m].astype(np.int64) * (1 << 32) + b[m]
        # within-batch combiner: (pair, count) partials
        from ..util import sparse_sum_reduce

        k, c = sparse_sum_reduce(key, np.ones(len(key), dtype=np.int64))
        return table_from_arrays(
            pk_a=k >> 32, pk_b=k & ((1 << 32) - 1), weight=c
        )

    agg = bucketed_sum_aggregate(
        pairs.map_batches(canon, batch_format="pyarrow"),
        key_cols=["pk_a", "pk_b"], sum_cols=["weight"],
    )

    def to_urls(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_url": part_url(col_np(t, "pk_a")),
                "dst_url": part_url(col_np(t, "pk_b")),
                "weight": t.column("weight").cast(pa.int64()),
            }
        )

    return agg.map_batches(to_urls, batch_format="pyarrow").sort(
        ["src_url", "dst_url"]
    )


def copart_backbone_q(sf_dir: str, min_weight: int = 2) -> "ray.data.Dataset":
    """Weighted-graph BACKBONE: drop projection edges with weight <
    min_weight (parts co-purchased in ≥2 distinct orders), then hash-min
    components over the surviving backbone (8 fixed rounds — the
    fixed-round contract the unrolled oracle replays) and report the
    component-size histogram → (component_size, n_components). The
    multiplicity-threshold backbone is the standard noise filter before
    community detection on projection graphs."""
    from ray.data.aggregate import Count

    from ..dedup.cluster import minlabel_clusters
    from ..util import bucketed_aggregate, compact_nonempty

    w = copart_weighted_q(sf_dir)

    def to_ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = t.filter(pc.greater_equal(t.column("weight"), min_weight))
        pre = len("part://")
        a = pc.utf8_slice_codeunits(keep.column("src_url"), pre).cast(
            pa.int64()
        )
        b = pc.utf8_slice_codeunits(keep.column("dst_url"), pre).cast(
            pa.int64()
        )
        return pa.table({"id_a": a, "id_b": b})

    pairs = compact_nonempty(w.map_batches(to_ids, batch_format="pyarrow"))
    empty = pa.table(
        {"component_size": pa.array([], pa.int64()),
         "n_components": pa.array([], pa.int64())}
    )
    if pairs is None:
        return ray.data.from_arrow(empty)
    labels = minlabel_clusters(pairs, rounds=8)
    sizes = compact_nonempty(
        bucketed_aggregate(
            labels, key_cols=["lbl"], aggs=[("lbl", "count", "sz")]
        )
    )
    if sizes is None:
        return ray.data.from_arrow(empty)
    return (
        sizes.groupby("sz")
        .aggregate(Count(alias_name="n_components"))
        .map_batches(
            lambda t: pa.table(
                {"component_size": t.column("sz").cast(pa.int64()),
                 "n_components": t.column("n_components").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sort("component_size")
    )


def copart_graph(sf_dir: str) -> Graph:
    key = (sf_dir, "plain")
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(copart_edge_urls(sf_dir), QCFG)
    return _GRAPH_CACHE[key]


def copart_edges_q(sf_dir: str) -> "ray.data.Dataset":
    return copart_edge_urls(sf_dir).sort(["src_url", "dst_url"])


def copart_degree_q(sf_dir: str) -> "ray.data.Dataset":
    # Arrow end-to-end: Dataset-native degrees (zero rows union partial
    # counts) attached to urls via a vid-unique hash join — no driver
    # V-length string loop (VERDICT r2 #7)
    from ..stages.graph_build import degree_dataset

    g = copart_graph(sf_dir)
    if g.num_vertices == 0:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "degree": pa.array([], pa.int64())}
        ))
    return (
        g.vertices.join(
            degree_dataset(g, "undirected"),
            join_type="inner", num_partitions=QCFG.num_partitions,
            on=("vid",), right_on=("vid",),
        )
        .select_columns(["url", "degree"])
        .materialize()
    )


def copart_top20_q(sf_dir: str) -> "ray.data.Dataset":
    return (
        copart_degree_q(sf_dir)
        .sort(["degree", "url"], descending=[True, False])
        .limit(20)
    )


def copart_triangles_q(sf_dir: str) -> "ray.data.Dataset":
    from .triangles import triangle_counts

    g = copart_graph(sf_dir)
    return (
        triangle_counts(g, QCFG)
        .select_columns(["url", "triangles"])
        .sort("url")
    )


def copart_sym_graph(sf_dir: str) -> Graph:
    """The copart graph with edges symmetrized (both directions) — the
    input shape PageRank-family kernels expect for undirected graphs."""
    key = (sf_dir, "sym")
    if key not in _GRAPH_CACHE:
        urls = copart_edge_urls(sf_dir)
        both = urls.union(
            urls.map_batches(
                lambda t: pa.table(
                    {"src_url": t["dst_url"], "dst_url": t["src_url"]}
                ),
                batch_format="pyarrow",
            )
        )
        _GRAPH_CACHE[key] = build_graph(both, QCFG)
    return _GRAPH_CACHE[key]


def copart_pagerank12_q(sf_dir: str) -> "ray.data.Dataset":
    """PageRank, fixed 12 iterations (tol=0) so a recursive-CTE DuckDB
    oracle can replay the identical trajectory; ranks rounded to 9dp.
    Co-purchase edges are undirected → symmetrize before ranking."""
    from .pagerank import pagerank

    cfg = EngineConfig(
        num_partitions=8, max_iterations=12, pagerank_tol=0
    )
    g = copart_sym_graph(sf_dir)
    pr = pagerank(g, cfg, mode="broadcast")

    def roundr(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t["url"],
             "rank": pc.round(t["rank"], 9)}
        )

    return pr.map_batches(roundr, batch_format="pyarrow").sort("url")


# ---------------------------------------------------------------------------
# geo graph (components oracle)
# ---------------------------------------------------------------------------


def geo_edge_urls(sf_dir: str) -> "ray.data.Dataset":
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_regionkey"])
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    supp = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def nat(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src_url": url_col("n://", t["n_nationkey"], 4),
             "dst_url": url_col("r://", t["n_regionkey"], 4)}
        )

    def cus(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src_url": url_col("c://", t["c_custkey"], 9),
             "dst_url": url_col("n://", t["c_nationkey"], 4)}
        )

    def sup(t: pa.Table) -> pa.Table:
        return pa.table(
            {"src_url": url_col("s://", t["s_suppkey"], 9),
             "dst_url": url_col("n://", t["s_nationkey"], 4)}
        )

    return (
        nation.map_batches(nat, batch_format="pyarrow")
        .union(cust.map_batches(cus, batch_format="pyarrow"))
        .union(supp.map_batches(sup, batch_format="pyarrow"))
    )


def geo_components_q(sf_dir: str) -> "ray.data.Dataset":
    from .cc import connected_components

    g = build_graph(geo_edge_urls(sf_dir), QCFG)
    return (
        connected_components(g, QCFG)
        .select_columns(["url", "component_id"])
        .sort("url")
    )


def geo_component_sizes_q(sf_dir: str) -> "ray.data.Dataset":
    from .cc import component_sizes, connected_components

    g = build_graph(geo_edge_urls(sf_dir), QCFG)
    cc = connected_components(g, QCFG)
    return component_sizes(cc).sort("component_id")


def geo_labelprop_q(sf_dir: str) -> "ray.data.Dataset":
    """Label propagation seeded at the region vertices (one label per
    region); the geo star graph fixpoints in ≤3 synchronous rounds, so
    the unrolled 6-round SQL oracle replays the exact trajectory."""
    from .labelprop import label_propagation

    g = build_graph(geo_edge_urls(sf_dir), QCFG)
    from ..util import to_pandas_typed

    regions = to_pandas_typed(_read(sf_dir, "region", columns=["r_regionkey"]))
    seeds = {
        f"r://{int(k):04d}": f"region_{int(k):04d}"
        for k in regions["r_regionkey"]
    }
    return (
        label_propagation(g, seeds, QCFG)
        .select_columns(["url", "label"])
        .sort("url")
    )


def geo_quotient_q(sf_dir: str) -> "ray.data.Dataset | pa.Table":
    """Quotient (contracted) graph of the geo graph under the labelprop
    community assignment: one row per unordered community pair with
    weight = number of directed deduped edges between (or within, when
    label_a == label_b) the two communities. The labelprop trajectory
    is the same one the geo_labelprop oracle unrolls; the contraction
    itself is two hash joins + one bucketed label-pair aggregation."""
    from .labelprop import label_propagation
    from .quotient import quotient_edges

    g = build_graph(geo_edge_urls(sf_dir), QCFG)
    from ..util import to_pandas_typed

    regions = to_pandas_typed(_read(sf_dir, "region", columns=["r_regionkey"]))
    seeds = {
        f"r://{int(k):04d}": f"region_{int(k):04d}"
        for k in regions["r_regionkey"]
    }
    labels = label_propagation(g, seeds, QCFG).select_columns(
        ["vid", "label"]
    )
    out = quotient_edges(g, labels, QCFG)
    if isinstance(out, pa.Table):
        return out
    return out.sort(["label_a", "label_b"])


def geo_percolation_q(sf_dir: str) -> pa.Table:
    """Bond-percolation resilience curve of the geo graph: keep each
    directed edge row iff md5('perc:' + src + ' ' + dst) u64-prefix
    % 256 < t for t ∈ {64, 128, 192}, run connected components on the
    surviving subgraph over the ORIGINAL vertex set (pruned-away
    vertices count as singletons) → (t, n_edges, n_components,
    max_size). Deterministic hash thresholds — no RNG state, same
    curve on every run/partitioning (the sampling discipline of
    scoring.sample_stratified applied to edges)."""
    import hashlib

    from .cc import component_sizes, connected_components

    edges = geo_edge_urls(sf_dir).materialize()
    g_full = build_graph(edges, QCFG)
    V = g_full.num_vertices
    rows = []
    for t in (64, 128, 192):

        def keep(tb: pa.Table, _t=t) -> pa.Table:
            s = tb.column("src_url").to_pylist()
            d = tb.column("dst_url").to_pylist()
            h = np.array(
                [
                    int(
                        hashlib.md5(f"perc:{a} {b}".encode()).hexdigest()[:16],
                        16,
                    )
                    % 256
                    for a, b in zip(s, d)
                ],
                dtype=np.int64,
            )
            return tb.filter(pa.array(h < _t))

        filt = edges.map_batches(keep, batch_format="pyarrow").materialize()
        n_edges = filt.count()
        if n_edges == 0:
            rows.append((t, 0, V, 1 if V else 0))
            continue
        g = build_graph(filt, QCFG)
        sizes = component_sizes(connected_components(g, QCFG)).materialize()
        n_comp = sizes.count()
        mx = max(
            int(sizes.max("size") or 0), 1 if V > g.num_vertices else 0
        )
        rows.append((t, n_edges, n_comp + (V - g.num_vertices), mx))
    return pa.table(
        {
            "t": pa.array([r[0] for r in rows], pa.int64()),
            "n_edges": pa.array([r[1] for r in rows], pa.int64()),
            "n_components": pa.array([r[2] for r in rows], pa.int64()),
            "max_size": pa.array([r[3] for r in rows], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# document pages: extraction pipeline
# ---------------------------------------------------------------------------


def doc_pages(sf_dir: str) -> "ray.data.Dataset":
    """Documents → synthesized HTML pages, DISTRIBUTED: page synthesis
    runs as map_batches over the documents Dataset with only the corpus
    count broadcast (the link formula needs (doc_id, n_docs)) — no
    driver-side to_pandas (the VERDICT fix)."""
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()  # parquet metadata count — no data pass

    def synth(t: pa.Table, _n=n_docs) -> pa.Table:
        return pages_from_documents(
            col_np(t, "doc_id").tolist(),
            t.column("text").to_pylist(),
            n_total=_n,
        )

    return docs.map_batches(synth, batch_format="pyarrow", batch_size=256)


def doc_link_density_q(sf_dir: str) -> "ray.data.Dataset":
    """Link-density page-quality signal from the FULL extraction
    pipeline → (url, n_links, n_tokens): link occurrences per page (the
    anchor stream — duplicates kept, self-links dropped) against the
    extracted-text token count. The classic "mostly navigation" web
    filter (pages where n_links/n_tokens is high are link farms /
    boilerplate); exact integers, ratio left to the consumer.

    Scale shape: pages are synthesized and extracted ONCE
    (materialized); links collapse per-batch then through ONE bucketed
    src count; texts tokenize batch-side; a url-keyed LEFT-OUTER hash
    join fills linkless pages with 0."""
    from ..stages.extract import anchor_extract_fn, text_extract_fn
    from ..functions.textfn import token_count
    from ..util import bucketed_sum_aggregate, compact_nonempty

    pages = doc_pages(sf_dir).materialize()

    def tok(t: pa.Table) -> pa.Table:
        import pandas as pd

        texts = pd.Series(t.column("text").to_numpy(zero_copy_only=False))
        return pa.table(
            {"url": t.column("url").cast(pa.string()),
             "n_tokens": pa.array(token_count(texts))}
        )

    texts = compact_nonempty(
        pages.select_columns(["url", "html"])
        .map_batches(
            text_extract_fn, batch_format="pyarrow",
            batch_size=QCFG.extract_batch_size,
        )
        .map_batches(tok, batch_format="pyarrow")
    )

    def link_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"lurl": pa.array([], pa.string()),
                 "n_links": pa.array([], pa.int64())}
            )
        return (
            pa.table({"lurl": t.column("src_url").cast(pa.string())})
            .group_by(["lurl"])
            .aggregate([("lurl", "count")])
            .rename_columns(["lurl", "n_links"])
        )

    links = compact_nonempty(
        bucketed_sum_aggregate(
            pages.select_columns(["url", "html"])
            .map_batches(
                anchor_extract_fn, batch_format="pyarrow",
                batch_size=QCFG.extract_batch_size,
            )
            .map_batches(link_partial, batch_format="pyarrow"),
            key_cols=["lurl"], sum_cols=["n_links"],
        )
    )
    if texts is None:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "n_links": pa.array([], pa.int64()),
             "n_tokens": pa.array([], pa.int64())}
        ))
    if links is None:
        # no anchors anywhere: zero links for every page
        return texts.map_batches(
            lambda t: pa.table(
                {"url": t.column("url").cast(pa.string()),
                 "n_links": pa.array(
                     np.zeros(t.num_rows, dtype=np.int64)),
                 "n_tokens": t.column("n_tokens").cast(pa.int64())}
            ),
            batch_format="pyarrow",
        ).sort("url")
    joined = texts.join(
        links, join_type="left_outer",
        num_partitions=QCFG.num_partitions,
        on=("url",), right_on=("lurl",),
    )

    def fill(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"url": t.column("url").cast(pa.string()),
             "n_links": pc.fill_null(
                 t.column("n_links").cast(pa.int64()), 0),
             "n_tokens": t.column("n_tokens").cast(pa.int64())}
        )

    return joined.map_batches(fill, batch_format="pyarrow").sort("url")


def doc_anchors_q(sf_dir: str) -> "ray.data.Dataset":
    """Anchor-text edge table from the FULL extraction pipeline:
    (src_url, dst_url, anchor) — one row per <a> occurrence (duplicates
    kept, self-links dropped), anchor text through the pinned text
    pipeline. The oracle reconstructs the link formula AND the anchor
    text ('d' || target) in SQL without parsing HTML."""
    from ..stages.extract import anchor_extract_fn

    pages = doc_pages(sf_dir)
    return (
        pages.select_columns(["url", "html"])
        .map_batches(
            anchor_extract_fn, batch_format="pyarrow",
            batch_size=QCFG.extract_batch_size,
        )
        .sort(["src_url", "dst_url", "anchor"])
    )


def doc_anchor_index_q(sf_dir: str) -> "ray.data.Dataset":
    """Anchor-text INDEX: per target url, each distinct anchor text
    with its occurrence count → (dst_url, anchor, n) — the inverted
    edge-payload table web rankers build (anchor text describes the
    TARGET). One bucketed (dst, anchor) count over the anchor edge
    stream; cardinality ≤ E so Ray's groupby never sees it raw."""
    from ..stages.extract import anchor_extract_fn
    from ..util import bucketed_aggregate

    pages = doc_pages(sf_dir)
    anchors = pages.select_columns(["url", "html"]).map_batches(
        anchor_extract_fn, batch_format="pyarrow",
        batch_size=QCFG.extract_batch_size,
    )
    out = bucketed_aggregate(
        anchors.select_columns(["dst_url", "anchor"]),
        key_cols=["dst_url", "anchor"],
        aggs=[("anchor", "count", "n")],
    )
    return out.map_batches(
        lambda t: pa.table(
            {"dst_url": t.column("dst_url"), "anchor": t.column("anchor"),
             "n": t.column("n").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).sort(["dst_url", "anchor"])


def _salsa_scores(sf_dir: str, side: str) -> "ray.data.Dataset":
    """Shared SALSA kernel (Lempel–Moran closed form): scores over the
    chosen side's projection graph — ``authority``: score vertices by
    IN-degree, two authorities adjacent iff they share an in-neighbor
    (co-citation); ``hub``: score vertices by OUT-degree, two hubs
    adjacent iff they share an out-neighbor (bibliographic coupling).
    Within each projection component C:
    score(v) = (|C| · deg(v)) / (|V_side| · Σ_{u∈C} deg(u)) — integer
    sufficient statistics, ONE float division per vertex, identical
    doubles in the oracle.

    Scale shape: projection pairs via a key-keyed self-join + bucketed
    distinct (the copart construction); components via the gated CC
    kernel; per-component stats one bucketed aggregation. Wedge volume
    is Σ deg(shared side)² — hub-gated like ball2/adamic on power-law
    graphs."""
    from ..util import bucketed_aggregate, bucketed_sum_aggregate, compact_nonempty
    from .cc import connected_components

    share_col, score_col = (
        ("src_url", "dst_url") if side == "authority"
        else ("dst_url", "src_url")
    )
    e = doc_edges_q(sf_dir).materialize()
    deg = compact_nonempty(
        bucketed_aggregate(
            e.select_columns([score_col]),
            key_cols=[score_col], aggs=[(score_col, "count", "din")],
        )
    )
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "score": pa.array([], pa.float64())}
    )
    if deg is None:
        return ray.data.from_arrow(empty)
    n_side = deg.count()
    right = e.rename_columns({score_col: "d2"})
    joined = e.join(
        right, join_type="inner", num_partitions=QCFG.num_partitions,
        on=(share_col,), right_on=(share_col,),
    )

    def canon(t: pa.Table, _sc=score_col) -> pa.Table:
        a = np.asarray(t.column(_sc), dtype=object)
        b = np.asarray(t.column("d2"), dtype=object)
        m = a < b
        return pa.table(
            {"src_url": pa.array(a[m], pa.string()),
             "dst_url": pa.array(b[m], pa.string())}
        )

    cop = compact_nonempty(
        bucketed_sum_aggregate(
            joined.map_batches(canon, batch_format="pyarrow"),
            key_cols=["src_url", "dst_url"], sum_cols=[],
        )
    )
    if cop is None:
        labels = deg.map_batches(
            lambda t, _sc=score_col: pa.table(
                {"url": t.column(_sc), "comp": t.column(_sc)}
            ),
            batch_format="pyarrow",
        )
    else:
        g2 = build_graph(cop, QCFG)
        cc2 = (
            connected_components(g2, QCFG)
            .select_columns(["url", "component_id"])
            .materialize()
        )
        # vertices with no projection partner keep their own url as the
        # component label (singleton components)
        labels = deg.select_columns([score_col]).join(
            cc2.rename_columns({"url": "u2"}),
            join_type="left_outer", num_partitions=QCFG.num_partitions,
            on=(score_col,), right_on=("u2",),
        ).map_batches(
            lambda t, _sc=score_col: pa.table(
                {"url": t.column(_sc),
                 "comp": pa.array(
                     [
                         u if c is None else f"c{int(c)}"
                         for u, c in zip(
                             t.column(_sc).to_pylist(),
                             t.column("component_id").to_pylist(),
                         )
                     ],
                     pa.string(),
                 )}
            ),
            batch_format="pyarrow",
        )
    tagged = compact_nonempty(
        labels.join(
            deg.rename_columns({score_col: "u3"}),
            join_type="inner", num_partitions=QCFG.num_partitions,
            on=("url",), right_on=("u3",),
        ).materialize()
    )
    stats = compact_nonempty(
        bucketed_aggregate(
            tagged.select_columns(["comp", "din"]),
            key_cols=["comp"],
            aggs=[("din", "sum", "sum_din"), ("din", "count", "n_members")],
        )
    )
    out = tagged.join(
        stats, join_type="inner", num_partitions=QCFG.num_partitions,
        on=("comp",), right_on=("comp",),
    )

    def score(t: pa.Table, _na=n_side) -> pa.Table:
        c = np.asarray(t.column("n_members"), dtype=np.int64)
        d = np.asarray(t.column("din"), dtype=np.int64)
        s = np.asarray(t.column("sum_din"), dtype=np.int64)
        sc = np.round(
            (c * d).astype(np.float64) / (_na * s).astype(np.float64), 9
        )
        return pa.table(
            {"url": t.column("url"), "score": pa.array(sc, pa.float64())}
        )

    return out.map_batches(score, batch_format="pyarrow").sort("url")


def doc_salsa_q(sf_dir: str) -> "ray.data.Dataset":
    """SALSA authority scores (Lempel–Moran) over the doc graph via the
    EXACT closed form of the stationary distribution — see
    _salsa_scores; no power iteration, no order-dependent float sums.
    → (url, score), authorities only."""
    return _salsa_scores(sf_dir, "authority")


def doc_salsa_hubs_q(sf_dir: str) -> "ray.data.Dataset":
    """SALSA hub scores: the symmetric closed form over the
    bibliographic-coupling projection (hubs adjacent iff they share an
    out-neighbor), scored by out-degree. → (url, score), hubs only."""
    return _salsa_scores(sf_dir, "hub")


def doc_edges_q(sf_dir: str) -> "ray.data.Dataset":
    """Full extraction pipeline on synthesized doc pages → distinct
    (src_url, dst_url). The DuckDB oracle reconstructs the link formula
    in SQL without parsing HTML."""
    pages = doc_pages(sf_dir)
    edges = pages.select_columns(["url", "html"]).map_batches(
        link_extract_fn, batch_format="pyarrow",
        batch_size=QCFG.extract_batch_size,
    )

    def dedup(t: pa.Table) -> pa.Table:
        # map-side combiner before the shuffle: Arrow-native distinct
        # (C++ hash group-by, no pandas conversion)
        return t.group_by(["src_url", "dst_url"]).aggregate([])

    from ..util import bucketed_sum_aggregate

    return bucketed_sum_aggregate(
        edges.map_batches(dedup, batch_format="pyarrow"),
        key_cols=["src_url", "dst_url"], sum_cols=[],
    ).sort(["src_url", "dst_url"])


def doc_texts_q(sf_dir: str) -> "ray.data.Dataset":
    """Pinned text extraction over the synthesized pages → (url, text)."""
    pages = doc_pages(sf_dir)
    return (
        pages.select_columns(["url", "html"])
        .map_batches(
            text_extract_fn, batch_format="pyarrow",
            batch_size=QCFG.extract_batch_size,
        )
        .map_batches(
            # DuckDB's VARCHAR maps to arrow string; avoid a
            # large_string-vs-string schema mismatch in the compare
            lambda t: pa.table(
                {"url": t["url"], "text": t["text"].cast(pa.string())}
            ),
            batch_format="pyarrow",
        )
        .sort("url")
    )


# ---------------------------------------------------------------------------
# traversal queries (HITS / BFS / k-core)
# ---------------------------------------------------------------------------


def doc_graph(sf_dir: str) -> Graph:
    """Directed doc link graph from the FULL extraction pipeline (the
    HITS oracle replays the link formula in SQL, so engine HITS over a
    graph built by real HTML parsing closes the loop end-to-end)."""
    key = (sf_dir, "doc")
    if key not in _GRAPH_CACHE:
        _GRAPH_CACHE[key] = build_graph(doc_edges_q(sf_dir), QCFG)
    return _GRAPH_CACHE[key]



def doc_bowtie_graph(sf_dir: str) -> Graph:
    """Directed doc graph FILTERED to (src_id + dst_id) % 3 != 0 —
    breaks the synthetic link formula's single giant cycle into a
    bowtie (one big SCC + small SCCs + singleton tendrils), the shape
    strongly-connected-components analysis exists for."""
    key = (sf_dir, "doc_bowtie")
    if key not in _GRAPH_CACHE:
        import pyarrow.compute as _pc

        def keep(t: pa.Table) -> pa.Table:
            pre = len("https://docs.example/d")
            s = _pc.cast(
                _pc.utf8_slice_codeunits(
                    t.column("src_url").combine_chunks(), pre, 1 << 30
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            d = _pc.cast(
                _pc.utf8_slice_codeunits(
                    t.column("dst_url").combine_chunks(), pre, 1 << 30
                ),
                pa.int64(),
            ).to_numpy(zero_copy_only=False)
            return t.filter(pa.array((s + d) % 3 != 0))

        edges = doc_edges_q(sf_dir).map_batches(keep, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph(edges, QCFG)
    return _GRAPH_CACHE[key]


def doc_scc_q(sf_dir: str) -> "ray.data.Dataset":
    """Strongly connected components of the bowtie doc graph; canonical
    min-url SCC ids (closure SQL oracle over mutual reachability)."""
    from .scc import strongly_connected_components

    out = strongly_connected_components(doc_bowtie_graph(sf_dir), QCFG)
    return out.select_columns(["url", "scc_url"]).sort("url")

def doc_bowtie_q(sf_dir: str) -> "ray.data.Dataset":
    """Broder bowtie decomposition (CORE/IN/OUT/TUBE/TENDRIL_*/
    DISCONNECTED) of the bowtie doc graph; closure SQL oracle."""
    from .bowtie import bowtie_decomposition

    out = bowtie_decomposition(doc_bowtie_graph(sf_dir), QCFG)
    return out.select_columns(["url", "region"]).sort("url")


def doc_scc_cond_q(sf_dir: str) -> "ray.data.Dataset":
    """Condensation DAG of the bowtie doc graph: distinct inter-SCC
    edges named by canonical min-url SCC ids."""
    from .bowtie import scc_condensation

    out = scc_condensation(doc_bowtie_graph(sf_dir), QCFG)
    return out.sort(["src_scc_url", "dst_scc_url"])


def doc_scc_depth4_q(sf_dir: str) -> "ray.data.Dataset":
    """Longest-path depth layering of the bowtie doc graph's SCC
    condensation after 4 monotone Bellman relaxations → (scc_url,
    depth). Fixed-round semantics match the unrolled oracle."""
    from .bowtie import condensation_depths

    return condensation_depths(doc_bowtie_graph(sf_dir), QCFG, rounds=4)


def doc_hyperanf3_q(sf_dir: str) -> "ray.data.Dataset":
    """HyperANF 3-hop neighborhood sizes over the directed doc link
    graph (per-vertex HLL max-merge rounds, p=8); the oracle replays
    the register hash + estimator bit-exactly over the true 3-ball."""
    from .hyperanf import hyperanf

    out = hyperanf(doc_graph(sf_dir), QCFG, radius=3, p=8)
    return out.select_columns(["url", "ball"]).sort("url")


def doc_harmonic3_q(sf_dir: str) -> "ray.data.Dataset":
    """Truncated harmonic centrality (HyperBall, radius 3, p=8) over
    the directed doc link graph; telescoped per-round integer ball
    estimates make the float exactly oracle-replayable."""
    from .hyperanf import harmonic_centrality_approx

    out = harmonic_centrality_approx(doc_graph(sf_dir), QCFG, radius=3, p=8)
    return out.select_columns(["url", "harmonic"]).sort("url")


def copart_match3_q(sf_dir: str) -> "ray.data.Dataset":
    """Handshake maximal matching, 3 fixed rounds, over the copart
    graph (mutual min-priority targets; bit-exact oracle replay)."""
    from .matching import maximal_matching

    out = maximal_matching(copart_graph(sf_dir), QCFG, rounds=3)
    return out.sort(["url_a", "url_b"])


def copart_color3_q(sf_dir: str) -> "ray.data.Dataset":
    """Greedy 3-color budget over the copart graph (iterated Luby MIS,
    2 rounds per color; adjacent vertices never share a color ≥ 0;
    leftovers -1). Oracle replays every round bit-exactly."""
    from .mis import greedy_coloring

    out = greedy_coloring(
        copart_graph(sf_dir), QCFG, colors=3, rounds_per_color=2
    )
    return out.select_columns(["url", "color"]).sort("url")


def doc_bc8_q(sf_dir: str) -> "ray.data.Dataset":
    """Depth-6 Brandes betweenness from the 8 lexicographically
    smallest doc urls (deterministic sampled-source betweenness; the
    oracle unrolls the level DAG and replays broadcast mode's
    per-edge dependency formula)."""
    from .betweenness import betweenness_approx

    out = betweenness_approx(doc_graph(sf_dir), QCFG, n_sources=8, depth=6)
    return out.select_columns(["url", "bc"]).sort("url")


def copart_msf2_q(sf_dir: str) -> "ray.data.Dataset":
    """Borůvka minimum-spanning-forest, 2 fixed rounds, over the
    weighted copart graph (w = 1 + (ka+kb) % 7; ties broken by the
    total (w, lo, hi) key so the selected edge set is unique). The
    oracle replays both rounds with window-function argmins and a
    recursive-CTE min-label merge closure."""
    from .msf import boruvka_forest

    g = copart_graph(sf_dir)
    out = boruvka_forest(g, copart_weighted_edges(sf_dir), QCFG, rounds=2)
    return out.sort(["url_a", "url_b"])


def doc_eigen8_q(sf_dir: str) -> "ray.data.Dataset":
    """Directed eigenvector centrality (8 power-iteration rounds,
    deferred L1 normalization) over the extraction-built doc graph —
    scores stay INTEGER until the final normalize (x0 = 1), so batch
    summation order cannot perturb the doubles the oracle replays."""
    from .traversal import eigenvector_centrality

    out = eigenvector_centrality(doc_graph(sf_dir), QCFG, iterations=8)
    return (
        out.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "score": pa.array(
                     np.round(
                         t.column("score").to_numpy(zero_copy_only=False), 9
                     ),
                     pa.float64(),
                 )}
            ),
            batch_format="pyarrow",
        )
        .sort("url")
    )


def doc_katz8_q(sf_dir: str) -> "ray.data.Dataset":
    """Katz centrality (8 truncated-walk rounds, α = 1/8, β = 1,
    deferred L1 normalization) over the extraction-built doc graph —
    α a power of two keeps every intermediate a dyadic rational, so
    the unrolled oracle replays the trajectory bit-exactly."""
    from .traversal import katz_centrality

    out = katz_centrality(doc_graph(sf_dir), QCFG, iterations=8)
    return (
        out.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "score": pa.array(
                     np.round(
                         t.column("score").to_numpy(zero_copy_only=False), 9
                     ),
                     pa.float64(),
                 )}
            ),
            batch_format="pyarrow",
        )
        .sort("url")
    )


def copart_mis3_q(sf_dir: str) -> "ray.data.Dataset":
    """Deterministic Luby maximal independent set, 3 fixed rounds, over
    the undirected copart graph (splitmix64 round priorities; the
    oracle replays every round bit-exactly via HUGEINT limb mulmod).
    status: 1 in MIS, 0 dominated, -1 undecided after round 3."""
    from .mis import maximal_independent_set

    out = maximal_independent_set(copart_graph(sf_dir), QCFG, rounds=3)
    return out.select_columns(["url", "status"]).sort("url")


def doc_nf4_q(sf_dir: str) -> "ray.data.Dataset":
    """Neighbourhood function N(0..4) of the directed doc link graph —
    Σ_v (HyperANF integer ball_k estimate): 5 rows, the distance-
    distribution summary HyperANF exists for."""
    from .hyperanf import neighbourhood_function

    out = neighbourhood_function(doc_graph(sf_dir), QCFG, radius=4, p=8)
    return out.sort("k")


def doc_effdiam4_q(sf_dir: str) -> "ray.data.Dataset":
    """Interpolated 0.9-effective diameter of the truncated (radius-4)
    distance distribution — one float64 row, bit-replayable by the SQL
    oracle from the same integer N(k) values."""
    from .hyperanf import effective_diameter

    return effective_diameter(doc_graph(sf_dir), QCFG, radius=4, p=8)


def doc_walks4_q(sf_dir: str) -> "ray.data.Dataset":
    """4-step deterministic random walks from every doc vertex
    (splitmix64 next-hop choice, replayed bit-exactly by the oracle's
    HUGEINT limb-mulmod recursive CTE)."""
    from .walks import random_walks

    out = random_walks(doc_graph(sf_dir), QCFG, length=4)
    return out.sort(["start_url", "step", "url"])


def lattice_components48_q(sf_dir: str, side: int = 48) -> "ray.data.Dataset":
    """The reference's CORE pixel-lattice CCL, ORACLE-GRADED → (size,
    n_components): a deterministic 48×48 binary mask (pix(r,c) fg iff
    md5('px:' + (r·48 + c + N)) u32-prefix mod 100 < 45, N = document
    count, so the fixture is table-derived and percolation-noisy — 193
    components across 27 distinct sizes at sf0.01, not a stripe
    artifact) runs the engine's vectorized mask→lattice-graph→
    hash-min CC pipeline (pipelines/lattice.py:mask_graph — the
    scanline-run semantics of src/SegmentImageImpl_Scanline.cpp
    re-expressed over Arrow) under CROSS connectivity, reduced to the
    component-size histogram. The SQL oracle rebuilds the same lattice
    and closes it with a recursive CTE — the driver-graded proof of the
    imtag CCL semantics that otherwise only the blobs-conformance
    pytest sees.

    Scale shape: identical machinery to every other CC query (bucketed
    exchanges, no driver V-state); the mask here is small because the
    ORACLE is a transitive closure, not because the engine needs it —
    the same call stack handles the 3840×2160 reference input
    (test_blobs_conformance)."""
    from ray.data.aggregate import Count

    from .cc import component_sizes
    from .lattice import lattice_cc

    import hashlib

    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    fg = np.array(
        [
            int(hashlib.md5(f"px:{i + n_docs}".encode()).hexdigest()[:8], 16)
            % 100 < 45
            for i in range(side * side)
        ],
        dtype=bool,
    )
    mask = fg.reshape(side, side)
    cc = lattice_cc(mask.astype(np.uint8), "cross", QCFG)
    return (
        component_sizes(cc.select_columns(["component_id"]))
        .groupby("size")  # |distinct sizes| groups — intrinsically tiny
        .aggregate(Count(alias_name="n_components"))
        .sort("size")
    )


def lattice_components48_eight_q(sf_dir: str, side: int = 48):
    """lattice_components48 under EIGHT_WAY connectivity — grades the
    reference's second overlap predicate (src/SegmentImageImpl.cpp:
    60-62: diagonal runs merge) against a closure oracle with the two
    diagonal adjacency terms added."""
    import hashlib

    from ray.data.aggregate import Count

    from .cc import component_sizes
    from .lattice import lattice_cc

    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    fg = np.array(
        [
            int(hashlib.md5(f"px:{i + n_docs}".encode()).hexdigest()[:8], 16)
            % 100 < 45
            for i in range(side * side)
        ],
        dtype=bool,
    )
    cc = lattice_cc(fg.reshape(side, side).astype(np.uint8), "eight", QCFG)
    return (
        component_sizes(cc.select_columns(["component_id"]))
        .groupby("size")
        .aggregate(Count(alias_name="n_components"))
        .sort("size")
    )


def lattice_holes48_q(sf_dir: str, side: int = 48) -> pa.Table:
    """The reference's hole-adjacency operator, ORACLE-GRADED → one row
    (n_land, n_holes, n_adj_pairs): the lattice_components48 mask runs
    land CCL, background ("hole", imtag's invert-includes-borders
    semantics, src/morphology.cpp:101-142) CCL, and the full 4-neighbor
    land×hole bipartite adjacency (pipelines/lattice.py:
    hole_adjacencies_full — the intended-semantics generalization of
    src/morphology.cpp:264-312); the SQL oracle rebuilds both closures
    with recursive CTEs and counts distinct adjacent component pairs.
    Driver-graded proof of the invert + bipartite-join path."""
    import hashlib

    from .lattice import hole_adjacencies_full

    n_docs = _read(sf_dir, "documents", columns=["doc_id"]).count()
    fg = np.array(
        [
            int(hashlib.md5(f"px:{i + n_docs}".encode()).hexdigest()[:8], 16)
            % 100 < 45
            for i in range(side * side)
        ],
        dtype=bool,
    )
    adj = hole_adjacencies_full(fg.reshape(side, side), QCFG)
    return pa.table(
        {"n_land": pa.array([adj.shape[0]], pa.int64()),
         "n_holes": pa.array([adj.shape[1]], pa.int64()),
         "n_adj_pairs": pa.array([int(adj.sum())], pa.int64())}
    )


def doc_graphlets_q(sf_dir: str) -> pa.Table:
    """Graphlet census of the undirected simple doc link graph →
    one row (n_wedges, n_triangles, n_k4): open 2-paths, triangles and
    4-cliques — the motif signature vector graph-mining compares
    networks by (copart_squares adds the 4-cycle).

    Scale shape: wedges are Σ d(d−1)/2 over the SIMPLE degrees (one
    bucketed endpoint count over the canonical oriented edge table +
    scalar partials); triangles reuse the gated orientation kernel; K4
    is enumerated Dataset-natively by the standard oriented-DAG join
    chain — tri(a,b,c) lists from apex wedges semi-joined on the
    closing edge, then tri⋈tri on the shared first edge (a,b) closed by
    the (c,d) edge, so each K4 counts exactly once. Join volume is
    Σ deg⁺(u)² (the same wedge bound every distributed triangle
    enumeration pays); skewed hubs are capped by the (degree, vid)
    orientation exactly as in triangle counting."""
    from ray.data.aggregate import Sum

    from .triangles import _oriented_edges, triangle_counts
    from ..util import bucketed_sum_aggregate, sparse_sum_reduce

    g = doc_graph(sf_dir)
    oe = _oriented_edges(g, QCFG)  # (u, v) canonical distinct, materialized

    # simple degrees → wedges, via bucketed endpoint count + scalar partials
    def ends(t: pa.Table) -> pa.Table:
        keys = np.concatenate([col_np(t, "u"), col_np(t, "v")])
        kk, s = sparse_sum_reduce(keys, np.ones(len(keys), np.int64))
        return table_from_arrays(vid=kk, c=s)

    degs = bucketed_sum_aggregate(
        oe.map_batches(ends, batch_format="pyarrow"),
        key_cols=["vid"], sum_cols=["c"],
    )

    def wedge_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"w": pa.array([], pa.int64())})
        d = col_np(t, "c")
        return pa.table({"w": pa.array([int((d * (d - 1) // 2).sum())])})

    n_wedges = int(
        degs.map_batches(wedge_partial, batch_format="pyarrow")
        .aggregate(Sum("w", alias_name="s"))["s"] or 0
    )
    tri_sum = int(
        triangle_counts(g, QCFG).aggregate(Sum("triangles", alias_name="s"))["s"]
        or 0
    )
    n_tri = tri_sum // 3

    # K4: tri list via apex-wedge join + closing-edge semi-join,
    # then tri ⋈ tri on (a, b) closed by the (c, d) oriented edge
    from ..util import compact_nonempty

    oe_c = compact_nonempty(oe)
    n_k4 = 0
    if oe_c is not None:
        P = QCFG.num_partitions
        wedges = compact_nonempty(
            oe_c.join(
                oe_c.rename_columns({"u": "u2", "v": "w"}),
                join_type="inner", num_partitions=P,
                on=("u",), right_on=("u2",),
            ).filter(expr="v != w")
        )
        tri = None
        if wedges is not None:
            tri = compact_nonempty(
                wedges.join(
                    oe_c.rename_columns({"u": "x", "v": "y"}),
                    join_type="inner", num_partitions=P,
                    on=("v", "w"), right_on=("x", "y"),
                ).select_columns(["u", "v", "w"]).materialize()
            )
        if tri is not None:
            tpairs = compact_nonempty(
                tri.join(
                    tri.rename_columns(
                        {"u": "u2", "v": "v2", "w": "w2"}
                    ),
                    join_type="inner", num_partitions=P,
                    on=("u", "v"), right_on=("u2", "v2"),
                ).filter(expr="w != w2").materialize()
            )
            if tpairs is not None:
                closed = compact_nonempty(
                    tpairs.join(
                        oe_c.rename_columns({"u": "x", "v": "y"}),
                        join_type="inner", num_partitions=P,
                        on=("w", "w2"), right_on=("x", "y"),
                    )
                )
                n_k4 = closed.count() if closed is not None else 0
    return pa.table(
        {"n_wedges": pa.array([n_wedges], pa.int64()),
         "n_triangles": pa.array([n_tri], pa.int64()),
         "n_k4": pa.array([n_k4], pa.int64())}
    )


def doc_hits8_q(sf_dir: str) -> "ray.data.Dataset":
    """HITS hub/authority, fixed 8 iterations with a single final sum
    normalization (a per-iteration normalization is a scalar factor, so
    deferring it yields identical scores and keeps the DuckDB oracle a
    plain unrolled join chain); 9dp rounding."""
    from .traversal import hits

    h = hits(doc_graph(sf_dir), QCFG, iterations=8)

    def roundha(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t["url"],
             "hub": pc.round(t["hub"], 9),
             "auth": pc.round(t["auth"], 9)}
        )

    return h.map_batches(roundha, batch_format="pyarrow").sort("url")


def copart_bfs12_q(sf_dir: str) -> "ray.data.Dataset":
    """Min-hop distance from the lexicographically smallest part url,
    fixed 12 relaxation rounds (reached-within-12 vertices only) so the
    bounded recursive-CTE oracle replays it exactly."""
    from ray.data.aggregate import Min

    from .traversal import bfs_distances

    g = copart_graph(sf_dir)
    seed = g.vertices.aggregate(Min("url", alias_name="m"))["m"]
    return bfs_distances(g, [seed], QCFG, rounds=12).sort("url")


def copart_kcore3_q(sf_dir: str) -> "ray.data.Dataset":
    """3-core membership after 8 fixed peel rounds → (url, degree
    within the surviving subgraph)."""
    from .traversal import kcore

    g = copart_graph(sf_dir)
    return kcore(g, 3, QCFG, rounds=8).sort("url")


def geo_attack_q(sf_dir: str) -> pa.Table:
    """Targeted-attack resilience curve of the geo graph → per hub
    budget k ∈ {0, 4, 8, 16}: remove the top-k vertices by undirected
    degree (ties → url ascending, a deterministic total order), run
    connected components on the survivors (isolated survivors count as
    singletons) → (k, n_edges, n_components, max_size). The
    deliberate-attack complement of geo_percolation's random bond
    drops: scale-free graphs survive random failure but shatter under
    hub removal (Albert, Jeong & Barabási 2000).

    Scale shape: the hub list is a top-k (≤16 urls — a legitimate
    driver-side broadcast, like any top-k report); everything else is
    the existing distributed CC machinery per budget."""
    from .cc import component_sizes, connected_components
    from ..stages.graph_build import degree_dataset

    edges = geo_edge_urls(sf_dir).materialize()
    g_full = build_graph(edges, QCFG)
    V = g_full.num_vertices
    if V == 0:
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "n_edges": pa.array([], pa.int64()),
             "n_components": pa.array([], pa.int64()),
             "max_size": pa.array([], pa.int64())}
        )
    from ..util import compact_nonempty as _cn

    verts_c = _cn(g_full.vertices)
    deg_c = _cn(degree_dataset(g_full, "undirected"))
    if verts_c is None:
        return pa.table(
            {"k": pa.array([], pa.int64()),
             "n_edges": pa.array([], pa.int64()),
             "n_components": pa.array([], pa.int64()),
             "max_size": pa.array([], pa.int64())}
        )
    if deg_c is None:
        # edgeless graph: every vertex has degree 0
        degu = verts_c.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "degree": pa.array(
                     np.zeros(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        ).materialize()
    else:
        degu = (
            verts_c.join(
                deg_c,
                join_type="inner", num_partitions=QCFG.num_partitions,
                on=("vid",), right_on=("vid",),
            )
            .select_columns(["url", "degree"])
            .materialize()
        )
    rows = []
    for k in (0, 4, 8, 16):
        hubs = (
            frozenset(
                degu.sort(["degree", "url"], descending=[True, False])
                .limit(k).to_pandas()["url"]
            )
            if k else frozenset()
        )

        def keep(tb: pa.Table, _h=hubs) -> pa.Table:
            s = tb.column("src_url").to_pylist()
            d = tb.column("dst_url").to_pylist()
            m = np.array(
                [a not in _h and b not in _h for a, b in zip(s, d)],
                dtype=bool,
            )
            return tb.filter(pa.array(m))

        filt = edges.map_batches(keep, batch_format="pyarrow").materialize()
        n_surv = V - k
        if filt.count() == 0:
            rows.append((k, 0, n_surv, 1 if n_surv else 0))
            continue
        g = build_graph(filt, QCFG)
        sizes = component_sizes(connected_components(g, QCFG)).materialize()
        n_comp = sizes.count() + (n_surv - g.num_vertices)
        mx = max(
            int(sizes.max("size") or 0), 1 if n_surv > g.num_vertices else 0
        )
        rows.append((k, g.num_edges, n_comp, mx))
    return pa.table(
        {"k": pa.array([r[0] for r in rows], pa.int64()),
         "n_edges": pa.array([r[1] for r in rows], pa.int64()),
         "n_components": pa.array([r[2] for r in rows], pa.int64()),
         "max_size": pa.array([r[3] for r in rows], pa.int64())}
    )


def copart_densest1_members_q(sf_dir: str) -> "ray.data.Dataset":
    """Dense-core membership after 1 Bahmani peel over the co-purchase
    graph → (url, core_degree): the vertex set whose density the
    copart_densest4 census tracks, with internal degrees."""
    from .traversal import densest_members

    return densest_members(copart_graph(sf_dir), QCFG, rounds=1)


def copart_densest4_q(sf_dir: str) -> pa.Table:
    """Densest-subgraph greedy-peel census (Bahmani et al. 2012,
    ε = 1/2 integer predicate) over the co-purchase graph → per-round
    (rnd, n_vertices, n_edges) density trajectory, 4 rounds."""
    from .traversal import densest_census

    return densest_census(copart_graph(sf_dir), QCFG, rounds=4)


def copart_wl2_q(sf_dir: str) -> "ray.data.Dataset | pa.Table":
    """Weisfeiler–Leman color-class histogram after 2 refinement
    rounds from degree colors → (wl_color, n_vertices): the structural
    role partition (vertices sharing a color are indistinguishable to
    any 2-layer message-passing computation)."""
    from ray.data.aggregate import Count

    from ..util import bucketed_aggregate, compact_nonempty
    from .wl import wl_colors

    g = copart_graph(sf_dir)
    cols = wl_colors(g, QCFG, rounds=2)
    empty = pa.table(
        {"wl_color": pa.array([], pa.string()),
         "n_vertices": pa.array([], pa.int64())}
    )
    if isinstance(cols, pa.Table):
        return empty
    out = compact_nonempty(
        bucketed_aggregate(
            cols.select_columns(["wl_color"]),
            key_cols=["wl_color"],
            aggs=[("wl_color", "count", "n_vertices")],
        )
    )
    if out is None:
        return empty
    return out.map_batches(
        lambda t: pa.table(
            {"wl_color": t.column("wl_color"),
             "n_vertices": t.column("n_vertices").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    ).sort("wl_color")


def copart_jdm_q(sf_dir: str) -> pa.Table:
    """Joint degree matrix of the co-purchase graph: per undirected
    edge, the unordered pair of capped (≤256) endpoint degrees, counted
    → (deg_a, deg_b, n_edges)."""
    from .linkpred import joint_degree_matrix

    return joint_degree_matrix(copart_graph(sf_dir), QCFG, cap=256)


def copart_lpa4_q(sf_dir: str) -> "ray.data.Dataset":
    """UNSEEDED label-propagation communities (classic LPA, 4 fixed
    synchronous rounds, labels start at own vid, most-frequent /
    smallest-label ties) over the copart graph → (url, community).
    Part urls are zero-padded, so vid order == url order == partkey
    order and the SQL oracle can propagate partkeys directly."""
    from .labelprop import lpa_communities

    g = copart_graph(sf_dir)
    return (
        lpa_communities(g, QCFG, rounds=4)
        .select_columns(["url", "community"])
        .sort("url")
    )


def copart_shells6_q(sf_dir: str) -> "ray.data.Dataset":
    """k-shell decomposition of the co-purchase graph under fixed-round
    semantics: shell(v) = max k ≤ 6 such that v survives 8 peel rounds
    of k-core peeling (the coreness number wherever every peel
    converges within 8 rounds) → (url, shell)."""
    from .traversal import kshells

    g = copart_graph(sf_dir)
    out = kshells(g, QCFG, k_max=6, rounds=8)
    if isinstance(out, pa.Table):
        return out
    return out.sort("url")


def copart_adamic_q(sf_dir: str) -> "ray.data.Dataset":
    """Adamic–Adar link prediction over the copart graph: every
    unordered vertex pair with ≥2 common neighbors, with the
    common-neighbor count and Σ 1/ln(deg(w)) score (9dp)."""
    from .linkpred import adamic_adar_pairs

    return adamic_adar_pairs(
        copart_graph(sf_dir), QCFG, min_cn=2
    ).sort(["url_a", "url_b"])


def copart_clustering_q(sf_dir: str) -> "ray.data.Dataset":
    """Local clustering coefficient per vertex (9dp), from the
    engine's distributed triangle counts + degree Dataset."""
    from .linkpred import clustering_coefficients

    g = copart_graph(sf_dir)
    return (
        clustering_coefficients(g, QCFG)
        .select_columns(["url", "lcc"])
        .sort("url")
    )


def doc_reciprocity_q(sf_dir: str) -> pa.Table:
    """Directed-link reciprocity of the extracted doc graph — one-row
    (n_edges, n_reciprocal, reciprocity)."""
    from .linkpred import edge_reciprocity

    return edge_reciprocity(doc_edges_q(sf_dir))


def copart_ppr12_q(sf_dir: str) -> "ray.data.Dataset":
    """Personalized PageRank (teleport to the 5 lexicographically
    smallest urls), fixed 12 iterations, 9dp — unrolled-CTE oracle."""
    from .pagerank import pagerank

    cfg = EngineConfig(num_partitions=8, max_iterations=12, pagerank_tol=0)
    g = copart_sym_graph(sf_dir)
    if g.num_vertices == 0:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "rank": pa.array([], pa.float64())}
        ))
    seeds = [
        r["vid"]
        for r in g.vertices.sort("url").limit(5).take(5)
    ]
    p = np.zeros(g.num_vertices, dtype=np.float64)
    p[np.asarray(seeds, dtype=np.int64)] = 1.0 / len(seeds)
    pr = pagerank(g, cfg, mode="broadcast", restart=p)

    def roundr(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t["url"], "rank": pc.round(t["rank"], 9)}
        )

    return pr.map_batches(roundr, batch_format="pyarrow").sort("url")


def copart_stats_q(sf_dir: str) -> pa.Table:
    """Whole-graph summary statistics in one row: vertex/edge/triangle
    counts, global clustering coefficient (transitivity = 3T / wedges)
    and degree assortativity (Pearson r of endpoint degrees over the
    symmetrized edge list, computed from EXACT integer sufficient
    statistics so the SQL oracle reproduces the identical doubles)."""
    from ray.data.aggregate import Sum

    from .triangles import triangle_counts

    g = copart_graph(sf_dir)
    deg = degrees(g, "undirected").astype(np.int64)
    tri_sum = int(
        triangle_counts(g, QCFG).aggregate(
            Sum("triangles", alias_name="s")
        )["s"]
        or 0
    )
    T = tri_sum // 3  # per-vertex memberships triple-count each triangle
    W = int((deg * (deg - 1) // 2).sum())
    transitivity = (3.0 * T) / W if W else 0.0

    # assortativity sufficient statistics over both edge directions —
    # integer partials per batch, one scalar aggregation
    dref = ray.put(deg)

    def partial(t: pa.Table, _ref=dref) -> pa.Table:
        dg = ray.get(_ref)
        s = col_np(t, "src").astype(np.int64)
        d = col_np(t, "dst").astype(np.int64)
        x = np.concatenate([dg[s], dg[d]])
        y = np.concatenate([dg[d], dg[s]])
        return table_from_arrays(
            n=np.array([len(x)], dtype=np.int64),
            sx=np.array([int(x.sum())], dtype=np.int64),
            sy=np.array([int(y.sum())], dtype=np.int64),
            sxx=np.array([int((x * x).sum())], dtype=np.int64),
            syy=np.array([int((y * y).sum())], dtype=np.int64),
            sxy=np.array([int((x * y).sum())], dtype=np.int64),
        )

    agg = g.edges.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    n = float(agg["n"] or 0)
    sx, sy = float(agg["sx"] or 0), float(agg["sy"] or 0)
    sxx, syy = float(agg["sxx"] or 0), float(agg["syy"] or 0)
    sxy = float(agg["sxy"] or 0)
    denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    assort = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    return pa.table(
        {
            "n_vertices": pa.array([g.num_vertices], pa.int64()),
            "n_edges": pa.array([g.num_edges], pa.int64()),
            "n_triangles": pa.array([T], pa.int64()),
            "transitivity": pc.round(
                pa.array([transitivity], pa.float64()), 9
            ),
            "assortativity": pc.round(
                pa.array([assort], pa.float64()), 9
            ),
        }
    )


def copart_ball2_q(sf_dir: str) -> "ray.data.Dataset":
    """Distinct vertices within ≤2 hops per vertex (self included)."""
    from .linkpred import ball2_sizes

    return ball2_sizes(copart_graph(sf_dir), QCFG).sort("url")



def copart_ball2_hll_q(sf_dir: str) -> "ray.data.Dataset":
    """APPROXIMATE ball2 via per-vertex HyperLogLog sketches (p=10) —
    the power-law-safe path whose per-hub cost is capped at 2^p
    register rows (exact ball2's pair stream is Σ deg²). No SQL oracle:
    the estimate is deterministic but not SQL-expressible; accuracy is
    pinned by tests/test_linkpred.py's scalar HLL replay + error-bound
    tests against the exact operator."""
    from .linkpred import ball2_sizes_approx

    return ball2_sizes_approx(copart_graph(sf_dir), QCFG).sort("url")

def copart_wpagerank8_q(sf_dir: str) -> "ray.data.Dataset":
    """Weighted PageRank (edge weight 1+(ka+kb)%7, strength-normalized
    contributions), fixed 8 iterations, 9dp — recursive-CTE oracle."""
    from .pagerank import pagerank_weighted

    cfg = EngineConfig(num_partitions=8, max_iterations=8, pagerank_tol=0)
    g = copart_graph(sf_dir)
    pr = pagerank_weighted(g, copart_weighted_edges(sf_dir), cfg)

    def roundr(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t["url"], "rank": pc.round(t["rank"], 9)}
        )

    return pr.map_batches(roundr, batch_format="pyarrow").sort("url")


def copart_edge_jaccard_q(sf_dir: str) -> "ray.data.Dataset":
    """Neighborhood Jaccard per edge (networkx jaccard_coefficient
    semantics), zero-cn edges included."""
    from .linkpred import edge_jaccard

    return edge_jaccard(copart_graph(sf_dir), QCFG).sort(
        ["url_a", "url_b"]
    )


def doc_und_graph(sf_dir: str) -> Graph:
    """Undirected-canonical doc link graph: the directed link edges
    collapsed to distinct (lo, hi) url pairs (per-batch Arrow distinct
    combiner; build_graph's exact-dedup shuffle finishes globally) —
    the input shape the per-edge neighborhood kernels expect."""
    key = (sf_dir, "doc_und")
    if key not in _GRAPH_CACHE:

        def canon(t: pa.Table) -> pa.Table:
            a = t["src_url"].combine_chunks()
            b = t["dst_url"].combine_chunks()
            return pa.table(
                {
                    "src_url": pc.min_element_wise(a, b),
                    "dst_url": pc.max_element_wise(a, b),
                }
            ).group_by(["src_url", "dst_url"]).aggregate([])

        und = doc_edges_q(sf_dir).map_batches(canon, batch_format="pyarrow")
        _GRAPH_CACHE[key] = build_graph(und, QCFG)
    return _GRAPH_CACHE[key]


def doc_bridges_q(sf_dir: str) -> "ray.data.Dataset":
    """LOCAL BRIDGES (span > 2): link edges whose endpoints share NO
    common neighbor — removing one disconnects its endpoints beyond
    distance 2, the classic weak-tie signal on a web link graph.
    Exactly the cn == 0 rows of the gated per-edge Jaccard kernel
    (broadcast CSR wedge enumeration below the edge gate, vid-space
    two-column shuffle above it), so the filter inherits that kernel's
    scale path for free."""
    from .linkpred import edge_jaccard

    ej = edge_jaccard(doc_und_graph(sf_dir), QCFG)

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["cn"], 0)).select(["url_a", "url_b"])

    return ej.map_batches(keep, batch_format="pyarrow").sort(
        ["url_a", "url_b"]
    )


def copart_nbr_top3_q(sf_dir: str) -> "ray.data.Dataset":
    """Top-3 neighbors per vertex by (edge weight DESC, neighbor url
    ASC) with a 1..3 rank — the group-wise top-k operator applied to
    the weighted adjacency."""
    from ..util import compact_nonempty
    from .linkpred import _url_lookup_ref
    from .scoring import top_k_per_group

    g = copart_graph(sf_dir)
    wedges = copart_weighted_edges(sf_dir)
    uref = _url_lookup_ref(g)

    def both_urls(t: pa.Table, _uref=uref) -> pa.Table:
        urls = ray.get(_uref)
        s = col_np(t, "src").astype(np.int64)
        d = col_np(t, "dst").astype(np.int64)
        w = col_np(t, "w").astype(np.int64)
        return pa.table(
            {
                "url": pa.array(
                    np.concatenate([urls[s], urls[d]]), pa.string()
                ),
                "nbr": pa.array(
                    np.concatenate([urls[d], urls[s]]), pa.string()
                ),
                "w": pa.array(np.concatenate([w, w]), pa.int64()),
            }
        )

    adj = compact_nonempty(
        wedges.map_batches(both_urls, batch_format="pyarrow")
    )
    if adj is None:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "nbr": pa.array([], pa.string()),
             "w": pa.array([], pa.int64()),
             "rnk": pa.array([], pa.int64())}
        ))
    return top_k_per_group(
        adj, group_col="url", order_col="w", tiebreak_col="nbr", k=3
    ).sort(["url", "rnk"])


def copart_weighted_edges(sf_dir: str) -> "ray.data.Dataset":
    """Weighted copart edges in vid space: w = 1 + (ka + kb) % 7 from
    the two endpoint part keys (parsed back out of the urls so the SQL
    oracle can recompute the identical weight from pa_/pb_)."""
    from ..util import compact_nonempty

    g = copart_graph(sf_dir)

    def keyed(t: pa.Table) -> pa.Table:
        key = pc.cast(
            pc.utf8_slice_codeunits(t["url"], 7, 32), pa.int64()
        )
        return pa.table({"kvid": t["vid"], "key": key})

    _W_EMPTY = pa.table(
        {"src": pa.array([], pa.int64()),
         "dst": pa.array([], pa.int64()),
         "w": pa.array([], pa.int64())}
    )
    vk = compact_nonempty(
        g.vertices.map_batches(keyed, batch_format="pyarrow")
    )
    e = compact_nonempty(g.edges.select_columns(["src", "dst"]))
    if vk is None or e is None:
        return ray.data.from_arrow(_W_EMPTY)
    a = compact_nonempty(
        e.join(
            vk, join_type="inner", num_partitions=QCFG.num_partitions,
            on=("src",), right_on=("kvid",),
        ).map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "src"), dst=col_np(t, "dst"),
                ka=col_np(t, "key"),
            ),
            batch_format="pyarrow",
        )
    )
    if a is None:
        return ray.data.from_arrow(_W_EMPTY)
    out = compact_nonempty(
        a.join(
            vk, join_type="inner", num_partitions=QCFG.num_partitions,
            on=("dst",), right_on=("kvid",),
        ).map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "src"), dst=col_np(t, "dst"),
                w=1 + (col_np(t, "ka") + col_np(t, "key")) % 7,
            ),
            batch_format="pyarrow",
        )
    )
    if out is None:
        return ray.data.from_arrow(_W_EMPTY)
    return out


def copart_sssp16_q(sf_dir: str) -> "ray.data.Dataset":
    """Weighted shortest-path cost from the lexicographically smallest
    part url, fixed 16 relaxation rounds (min cost over paths of ≤ 16
    edges — the bounded recursive-CTE oracle's exact trajectory)."""
    from ray.data.aggregate import Min

    from .traversal import sssp_distances

    g = copart_graph(sf_dir)
    wedges = copart_weighted_edges(sf_dir)
    seed = g.vertices.aggregate(Min("url", alias_name="m"))["m"]
    return sssp_distances(g, [seed], wedges, QCFG, rounds=16).sort("url")


def copart_avg_nbr_deg_q(sf_dir: str) -> "ray.data.Dataset":
    """Average-neighbor-degree curve k_nn(k) — the degree-mixing
    profile (assortative graphs rise, disassortative web/co-purchase
    graphs fall): for every degree value k, the mean degree of
    neighbors of degree-k vertices. Complements the scalar Pearson
    assortativity in copart_stats with the full curve.

    Scale shape: per-vertex degrees come from the Dataset-native
    degree kernel (no driver arrays), attached to both edge endpoints
    by two hash joins, then ONE bucketed sum keyed by the (few)
    distinct degree values. Integer sufficient statistics; the single
    float division happens after aggregation, so the DuckDB oracle is
    bit-exact."""
    from ..stages.graph_build import degree_dataset
    from ..util import bucketed_sum_aggregate, compact_nonempty

    g = copart_graph(sf_dir)
    e = g.edges.select_columns(["src", "dst"])
    und = e.map_batches(
        lambda t: pa.table({"a": t["src"], "b": t["dst"]}),
        batch_format="pyarrow",
    ).union(
        e.map_batches(
            lambda t: pa.table({"a": t["dst"], "b": t["src"]}),
            batch_format="pyarrow",
        )
    )
    deg_nbr = degree_dataset(g, "undirected", col="dnbr")
    deg_self = degree_dataset(g, "undirected", col="degree")
    und_c = compact_nonempty(und)
    dn_c = compact_nonempty(deg_nbr)
    ds_c = compact_nonempty(deg_self)
    if und_c is None or dn_c is None or ds_c is None:
        return ray.data.from_arrow(pa.table(
            {"degree": pa.array([], pa.int64()),
             "avg_nbr_deg": pa.array([], pa.float64())}
        ))
    j = (
        und_c
        .join(
            dn_c, join_type="inner",
            num_partitions=QCFG.num_partitions,
            on=("b",), right_on=("vid",),
        )
        .select_columns(["a", "dnbr"])
        .join(
            ds_c, join_type="inner",
            num_partitions=QCFG.num_partitions,
            on=("a",), right_on=("vid",),
        )
        .select_columns(["degree", "dnbr"])
    )
    agg = bucketed_sum_aggregate(
        j, key_cols=["degree"], sum_cols=["dnbr"], count_col="c"
    )

    def finalize(t: pa.Table) -> pa.Table:
        s = col_np(t, "dnbr").astype(np.float64)
        c = col_np(t, "c").astype(np.float64)
        return pa.table(
            {
                "degree": t["degree"],
                "avg_nbr_deg": pc.round(pa.array(s / c), 9),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("degree")


def doc_degree_corr_q(sf_dir: str) -> pa.Table:
    """Hub-vs-authority degree mixing of the DIRECTED doc link graph:
    Pearson correlation of (in-degree, out-degree) across vertices —
    one row (n_vertices, corr). Computed from EXACT integer sufficient
    statistics (per-batch partials, one scalar aggregation) so the SQL
    oracle reproduces the identical doubles; same discipline as
    copart_stats' assortativity."""
    from ray.data.aggregate import Sum

    from ..stages.graph_build import degree_dataset
    from ..util import compact_nonempty

    g = doc_graph(sf_dir)
    din_c = compact_nonempty(degree_dataset(g, "in", col="din"))
    dout_c = compact_nonempty(degree_dataset(g, "out", col="dout"))
    if din_c is None or dout_c is None:
        return pa.table(
            {"n_vertices": pa.array([0], pa.int64()),
             "corr": pa.array([0.0], pa.float64())}
        )
    dj = din_c.join(
        dout_c,
        join_type="inner", num_partitions=QCFG.num_partitions,
        on=("vid",), right_on=("vid",),
    )

    def partial(t: pa.Table) -> pa.Table:
        x = col_np(t, "din").astype(np.int64)
        y = col_np(t, "dout").astype(np.int64)
        return table_from_arrays(
            n=np.array([len(x)], dtype=np.int64),
            sx=np.array([int(x.sum())], dtype=np.int64),
            sy=np.array([int(y.sum())], dtype=np.int64),
            sxx=np.array([int((x * x).sum())], dtype=np.int64),
            syy=np.array([int((y * y).sum())], dtype=np.int64),
            sxy=np.array([int((x * y).sum())], dtype=np.int64),
        )

    agg = dj.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
        Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
        Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    n = float(agg["n"] or 0)
    sx, sy = float(agg["sx"] or 0), float(agg["sy"] or 0)
    sxx, syy = float(agg["sxx"] or 0), float(agg["syy"] or 0)
    sxy = float(agg["sxy"] or 0)
    denom = np.sqrt(n * sxx - sx * sx) * np.sqrt(n * syy - sy * sy)
    corr = (n * sxy - sx * sy) / denom if denom > 0 else 0.0
    return pa.table(
        {
            "n_vertices": pa.array([int(agg["n"] or 0)], pa.int64()),
            "corr": pc.round(pa.array([corr], pa.float64()), 9),
        }
    )


def copart_squares_q(sf_dir: str) -> pa.Table:
    """Global 4-cycle (rectangle) census of the co-purchase graph → one
    row (n_codeg_pairs, n_wedge_pairs, n_squares). The square-counting
    identity: every unordered vertex pair {u,w} with c common neighbors
    closes C(c,2) wedge pairs, and each 4-cycle is counted once per
    diagonal pair → n_squares = Σ C(codeg,2) / 2 (Chiba–Nishizeki
    rectangle counting, the motif one step past the triangle kernel at
    stages/graph_build's reference lineage src/imtag.cpp:61-141).

    Scale shape: the codegree table is built exactly like the triangle
    wedge join — symmetrized edges self-joined on the MIDDLE vertex
    (hash-partitioned, never broadcast), collapsed by the bucketed
    Arrow aggregation (pair cardinality can approach V²/2, Ray's raw
    groupby must not see it), then reduced to three scalars via
    per-batch integer partials. Nothing vertex- or edge-sized ever
    lands on the driver; integer sufficient statistics make the DuckDB
    oracle bit-exact."""
    from ray.data.aggregate import Sum

    from ..util import bucketed_sum_aggregate, compact_nonempty

    g = copart_graph(sf_dir)
    e = g.edges.select_columns(["src", "dst"])
    und = e.map_batches(
        lambda t: pa.table({"m": t["src"], "x": t["dst"]}),
        batch_format="pyarrow",
    ).union(
        e.map_batches(
            lambda t: pa.table({"m": t["dst"], "x": t["src"]}),
            batch_format="pyarrow",
        )
    )
    right = e.map_batches(
        lambda t: pa.table({"m": t["src"], "x2": t["dst"]}),
        batch_format="pyarrow",
    ).union(
        e.map_batches(
            lambda t: pa.table({"m": t["dst"], "x2": t["src"]}),
            batch_format="pyarrow",
        )
    )
    und_c = compact_nonempty(und)
    right_c = compact_nonempty(right)
    if und_c is None or right_c is None:
        return pa.table(
            {"n_codeg_pairs": pa.array([0], pa.int64()),
             "n_wedge_pairs": pa.array([0], pa.int64()),
             "n_squares": pa.array([0], pa.int64())}
        )
    wedges = und_c.join(
        right_c, join_type="inner",
        num_partitions=QCFG.num_partitions, on=("m",),
    )

    def ends(t: pa.Table) -> pa.Table:
        u = col_np(t, "x").astype(np.int64)
        w = col_np(t, "x2").astype(np.int64)
        m = u < w
        return table_from_arrays(u=u[m], w=w[m])

    codeg = bucketed_sum_aggregate(
        wedges.map_batches(ends, batch_format="pyarrow"),
        key_cols=["u", "w"], sum_cols=[], count_col="c",
    )

    def partial(t: pa.Table) -> pa.Table:
        c = col_np(t, "c").astype(np.int64)
        return table_from_arrays(
            np_=np.array([t.num_rows], dtype=np.int64),
            wp=np.array([int((c * (c - 1) // 2).sum())], dtype=np.int64),
        )

    agg = codeg.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("np_", alias_name="np_"), Sum("wp", alias_name="wp")
    )
    n_pairs = int(agg["np_"] or 0)
    wedge_pairs = int(agg["wp"] or 0)
    return pa.table(
        {
            "n_codeg_pairs": pa.array([n_pairs], pa.int64()),
            "n_wedge_pairs": pa.array([wedge_pairs], pa.int64()),
            # each 4-cycle has two diagonal pairs → exactly even
            "n_squares": pa.array([wedge_pairs // 2], pa.int64()),
        }
    )


def copart_deg_hist_q(sf_dir: str) -> "ray.data.Dataset":
    """Degree DISTRIBUTION of the co-purchase graph → (degree,
    n_vertices). Two-level collapse: per-vertex degrees come from the
    Dataset-native degree kernel (no driver state), then the histogram
    itself is a per-batch sparse partial count over degree values —
    the only shuffle carries ≤ |distinct degrees| × blocks rows, the
    standard scale-free-graph histogram shape (power-law tail: few
    distinct degrees, heavy counts)."""
    from ray.data.aggregate import Sum

    from ..stages.graph_build import degree_dataset
    from ..util import sparse_sum_reduce

    g = copart_graph(sf_dir)
    deg = degree_dataset(g, "undirected")

    def partial(t: pa.Table) -> pa.Table:
        k, s = sparse_sum_reduce(
            col_np(t, "degree"), np.ones(t.num_rows, dtype=np.int64)
        )
        return table_from_arrays(degree=k, n_vertices=s)

    return (
        deg.map_batches(partial, batch_format="pyarrow")
        .groupby("degree")
        .aggregate(Sum("n_vertices", alias_name="n_vertices"))
        .sort("degree")
    )


def geo_modularity_q(sf_dir: str) -> "ray.data.Dataset":
    """Per-community MODULARITY decomposition of the labelprop
    communities on the geo star graph → (label, n_intra, deg_sum, q_c)
    with q_c = n_intra/m − (deg_sum/2m)²; Σ q_c is Newman's Q. Intra
    counts come from two hash joins of the (vid, label) Dataset onto
    the edge table; degree mass per community is the Dataset-native
    degree kernel joined to labels — community cardinality is tiny
    (one per region), so the final groupby is cheap by construction
    while every E/V-sized step stays distributed."""
    from ray.data.aggregate import Count, Sum

    from ..stages.graph_build import degree_dataset
    from ..util import compact_nonempty
    from .labelprop import label_propagation

    g = build_graph(geo_edge_urls(sf_dir), QCFG)
    from ..util import to_pandas_typed

    regions = to_pandas_typed(_read(sf_dir, "region", columns=["r_regionkey"]))
    seeds = {
        f"r://{int(k):04d}": f"region_{int(k):04d}"
        for k in regions["r_regionkey"]
    }
    labels = compact_nonempty(
        label_propagation(g, seeds, QCFG).select_columns(["vid", "label"])
    )
    edges_c = compact_nonempty(g.edges)
    if labels is None or edges_c is None:
        return ray.data.from_arrow(pa.table(
            {"label": pa.array([], pa.string()),
             "n_intra": pa.array([], pa.int64()),
             "deg_sum": pa.array([], pa.int64()),
             "q_c": pa.array([], pa.float64())}
        ))
    m = float(g.num_edges)

    j1 = compact_nonempty(
        edges_c.join(
            labels.rename_columns({"vid": "sv", "label": "lab_s"}),
            join_type="inner", num_partitions=QCFG.num_partitions,
            on=("src",), right_on=("sv",),
        )
    )
    intra = None
    if j1 is not None:
        j2 = compact_nonempty(
            j1.join(
                labels.rename_columns({"vid": "dv", "label": "lab_d"}),
                join_type="inner", num_partitions=QCFG.num_partitions,
                on=("dst",), right_on=("dv",),
            )
        )
        if j2 is not None:
            intra = compact_nonempty(
                j2.map_batches(
                    lambda t: t.filter(
                        pc.equal(t.column("lab_s"), t.column("lab_d"))
                    ),
                    batch_format="pyarrow",
                )
                .groupby("lab_s")
                .aggregate(Count(alias_name="n_intra"))
            )
    deg_c = compact_nonempty(degree_dataset(g, "undirected"))
    degmass = (
        compact_nonempty(
            deg_c.join(
                labels, join_type="inner",
                num_partitions=QCFG.num_partitions,
                on=("vid",), right_on=("vid",),
            )
        )
        if deg_c is not None
        else None
    )
    if degmass is None:
        return ray.data.from_arrow(pa.table(
            {"label": pa.array([], pa.string()),
             "n_intra": pa.array([], pa.int64()),
             "deg_sum": pa.array([], pa.int64()),
             "q_c": pa.array([], pa.float64())}
        ))
    degmass = degmass.groupby("label").aggregate(
        Sum("degree", alias_name="deg_sum")
    )
    if intra is None:
        joined = degmass.map_batches(
            lambda t: t.append_column(
                "n_intra",
                pa.array(np.zeros(t.num_rows, dtype=np.int64)),
            ),
            batch_format="pyarrow",
        )
    else:
        joined = compact_nonempty(degmass).join(
            intra, join_type="left_outer", num_partitions=4,
            on=("label",), right_on=("lab_s",),
        )

    def fin(t: pa.Table, _m=m) -> pa.Table:
        ni = pc.coalesce(t.column("n_intra"), pa.scalar(0, pa.int64()))
        dsum = col_np(t, "deg_sum").astype(np.float64)
        niv = np.asarray(pc.cast(ni, pa.int64()))
        q_c = niv / _m - (dsum / (2.0 * _m)) ** 2
        return pa.table(
            {
                "label": t.column("label"),
                "n_intra": pc.cast(ni, pa.int64()),
                "deg_sum": pc.cast(t.column("deg_sum"), pa.int64()),
                "q_c": pc.round(pa.array(q_c, pa.float64()), 9),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow").sort("label")


def copart_truss4_q(sf_dir: str) -> "ray.data.Dataset | pa.Table":
    """4-truss of the co-purchase graph after 3 fixed peel rounds →
    (url_a, url_b, support) with support recomputed in the final
    subgraph (exact unrolled-CTE oracle trajectory)."""
    from .truss import ktruss_edges

    g = copart_graph(sf_dir)
    out = ktruss_edges(g, k=4, rounds=3, cfg=QCFG)
    if isinstance(out, pa.Table):
        return out
    return out.sort(["url_a", "url_b"])


def copart_richclub_q(sf_dir: str) -> pa.Table:
    """Rich-club coefficient curve of the co-purchase graph →
    (k, n_nodes, n_edges, phi) for k = 0..63 where the >k subgraph has
    ≥2 vertices."""
    from .linkpred import rich_club_curve

    return rich_club_curve(copart_graph(sf_dir), QCFG, max_k=64)


def copart_diam16_q(sf_dir: str) -> pa.Table:
    """Pseudo-diameter of the co-purchase graph by the classic
    double-sweep BFS: sweep 1 from the lexicographically smallest url,
    sweep 2 from the farthest vertex of sweep 1 (ties → smallest url);
    each sweep runs 16 fixed relaxation rounds so the bounded
    recursive-CTE oracle replays it exactly. One row (src_url, mid_url,
    dst_url, diameter). Both argmax picks are LIMIT-1 sorts of the
    (url, dist) Dataset — the only driver materialization is 1 row."""
    from ray.data.aggregate import Min

    from .traversal import bfs_distances

    g = copart_graph(sf_dir)
    if g.num_vertices == 0:
        return pa.table(
            {"src_url": pa.array([], pa.string()),
             "mid_url": pa.array([], pa.string()),
             "dst_url": pa.array([], pa.string()),
             "diameter": pa.array([], pa.int64())}
        )
    seed = g.vertices.aggregate(Min("url", alias_name="m"))["m"]
    d1 = bfs_distances(g, [seed], QCFG, rounds=16)
    far1 = d1.sort(["dist", "url"], descending=[True, False]).limit(1).take(1)[0]
    d2 = bfs_distances(g, [far1["url"]], QCFG, rounds=16)
    far2 = d2.sort(["dist", "url"], descending=[True, False]).limit(1).take(1)[0]
    return pa.table(
        {
            "src_url": pa.array([seed], pa.string()),
            "mid_url": pa.array([far1["url"]], pa.string()),
            "dst_url": pa.array([far2["url"]], pa.string()),
            "diameter": pa.array([int(far2["dist"])], pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# host/source-level graph aggregation (the Common-Crawl "domain graph")
# ---------------------------------------------------------------------------


def _url_doc_ids(arr: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """doc_id parsed from 'https://docs.example/d<ID>' urls, vectorized
    (pyarrow slice + cast — no per-row Python)."""
    pre = len("https://docs.example/d")
    a = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    return pc.cast(
        pc.utf8_slice_codeunits(a, pre, 1 << 30), pa.int64()
    ).to_numpy(zero_copy_only=False)


def _source_edge_matrix(sf_dir: str) -> "ray.data.Dataset":
    """Distinct doc-graph edges attributed to their endpoint SOURCES →
    (src_source, dst_source, n_links): the domain-graph aggregation web
    corpora publish (Common Crawl's host/domain-level graph). The
    doc→source map is V-sized, so attribution is TWO hash-partitioned
    joins against the documents table — never a driver-side lookup —
    and the final matrix is |sources|² rows.

    Reference tie-in: this is the quotient-graph shape of
    imtag's component summarization (rows_to_components collapses
    pixel-level structure to component level; here links collapse to
    source level)."""
    from ..util import bucketed_sum_aggregate, compact_nonempty

    edges = doc_edges_q(sf_dir)

    def ids(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            src_id=_url_doc_ids(t.column("src_url")),
            dst_id=_url_doc_ids(t.column("dst_url")),
        )

    eids = compact_nonempty(
        edges.map_batches(ids, batch_format="pyarrow").materialize()
    )
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    src_map = compact_nonempty(
        docs.map_batches(
            lambda t: pa.table(
                {"src_id": t.column("doc_id").cast(pa.int64()),
                 "src_source": t.column("source").cast(pa.string())}
            ),
            batch_format="pyarrow",
        ).materialize()
    )
    dst_map = compact_nonempty(
        docs.map_batches(
            lambda t: pa.table(
                {"dst_id": t.column("doc_id").cast(pa.int64()),
                 "dst_source": t.column("source").cast(pa.string())}
            ),
            batch_format="pyarrow",
        ).materialize()
    )
    if eids is None or src_map is None or dst_map is None:
        return ray.data.from_arrow(pa.table(
            {"src_source": pa.array([], pa.string()),
             "dst_source": pa.array([], pa.string()),
             "n_links": pa.array([], pa.int64())}
        ))
    attributed = (
        eids.join(
            src_map, join_type="inner",
            num_partitions=QCFG.num_partitions, on=("src_id",),
        )
        .materialize()  # two fused JoinOperators can deadlock (Ray 2.49)
        .join(
            dst_map, join_type="inner",
            num_partitions=QCFG.num_partitions, on=("dst_id",),
        )
    )
    out = bucketed_sum_aggregate(
        attributed.select_columns(["src_source", "dst_source"]),
        key_cols=["src_source", "dst_source"],
        sum_cols=[], count_col="n_links",
    )
    return out.map_batches(
        lambda t: pa.table(
            {"src_source": t.column("src_source"),
             "dst_source": t.column("dst_source"),
             "n_links": t.column("n_links").cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def doc_source_graph_q(sf_dir: str) -> "ray.data.Dataset":
    """→ (src_source, dst_source, n_links), ordered: the source-level
    (domain-level) aggregation of the extracted doc link graph."""
    return _source_edge_matrix(sf_dir).sort(["src_source", "dst_source"])


def doc_source_cut_q(sf_dir: str) -> "ray.data.Dataset":
    """Per-source partition cut statistics → (source, n_internal,
    n_out_cut, n_in_cut, volume): the conductance ingredients
    (cut / volume) for the partition of the doc graph induced by the
    source column — the standard "how self-contained is each domain"
    curation signal. Derived entirely from the |sources|² source
    matrix, so the per-source reduction shuffles O(|sources|²) rows
    regardless of E."""
    from ..util import bucketed_aggregate

    m = _source_edge_matrix(sf_dir)

    def sides(t: pa.Table) -> pa.Table:
        s = t.column("src_source").to_numpy(zero_copy_only=False)
        d = t.column("dst_source").to_numpy(zero_copy_only=False)
        n = col_np(t, "n_links").astype(np.int64)
        internal = s == d
        z = np.zeros(len(n), dtype=np.int64)
        # src perspective: internal counts once, else an out-cut edge
        src_rows = pa.table(
            {"source": pa.array(s, pa.string()),
             "n_internal": pa.array(np.where(internal, n, z)),
             "n_out_cut": pa.array(np.where(internal, z, n)),
             "n_in_cut": pa.array(z)}
        )
        # dst perspective for CROSS edges only (internal already booked)
        x = ~internal
        dst_rows = pa.table(
            {"source": pa.array(d[x], pa.string()),
             "n_internal": pa.array(z[x]),
             "n_out_cut": pa.array(z[x]),
             "n_in_cut": pa.array(n[x])}
        )
        return pa.concat_tables([src_rows, dst_rows])

    agg = bucketed_aggregate(
        m.map_batches(sides, batch_format="pyarrow"),
        key_cols=["source"],
        aggs=[("n_internal", "sum", "n_internal"),
              ("n_out_cut", "sum", "n_out_cut"),
              ("n_in_cut", "sum", "n_in_cut")],
    )

    def finish(t: pa.Table) -> pa.Table:
        i = col_np(t, "n_internal").astype(np.int64)
        o = col_np(t, "n_out_cut").astype(np.int64)
        e = col_np(t, "n_in_cut").astype(np.int64)
        return pa.table(
            {"source": t.column("source"),
             "n_internal": pa.array(i), "n_out_cut": pa.array(o),
             "n_in_cut": pa.array(e), "volume": pa.array(2 * i + o + e)}
        )

    return agg.map_batches(finish, batch_format="pyarrow").sort("source")


def doc_cocitation_q(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    """Top-k CO-CITED page pairs → (url_a, url_b, n_cociting): pairs of
    targets linked by the same source page, weighted by the number of
    distinct co-citing pages (Small 1973 — the similarity signal SALSA's
    authority projection walks; doc_salsa consumes this same projection
    implicitly). Hash-partitioned self-join on the citing page + a
    bucketed two-column pair count (no arithmetic a*V+b key, so no
    int64 overflow at web-scale V)."""
    from ..util import bucketed_sum_aggregate

    edges = doc_edges_q(sf_dir)

    def ids(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            src_id=_url_doc_ids(t.column("src_url")),
            a=_url_doc_ids(t.column("dst_url")),
        )

    from ..util import compact_nonempty

    eids = compact_nonempty(
        edges.map_batches(ids, batch_format="pyarrow").materialize()
    )
    if eids is None:
        return ray.data.from_arrow(pa.table(
            {"url_a": pa.array([], pa.string()),
             "url_b": pa.array([], pa.string()),
             "n_cociting": pa.array([], pa.int64())}
        ))
    right = eids.map_batches(
        lambda t: pa.table({"src_id": t.column("src_id"),
                            "b": t.column("a")}),
        batch_format="pyarrow",
    )
    pairs = eids.join(
        right, join_type="inner",
        num_partitions=QCFG.num_partitions, on=("src_id",),
    )

    def canon(t: pa.Table) -> pa.Table:
        a = col_np(t, "a").astype(np.int64)
        b = col_np(t, "b").astype(np.int64)
        m = a < b
        # within-batch combiner: ONE Arrow C++ hash group-by
        part = pa.table({"a": pa.array(a[m]), "b": pa.array(b[m])})
        return part.group_by(["a", "b"]).aggregate([([], "count_all")]
        ).rename_columns(["a", "b", "w"])

    agg = bucketed_sum_aggregate(
        pairs.map_batches(canon, batch_format="pyarrow"),
        key_cols=["a", "b"], sum_cols=["w"],
    )

    def to_urls(t: pa.Table) -> pa.Table:
        ida = col_np(t, "a").astype(np.int64)
        idb = col_np(t, "b").astype(np.int64)
        ua = np.char.add("https://docs.example/d", ida.astype(str))
        ub = np.char.add("https://docs.example/d", idb.astype(str))
        return pa.table(
            {"url_a": pa.array(ua, pa.string()),
             "url_b": pa.array(ub, pa.string()),
             "n_cociting": t.column("w").cast(pa.int64())}
        )

    return (
        agg.map_batches(to_urls, batch_format="pyarrow")
        .sort(["n_cociting", "url_a", "url_b"],
              descending=[True, False, False])
        .limit(k)
    )


def copart_bfs_tree12_q(sf_dir: str) -> "ray.data.Dataset":
    """BFS shortest-path TREE from the lexicographically smallest part
    url, 12 fixed relaxation rounds → (url, dist, parent_url) over
    reached vertices: parent = the lexicographically smallest neighbor
    one hop closer to the seed (the deterministic predecessor a path
    reconstruction walks; the seed points at itself). copart_bfs12 is
    the distance view; this adds the routing structure.

    Scale shape: distances from the gated bfs_distances kernel; the
    parent choice is ONE pass over the (both-direction) edge stream —
    two vid-keyed hash joins attach endpoint distances, a batch-side
    min combiner + bucketed vid min pick the parent (min vid == min
    url: part urls are zero-padded) — then vid-unique joins attach
    urls. No driver state, no string shuffle keys."""
    from ray.data.aggregate import Min

    from ..util import bucketed_aggregate, compact_nonempty
    from .traversal import bfs_distances

    g = copart_graph(sf_dir)
    if g.num_vertices == 0:
        return ray.data.from_arrow(pa.table(
            {"url": pa.array([], pa.string()),
             "dist": pa.array([], pa.int64()),
             "parent_url": pa.array([], pa.string())}
        ))
    seed = g.vertices.aggregate(Min("url", alias_name="m"))["m"]
    dist = bfs_distances(g, [seed], QCFG, rounds=12)
    dvert = compact_nonempty(g.vertices.materialize())
    distv = compact_nonempty(
        dist.join(
            dvert, join_type="inner", num_partitions=QCFG.num_partitions,
            on=("url",),
        ).materialize()
    )  # (url, dist, vid)
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "dist": pa.array([], pa.int64()),
         "parent_url": pa.array([], pa.string())}
    )
    if distv is None:
        return ray.data.from_arrow(empty)

    p_side = distv.map_batches(
        lambda t: table_from_arrays(
            u=col_np(t, "vid"), udist=col_np(t, "dist")
        ),
        batch_format="pyarrow",
    ).materialize()
    c_side = distv.map_batches(
        lambda t: table_from_arrays(
            v=col_np(t, "vid"), vdist=col_np(t, "dist")
        ),
        batch_format="pyarrow",
    ).materialize()

    und = g.edges.map_batches(
        lambda t: table_from_arrays(
            u=np.concatenate([col_np(t, "src"), col_np(t, "dst")]),
            v=np.concatenate([col_np(t, "dst"), col_np(t, "src")]),
        ),
        batch_format="pyarrow",
    ).materialize()

    j = (
        compact_nonempty(und)
        .join(compact_nonempty(p_side), join_type="inner",
              num_partitions=QCFG.num_partitions, on=("u",))
        .materialize()
        .join(compact_nonempty(c_side), join_type="inner",
              num_partitions=QCFG.num_partitions, on=("v",))
    )

    def cand(t: pa.Table) -> pa.Table:
        u = col_np(t, "u")
        v = col_np(t, "v")
        ud = col_np(t, "udist")
        vd = col_np(t, "vdist")
        m = ud == vd - 1
        # within-batch combiner: min parent per child
        from ..util import sparse_min_reduce

        k, p = sparse_min_reduce(v[m], u[m])
        return table_from_arrays(vid=k, parent_vid=p)

    parent = compact_nonempty(
        bucketed_aggregate(
            j.map_batches(cand, batch_format="pyarrow"),
            key_cols=["vid"],
            aggs=[("parent_vid", "min", "parent_vid")],
        )
    )
    purls = dvert.map_batches(
        lambda t: pa.table(
            {"parent_vid": t.column("vid").cast(pa.int64()),
             "parent_url": t.column("url")}
        ),
        batch_format="pyarrow",
    ).materialize()
    if parent is not None:
        withp = compact_nonempty(
            parent.join(
                compact_nonempty(purls), join_type="inner",
                num_partitions=QCFG.num_partitions, on=("parent_vid",),
            ).select_columns(["vid", "parent_url"]).materialize()
        )
    else:
        withp = None

    if withp is None:
        out = distv.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "dist": t.column("dist").cast(pa.int64()),
                 "parent_url": t.column("url")}
            ),
            batch_format="pyarrow",
        )
        return out.sort("url")

    joined = distv.join(
        withp, join_type="left_outer",
        num_partitions=QCFG.num_partitions, on=("vid",),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"url": t.column("url"),
             "dist": t.column("dist").cast(pa.int64()),
             "parent_url": pc.coalesce(
                 t.column("parent_url"), t.column("url")
             )}
        )

    return joined.map_batches(finish, batch_format="pyarrow").sort("url")


def copart_bipartite12_q(sf_dir: str) -> pa.Table:
    """Bipartiteness census of the 12-round BFS ball around the
    smallest part url → ONE row (n_reached, n_even, n_odd,
    n_same_parity_edges, n_cross_parity_edges): 2-color by BFS-level
    parity and count edges whose endpoints agree vs differ — every
    same-parity edge witnesses an odd cycle (the ball is bipartite iff
    n_same_parity_edges = 0; the co-purchase graph is triangle-rich,
    so the census is non-degenerate).

    Scale shape: parity rides the gated bfs_distances output; edge
    classification is two vid-keyed hash joins over the canonical edge
    stream (each undirected edge once) + per-batch indicator partials,
    so the driver only ever sees five integers."""
    from ray.data.aggregate import Min, Sum

    from ..util import compact_nonempty
    from .traversal import bfs_distances

    g = copart_graph(sf_dir)
    z = pa.array([0], pa.int64())
    zeros = pa.table(
        {"n_reached": z, "n_even": z, "n_odd": z,
         "n_same_parity_edges": z, "n_cross_parity_edges": z}
    )
    if g.num_vertices == 0:
        return zeros
    seed = g.vertices.aggregate(Min("url", alias_name="m"))["m"]
    dist = bfs_distances(g, [seed], QCFG, rounds=12)
    distv = compact_nonempty(
        dist.join(
            compact_nonempty(g.vertices.materialize()),
            join_type="inner", num_partitions=QCFG.num_partitions,
            on=("url",),
        ).materialize()
    )
    if distv is None:
        return zeros
    n_reached = distv.count()
    n_odd = int(
        distv.map_batches(
            lambda t: pa.table(
                {"odd": pa.array(
                    [int((col_np(t, "dist") % 2).sum())], pa.int64())}
            ),
            batch_format="pyarrow",
        ).aggregate(Sum("odd", alias_name="s"))["s"]
    )
    pa_side = distv.map_batches(
        lambda t: table_from_arrays(
            src=col_np(t, "vid"), ps=col_np(t, "dist") % 2
        ),
        batch_format="pyarrow",
    ).materialize()
    pb_side = distv.map_batches(
        lambda t: table_from_arrays(
            dst=col_np(t, "vid"), pd_=col_np(t, "dist") % 2
        ),
        batch_format="pyarrow",
    ).materialize()
    j = (
        compact_nonempty(g.edges.materialize())
        .join(compact_nonempty(pa_side), join_type="inner",
              num_partitions=QCFG.num_partitions, on=("src",))
        .materialize()
        .join(compact_nonempty(pb_side), join_type="inner",
              num_partitions=QCFG.num_partitions, on=("dst",))
    )

    def partial(t: pa.Table) -> pa.Table:
        same = int((col_np(t, "ps") == col_np(t, "pd_")).sum())
        return pa.table(
            {"same": pa.array([same], pa.int64()),
             "cross": pa.array([t.num_rows - same], pa.int64())}
        )

    agg = j.map_batches(partial, batch_format="pyarrow").aggregate(
        Sum("same", alias_name="s"), Sum("cross", alias_name="c")
    )
    return pa.table(
        {"n_reached": pa.array([n_reached], pa.int64()),
         "n_even": pa.array([n_reached - n_odd], pa.int64()),
         "n_odd": pa.array([n_odd], pa.int64()),
         "n_same_parity_edges": pa.array([int(agg["s"] or 0)], pa.int64()),
         "n_cross_parity_edges": pa.array([int(agg["c"] or 0)], pa.int64())}
    )


def doc_components_inc_q(sf_dir: str) -> "ray.data.Dataset":
    """Connected components of the (undirected) bowtie doc graph,
    computed INCREMENTALLY: a base graph holding ~4/5 of the edges is
    labeled first, its url-keyed labels (connected_components_urls)
    warm-start the full graph's relabeling via
    connected_components_incremental — the crawl-delta workflow, graded
    by the driver against the FULL graph's closure oracle (warm starts
    must not change the fixpoint, only the round count).
    → (url, component_id), canonical min-url-ranked dense ids."""
    from .cc import connected_components_incremental, connected_components_urls

    def ids_of(t: pa.Table):
        return (
            _url_doc_ids(t.column("src_url")),
            _url_doc_ids(t.column("dst_url")),
        )

    def keep_bowtie(t: pa.Table) -> pa.Table:
        s, d = ids_of(t)
        return t.filter(pa.array((s + d) % 3 != 0))

    def keep_base(t: pa.Table) -> pa.Table:
        s, d = ids_of(t)
        return t.filter(pa.array((s * 7 + d) % 5 != 0))

    full_edges = doc_edges_q(sf_dir).map_batches(
        keep_bowtie, batch_format="pyarrow"
    ).materialize()
    g_base = build_graph(
        full_edges.map_batches(keep_base, batch_format="pyarrow"), QCFG
    )
    prior = connected_components_urls(g_base, QCFG)
    g_full = doc_bowtie_graph(sf_dir)
    return (
        connected_components_incremental(g_full, prior, QCFG)
        .select_columns(["url", "component_id"])
        .sort("url")
    )


def doc_walk_pairs_q(sf_dir: str, window: int = 2) -> "ray.data.Dataset":
    """Skip-gram co-occurrence pairs from the deterministic random
    walks — the DeepWalk/word2vec corpus-preparation stage (Perozzi et
    al. KDD 2014 feed walks into skip-gram): → (center_url,
    context_url, n_cooc) counting, over every 4-step walk, the ordered
    pairs (step s, step s+d) for d = 1..window. The walks are the
    splitmix64-replayable ones of doc_walks4, so the oracle re-derives
    the identical corpus and self-joins it.

    Scale shape: walk state is a Dataset (one row per visited step);
    the pair expansion is ONE hash-partitioned self-join on the walk
    id (≤ length+1 rows per key ⇒ ≤ (length+1)² join fanout per walk,
    a constant), and the count is a bucketed pair aggregate —
    url-pair cardinality never feeds Ray's groupby raw."""
    from ..util import bucketed_sum_aggregate, compact_nonempty
    from .walks import random_walks

    walks = random_walks(doc_graph(sf_dir), QCFG, length=4)
    left = walks.map_batches(
        lambda t: pa.table(
            {"wid": t["start_url"], "s_a": t["step"], "u_a": t["url"]}
        ),
        batch_format="pyarrow",
    )
    right = walks.map_batches(
        lambda t: pa.table(
            {"wid_b": t["start_url"], "s_b": t["step"], "u_b": t["url"]}
        ),
        batch_format="pyarrow",
    )
    lc, rc = compact_nonempty(left), compact_nonempty(right)
    if lc is None or rc is None:
        return ray.data.from_arrow(pa.table(
            {"center_url": pa.array([], pa.string()),
             "context_url": pa.array([], pa.string()),
             "n_cooc": pa.array([], pa.int64())}
        ))
    j = lc.join(
        rc, join_type="inner", num_partitions=QCFG.num_partitions,
        on=("wid",), right_on=("wid_b",),
    )

    def in_window(t: pa.Table, _w=window) -> pa.Table:
        d = (
            col_np(t, "s_b").astype(np.int64)
            - col_np(t, "s_a").astype(np.int64)
        )
        keep = (d >= 1) & (d <= _w)
        return pa.table(
            {"center_url": t.column("u_a").filter(pa.array(keep)),
             "context_url": t.column("u_b").filter(pa.array(keep))}
        )

    pairs = j.map_batches(in_window, batch_format="pyarrow")
    return bucketed_sum_aggregate(
        pairs, key_cols=["center_url", "context_url"],
        sum_cols=[], count_col="n_cooc",
    ).sort(["center_url", "context_url"])


def doc_sym_graph(sf_dir: str) -> Graph:
    """The undirected-canonical doc link graph with both edge
    directions materialized — the input shape the PageRank-family
    kernels expect for undirected ranking (each distinct {a, b} link
    contributes a→b and b→a exactly once)."""
    key = (sf_dir, "doc_sym")
    if key not in _GRAPH_CACHE:
        und = doc_und_graph(sf_dir)
        # reconstruct the canonical url pairs from the vid edges (the
        # V-sized url lookup is ray.put once, read per task)
        from .linkpred import _url_lookup_ref

        uref = _url_lookup_ref(und)

        def to_urls(t: pa.Table, _uref=uref) -> pa.Table:
            u = ray.get(_uref)
            return pa.table(
                {"src_url": pa.array(
                    u[col_np(t, "src").astype(np.int64)], pa.string()),
                 "dst_url": pa.array(
                    u[col_np(t, "dst").astype(np.int64)], pa.string())}
            )

        base = und.edges.map_batches(to_urls, batch_format="pyarrow")
        both = base.union(
            base.map_batches(
                lambda t: pa.table(
                    {"src_url": t["dst_url"], "dst_url": t["src_url"]}
                ),
                batch_format="pyarrow",
            )
        )
        _GRAPH_CACHE[key] = build_graph(both, QCFG)
    return _GRAPH_CACHE[key]


def doc_source_rank_q(sf_dir: str) -> "ray.data.Dataset":
    """Domain-authority aggregation → (source, n_docs, total_rank):
    12-iteration PageRank over the symmetrized doc link graph, per-doc
    ranks rounded to 9 dp, then summed per SOURCE (the host/domain
    aggregation web corpora publish next to the page-level ranks).
    Rounding BEFORE the sum pins both engines to identical addends, so
    the unordered float reduction cannot diverge at the 9-dp output.

    Scale shape: the rank table and the doc→source map meet in ONE
    hash-partitioned join (both V-sized, never a driver lookup); the
    per-source reduction is a bucketed aggregate."""
    from ..util import bucketed_aggregate, compact_nonempty
    from .pagerank import pagerank

    cfg = EngineConfig(
        num_partitions=8, max_iterations=12, pagerank_tol=0
    )
    pr = pagerank(doc_sym_graph(sf_dir), cfg, mode="broadcast")

    def keyed(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            doc_id=_url_doc_ids(t.column("url")),
            r=pc.round(t["rank"], 9).to_numpy(zero_copy_only=False),
        )

    ranks = compact_nonempty(
        pr.map_batches(keyed, batch_format="pyarrow")
    )
    empty = pa.table(
        {"source": pa.array([], pa.string()),
         "n_docs": pa.array([], pa.int64()),
         "total_rank": pa.array([], pa.float64())}
    )
    if ranks is None:
        return ray.data.from_arrow(empty)
    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])
    j = ranks.join(
        compact_nonempty(
            docs.map_batches(
                lambda t: pa.table(
                    {"did": t.column("doc_id").cast(pa.int64()),
                     "source": t.column("source").cast(pa.string())}
                ),
                batch_format="pyarrow",
            )
        ),
        join_type="inner", num_partitions=QCFG.num_partitions,
        on=("doc_id",), right_on=("did",),
    )
    agg = bucketed_aggregate(
        j.map_batches(
            lambda t: pa.table(
                {"source": t["source"], "r": t["r"],
                 "one": pa.array(np.ones(t.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        key_cols=["source"],
        aggs=[("one", "sum", "n_docs"), ("r", "sum", "total_rank")],
    )

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table(
            {"source": t["source"], "n_docs": t["n_docs"],
             "total_rank": pc.round(t["total_rank"], 9)}
        )

    return agg.map_batches(finalize, batch_format="pyarrow").sort("source")


def copart_feature_agg2_q(sf_dir: str) -> "ray.data.Dataset":
    """GNN-style 2-hop neighborhood feature aggregation over the
    co-purchase graph → (url, degree, h1, h2): per vertex, h1 = mean
    retail-price feature of its neighbors (one message-passing round)
    and h2 = the path-weighted 2-hop mean Σ_{v∈N(u)} s1(v) /
    Σ_{v∈N(u)} deg(v) — the aggregate a 2-layer mean-aggregator GNN
    computes before the learned transform. Features are exact integer
    cents; each hop keeps (sum, count) sufficient statistics so the
    ONLY floating-point ops are the two final divisions of identical
    int64s on both sides.

    Scale shape: neighbor lists are never materialized — each hop is
    one hash join (edge table ⋈ per-vertex stats on the v side) + one
    bucketed sum keyed on u; the feature table joins by part key. Both
    hops reuse the cached distinct pair Dataset; no driver state
    beyond scalars."""
    from ..util import bucketed_aggregate, compact_nonempty

    pairs = copart_pk_pairs(sf_dir)

    def both_dirs(t: pa.Table) -> pa.Table:
        a = col_np(t, "pk_a").astype(np.int64)
        b = col_np(t, "pk_b").astype(np.int64)
        return table_from_arrays(
            u=np.concatenate([a, b]), v=np.concatenate([b, a])
        )

    und = pairs.map_batches(both_dirs, batch_format="pyarrow")

    def fproj(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            pk=col_np(t, "p_partkey").astype(np.int64),
            fc=np.floor(
                col_np(t, "p_retailprice").astype(np.float64) * 100.0
                + 0.5
            ).astype(np.int64),
        )

    feat = _read(
        sf_dir, "part", columns=["p_partkey", "p_retailprice"]
    ).map_batches(fproj, batch_format="pyarrow")

    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "degree": pa.array([], pa.int64()),
         "h1": pa.array([], pa.float64()),
         "h2": pa.array([], pa.float64())}
    )
    und_c = compact_nonempty(und)
    feat_c = compact_nonempty(feat)
    if und_c is None or feat_c is None:
        return ray.data.from_arrow(empty)
    und_c = und_c.materialize()

    hop1 = und_c.join(
        feat_c, join_type="inner", num_partitions=QCFG.num_partitions,
        on=("v",), right_on=("pk",),
    )
    n1 = compact_nonempty(bucketed_aggregate(
        hop1.select_columns(["u", "fc"]), key_cols=["u"],
        aggs=[("fc", "sum", "s1"), ("fc", "count", "deg")],
    ))
    if n1 is None:
        return ray.data.from_arrow(empty)
    n1 = n1.materialize()

    # n1 is already compacted + materialized; the rename preserves its
    # block layout, so no further compact (which could return None) is
    # needed before the join
    n1v = n1.rename_columns({"u": "vv", "s1": "s1v", "deg": "degv"})
    hop2 = und_c.join(
        n1v, join_type="inner",
        num_partitions=QCFG.num_partitions, on=("v",), right_on=("vv",),
    )
    n2 = compact_nonempty(bucketed_aggregate(
        hop2.select_columns(["u", "s1v", "degv"]), key_cols=["u"],
        aggs=[("s1v", "sum", "s2"), ("degv", "sum", "w2")],
    ))
    if n2 is None:
        return ray.data.from_arrow(empty)

    j = n1.join(
        n2.rename_columns({"u": "u2"}), join_type="inner",
        num_partitions=QCFG.num_partitions, on=("u",), right_on=("u2",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        s1 = col_np(t, "s1").astype(np.int64)
        deg = col_np(t, "deg").astype(np.int64)
        s2 = col_np(t, "s2").astype(np.int64)
        w2 = col_np(t, "w2").astype(np.int64)
        return pa.table(
            {"url": part_url(col_np(t, "u").astype(np.int64)),
             "degree": pa.array(deg, pa.int64()),
             "h1": pa.array(
                 s1.astype(np.float64) / (100.0 * deg), pa.float64()),
             "h2": pa.array(
                 s2.astype(np.float64) / (100.0 * w2), pa.float64())}
        )

    return j.map_batches(finalize, batch_format="pyarrow").sort("url")


def copart_negatives_q(sf_dir: str, mod: int = 50) -> "ray.data.Dataset":
    """Negative-edge sampling for link-prediction training →
    (src_url, dst_url): a deterministic 1/mod sample of NON-edges of
    the co-purchase graph — candidate pairs (a < b) kept when the
    Knuth-mixed key (a·2654435761 + b) % mod == 0, minus the real
    edge set. The standard negatives-miner a graph-ML data pipeline
    pairs with its positive edge list; the integer sampler replays
    exactly in SQL (no float RNG state, restart-safe).

    Scale shape (round 10 — closed-form, no all-pairs): the keep
    congruence (a·K + b) % mod == 0 fixes b's RESIDUE CLASS given a,
    so each vertex batch generates its candidates directly from the
    residue-grouped sorted id array (one searchsorted + ragged gather
    per class) — O(V²/mod) rows produced with O(V²/mod) work, never
    the O(V²) repeat/tile screen. All congruence arithmetic is done
    mod `mod` ((a%m)·(K%m)+b%m), which never overflows int64 at ANY
    key range (the oracle uses the same residue form). The
    residue-grouped id array broadcasts once via ray.put (O(V) ids —
    the broadcast_max_vertices-class footprint every broadcast-mode
    kernel already carries), and the real-edge subtraction is one
    hash-partitioned LEFT OUTER join + null filter — candidates are
    V²/mod rows streaming through the join, never driver-resident."""
    from ..util import bucketed_sum_aggregate, compact_nonempty, \
        dataset_to_numpy

    pairs = copart_pk_pairs(sf_dir)

    def both_cols(t: pa.Table) -> pa.Table:
        return table_from_arrays(u=np.concatenate([
            col_np(t, "pk_a").astype(np.int64),
            col_np(t, "pk_b").astype(np.int64),
        ]))

    verts = bucketed_sum_aggregate(
        pairs.map_batches(both_cols, batch_format="pyarrow"),
        key_cols=["u"], sum_cols=[],
    )
    empty = pa.table(
        {"src_url": pa.array([], pa.string()),
         "dst_url": pa.array([], pa.string())}
    )
    verts_c = compact_nonempty(verts)
    if verts_c is None:
        return ray.data.from_arrow(empty)
    verts_c = verts_c.materialize()
    vids = np.sort(dataset_to_numpy(verts_c, "u")["u"].astype(np.int64))
    # residue-grouped layout: grouped[offsets[r]:offsets[r+1]] is the
    # sorted id list with id % mod == r
    res = vids % mod
    order = np.lexsort((vids, res))
    grouped = vids[order]
    offsets = np.searchsorted(res[order], np.arange(mod + 1))
    vref = ray.put((grouped, offsets))

    def gen(t: pa.Table, _vref=vref, _mod=mod) -> pa.Table:
        grp, off = ray.get(_vref)
        a = col_np(t, "u").astype(np.int64)
        # b's residue class: b ≡ -(a·K) (mod m), computed mod m only
        r_a = (-(a % _mod) * (2654435761 % _mod)) % _mod
        xs, ys = [], []
        for r in np.unique(r_a):
            arr = grp[off[r]:off[r + 1]]
            aa = a[r_a == r]
            if len(arr) == 0 or len(aa) == 0:
                continue
            start = np.searchsorted(arr, aa, side="right")  # b > a
            cnt = len(arr) - start
            tot = int(cnt.sum())
            if tot == 0:
                continue
            base = np.repeat(start, cnt)
            head = np.concatenate(([0], np.cumsum(cnt)[:-1]))
            within = np.arange(tot) - np.repeat(head, cnt)
            xs.append(np.repeat(aa, cnt))
            ys.append(arr[base + within])
        if not xs:
            return table_from_arrays(
                x=np.array([], dtype=np.int64),
                y=np.array([], dtype=np.int64),
            )
        return table_from_arrays(
            x=np.concatenate(xs), y=np.concatenate(ys)
        )

    cand = verts_c.map_batches(gen, batch_format="pyarrow")

    def mark(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            pk_a=col_np(t, "pk_a").astype(np.int64),
            pk_b=col_np(t, "pk_b").astype(np.int64),
            __hit=np.ones(t.num_rows, dtype=np.int64),
        )

    marked = pairs.map_batches(mark, batch_format="pyarrow")
    cand_c = compact_nonempty(cand)
    marked_c = compact_nonempty(marked)
    if cand_c is None:
        return ray.data.from_arrow(empty)
    j = cand_c.join(
        marked_c, join_type="left_outer",
        num_partitions=QCFG.num_partitions,
        on=("x", "y"), right_on=("pk_a", "pk_b"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        keep = pc.is_null(t.column("__hit")).to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {"src_url": part_url(col_np(t, "x").astype(np.int64)[keep]),
             "dst_url": part_url(col_np(t, "y").astype(np.int64)[keep])}
        )

    out = compact_nonempty(
        j.map_batches(finalize, batch_format="pyarrow")
    )
    if out is None:
        return ray.data.from_arrow(empty)
    return out.sort(["src_url", "dst_url"])


def copart_harmonic8_q(sf_dir: str, n_seeds: int = 4,
                       rounds: int = 8) -> "ray.data.Dataset":
    """Sampled harmonic centrality → (url, harmonic): Σ_i 1/d_i(u)
    over a deterministic pivot set (the n_seeds smallest urls), with
    d_i the min-hop distance within `rounds` synchronous BFS rounds
    (unreached or self ⇒ 0 contribution) — the standard
    sampled-pivot estimator (Eppstein–Wang) for a centrality whose
    exact form needs all-pairs distances. The score is ONE per-row
    left-to-right 4-term double expression over exact integer
    distances, identical on both sides.

    Scale shape: each pivot reuses the gated BFS kernel
    (broadcast/shuffle per graph size); the per-pivot distance tables
    attach via hash joins; the pivot list is a ≤n_seeds driver
    constant (a top-k report)."""
    from .traversal import bfs_distances

    g = copart_graph(sf_dir)
    seeds = [
        row["url"]
        for row in g.vertices.sort("url").limit(n_seeds).take(n_seeds)
    ]
    out = g.vertices.select_columns(["url"])
    for i, s in enumerate(seeds):
        di = bfs_distances(g, [s], QCFG, rounds=rounds).rename_columns(
            {"url": f"u{i}", "dist": f"d{i}"}
        )
        out = out.join(
            di, join_type="left_outer",
            num_partitions=QCFG.num_partitions,
            on=("url",), right_on=(f"u{i}",),
        )

    def finalize(t: pa.Table, _n=len(seeds)) -> pa.Table:
        n = t.num_rows
        h = np.zeros(n, dtype=np.float64)
        for i in range(_n):
            d = t.column(f"d{i}").to_numpy(zero_copy_only=False)
            d = np.nan_to_num(
                d.astype(np.float64), nan=0.0
            )
            # left-to-right accumulation, one term per pivot — the
            # SQL expression adds in the same order
            h = h + np.where(d > 0, 1.0 / np.where(d > 0, d, 1.0), 0.0)
        return pa.table(
            {"url": t.column("url"), "harmonic": pa.array(h, pa.float64())}
        )

    return out.map_batches(finalize, batch_format="pyarrow").sort("url")
