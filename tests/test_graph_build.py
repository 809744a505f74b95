"""Graph build: vid dictionary ordering, dedup, capacity guard, degrees."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.stages.graph_build import Graph, build_graph, build_vertices, degrees
from imtag_ray.util import dataset_to_numpy, zip_with_index


def edges_table():
    return pa.table(
        {
            "src_url": ["u/b", "u/a", "u/a", "u/c", "u/a"],
            "dst_url": ["u/a", "u/b", "u/b", "u/a", "u/c"],
        }
    )


def test_zip_with_index_contiguous():
    ds = ray.data.range(1000).repartition(7)
    out = zip_with_index(ds.sort("id"), index_name="idx")
    got = dataset_to_numpy(out, "id", "idx")
    order = np.argsort(got["idx"])
    assert np.array_equal(got["idx"][order], np.arange(1000))
    # index order == sorted order of the key
    assert np.array_equal(got["id"][order], np.sort(got["id"]))


def test_vertices_sorted_dense():
    ds = ray.data.from_arrow(edges_table())
    v = build_vertices(ds)
    got = dataset_to_numpy(v.sort("vid"), "vid", "url")
    assert list(got["vid"]) == [0, 1, 2]
    assert list(got["url"]) == ["u/a", "u/b", "u/c"]  # lexicographic


def test_build_graph_dedup_and_weight():
    g = build_graph(ray.data.from_arrow(edges_table()))
    assert g.num_vertices == 3
    e = dataset_to_numpy(g.edges.sort(["src", "dst"]), "src", "dst", "weight")
    triples = sorted(zip(e["src"], e["dst"], e["weight"]))
    # a=0, b=1, c=2; (a,b) appears twice → weight 2
    assert triples == [(0, 1, 2), (0, 2, 1), (1, 0, 1), (2, 0, 1)]
    assert g.num_edges == 4


def test_shuffle_join_path_matches_broadcast():
    cfg = EngineConfig(broadcast_max_vertices=0, num_partitions=4)
    g = build_graph(ray.data.from_arrow(edges_table()), cfg)
    e = dataset_to_numpy(g.edges.sort(["src", "dst"]), "src", "dst", "weight")
    assert sorted(zip(e["src"], e["dst"], e["weight"])) == [
        (0, 1, 2),
        (0, 2, 1),
        (1, 0, 1),
        (2, 0, 1),
    ]


def test_capacity_guard():
    from imtag_ray.stages.graph_build import check_capacity

    check_capacity(2**32 - 1, "uint32")
    with pytest.raises(OverflowError):
        check_capacity(2**32, "uint32")
    check_capacity(2**32, "uint64")
    # guard is wired into build_graph
    build_graph(ray.data.from_arrow(edges_table()), EngineConfig(vid_dtype="uint32"))


def test_degrees():
    g = build_graph(ray.data.from_arrow(edges_table()))
    out = degrees(g, "out")
    # distinct-neighbor degree: a→{b,c}=2, b→{a}=1, c→{a}=1
    assert list(out) == [2, 1, 1]
    ind = degrees(g, "in")
    assert list(ind) == [2, 1, 1]
    und = degrees(g, "undirected")
    assert list(und) == [4, 2, 2]


def test_exclusive_prefix_sum_matches_numpy():
    from imtag_ray.util import exclusive_prefix_sum

    rng = np.random.default_rng(100)
    vals = rng.integers(0, 50, size=1000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": np.arange(1000, dtype=np.int64), "v": vals})
    ).repartition(7).sort("id")
    out = exclusive_prefix_sum(ds, "v", out_col="off")
    got = dataset_to_numpy(out, "id", "v", "off")
    order = np.argsort(got["id"])
    expect = np.concatenate([[0], np.cumsum(vals)[:-1]])
    assert np.array_equal(got["off"][order], expect)
    assert np.array_equal(got["v"][order], vals)


def test_exclusive_prefix_sum_empty_blocks():
    from imtag_ray.util import exclusive_prefix_sum

    # a filter that empties some blocks: post-filter zero-row blocks
    # must be dropped, not crash the scan or skew the offsets
    ds = (
        ray.data.range(100)
        .repartition(10)
        .filter(lambda r: r["id"] < 30)
        .map_batches(
            lambda t: pa.table(
                {"id": t.column("id"),
                 "v": pa.array(np.ones(t.num_rows, dtype=np.int64))}
            ),
            batch_format="pyarrow",
        )
        .sort("id")
    )
    out = exclusive_prefix_sum(ds, "v", out_col="off")
    got = dataset_to_numpy(out, "id", "off")
    order = np.argsort(got["id"])
    assert np.array_equal(got["off"][order], np.arange(30))
