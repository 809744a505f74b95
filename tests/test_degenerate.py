"""Degenerate graphs: empty, self-loop, single edge — every algorithm
must handle them without special casing by the caller."""

import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.cc import connected_components
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.pipelines.triangles import triangle_counts
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=2)


def test_empty_graph():
    empty = ray.data.from_arrow(
        pa.table(
            {"src_url": pa.array([], pa.string()),
             "dst_url": pa.array([], pa.string())}
        )
    )
    g = build_graph(empty, CFG)
    assert g.num_vertices == 0 and g.num_edges == 0
    assert connected_components(g, CFG).count() == 0
    assert pagerank(g, CFG, mode="broadcast").count() == 0
    assert triangle_counts(g, CFG).count() == 0


def test_self_loop():
    one = ray.data.from_arrow(
        pa.table({"src_url": ["u/a"], "dst_url": ["u/a"]})
    )
    g = build_graph(one, CFG)
    cc = connected_components(g, CFG).take_all()
    assert cc == [{"vid": 0, "url": "u/a", "component_id": 0}]
    pr = pagerank(g, CFG, mode="broadcast").take_all()
    assert pr[0]["rank"] == pytest.approx(1.0)
    tc = triangle_counts(g, CFG).take_all()
    assert tc[0]["triangles"] == 0


def test_single_edge():
    e = ray.data.from_arrow(
        pa.table({"src_url": ["u/a"], "dst_url": ["u/b"]})
    )
    g = build_graph(e, CFG)
    cc = {r["url"]: r["component_id"] for r in connected_components(g, CFG).take_all()}
    assert cc == {"u/a": 0, "u/b": 0}
    ranks = {r["url"]: r["rank"] for r in pagerank(g, CFG, mode="broadcast").take_all()}
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9)
    assert ranks["u/b"] > ranks["u/a"]
