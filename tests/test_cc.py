"""Connected components: exact lattice conformance to the reference's
CCL semantics (SURVEY.md §5 'golden lattice conformance'), plus named
graphs vs networkx, in both broadcast and shuffle modes."""

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.oracle.ccl import ccl_labels
from imtag_ray.pipelines.cc import component_sizes, connected_components
from imtag_ray.sources.synth import (
    LANDS_WATERS,
    checkerboard_image,
    lattice_edges,
    lattice_vertices,
    named_graph_edges,
    noise_image,
    pixel_url,
    serpentine_image,
)
from imtag_ray.stages.graph_build import build_graph, build_vertices
from imtag_ray.util import dataset_to_numpy


def lattice_graph(img, connectivity):
    """Engine graph for a lattice image: vertices = ALL foreground pixels
    (isolated pixels must become singleton components), edges from the
    reference's overlap predicates."""
    edges = ray.data.from_arrow(lattice_edges(img, connectivity))
    urls = lattice_vertices(img)
    import pyarrow as pa

    verts_urls = ray.data.from_arrow(
        pa.table({"src_url": urls, "dst_url": urls})  # self-pairs: vocab only
    )
    vertices = build_vertices(edges.union(verts_urls))
    return build_graph(edges, vertices=vertices)


def engine_labels(img, connectivity, mode, cfg=None):
    cfg = cfg or EngineConfig(num_partitions=4)
    g = lattice_graph(img, connectivity)
    cc = connected_components(g, cfg, mode=mode)
    out = dataset_to_numpy(cc, "url", "component_id")
    return dict(zip([str(u) for u in out["url"]], out["component_id"]))


def assert_conformant(img, connectivity, mode):
    oracle, n_oracle = ccl_labels(img, connectivity)
    got = engine_labels(img, connectivity, mode)
    assert len(got) == len(oracle)
    for (r, c), lab in oracle.items():
        assert got[pixel_url(r, c)] == lab, (r, c, lab, got[pixel_url(r, c)])


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
@pytest.mark.parametrize("connectivity", ["cross", "eight", "horizontal"])
def test_lands_waters_exact(mode, connectivity):
    # the reference's own documented golden (src/morphology.cpp:234-263)
    assert_conformant(LANDS_WATERS, connectivity, mode)


def test_lands_waters_inverted_holes():
    # hole components of the worked example: 2 under CROSS
    inv = ~LANDS_WATERS
    oracle, n = ccl_labels(inv, "cross")
    assert n == 2
    got = engine_labels(inv, "cross", "broadcast")
    for (r, c), lab in oracle.items():
        assert got[pixel_url(r, c)] == lab


@pytest.mark.parametrize("mode", ["broadcast"])
def test_noise_grid_exact(mode):
    assert_conformant(noise_image((64, 64), seed=100), "cross", mode)
    assert_conformant(noise_image((64, 64), seed=100), "eight", mode)


def test_noise_grid_large_exact():
    # FIXTURES.md F3b at reduced size: a denser, larger seeded grid
    # (~10k foreground px, hundreds of components)
    assert_conformant(noise_image((128, 128), seed=100), "cross", "broadcast")


def test_serpentine_worst_case_diameter():
    # single snake component of ~500 pixels; pointer jumping must keep
    # round count far below the path length
    img = serpentine_image(31)
    rounds = []
    cfg = EngineConfig(num_partitions=4)
    g = lattice_graph(img, "cross")
    cc = connected_components(
        g, cfg, mode="broadcast", on_round=lambda r, lab: rounds.append(r)
    )
    out = dataset_to_numpy(cc, "component_id")
    assert (out["component_id"] == 0).all()
    assert len(rounds) < 12, f"too many rounds: {len(rounds)}"


def test_checkerboard_max_components():
    img = checkerboard_image(16)
    oracle, n = ccl_labels(img, "cross")
    got = engine_labels(img, "cross", "broadcast")
    assert len(set(got.values())) == n == 128
    # eight-way: checkerboard is fully connected
    got8 = engine_labels(img, "eight", "broadcast")
    assert len(set(got8.values())) == 1


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_named_graphs_vs_networkx(mode):
    import networkx as nx

    for name in ["two_cliques", "star", "barbell", "gnp"]:
        tbl = named_graph_edges(name)
        g = build_graph(ray.data.from_arrow(tbl))
        cc = connected_components(g, EngineConfig(num_partitions=4), mode=mode)
        out = dataset_to_numpy(cc, "url", "component_id")
        ours = dict(zip([str(u) for u in out["url"]], out["component_id"]))
        nxg = nx.Graph()
        for s, d in zip(tbl["src_url"].to_pylist(), tbl["dst_url"].to_pylist()):
            nxg.add_edge(s, d)
        comps = list(nx.connected_components(nxg))
        # same partition: two urls share an engine label iff same nx comp
        for comp in comps:
            labels = {ours[u] for u in comp}
            assert len(labels) == 1, (name, comp, labels)
        assert len({min(ours[u] for u in c) for c in comps}) == len(comps)
        # canonical: component ids are dense 0..M-1 ranked by min url
        mins = sorted(min(c) for c in comps)
        for comp in comps:
            expected_id = mins.index(min(comp))
            assert ours[next(iter(comp))] == expected_id


def test_component_sizes():
    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl))
    cc = connected_components(g, EngineConfig(num_partitions=4))
    sizes = dataset_to_numpy(component_sizes(cc), "component_id", "size")
    assert sorted(sizes["size"]) == [5, 7]


def test_permutation_invariance():
    """Block/row order must not affect labels (SURVEY.md §7.4)."""
    img = noise_image((32, 32), seed=100)
    tbl = lattice_edges(img, "cross")
    rng = np.random.RandomState(7)
    perm = rng.permutation(tbl.num_rows)
    shuffled = tbl.take(perm)
    g1 = build_graph(ray.data.from_arrow(tbl))
    g2 = build_graph(ray.data.from_arrow(shuffled).repartition(5))
    c1 = dataset_to_numpy(connected_components(g1), "url", "component_id")
    c2 = dataset_to_numpy(connected_components(g2), "url", "component_id")
    m1 = dict(zip([str(u) for u in c1["url"]], c1["component_id"]))
    m2 = dict(zip([str(u) for u in c2["url"]], c2["component_id"]))
    assert m1 == m2


def test_shuffle_long_path_converges_fast():
    """ADVICE regression: a 40-vertex path must converge well within
    max_iterations=20 in shuffle mode (pointer jumping makes rounds
    O(log diameter), not O(diameter)) — previously this silently
    reported 20 components."""
    import pyarrow as pa

    n = 40
    tbl = pa.table(
        {
            "src_url": pa.array([f"https://p.example/v{i:03d}" for i in range(n - 1)]),
            "dst_url": pa.array([f"https://p.example/v{i + 1:03d}" for i in range(n - 1)]),
        }
    )
    g = build_graph(ray.data.from_arrow(tbl))
    cfg = EngineConfig(num_partitions=4, max_iterations=20)
    cc = connected_components(g, cfg, mode="shuffle")
    out = dataset_to_numpy(cc, "component_id")
    assert set(out["component_id"].tolist()) == {0}


def test_shuffle_raises_when_iterations_exhausted():
    """Exhausting max_iterations without a fixpoint must raise, never
    silently return wrong labels."""
    import pyarrow as pa
    import pytest

    n = 30
    tbl = pa.table(
        {
            "src_url": pa.array([f"https://p.example/v{i:03d}" for i in range(n - 1)]),
            "dst_url": pa.array([f"https://p.example/v{i + 1:03d}" for i in range(n - 1)]),
        }
    )
    g = build_graph(ray.data.from_arrow(tbl))
    cfg = EngineConfig(num_partitions=4, max_iterations=1)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(g, cfg, mode="shuffle")
