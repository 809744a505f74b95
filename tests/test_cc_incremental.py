"""Incremental connected components: warm-started relabeling over an
additive graph delta — the distributed analogue of the reference's
per-frame update() against its cached merge table
(src/SegmentImageImpl.cpp:27-31). The oracle is equivalence: the
incremental result must EQUAL a cold run on the full graph, in both
modes, and a fixpoint warm start must converge with zero label churn.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.cc import (
    connected_components,
    connected_components_incremental,
    connected_components_urls,
)
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)


def edges_ds(pairs):
    a = [f"u/{i:03d}" for i, _ in pairs]
    b = [f"u/{j:03d}" for _, j in pairs]
    return ray.data.from_arrow(
        pa.table({"src_url": pa.array(a), "dst_url": pa.array(b)})
    )


# old graph: three chains {0-1-2}, {10-11}, {20-21-22}
OLD = [(0, 1), (1, 2), (10, 11), (20, 21), (21, 22)]
# delta: merge chain 1 with chain 2, extend chain 3 with NEW vertices
# 23/24, add a brand-new isolated pair 30-31
DELTA = [(2, 10), (22, 23), (23, 24), (30, 31)]


def comp_map(cc_ds):
    out = dataset_to_numpy(cc_ds, "url", "component_id")
    return dict(zip([str(u) for u in out["url"]], out["component_id"]))


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_incremental_equals_cold(mode):
    g_old = build_graph(edges_ds(OLD))
    prior = connected_components_urls(g_old, CFG, mode=mode)
    g_new = build_graph(edges_ds(OLD + DELTA))
    inc = comp_map(
        connected_components_incremental(g_new, prior, CFG, mode=mode)
    )
    cold = comp_map(connected_components(g_new, CFG, mode=mode))
    assert inc == cold
    # the merge actually happened: 0 and 11 now share a component
    assert inc["u/000"] == inc["u/011"]
    assert inc["u/022"] == inc["u/024"]
    assert inc["u/030"] == inc["u/031"]
    assert inc["u/000"] != inc["u/030"]


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_fixpoint_warm_start_converges_immediately(mode):
    """Priming with the full graph's own converged labels must detect
    the fixpoint in the very first round (no label ever decreases)."""
    g = build_graph(edges_ds(OLD + DELTA))
    prior = connected_components_urls(g, CFG, mode=mode)
    rounds = []
    inc = comp_map(
        connected_components_incremental(
            g, prior, CFG, mode=mode, on_round=lambda r, _l: rounds.append(r)
        )
    )
    cold = comp_map(connected_components(g, CFG, mode=mode))
    assert inc == cold
    # broadcast breaks BEFORE invoking on_round when nothing improved;
    # shuffle needs exactly one confirming round
    assert len(rounds) <= 1


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_cross_mode_prior(mode):
    """A prior computed in one mode warm-starts the other mode."""
    other = "shuffle" if mode == "broadcast" else "broadcast"
    g_old = build_graph(edges_ds(OLD))
    prior = connected_components_urls(g_old, CFG, mode=other)
    g_new = build_graph(edges_ds(OLD + DELTA))
    inc = comp_map(
        connected_components_incremental(g_new, prior, CFG, mode=mode)
    )
    cold = comp_map(connected_components(g_new, CFG, mode=mode))
    assert inc == cold


def test_urls_form_is_min_url_rooted():
    g = build_graph(edges_ds(OLD))
    out = dataset_to_numpy(
        connected_components_urls(g, CFG), "url", "root_url"
    )
    m = dict(zip([str(u) for u in out["url"]], [str(r) for r in out["root_url"]]))
    assert m["u/002"] == "u/000"
    assert m["u/011"] == "u/010"
    assert m["u/020"] == "u/020"
    assert m["u/022"] == "u/020"
