"""Morphology/statistics parity: invert, hole adjacencies (the
reference's documented golden), remove_components, stats, round trips,
k-hop expansion."""

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.oracle.ccl import ccl_labels
from imtag_ray.pipelines.lattice import (
    component_stats,
    hole_adjacencies,
    khop_expand,
    lattice_cc,
    remove_components,
    small_component_filter,
    to_label_image,
    to_mask_image,
)
from imtag_ray.sources.synth import LANDS_WATERS, noise_image
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def lw_cc():
    return lattice_cc(LANDS_WATERS, "cross", CFG)


def test_hole_adjacencies_golden():
    # the worked example documented at src/morphology.cpp:234-263:
    # 3 lands × 2 holes, adjacency [[1,0],[1,1],[1,0]]
    adj = hole_adjacencies(LANDS_WATERS, CFG)
    assert adj.shape == (3, 2)
    assert adj.astype(int).tolist() == [[1, 0], [1, 1], [1, 0]]
    # the full 4-neighbor generalization agrees on the worked example
    from imtag_ray.pipelines.lattice import hole_adjacencies_full

    assert hole_adjacencies_full(LANDS_WATERS, CFG).astype(int).tolist() == [
        [1, 0], [1, 1], [1, 0],
    ]


def test_hole_adjacencies_strict_vs_full_divergence():
    """The reference's row-pairing records only shared-row contacts —
    a land directly ABOVE a hole with no same-row water is NOT recorded
    (ADVICE: the strict replica must mirror that, the full variant
    records it)."""
    from imtag_ray.pipelines.lattice import hole_adjacencies_full

    # row 0: all land; row 1: left half land, right half hole
    img = np.array([[1, 1, 1, 1], [1, 1, 0, 0]], dtype=bool)
    strict = hole_adjacencies(img, CFG)
    full = hole_adjacencies_full(img, CFG)
    # one land, one hole; they touch horizontally in row 1 → both record
    assert strict.astype(int).tolist() == [[1]] == full.astype(int).tolist()

    # vertical-ONLY contact: land row above, hole row below, land row 1
    # empty → reference's per-row pairing finds nothing
    img2 = np.array([[1, 1], [0, 0]], dtype=bool)
    strict2 = hole_adjacencies(img2, CFG)
    full2 = hole_adjacencies_full(img2, CFG)
    assert strict2.astype(int).tolist() == [[0]]  # reference behavior
    assert full2.astype(int).tolist() == [[1]]    # generalization


def test_component_stats_golden(lw_cc):
    st = component_stats(lw_cc).to_pandas()
    st = st.set_index("component_id")
    # comp 0: rows 0-1, cols 0-3 → 8 px, bbox half-open (0,0,2,4)
    assert st.loc[0, "npixels"] == 8
    assert (st.loc[0, ["top", "left", "bottom", "right"]] == [0, 0, 2, 4]).all()
    assert st.loc[0, "centroid_row"] == pytest.approx(0.5)
    assert st.loc[0, "centroid_col"] == pytest.approx(1.5)
    # comp 1: column 6 all 4 rows
    assert st.loc[1, "npixels"] == 4
    assert (st.loc[1, ["top", "left", "bottom", "right"]] == [0, 6, 4, 7]).all()
    # comp 2: row 3 cols 0-4
    assert st.loc[2, "npixels"] == 5
    assert st.loc[2, "centroid_col"] == pytest.approx(2.0)


def test_label_mask_roundtrip(lw_cc):
    got = dataset_to_numpy(lw_cc, "row", "col", "component_id")
    lab = to_label_image(got, LANDS_WATERS.shape)
    # documented label image with background 0 and +1 offset:
    expected = np.array(
        [
            [1, 1, 1, 1, 0, 0, 2, 0],
            [1, 1, 1, 1, 0, 0, 2, 0],
            [0, 0, 0, 0, 0, 0, 2, 0],
            [3, 3, 3, 3, 3, 0, 2, 0],
        ]
    )
    assert np.array_equal(lab, expected)
    mask = to_mask_image(got, LANDS_WATERS.shape)
    assert np.array_equal(mask, LANDS_WATERS)  # lossless inverse


def test_remove_components_dense_relabel(lw_cc):
    out = remove_components(lw_cc, [1])
    got = dataset_to_numpy(out, "row", "col", "component_id")
    assert set(got["component_id"]) == {0, 1}  # dense after drop
    # survivor order preserved: old comp 0 → 0, old comp 2 → 1
    lab = to_label_image(got, LANDS_WATERS.shape)
    assert lab[0, 0] == 1 and lab[3, 0] == 2 and lab[0, 6] == 0


def test_small_component_filter_matches_oracle():
    img = noise_image((48, 48), seed=100)
    cc = lattice_cc(img, "cross", CFG)
    filtered = small_component_filter(cc, min_pixels=8)
    got = dataset_to_numpy(filtered, "row", "col", "component_id")
    # oracle: reference CCL labels + same size filter + dense re-rank
    oracle, n = ccl_labels(img, "cross")
    from collections import Counter

    sizes = Counter(oracle.values())
    keep = sorted(l for l, s in sizes.items() if s >= 8)
    remap = {l: i for i, l in enumerate(keep)}
    expected = {
        (r, c): remap[l] for (r, c), l in oracle.items() if l in remap
    }
    ours = dict(zip(zip(got["row"], got["col"]), got["component_id"]))
    assert ours == expected


def test_khop_expand():
    import pyarrow as pa

    from imtag_ray.stages.graph_build import build_graph

    # path graph 0-1-2-3-4-5
    tbl = pa.table(
        {
            "src_url": [f"u/{i}" for i in range(5)],
            "dst_url": [f"u/{i+1}" for i in range(5)],
        }
    )
    g = build_graph(ray.data.from_arrow(tbl))
    got = khop_expand(g, np.array([0]), 2)
    assert list(got) == [0, 1, 2]
    got = khop_expand(g, np.array([3]), 1)
    assert list(got) == [2, 3, 4]
    got = khop_expand(g, np.array([0]), 99)  # saturates, early exit
    assert list(got) == [0, 1, 2, 3, 4, 5]
