"""Reference canonical-input conformance: the reference's OWN test
image (test/blobs1.png, 3840×2160) through the engine's lattice CC must
reproduce the component counts the C++ engine reports — 22 under CROSS
and 16 under EIGHT_WAY (test/imtag_test.cpp:80-93; BASELINE.md
'Components found'). The image is decoded with a pure-numpy PNG reader
mirroring stb_image's grey conversion byte-exactly."""

import os

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.cc import connected_components
from imtag_ray.pipelines.lattice import mask_graph
from imtag_ray.sources.png import read_png, stb_grey

BLOBS = "/root/reference/test/blobs1.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(BLOBS), reason="reference image unavailable"
)


@pytest.fixture(scope="module")
def blobs_mask():
    img = read_png(BLOBS)
    assert img.shape == (2160, 3840, 4)
    grey = stb_grey(img)
    # foreground = nonzero byte, exactly compress_scanline's run rule
    # (src/SegmentImageImpl_Scanline.cpp:15-35 searches for 1s)
    return grey != 0


@pytest.mark.parametrize(
    "connectivity,expected", [("cross", 22), ("eight", 16)]
)
def test_blobs1_component_counts(blobs_mask, connectivity, expected):
    cfg = EngineConfig(num_partitions=8, max_iterations=64)
    g = mask_graph(blobs_mask, connectivity, cfg)
    cc = connected_components(g, cfg, mode="broadcast")
    from imtag_ray.util import dataset_to_numpy

    comp = dataset_to_numpy(cc, "component_id")["component_id"]
    assert len(comp) == int(blobs_mask.sum())
    assert comp.max() + 1 == expected


def test_mask_graph_matches_string_fixture_path():
    """mask_graph (vectorized ints) and the px:// string fixture path
    must produce identical component partitions on a noise image."""
    from imtag_ray.pipelines.lattice import lattice_cc
    from imtag_ray.sources.synth import noise_image
    from imtag_ray.util import dataset_to_numpy

    img = noise_image((48, 48), seed=100)
    cfg = EngineConfig(num_partitions=4)
    g = mask_graph(img, "cross", cfg)
    cc = connected_components(g, cfg)
    got = dataset_to_numpy(cc.sort("vid"), "component_id")["component_id"]

    ref = lattice_cc(img, "cross", cfg)
    out = dataset_to_numpy(ref, "row", "col", "component_id")
    order = np.lexsort((out["col"], out["row"]))  # scan order == vid order
    assert np.array_equal(out["component_id"][order], got)
