"""Presentation renderers: bit-exact glibc palette, RGBA label image,
adjacency coloring, bounding-box drawing."""

import numpy as np
import pytest

from imtag_ray.config import EngineConfig
from imtag_ray.functions.crand import GlibcRand
from imtag_ray.pipelines.lattice import hole_adjacencies, lattice_cc
from imtag_ray.pipelines.render import (
    draw_bounding_box,
    label_palette,
    to_rgba_adjacencies_image,
    to_rgba_label_image,
)
from imtag_ray.sources.synth import LANDS_WATERS
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)

# glibc rand() outputs for srand(100), recorded from a compiled C
# harness on this host (gcc 12 / glibc): the palette parity anchor.
GLIBC_SRAND100 = [
    677741240, 611911301, 516687479, 1039653884, 807009856, 115325623,
    1224653905, 2083069270, 1106860981, 922406371, 876420180, 322411828,
    1259609597, 1356425747, 1318253490, 883344301,
]


def test_glibc_rand_bit_exact():
    g = GlibcRand(100)
    assert [g.rand() for _ in range(16)] == GLIBC_SRAND100


def test_glibc_rand_matches_live_gcc_if_available():
    import shutil
    import subprocess
    import tempfile

    if shutil.which("gcc") is None:
        pytest.skip("no gcc")
    with tempfile.TemporaryDirectory() as d:
        src = f"{d}/t.c"
        open(src, "w").write(
            '#include <stdio.h>\n#include <stdlib.h>\n'
            'int main(){srand(12345);for(int i=0;i<64;i++)'
            'printf("%d\\n", rand());return 0;}\n'
        )
        subprocess.run(["gcc", "-O2", src, "-o", f"{d}/t"], check=True)
        out = subprocess.run([f"{d}/t"], capture_output=True, text=True)
        live = [int(x) for x in out.stdout.split()]
    g = GlibcRand(12345)
    assert [g.rand() for _ in range(64)] == live


def test_label_palette_reference_scheme():
    pal = label_palette(3)
    g = GlibcRand(100)
    exp = []
    for _ in range(3):
        exp.append([g.rand() % 255, g.rand() % 255, g.rand() % 255, 255])
    assert pal.tolist() == exp
    # caller-provided colors come first, random fill after
    pal2 = label_palette(3, [(1, 2, 3, 4)])
    assert pal2[0].tolist() == [1, 2, 3, 4]
    g2 = GlibcRand(100)
    assert pal2[1].tolist() == [g2.rand() % 255, g2.rand() % 255, g2.rand() % 255, 255]


@pytest.fixture(scope="module")
def lw_cc_rows():
    cc = lattice_cc(LANDS_WATERS, "cross", CFG)
    return dataset_to_numpy(cc, "row", "col", "component_id")


def test_rgba_label_image(lw_cc_rows):
    img = to_rgba_label_image(lw_cc_rows, LANDS_WATERS.shape)
    assert img.shape == (*LANDS_WATERS.shape, 4)
    pal = label_palette(3)
    # component 0 covers (0,0); component 1 covers (0,6); comp 2 (3,0)
    assert img[0, 0].tolist() == pal[0].tolist()
    assert img[0, 6].tolist() == pal[1].tolist()
    assert img[3, 0].tolist() == pal[2].tolist()
    # background stays background
    assert img[2, 0].tolist() == [0, 0, 0, 0]


def test_rgba_adjacencies_image(lw_cc_rows):
    adj = hole_adjacencies(LANDS_WATERS, CFG)  # [[1,0],[1,1],[1,0]]
    img = to_rgba_adjacencies_image(lw_cc_rows, LANDS_WATERS.shape, adj)
    g = GlibcRand(100)
    wa = [g.rand() % 255, g.rand() % 255, g.rand() % 255]
    wb = [g.rand() % 255, g.rand() % 255, g.rand() % 255]
    # land 0 → water A only; land 1 → A|B; land 2 → A only
    assert img[0, 0].tolist() == wa + [255]
    assert img[0, 6].tolist() == [wa[i] | wb[i] for i in range(3)] + [255]
    assert img[3, 0].tolist() == wa + [255]


def test_draw_bounding_box():
    img = np.zeros((6, 8, 1), dtype=np.uint8)
    draw_bounding_box(img, top=1, left=2, bottom=4, right=5)
    assert img[1, 2:5, 0].tolist() == [255, 255, 255]  # top line
    assert img[4, 2:5, 0].tolist() == [255, 255, 255]  # bottom line
    assert img[2, 2, 0] == 255 and img[3, 2, 0] == 255  # left edge
    # right edge drawn AT column `right` (reference quirk)
    assert img[2, 5, 0] == 255 and img[3, 5, 0] == 255
    assert img[2, 4, 0] == 0  # interior untouched
    # degenerate boxes are no-ops
    img2 = np.zeros((4, 4, 1), dtype=np.uint8)
    draw_bounding_box(img2, 0, 3, 2, 2)  # right <= left
    assert img2.sum() == 0


def test_draw_crosshair_reference_semantics():
    from imtag_ray.pipelines.render import draw_crosshair

    # center mid-image: arms span [c-hl, c+hl+1) in both axes
    img = np.zeros((20, 20, 3), dtype=np.uint8)
    draw_crosshair(img, 10, 10, 4, (255, 7, 9))
    assert (img[6:15, 10] == [255, 7, 9]).all()
    assert (img[10, 6:15] == [255, 7, 9]).all()
    assert img[5, 10].sum() == 0 and img[15, 10].sum() == 0
    # the reference clamps the EXCLUSIVE end to dim-1: an arm reaching
    # the image edge stops one pixel short (quirk preserved)
    img = np.zeros((10, 10), dtype=np.uint8)
    draw_crosshair(img, 9, 9, 4, (255,))
    assert img[8, 9] == 255 and img[9, 8] == 255
    # y1 = min(h-1, 9+5) = 9 → vertical arm covers [5, 9) and the
    # horizontal arm [5, 9), so the corner CENTER pixel itself stays
    # unpainted — the reference's exclusive-end clamp quirk, preserved
    assert img[9, 9] == 0
    assert img[4, 9] == 0
    # top-left clamp: half_length > center → arm starts at 0
    img = np.zeros((10, 10), dtype=np.uint8)
    draw_crosshair(img, 1, 1, 4, (255,))
    assert img[0, 1] == 255 and img[1, 0] == 255
    # off-image center: no-op
    img = np.zeros((10, 10), dtype=np.uint8)
    draw_crosshair(img, 50, 3, 4, (255,))
    assert img.sum() == 0


def test_draw_component_segments():
    from imtag_ray.pipelines.render import draw_component

    img = np.full((5, 8, 3), 9, dtype=np.uint8)
    draw_component(img, [(1, 2, 5), (2, 0, 8)], (1, 2, 3))
    assert (img[1, 2:5] == [1, 2, 3]).all()
    assert (img[1, :2] == 9).all() and (img[1, 5:] == 9).all()
    assert (img[2, :] == [1, 2, 3]).all()
    # dict-of-arrays form
    img2 = np.zeros((4, 4), dtype=np.uint8)
    draw_component(
        img2,
        {"row": np.array([0]), "col_begin": np.array([1]),
         "col_end": np.array([3])},
        (7,),
    )
    assert list(img2[0]) == [0, 7, 7, 0]
