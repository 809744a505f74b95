"""Presentation renderers — the reference's debug/visualization surface
(SURVEY.md §2.1), closed out with BIT-EXACT palette parity:

- ``to_rgba_label_image``       → src/morphology.cpp:37-59
- ``to_rgba_adjacencies_image`` → src/morphology.cpp:61-93
- ``draw_bounding_box``         → src/imtag_statistics.cpp:6-27

The reference seeds its palettes with C ``srand(100)``/``rand()``
(src/morphology.cpp:50,74); functions.crand.GlibcRand replicates glibc's
generator bit-exactly (validated against a compiled C harness), so the
rendered bytes match what the C++ engine writes — not just "some
deterministic colors".

Renderers are driver-side finishing steps over a (row, col,
component_id) label table (itself computed distributed); for huge
images, paint row-ranges inside map_batches with the palette broadcast.
Output images can be written with multimodal.media.encode_bmp /
encode_ppm (the engine analogue of stbi Image::write).
"""

from __future__ import annotations

import numpy as np

from ..functions.crand import GlibcRand

PALETTE_SEED = 100  # the reference's srand(100)


def label_palette(
    n_labels: int, label_colors: "list[tuple] | tuple" = (),
) -> np.ndarray:
    """(n_labels, 4) uint8 RGBA palette: caller-provided colors first,
    then srand(100) ``rand() % 255`` colors for the remainder, exactly
    as src/morphology.cpp:43-56."""
    out = np.zeros((n_labels, 4), dtype=np.uint8)
    given = min(len(label_colors), n_labels)
    for i in range(given):
        out[i] = label_colors[i]
    g = GlibcRand(PALETTE_SEED)
    for i in range(given, n_labels):
        out[i] = (g.rand() % 255, g.rand() % 255, g.rand() % 255, 0xFF)
    return out


def _paint(
    rows: np.ndarray, cols: np.ndarray, labels: np.ndarray,
    shape: tuple, colors: np.ndarray, background,
) -> np.ndarray:
    img = np.empty((*shape, 4), dtype=np.uint8)
    img[:, :] = np.asarray(background, dtype=np.uint8)
    if len(rows):
        img[rows, cols] = colors[labels]
    return img


def to_rgba_label_image(
    cc_rows: dict, shape: tuple,
    label_colors: "list[tuple] | tuple" = (),
    background: tuple = (0, 0, 0, 0),
) -> np.ndarray:
    """Label table (dataset_to_numpy of a lattice_cc result: row, col,
    component_id) → (H, W, 4) uint8 RGBA, colors per component from
    ``label_palette``. Mirrors to_rgba_label_image
    (src/morphology.cpp:37-59)."""
    labels = cc_rows["component_id"]
    n = int(labels.max()) + 1 if len(labels) else 0
    pal = label_palette(n, label_colors)
    return _paint(
        cc_rows["row"], cc_rows["col"], labels, shape, pal, background
    )


def to_rgba_adjacencies_image(
    cc_rows: dict, shape: tuple, hole_adj: np.ndarray,
    background: tuple = (0, 0, 0, 0),
) -> np.ndarray:
    """Each land is painted with the bitwise-OR combination of its
    connected waters' srand(100) colors — byte-for-byte the scheme of
    src/morphology.cpp:61-93 ('partition rivers into 3 color
    channels')."""
    labels = cc_rows["component_id"]
    n_lands, n_waters = hole_adj.shape
    if n_waters == 0:
        return _paint(
            cc_rows["row"], cc_rows["col"], labels, shape,
            np.zeros((max(n_lands, 1), 4), np.uint8), background,
        )
    g = GlibcRand(PALETTE_SEED)
    water = np.zeros((n_waters, 3), dtype=np.uint8)
    for w in range(n_waters):
        water[w] = (g.rand() % 255, g.rand() % 255, g.rand() % 255)
    land = np.zeros((n_lands, 4), dtype=np.uint8)
    land[:, 3] = 0xFF
    for l in range(n_lands):
        connected = hole_adj[l]
        for ch in range(3):
            land[l, ch] = np.bitwise_or.reduce(
                water[connected, ch], initial=0
            )
    return _paint(cc_rows["row"], cc_rows["col"], labels, shape, land, background)


def draw_bounding_box(
    image: np.ndarray, top: int, left: int, bottom: int, right: int,
) -> np.ndarray:
    """In-place 0xFF box outline on an (H, W, C) uint8 image —
    src/imtag_statistics.cpp:6-27 semantics, including the quirk that
    the right edge is drawn AT column ``right`` (the half-open bound),
    one past the box; where the reference's flat memset would run off
    the pixel grid (right == width) the write is clipped instead of
    invoking C undefined behavior."""
    h, w = image.shape[:2]
    if right == 0 or right > w or right <= left or bottom == 0:
        return image
    image[top, left:right] = 0xFF
    if bottom < h:
        image[bottom, left:right] = 0xFF
    for y in range(top, min(bottom, h)):
        image[y, left] = 0xFF
        if right < w:
            image[y, right] = 0xFF
    return image


def draw_crosshair(
    image: np.ndarray, x: int, y: int, half_length: int = 4,
    color: tuple = (0, 0, 0),
) -> np.ndarray:
    """In-place crosshair centered at (x, y) on an (H, W, C) uint8
    image — test/deps/stb_image_library.cpp:120-134 semantics exactly:
    off-image centers are a no-op, arms are half-open
    [lo, min(dim-1, center+half_length+1)) spans (the reference clamps
    the EXCLUSIVE end to dim-1, so an arm reaching the image edge stops
    one pixel short — quirk preserved), and only the first C channels
    of ``color`` are written."""
    h, w = image.shape[:2]
    nch = 1 if image.ndim == 2 else image.shape[2]
    if x >= w or y >= h or x < 0 or y < 0:
        return image
    c = np.asarray(color[:nch] if nch > 1 else color[:1], dtype=np.uint8)
    y0 = 0 if half_length > y else y - half_length
    y1 = min(h - 1, y + half_length + 1)
    x0 = 0 if half_length > x else x - half_length
    x1 = min(w - 1, x + half_length + 1)
    if image.ndim == 2:
        image[y0:y1, x] = c[0]
        image[y, x0:x1] = c[0]
    else:
        image[y0:y1, x, :nch] = c
        image[y, x0:x1, :nch] = c
    return image


def draw_component(
    image: np.ndarray, segments, color: tuple = (0, 0, 0),
) -> np.ndarray:
    """In-place component rasterizer — include/imtag_statistics.hpp:
    88-105 ``draw(component, ...)`` semantics: every scanline segment
    (row, column_begin, column_end) is filled half-open with ``color``
    (first C channels). ``segments`` is an iterable of (row, col_begin,
    col_end) triples or a dict of equal-length arrays with those
    keys."""
    nch = 1 if image.ndim == 2 else image.shape[2]
    c = np.asarray(color[:nch] if nch > 1 else color[:1], dtype=np.uint8)
    if isinstance(segments, dict):
        segments = zip(
            segments["row"], segments["col_begin"], segments["col_end"]
        )
    for row, cb, ce in segments:
        if image.ndim == 2:
            image[int(row), int(cb):int(ce)] = c[0]
        else:
            image[int(row), int(cb):int(ce), :nch] = c
    return image
