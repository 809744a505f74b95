"""Pure-Python oracle reimplementing the reference's CCL semantics
(SURVEY.md §5: run extraction + union-find with lt_cmp + first-appearance
dense relabel). Used ONLY by tests as the exact-conformance oracle for
lattice fixtures; never by the engine.

Semantics mirrored (with citations into /root/reference):
- run extraction per row, left→right, rows in order, dense run labels in
  row-major order (src/SegmentImageImpl_Scanline.cpp:40-96)
- adjacent-row overlap predicates: CROSS strict '<' on half-open
  intervals, EIGHT_WAY '<=' (src/SegmentImageImpl.cpp:53-76)
- union-find with path compression and min-root union (lt_cmp,
  src/disjoint_set.hpp:22-27,125-137)
- compressed_freeze: dense final labels in first-appearance scan order
  (src/disjoint_set.hpp:73-96)
- HORIZONTAL: each run is its own component (intended semantics; the
  reference's code path crashes — SURVEY.md §2.11 defect #1)
"""

from __future__ import annotations

import numpy as np


def extract_runs(img: np.ndarray) -> list[tuple[int, int, int]]:
    """Maximal horizontal foreground runs as (row, col_begin, col_end_excl),
    in row-major scan order — the dense run labeling order."""
    runs = []
    for r in range(img.shape[0]):
        row = img[r]
        padded = np.concatenate([[False], row, [False]])
        diff = np.diff(padded.astype(np.int8))
        starts = np.flatnonzero(diff == 1)
        ends = np.flatnonzero(diff == -1)
        for b, e in zip(starts, ends):
            runs.append((r, int(b), int(e)))
    return runs


class _DS:
    def __init__(self, n: int):
        self.p = list(range(n))

    def find(self, x: int) -> int:
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]  # path halving, ref :54-64
            x = self.p[x]
        return x

    def unite(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if rb < ra:  # lt_cmp: smaller root wins, ref :22-27
            ra, rb = rb, ra
        self.p[rb] = ra


def _overlaps(a, b, eight: bool) -> bool:
    # a, b are (begin, end_exclusive) runs in adjacent rows.
    if eight:
        return a[0] <= b[1] and b[0] <= a[1]  # diagonal touch counts
    return a[0] < b[1] and b[0] < a[1]  # strict column sharing


def ccl_labels(img: np.ndarray, connectivity: str = "cross"):
    """Return ({(row,col): final_label}, n_components) under the
    reference's exact semantics."""
    runs = extract_runs(img)
    n = len(runs)
    ds = _DS(n)
    if connectivity != "horizontal":
        eight = connectivity == "eight"
        by_row: dict[int, list[tuple[int, int, int, int]]] = {}
        for i, (r, b, e) in enumerate(runs):
            by_row.setdefault(r, []).append((b, e, r, i))
        for r, cur in by_row.items():
            prev = by_row.get(r - 1)
            if not prev:
                continue
            for b, e, _, i in cur:
                for pb, pe, _, j in prev:
                    if _overlaps((b, e), (pb, pe), eight):
                        ds.unite(i, j)
    # compressed_freeze: dense relabel in first-appearance scan order
    remap: dict[int, int] = {}
    final = []
    for i in range(n):
        root = ds.find(i)
        if root not in remap:
            remap[root] = len(remap)
        final.append(remap[root])
    labels: dict[tuple[int, int], int] = {}
    for (r, b, e), lab in zip(runs, final):
        for c in range(b, e):
            labels[(r, c)] = lab
    return labels, len(remap)
