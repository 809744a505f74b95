"""Dense single-machine graph-algorithm oracles (tests only).

networkx 3.x's pagerank requires scipy (absent in this sandbox), so the
PageRank oracle is an independent dense-numpy power iteration with the
published NetworkX semantics: unweighted simple digraph, uniform start,
dangling mass redistributed uniformly, convergence when
L1(x' - x) < N * tol. Deliberately a different implementation shape
(dense matrix) than the engine (distributed edge scan) so the
differential test is meaningful.
"""

from __future__ import annotations

import numpy as np


def pagerank_oracle(
    edges: list[tuple[str, str]],
    alpha: float = 0.85,
    tol: float = 1e-12,
    max_iter: int = 500,
) -> dict[str, float]:
    nodes = sorted({u for e in edges for u in e})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    if n == 0:
        return {}
    # dedup edges, drop self-loops? networkx keeps self-loops; keep them.
    pairs = sorted({(idx[s], idx[d]) for s, d in edges})
    src = np.array([p[0] for p in pairs])
    dst = np.array([p[1] for p in pairs])
    outdeg = np.bincount(src, minlength=n).astype(float)
    dangling = outdeg == 0
    x = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        contrib = np.zeros(n)
        nz = outdeg > 0
        contrib[nz] = x[nz] / outdeg[nz]
        incoming = np.zeros(n)
        np.add.at(incoming, dst, contrib[src])
        dm = x[dangling].sum()
        x_new = (1 - alpha) / n + alpha * (incoming + dm / n)
        if np.abs(x_new - x).sum() < n * tol:
            x = x_new
            break
        x = x_new
    return {u: float(x[idx[u]]) for u in nodes}
