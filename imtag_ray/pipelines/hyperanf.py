"""HyperANF — approximate r-hop neighborhood sizes for EVERY vertex
(Boldi, Rosa & Vigna, "HyperANF: approximating the neighbourhood
function of very large graphs on a budget", WWW 2011): each vertex
carries a HyperLogLog sketch of the set it can reach within r forward
hops, and one round max-merges every vertex's sketch with its
out-neighbors' sketches. This is THE scale path for reach/centrality
analysis of a trillion-edge web graph — exact ball sizes stream
Σ deg^r rows (a single 10^7-degree hub is intractable at r=2 already),
while HyperANF moves at most E·2^p register rows per round no matter
how skewed the degree distribution is.

It is the radius-r generalization of linkpred.ball2_sizes_approx (the
undirected r=2 special case) and shares its register hash (splitmix64
of the vid) and estimator (alpha_m·m²/Z with the linear-counting
small-ball branch, floor(est+0.5) rounding) so the DuckDB oracle's
bit-exact HUGEINT replay covers both.

Modes follow the engine convention (imtag's cached run-table state,
ref include/imtag.hpp:87, re-expressed for a cluster):

- ``broadcast``: the V×2^p uint8 register matrix lives on the driver
  and each round is a chunked ``np.maximum.at`` gather along the edge
  array — the in-memory HyperANF of the paper. Gated on BOTH
  ``broadcast_max_vertices`` (scaled by the m-byte-per-vertex register
  cost) and ``broadcast_max_edges``.
- ``shuffle``: registers are a (v, j, rho) Dataset; one round = one
  vid-keyed relay join + one bucketed (v, j) max-aggregation — no
  driver state at any point, the 10^12-vertex path.

Synchronous rounds (round k reads only round k-1's registers) make the
two modes bit-identical in register content; the float estimate sums
registers in different orders, which the oracle's exact HUGEINT Z
bounds to ~1e-13 relative — far inside the integer rounding.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import (
    bucketed_aggregate,
    bucketed_sum_aggregate,
    col_np,
    compact_nonempty,
    dataset_to_numpy,
    table_from_arrays,
)
from .linkpred import _hll_parts

_EMPTY = pa.table(
    {"url": pa.array([], pa.string()), "ball": pa.array([], pa.int64())}
)


def _estimate_balls(z: np.ndarray, nreg: np.ndarray, m: int) -> np.ndarray:
    """Shared estimator: z = Σ 2^-rho over PRESENT registers, nreg =
    number of present (nonzero) registers. Absent registers contribute
    2^0. Same float formula + floor(est+0.5) as ball2_sizes_approx —
    the oracle replays it bit-exactly."""
    alpha = 0.7213 / (1.0 + 1.079 / m)
    zeros = (m - nreg).astype(np.int64)
    zfull = z.astype(np.float64) + zeros.astype(np.float64)
    e_raw = alpha * m * m / zfull
    lin = np.where(zeros > 0, m * np.log(m / np.maximum(zeros, 1)), e_raw)
    est = np.where((e_raw <= 2.5 * m) & (zeros > 0), lin, e_raw)
    return np.floor(est + 0.5).astype(np.int64)


def _ball_coefs(radius: int) -> list[float]:
    """Telescoped harmonic weights: H(v) = Σ_{k=1..r} (b_k − b_{k−1})/k
    = Σ_k coef_k · b_k with coef_0 = −1, coef_k = 1/k − 1/(k+1) for
    k < r, coef_r = 1/r — so per-round ball estimates can be summed
    with ONE bucketed aggregation instead of r successive joins."""
    coefs = [-1.0]
    for k in range(1, radius):
        coefs.append(1.0 / k - 1.0 / (k + 1))
    if radius >= 1:
        coefs.append(1.0 / radius)
    return coefs


def _pick_mode(graph: Graph, cfg: EngineConfig, m: int) -> str:
    # the register matrix costs m bytes/vertex (vs 8 for a rank
    # vector), so scale the vertex gate accordingly
    v_budget = max(1, cfg.broadcast_max_vertices // max(1, m // 8))
    if (
        graph.num_vertices <= v_budget
        and graph.num_edges <= cfg.broadcast_max_edges
    ):
        return "broadcast"
    return "shuffle"


def hyperanf(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    radius: int = 3,
    p: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, ball): approximate |{w : dist(v→w) ≤ radius}|
    (including v itself) along FORWARD edges, per vertex."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY)
    mode = mode or _pick_mode(graph, cfg, 1 << p)
    if mode == "broadcast":
        return _hyperanf_broadcast(graph, cfg, radius, p)
    return _hyperanf_shuffle(graph, cfg, radius, p)


def harmonic_centrality_approx(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    radius: int = 3,
    p: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (url, harmonic): approximate truncated harmonic
    centrality H(v) = Σ_{1≤d(v→w)≤radius} 1/d(v→w), computed from the
    HyperANF per-round INTEGER ball estimates via the telescoped sum
    Σ coef_k·b_k(v) (see _ball_coefs) — the HyperBall centrality of
    Boldi & Vigna ("In-core computation of geometric centralities with
    HyperBall", ICDMW 2013). Using the rounded integer ball estimates
    makes the value exactly replayable by the SQL oracle; output is
    rounded to 9 decimals (the engine's float-column convention)."""
    empty = pa.table(
        {"url": pa.array([], pa.string()),
         "harmonic": pa.array([], pa.float64())}
    )
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    if radius < 1:
        return graph.vertices.map_batches(
            lambda t: pa.table(
                {"url": t.column("url"),
                 "harmonic": pa.array(
                     np.zeros(t.num_rows), pa.float64()
                 )}
            ),
            batch_format="pyarrow",
        )
    mode = mode or _pick_mode(graph, cfg, 1 << p)
    coefs = _ball_coefs(radius)
    if mode == "broadcast":
        return _harmonic_broadcast(graph, cfg, radius, p, coefs)
    return _harmonic_shuffle(graph, cfg, radius, p, coefs)


_EMPTY_NF = pa.table(
    {"k": pa.array([], pa.int64()), "nf": pa.array([], pa.int64())}
)


def neighbourhood_function(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    radius: int = 4,
    p: int = 8,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset (k, nf) for k = 0..radius: the graph's neighbourhood
    function N(k) = Σ_v |ball_k(v)| — the number of reachable ordered
    pairs within k forward hops — estimated as the sum of the per-round
    INTEGER HyperANF ball estimates (so both modes and the SQL oracle
    agree bit-exactly). This is THE summary statistic HyperANF was
    built for (Boldi-Rosa-Vigna WWW 2011 §1: distance distribution /
    effective diameter of the web graph); the reference's analogue is
    whole-image component statistics over the cached segmentation state
    (include/imtag_statistics.hpp), generalized to reachability.

    Scale: per round ≤ E·2^p register rows move (shuffle mode); the
    output is radius+1 rows regardless of graph size."""
    if graph.num_vertices == 0:
        return ray.data.from_arrow(_EMPTY_NF)
    mode = mode or _pick_mode(graph, cfg, 1 << p)
    if mode == "broadcast":
        nf = _nf_broadcast(graph, cfg, radius, p)
    else:
        nf = _nf_shuffle(graph, cfg, radius, p)
    return ray.data.from_arrow(
        pa.table(
            {"k": pa.array(range(radius + 1), pa.int64()),
             "nf": pa.array(nf, pa.int64())}
        )
    )


def effective_diameter(
    graph: Graph,
    cfg: EngineConfig = DEFAULT_CONFIG,
    radius: int = 4,
    p: int = 8,
    q: float = 0.9,
    mode: str | None = None,
) -> "ray.data.Dataset":
    """→ Dataset with ONE row (eff_diam float64): the interpolated
    q-effective diameter — the x where the neighbourhood function
    reaches q·N(radius) (classic HyperANF definition, q = 0.9).
    Computed from the radius+1 integer N(k) values: with k0 the
    smallest k where N(k) ≥ q·N(radius),
        eff = (k0−1) + (q·N(radius) − N(k0−1)) / (N(k0) − N(k0−1))
    (0.0 when k0 = 0). Pure float64 arithmetic in a fixed operation
    order so the SQL oracle reproduces the double exactly; rounded to
    9 decimals (engine float-column convention).

    `radius` must be ≥ the true diameter for the asymptotic N(∞)
    semantics; with a truncated radius this is the effective diameter
    of the truncated distance distribution (documented, deterministic
    either way)."""
    empty = pa.table({"eff_diam": pa.array([], pa.float64())})
    if graph.num_vertices == 0:
        return ray.data.from_arrow(empty)
    nf_rows = neighbourhood_function(graph, cfg, radius, p, mode).take_all()
    nf = [0] * (radius + 1)
    for r in nf_rows:
        nf[int(r["k"])] = int(r["nf"])
    t = q * float(nf[radius])
    k0 = next(k for k in range(radius + 1) if float(nf[k]) >= t)
    if k0 == 0:
        eff = 0.0
    else:
        eff = (k0 - 1) + (t - float(nf[k0 - 1])) / (
            float(nf[k0]) - float(nf[k0 - 1])
        )
    return ray.data.from_arrow(
        pa.table({"eff_diam": pa.array([round(eff, 9)], pa.float64())})
    )


def _nf_broadcast(
    graph: Graph, cfg: EngineConfig, radius: int, p: int
) -> list:
    """Σ_v integer ball estimates per round from the driver-resident
    register matrix (same chunked gather as _hyperanf_broadcast)."""
    m = 1 << p
    V = graph.num_vertices
    j, rho = _hll_parts(np.arange(V, dtype=np.int64), p)
    reg = np.zeros((V, m), dtype=np.uint8)
    reg[np.arange(V), j] = rho.astype(np.uint8)

    def balls_of(r: np.ndarray) -> np.ndarray:
        nz = r != 0
        nreg = nz.sum(axis=1).astype(np.int64)
        z = np.where(nz, np.ldexp(1.0, -r.astype(np.int64)), 0.0).sum(axis=1)
        return _estimate_balls(z, nreg, m)

    e = dataset_to_numpy(graph.edges, "src", "dst")
    src = e["src"].astype(np.int64)
    dst = e["dst"].astype(np.int64)
    chunk = max(1, (64 << 20) // m)
    nf = [int(balls_of(reg).sum())]
    for _ in range(radius):
        new = reg.copy()
        for lo in range(0, len(src), chunk):
            s = src[lo : lo + chunk]
            d = dst[lo : lo + chunk]
            np.maximum.at(new, s, reg[d])
        reg = new
        nf.append(int(balls_of(reg).sum()))
    return nf


def _nf_shuffle(
    graph: Graph, cfg: EngineConfig, radius: int, p: int
) -> list:
    """Dataset-state rounds (register Dataset + relay join + bucketed
    (v, j) max, exactly _hyperanf_shuffle's exchange); per round ONE
    scalar Sum over the per-vertex integer estimates — the only
    driver-resident state is radius+1 integers."""
    m = 1 << p
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)

    def selfregs(t: pa.Table, _p=p) -> pa.Table:
        v = col_np(t, "vid").astype(np.int64)
        jj, rr = _hll_parts(v, _p)
        return table_from_arrays(v=v, j=jj, rho=rr)

    s = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            selfregs, batch_format="pyarrow"
        )
    ).materialize()
    edges = compact_nonempty(
        graph.edges.select_columns(["src", "dst"]).map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "src").astype(np.int64),
                dst=col_np(t, "dst").astype(np.int64),
            ),
            batch_format="pyarrow",
        )
    )

    def nf_of(regs: "ray.data.Dataset") -> int:
        def terms(t: pa.Table) -> pa.Table:
            rho = col_np(t, "rho").astype(np.int64)
            return table_from_arrays(
                v=col_np(t, "v").astype(np.int64),
                z=np.ldexp(1.0, -rho),
                nreg=np.ones(len(rho), dtype=np.int64),
            )

        sums = compact_nonempty(
            bucketed_sum_aggregate(
                regs.map_batches(terms, batch_format="pyarrow"),
                key_cols=["v"], sum_cols=["z", "nreg"],
            )
        )
        if sums is None:
            return 0

        def est(t: pa.Table, _m=m) -> pa.Table:
            return table_from_arrays(
                ball=_estimate_balls(
                    col_np(t, "z").astype(np.float64),
                    col_np(t, "nreg").astype(np.int64),
                    _m,
                )
            )

        total = sums.map_batches(est, batch_format="pyarrow").sum("ball")
        return int(total or 0)

    nf = [nf_of(s)]
    for _ in range(radius):
        if edges is not None:
            relayed = compact_nonempty(
                edges.join(
                    s.rename_columns({"v": "w"}),
                    join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("w",),
                ).map_batches(
                    lambda t: (
                        pa.table(
                            {"v": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())}
                        )
                        if t.num_rows == 0
                        else table_from_arrays(
                            v=col_np(t, "src").astype(np.int64),
                            j=col_np(t, "j").astype(np.int64),
                            rho=col_np(t, "rho").astype(np.int64),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            if relayed is not None:
                s = compact_nonempty(
                    bucketed_aggregate(
                        s.union(relayed),
                        key_cols=["v", "j"], aggs=[("rho", "max", "rho")],
                        num_buckets=n_buckets,
                    )
                ).materialize()
        nf.append(nf_of(s))
    return nf


def _harmonic_broadcast(
    graph: Graph, cfg: EngineConfig, radius: int, p: int, coefs: list
) -> "ray.data.Dataset":
    m = 1 << p
    V = graph.num_vertices
    j, rho = _hll_parts(np.arange(V, dtype=np.int64), p)
    reg = np.zeros((V, m), dtype=np.uint8)
    reg[np.arange(V), j] = rho.astype(np.uint8)

    def balls_of(r: np.ndarray) -> np.ndarray:
        nz = r != 0
        nreg = nz.sum(axis=1).astype(np.int64)
        z = np.where(nz, np.ldexp(1.0, -r.astype(np.int64)), 0.0).sum(axis=1)
        return _estimate_balls(z, nreg, m)

    e = dataset_to_numpy(graph.edges, "src", "dst")
    src = e["src"].astype(np.int64)
    dst = e["dst"].astype(np.int64)
    chunk = max(1, (64 << 20) // m)
    h = coefs[0] * balls_of(reg).astype(np.float64)
    for k in range(1, radius + 1):
        new = reg.copy()
        for lo in range(0, len(src), chunk):
            s = src[lo : lo + chunk]
            d = dst[lo : lo + chunk]
            np.maximum.at(new, s, reg[d])
        reg = new
        h = h + coefs[k] * balls_of(reg).astype(np.float64)
    h = np.round(h, 9)
    href = ray.put(h)

    def attach(t: pa.Table, _h=href) -> pa.Table:
        hv = ray.get(_h)
        return pa.table(
            {"url": t.column("url"),
             "harmonic": pa.array(hv[col_np(t, "vid")], pa.float64())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _harmonic_shuffle(
    graph: Graph, cfg: EngineConfig, radius: int, p: int, coefs: list
) -> "ray.data.Dataset":
    m = 1 << p
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)

    def selfregs(t: pa.Table, _p=p) -> pa.Table:
        v = col_np(t, "vid").astype(np.int64)
        jj, rr = _hll_parts(v, _p)
        return table_from_arrays(v=v, j=jj, rho=rr)

    s = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            selfregs, batch_format="pyarrow"
        )
    ).materialize()
    edges = compact_nonempty(
        graph.edges.select_columns(["src", "dst"]).map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "src").astype(np.int64),
                dst=col_np(t, "dst").astype(np.int64),
            ),
            batch_format="pyarrow",
        )
    )

    def est_terms(regs: "ray.data.Dataset", coef: float):
        """(v, part = coef · integer-ball-estimate) from a register
        Dataset: per-(v) sums then the shared estimator."""

        def terms(t: pa.Table) -> pa.Table:
            r = col_np(t, "rho").astype(np.int64)
            return table_from_arrays(
                v=col_np(t, "v").astype(np.int64),
                z=np.ldexp(1.0, -r),
                nreg=np.ones(len(r), dtype=np.int64),
            )

        sums = compact_nonempty(
            bucketed_sum_aggregate(
                regs.map_batches(terms, batch_format="pyarrow"),
                key_cols=["v"], sum_cols=["z", "nreg"],
            )
        )

        def part(t: pa.Table, _m=m, _c=coef) -> pa.Table:
            b = _estimate_balls(
                col_np(t, "z").astype(np.float64),
                col_np(t, "nreg").astype(np.int64),
                _m,
            )
            return table_from_arrays(
                v=col_np(t, "v").astype(np.int64),
                part=_c * b.astype(np.float64),
            )

        return sums.map_batches(part, batch_format="pyarrow")

    contribs = [est_terms(s, coefs[0])]
    cur = s
    for k in range(1, radius + 1):
        if edges is not None:
            relayed = compact_nonempty(
                edges.join(
                    cur.rename_columns({"v": "w"}),
                    join_type="inner", num_partitions=P,
                    on=("dst",), right_on=("w",),
                ).map_batches(
                    lambda t: (
                        pa.table(
                            {"v": pa.array([], pa.int64()),
                             "j": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())}
                        )
                        if t.num_rows == 0
                        else table_from_arrays(
                            v=col_np(t, "src").astype(np.int64),
                            j=col_np(t, "j").astype(np.int64),
                            rho=col_np(t, "rho").astype(np.int64),
                        )
                    ),
                    batch_format="pyarrow",
                )
            )
            if relayed is not None:
                cur = compact_nonempty(
                    bucketed_aggregate(
                        cur.union(relayed),
                        key_cols=["v", "j"], aggs=[("rho", "max", "rho")],
                        num_buckets=n_buckets,
                    )
                ).materialize()
        contribs.append(est_terms(cur, coefs[k]))

    union = contribs[0]
    for c in contribs[1:]:
        union = union.union(c)
    total = compact_nonempty(
        bucketed_sum_aggregate(union, key_cols=["v"], sum_cols=["part"])
    )

    def fin(t: pa.Table) -> pa.Table:
        return table_from_arrays(
            v=col_np(t, "v").astype(np.int64),
            harmonic=np.round(col_np(t, "part").astype(np.float64), 9),
        )

    return (
        total.map_batches(fin, batch_format="pyarrow")
        .join(
            graph.vertices.select_columns(["vid", "url"]),
            join_type="inner", num_partitions=P,
            on=("v",), right_on=("vid",),
        )
        .select_columns(["url", "harmonic"])
    )


def _hyperanf_broadcast(
    graph: Graph, cfg: EngineConfig, radius: int, p: int
) -> "ray.data.Dataset":
    m = 1 << p
    V = graph.num_vertices
    j, rho = _hll_parts(np.arange(V, dtype=np.int64), p)
    reg = np.zeros((V, m), dtype=np.uint8)
    reg[np.arange(V), j] = rho.astype(np.uint8)

    e = dataset_to_numpy(graph.edges, "src", "dst")
    src = e["src"].astype(np.int64)
    dst = e["dst"].astype(np.int64)

    chunk = max(1, (64 << 20) // m)  # ≤64 MiB of gathered registers
    for _ in range(radius):
        new = reg.copy()
        for lo in range(0, len(src), chunk):
            s = src[lo : lo + chunk]
            d = dst[lo : lo + chunk]
            np.maximum.at(new, s, reg[d])
        if np.array_equal(new, reg):  # balls converged early
            break
        reg = new

    nz = reg != 0
    nreg = nz.sum(axis=1).astype(np.int64)
    z = np.where(nz, np.ldexp(1.0, -reg.astype(np.int64)), 0.0).sum(axis=1)
    ball = _estimate_balls(z, nreg, m)
    bref = ray.put(ball)

    def attach(t: pa.Table, _b=bref) -> pa.Table:
        b = ray.get(_b)
        return pa.table(
            {"url": t.column("url"),
             "ball": pa.array(b[col_np(t, "vid")], pa.int64())}
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def _hyperanf_shuffle(
    graph: Graph, cfg: EngineConfig, radius: int, p: int
) -> "ray.data.Dataset":
    m = 1 << p
    P = cfg.num_partitions
    n_buckets = max(P * 32, 256)

    def selfregs(t: pa.Table, _p=p) -> pa.Table:
        v = col_np(t, "vid").astype(np.int64)
        j, rho = _hll_parts(v, _p)
        return table_from_arrays(v=v, j=j, rho=rho)

    s = compact_nonempty(
        graph.vertices.select_columns(["vid"]).map_batches(
            selfregs, batch_format="pyarrow"
        )
    ).materialize()

    edges = compact_nonempty(
        graph.edges.select_columns(["src", "dst"]).map_batches(
            lambda t: table_from_arrays(
                src=col_np(t, "src").astype(np.int64),
                dst=col_np(t, "dst").astype(np.int64),
            ),
            batch_format="pyarrow",
        )
    )
    for _ in range(radius):
        if edges is None:
            break
        relayed = compact_nonempty(
            edges.join(
                s.rename_columns({"v": "w"}),
                join_type="inner", num_partitions=P,
                on=("dst",), right_on=("w",),
            ).map_batches(
                lambda t: (
                    pa.table(
                        {"v": pa.array([], pa.int64()),
                         "j": pa.array([], pa.int64()),
                         "rho": pa.array([], pa.int64())}
                    )
                    if t.num_rows == 0  # post-join empties: schema-less
                    else table_from_arrays(
                        v=col_np(t, "src").astype(np.int64),
                        j=col_np(t, "j").astype(np.int64),
                        rho=col_np(t, "rho").astype(np.int64),
                    )
                ),
                batch_format="pyarrow",
            )
        )
        if relayed is None:
            break
        s = compact_nonempty(
            bucketed_aggregate(
                s.union(relayed),
                key_cols=["v", "j"], aggs=[("rho", "max", "rho")],
                num_buckets=n_buckets,
            )
        ).materialize()

    def terms(t: pa.Table) -> pa.Table:
        rho = col_np(t, "rho").astype(np.int64)
        return table_from_arrays(
            v=col_np(t, "v").astype(np.int64),
            z=np.ldexp(1.0, -rho),
            nreg=np.ones(len(rho), dtype=np.int64),
        )

    sums = compact_nonempty(
        bucketed_sum_aggregate(
            s.map_batches(terms, batch_format="pyarrow"),
            key_cols=["v"], sum_cols=["z", "nreg"],
        )
    )
    if sums is None:
        return ray.data.from_arrow(_EMPTY)

    def estimate(t: pa.Table, _m=m) -> pa.Table:
        return table_from_arrays(
            v=col_np(t, "v").astype(np.int64),
            ball=_estimate_balls(
                col_np(t, "z").astype(np.float64),
                col_np(t, "nreg").astype(np.int64),
                _m,
            ),
        )

    return (
        sums.map_batches(estimate, batch_format="pyarrow")
        .join(
            graph.vertices.select_columns(["vid", "url"]),
            join_type="inner", num_partitions=P,
            on=("v",), right_on=("vid",),
        )
        .select_columns(["url", "ball"])
    )
