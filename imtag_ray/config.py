"""Engine configuration.

Mirrors the reference's compile-time knobs as runtime config
(SURVEY.md §2.10): label width (``uint32`` vs ``uint64`` vertex ids,
ref src/imtag.cpp:120-123), connectivity selection (ref
include/imtag.hpp:46-51 → edge-predicate config), and adds the knobs a
distributed engine needs: partition counts, hub-salting threshold, and
the broadcast-vs-shuffle crossover for vertex state.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # Graph build -----------------------------------------------------------
    #: number of hash partitions for edge/vertex shuffles. At cluster scale
    #: this should be ~2-4x total cores; single-node tests use fewer.
    num_partitions: int = 32

    #: vertex-id dtype guard. The reference throws when the run count
    #: overflows the label type (src/SegmentImageImpl.cpp:85-91); we mirror
    #: that: assert vertex count < 2**32 when "uint32" is selected.
    vid_dtype: str = "uint64"

    # Iterative algorithms --------------------------------------------------
    #: vertex state strategy: "broadcast" keeps per-vertex state as a numpy
    #: array in the object store (``ray.put`` once per round, read zero-copy
    #: by every task) — right up to O(10^8) vertices per node. "shuffle"
    #: keeps state as a Dataset and joins it to edges each round — the
    #: 10^12-vertex scale path. "auto" picks by vertex count.
    vertex_state: str = "auto"

    #: crossover for "auto": above this many vertices use shuffle state.
    broadcast_max_vertices: int = 50_000_000

    #: crossover for EDGE-sized broadcast state (triangle counting's
    #: oriented CSR is O(E), not O(V)): above this many edges the
    #: 2-join shuffle path runs regardless of vertex count.
    broadcast_max_edges: int = 200_000_000

    #: vocabulary fast path: up to this many distinct urls the vid
    #: dictionary is collected+sorted on the driver (strings are heavier
    #: than the numeric vertex state, so this cap is much lower than
    #: broadcast_max_vertices); above it, the distributed
    #: distinct→sort→zip_with_index path runs.
    driver_vocab_max: int = 3_000_000

    #: hub salting: a destination with in-degree above this threshold is
    #: split into ``ceil(degree/threshold)`` salted sub-keys before the
    #: per-round groupby, then re-merged (partial+final aggregation;
    #: SURVEY.md §4.1 "Skew").
    hub_degree_threshold: int = 100_000

    # Iteration control -----------------------------------------------------
    max_iterations: int = 100
    pagerank_damping: float = 0.85
    pagerank_tol: float = 1e-9  # L-inf; tight so tests hit allclose 1e-6

    # Checkpointing ---------------------------------------------------------
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # 0 = disabled

    # Extraction ------------------------------------------------------------
    extract_concurrency: int | tuple = 4
    extract_batch_size: int = 256

    extra: dict = field(default_factory=dict)


DEFAULT_CONFIG = EngineConfig()
