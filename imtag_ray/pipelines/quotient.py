"""Graph contraction: collapse a vertex labeling into a quotient graph.

The coarsening step every multilevel graph algorithm (Louvain,
multilevel partitioning, METIS-style coarsening) needs: given a graph
and a per-vertex label (community, component, host, shard), contract
each label class to a single super-vertex and emit the weighted
quotient edge table — one row per unordered label pair, weight = how
many original edges connect the two classes (label_a == label_b rows
are the intra-class edge counts / self-loops).

This generalizes the reference's ``compressed_freeze`` dense relabel
(src/imtag.cpp:78-103 collapses the run table's provisional labels to
canonical component ids): there the "quotient" is the component list
itself; here edges between classes survive as weighted super-edges.

Scale shape: two hash joins (labels onto src, then dst — materialized
between, the Ray 2.49 two-joins-per-plan deadlock guard) and ONE
bucketed aggregation over the label-pair keys. No driver state at any
size; label-pair cardinality is ≤ E so the groupby must never see raw
Ray groupby keys (util.bucketed_sum_aggregate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import bucketed_sum_aggregate, compact_nonempty

_EMPTY = pa.table(
    {
        "label_a": pa.array([], pa.string()),
        "label_b": pa.array([], pa.string()),
        "weight": pa.array([], pa.int64()),
    }
)


def quotient_edges(
    graph: Graph,
    labels: "ray.data.Dataset",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset | pa.Table":
    """→ Dataset (label_a, label_b, weight), label_a <= label_b.

    ``labels``: Dataset (vid, label) — every vertex must carry a label
    (use '' for never-labeled vertices, as label_propagation emits).
    Each DIRECTED edge of ``graph.edges`` contributes 1 to its
    unordered label pair; intra-class edges land on label_a == label_b.
    """
    P = cfg.num_partitions
    edges = compact_nonempty(graph.edges.select_columns(["src", "dst"]))
    if edges is None:
        return _EMPTY
    labs = compact_nonempty(labels.select_columns(["vid", "label"]))
    if labs is None:
        return _EMPTY
    lab_s = labs.rename_columns({"label": "lab_s"})
    lab_d = labs.rename_columns({"label": "lab_d"})
    tagged = compact_nonempty(
        edges.join(
            lab_s, join_type="inner", num_partitions=P,
            on=("src",), right_on=("vid",),
        ).materialize()
    )
    if tagged is None:
        return _EMPTY
    tagged = compact_nonempty(
        tagged.join(
            lab_d, join_type="inner", num_partitions=P,
            on=("dst",), right_on=("vid",),
        ).materialize()
    )
    if tagged is None:
        return _EMPTY

    def canon(t: pa.Table) -> pa.Table:
        a = np.asarray(t.column("lab_s"), dtype=object)
        b = np.asarray(t.column("lab_d"), dtype=object)
        lo = np.minimum(a, b)
        hi = np.maximum(a, b)
        return pa.table(
            {
                "label_a": pa.array(lo, pa.string()),
                "label_b": pa.array(hi, pa.string()),
                "weight": pa.array(
                    np.ones(t.num_rows, dtype=np.int64), pa.int64()
                ),
            }
        )

    out = bucketed_sum_aggregate(
        tagged.map_batches(canon, batch_format="pyarrow"),
        key_cols=["label_a", "label_b"],
        sum_cols=["weight"],
    )
    return compact_nonempty(out) or _EMPTY
