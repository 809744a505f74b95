"""Semi-supervised label propagation (SURVEY.md §7.1 M5).

Reuses the hash-min machinery of connected components with a
mode-update rule instead of min (ref mapping: disjoint_set's policy
point ``label_cmp_func``, src/disjoint_set.hpp:30-34 — the propagation
rule is pluggable; CC uses min, LP uses most-frequent-with-min-tiebreak).

Semantics (deterministic, synchronous):
- seed vertices are clamped to their seed label forever
- every round, each non-seed vertex adopts the most frequent label
  among its labeled neighbors (undirected); ties → lexicographically
  smallest label; no labeled neighbor → unchanged
- converges when no vertex changes (or max_iterations)

The engine result is differentially tested against a pure-Python
reference loop with identical semantics (tests/test_labelprop.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from ..config import DEFAULT_CONFIG, EngineConfig
from ..stages.graph_build import Graph
from ..util import col_np, dataset_to_numpy, table_from_arrays

UNLABELED = -1


def label_propagation(
    graph: Graph,
    seeds: dict[str, str],
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> "ray.data.Dataset":
    """→ Dataset (vid, url, label) — label '' for never-labeled vertices.

    Broadcast vertex state (label-code array via ray.put per round);
    per-batch combiner pre-counts (vid, label) pairs so the shuffle
    moves count rows, not edge rows.
    """
    vocab = sorted(set(seeds.values()))
    code = {s: i for i, s in enumerate(vocab)}

    # Resolve seed urls → vids with a filtered vertex scan (the seed set
    # is tiny; never build a driver dict of ALL urls).
    seed_set = pa.array(sorted(seeds.keys()), type=pa.string())

    def find_seeds(t: pa.Table, _set=seed_set) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.is_in(t["url"], value_set=_set)).select(
            ["vid", "url"]
        )

    url_to_vid = {
        r["url"]: r["vid"]
        for r in graph.vertices.map_batches(
            find_seeds, batch_format="pyarrow"
        ).take_all()
    }

    V = graph.num_vertices
    lab = np.full(V, UNLABELED, dtype=np.int64)
    is_seed = np.zeros(V, dtype=bool)
    for u, s in seeds.items():
        vid = url_to_vid.get(u)
        if vid is not None:
            lab[vid] = code[s]
            is_seed[vid] = True

    # Canonicalize to DISTINCT undirected (min,max) pairs before voting:
    # web link graphs commonly contain both (u,v) and (v,u), and counting
    # a neighbor's vote once per directed row would double it (diverging
    # from the documented most-frequent-among-NEIGHBORS semantics and
    # from label_propagation_reference's set-based adjacency).
    def canon(t: pa.Table, _V=V) -> pa.Table:
        src = col_np(t, "src")
        dst = col_np(t, "dst")
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        key = np.unique(lo.astype(np.int64) * _V + hi)
        return table_from_arrays(src=key // _V, dst=key % _V)

    edges = (
        graph.edges.select_columns(["src", "dst"])
        .map_batches(canon, batch_format="pyarrow")
        .groupby(["src", "dst"])
        .count()
        .select_columns(["src", "dst"])
        .materialize()
    )
    L = max(len(vocab), 1)

    for _ in range(cfg.max_iterations):
        ref = ray.put(lab)

        def step(batch: pa.Table, _ref=ref, _L=L) -> pa.Table:
            labels = ray.get(_ref)
            src = col_np(batch, "src")
            dst = col_np(batch, "dst")
            # undirected: each endpoint votes for the other; a self-loop
            # contributes ONE self-vote (set-adjacency semantics)
            m = src != dst
            voters = np.concatenate([labels[src], labels[dst[m]]])
            targets = np.concatenate([dst, src[m]])
            ok = voters != UNLABELED
            key = targets[ok] * _L + voters[ok]  # (vid,label) composite
            uniq, counts = np.unique(key, return_counts=True)
            return table_from_arrays(
                vid=uniq // _L, label=uniq % _L, cnt=counts.astype(np.int64)
            )

        agg = (
            edges.map_batches(step, batch_format="pyarrow")
            .groupby(["vid", "label"])
            .aggregate(Sum("cnt", alias_name="cnt"))
        )
        res = dataset_to_numpy(agg, "vid", "label", "cnt")
        if len(res["vid"]) == 0:
            break
        # argmax with (count desc, label asc) tie-break: sort rows by
        # (vid asc, cnt desc, label asc) and take the first per vid
        order = np.lexsort((res["label"], -res["cnt"], res["vid"]))
        vids = res["vid"][order]
        labs = res["label"][order]
        first = np.ones(len(vids), dtype=bool)
        first[1:] = vids[1:] != vids[:-1]
        winner_vid = vids[first]
        winner_lab = labs[first]

        new = lab.copy()
        upd = ~is_seed[winner_vid]
        new[winner_vid[upd]] = winner_lab[upd]
        if np.array_equal(new, lab):
            break
        lab = new

    out_labels = np.array([""] + vocab, dtype=object)[lab + 1]
    lab_ref = ray.put(out_labels)

    def attach(batch: pa.Table, _ref=lab_ref) -> pa.Table:
        lbl = ray.get(_ref)
        vid = col_np(batch, "vid")
        return batch.append_column(
            "label", pa.array([str(x) for x in lbl[vid]], type=pa.string())
        )

    return graph.vertices.map_batches(attach, batch_format="pyarrow")


def label_propagation_reference(
    edges: list[tuple[str, str]],
    seeds: dict[str, str],
    max_iterations: int = 100,
) -> dict[str, str]:
    """Pure-Python oracle with identical semantics (tests only)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    verts = set()
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
        verts.update((s, d))
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(max_iterations):
        new = dict(lab)
        for v in verts:
            if v in seeds:
                continue
            votes = Counter(
                lab[n] for n in adj[v] if lab[n] is not None
            )
            if votes:
                best = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
                new[v] = best[0]
        if new == lab:
            break
        lab = new
    return {v: (s if s is not None else "") for v, s in lab.items()}
