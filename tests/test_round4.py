"""Round-4 kernels: densest-subgraph peel census (python replay),
winnowing fingerprint guarantee, curriculum-bucket invariants."""

import collections

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.traversal import densest_census
from imtag_ray.stages.graph_build import build_graph

CFG = EngineConfig(num_partitions=4)


def _graph(pairs):
    t = pa.table(
        {"src_url": [a for a, _ in pairs], "dst_url": [b for _, b in pairs]}
    )
    return build_graph(ray.data.from_arrow(t), CFG)


def _densest_replay(pairs, rounds):
    """Scalar replay of Bahmani eps=1/2 peeling over canonical pairs."""
    edges = set(pairs)
    alive = {v for e in edges for v in e}
    rows = []
    for r in range(rounds):
        if not alive:
            break
        rows.append((r, len(alive), len(edges)))
        deg = collections.Counter()
        for a, b in edges:
            deg[a] += 1
            deg[b] += 1
        nv, ne = len(alive), len(edges)
        alive = {v for v in deg if deg[v] * nv > 3 * ne}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    return rows


@pytest.mark.parametrize(
    "pairs",
    [
        # K4 clique + pendant chain: clique survives the first peel
        [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
         ("c", "d"), ("d", "e"), ("e", "f")],
        # pure cycle: deg*V = 2V > 3E=3V is false -> everything peels
        [("a", "b"), ("b", "c"), ("c", "a")],
        # two dense blobs joined by a bridge
        [("a", "b"), ("a", "c"), ("b", "c"), ("x", "y"), ("x", "z"),
         ("y", "z"), ("c", "x"), ("p", "q")],
    ],
)
def test_densest_census_matches_replay(pairs):
    got = densest_census(_graph(pairs), CFG, rounds=5).to_pandas()
    exp = _densest_replay(pairs, 5)
    assert list(zip(got["rnd"], got["n_vertices"], got["n_edges"])) == exp


def test_densest_census_edgeless_zero_rounds():
    g = _graph([("a", "b")])
    out = densest_census(g, CFG, rounds=0).to_pandas()
    assert len(out) == 0


def _write_docs(tmp_path, texts):
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_winnow_shared_passage_guarantee(tmp_path):
    """Winnowing guarantee: a shared passage of >= w+k-1 = 4+3-1 tokens
    yields at least one shared fingerprint; disjoint-vocabulary docs
    share none."""
    from imtag_ray.pipelines.dataops import doc_winnow_q, winnow_pairs_q

    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    texts = [
        "one two three " + passage + " four five",
        "six seven " + passage + " eight nine ten",
        "completely different words entirely unrelated here now",
    ]
    sf = _write_docs(tmp_path, texts)
    fps = doc_winnow_q(sf).to_pandas()
    by_doc = {d: set(g["fp"]) for d, g in fps.groupby("doc_id")}
    assert by_doc[0] & by_doc[1], "shared passage must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # the pair detector finds exactly the (0,1) pair at min_shared=3
    # (a 10-token shared passage gives a run of shared fingerprints)
    pairs = winnow_pairs_q(sf, min_shared=3)
    df = pairs.to_pandas() if isinstance(pairs, pa.Table) else pairs.to_pandas()
    assert list(zip(df["id_a"], df["id_b"])) == [(0, 1)]


def test_buckets_sizes_ntile(tmp_path):
    """ntile semantics: first N mod k buckets get one extra row."""
    from imtag_ray.pipelines.dataops import doc_buckets10_q

    # 23 docs -> buckets 1..3 of size 3, buckets 4..10 of size 2
    t = pa.table(
        {"doc_id": pa.array(range(23), pa.int64()),
         "n_chars": pa.array([(i * 7919) % 101 for i in range(23)],
                             pa.int64())}
    )
    import pathlib

    pq.write_table(t, str(pathlib.Path(tmp_path) / "documents.parquet"))
    out = doc_buckets10_q(str(tmp_path)).to_pandas()
    sizes = out["bucket"].value_counts().sort_index()
    assert list(sizes) == [3, 3, 3] + [2] * 7
    # bucket order follows the curriculum key
    srt = out.sort_values(["n_chars", "doc_id"])
    assert (np.diff(srt["bucket"].to_numpy()) >= 0).all()
