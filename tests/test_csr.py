"""CSR block layout: structure, determinism, checkpoint round-trip,
PageRank-over-CSR equivalence."""

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.sources.synth import named_graph_edges
from imtag_ray.stages.csr import build_csr_blocks, pagerank_csr
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.util import dataset_to_numpy

CFG = EngineConfig(num_partitions=4)


@pytest.fixture(scope="module")
def graph():
    return build_graph(ray.data.from_arrow(named_graph_edges("gnp")), CFG)


@pytest.fixture(scope="module")
def csr(graph):
    return build_csr_blocks(graph, CFG)


def test_csr_structure(graph, csr):
    rows = csr.take_all()
    assert len(rows) <= CFG.num_partitions
    total_edges = 0
    for r in rows:
        src_ids = np.array(r["src_ids"])
        indptr = np.array(r["indptr"])
        indices = np.array(r["indices"])
        assert len(indptr) == len(src_ids) + 1
        assert indptr[-1] == len(indices)
        assert (np.diff(indptr) > 0).all()  # only present sources stored
        assert (src_ids % CFG.num_partitions == r["part"]).all()
        assert np.array_equal(src_ids, np.sort(src_ids))
        total_edges += len(indices)
    assert total_edges == graph.num_edges


def test_csr_deterministic(graph):
    a = build_csr_blocks(graph, CFG).to_pandas().sort_values("part")
    b = build_csr_blocks(graph, CFG).to_pandas().sort_values("part")
    for (_, ra), (_, rb) in zip(a.iterrows(), b.iterrows()):
        assert list(ra["src_ids"]) == list(rb["src_ids"])
        assert list(ra["indices"]) == list(rb["indices"])


def test_csr_checkpoint_roundtrip(graph, csr, tmp_path):
    out = str(tmp_path / "csr")
    csr.write_parquet(out)
    back = ray.data.read_parquet(out)
    a = csr.to_pandas().sort_values("part").reset_index(drop=True)
    b = back.to_pandas().sort_values("part").reset_index(drop=True)
    for (_, ra), (_, rb) in zip(a.iterrows(), b.iterrows()):
        assert list(ra["indices"]) == list(rb["indices"])


def test_pagerank_csr_matches_broadcast(graph, csr):
    cfg = EngineConfig(num_partitions=4, max_iterations=10, pagerank_tol=0)
    ranks_csr = pagerank_csr(graph, csr, cfg)
    pr = pagerank(graph, cfg, mode="broadcast")
    got = dataset_to_numpy(pr.sort("vid"), "rank")["rank"]
    assert np.allclose(ranks_csr, got, atol=1e-14)
