"""Checkpoint/resume: resumed run must be bit-identical to an
uninterrupted run (FIXTURES.md F5)."""

import json
import os
import shutil

import numpy as np
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.cc import connected_components
from imtag_ray.pipelines.pagerank import pagerank
from imtag_ray.sources.synth import named_graph_edges
from imtag_ray.stages.graph_build import build_graph
from imtag_ray.state.checkpoint import CheckpointManager, graph_fingerprint
from imtag_ray.util import dataset_to_numpy


@pytest.fixture()
def ckpt_dir(tmp_path):
    return str(tmp_path / "ckpt")


def ranks_of(ds):
    out = dataset_to_numpy(ds.sort("vid"), "rank")
    return out["rank"]


def test_pagerank_resume_bit_identical(ckpt_dir):
    tbl = named_graph_edges("powerlaw")
    g = build_graph(ray.data.from_arrow(tbl))

    # uninterrupted: 6 iterations
    cfg_full = EngineConfig(num_partitions=4, max_iterations=6, pagerank_tol=0)
    full = ranks_of(pagerank(g, cfg_full, mode="broadcast"))

    # interrupted after 3 (checkpoint every iter), then resumed to 6
    cfg_half = EngineConfig(
        num_partitions=4, max_iterations=3, pagerank_tol=0,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    pagerank(g, cfg_half, mode="broadcast")
    iters = sorted(os.listdir(os.path.join(ckpt_dir, "pagerank")))
    assert iters == ["iter=00000", "iter=00001", "iter=00002"]

    cfg_resume = EngineConfig(
        num_partitions=4, max_iterations=6, pagerank_tol=0,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    resumed = ranks_of(pagerank(g, cfg_resume, mode="broadcast"))
    assert np.array_equal(full, resumed)  # bit-identical


def test_incomplete_checkpoint_ignored(ckpt_dir):
    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg = EngineConfig(
        num_partitions=2, max_iterations=4,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    cc1 = dataset_to_numpy(
        connected_components(g, cfg).sort("vid"), "component_id"
    )["component_id"]
    # corrupt the newest checkpoint: remove its manifest → incomplete
    d = os.path.join(ckpt_dir, "cc")
    newest = sorted(os.listdir(d))[-1]
    os.remove(os.path.join(d, newest, "_manifest.json"))
    cc2 = dataset_to_numpy(
        connected_components(g, cfg).sort("vid"), "component_id"
    )["component_id"]
    assert np.array_equal(cc1, cc2)


def test_fingerprint_mismatch_not_resumed(ckpt_dir):
    t1 = named_graph_edges("two_cliques")
    t2 = named_graph_edges("barbell")
    g1 = build_graph(ray.data.from_arrow(t1))
    g2 = build_graph(ray.data.from_arrow(t2))
    cfg = EngineConfig(
        num_partitions=2, max_iterations=4,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    pagerank(g1, cfg, mode="broadcast")
    mgr = CheckpointManager(ckpt_dir, "pagerank", graph_fingerprint(g2))
    assert mgr.latest() is None  # different input → no resumable checkpoint


def test_manifest_lineage(ckpt_dir):
    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg = EngineConfig(
        num_partitions=2, max_iterations=3, pagerank_tol=0,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    pagerank(g, cfg, mode="broadcast")
    with open(os.path.join(ckpt_dir, "pagerank", "iter=00002", "_manifest.json")) as f:
        m = json.load(f)
    assert m["iteration"] == 2
    assert m["parent"].endswith("iter=00001")
    assert m["input_fingerprint"] == graph_fingerprint(g)
    assert "delta_l1" in m["metrics"]
    assert m["n_rows"] == g.num_vertices


def test_latest_ignores_orphaned_tmp_dirs(ckpt_dir):
    """ADVICE regression: a crash between part write and rename leaves
    'iter=NNNNN.tmp-xxxx' dirs (with a manifest inside); latest() must
    never resume from one, and manager init garbage-collects them."""
    mgr = CheckpointManager(ckpt_dir, "cc", "fp", num_partitions=2)
    mgr.write_arrays(3, {"label": np.arange(10, dtype=np.int64)})
    # simulate a crashed write for a LATER iteration: tmp dir with manifest
    tmp = os.path.join(ckpt_dir, "cc", "iter=00004.tmp-deadbeef")
    os.makedirs(tmp)
    with open(os.path.join(tmp, "_manifest.json"), "w") as f:
        json.dump({"iteration": 4, "input_fingerprint": "fp"}, f)
    m = mgr.latest()
    assert m is not None and m["iteration"] == 3
    assert ".tmp-" not in m["path"]
    # re-init GCs the orphan
    CheckpointManager(ckpt_dir, "cc", "fp", num_partitions=2)
    assert not os.path.isdir(tmp)


def test_pagerank_shuffle_resume_equivalent(ckpt_dir):
    """VERDICT #10: the Dataset-state (shuffle) path — the declared
    10^12-vertex path — must checkpoint and resume to the same result.
    Equality is allclose-tight rather than bit-exact: resuming re-reads
    state from parquet with different block boundaries, which reorders
    the float summation inside the per-key aggregates (the same
    last-ulp variation any block-order change produces)."""
    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl))

    cfg_full = EngineConfig(num_partitions=4, max_iterations=4, pagerank_tol=0)
    full = ranks_of(pagerank(g, cfg_full, mode="shuffle"))

    cfg_half = EngineConfig(
        num_partitions=4, max_iterations=2, pagerank_tol=0,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    pagerank(g, cfg_half, mode="shuffle")
    assert sorted(os.listdir(os.path.join(ckpt_dir, "pagerank"))) == [
        "iter=00000", "iter=00001",
    ]
    cfg_resume = EngineConfig(
        num_partitions=4, max_iterations=4, pagerank_tol=0,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    resumed = ranks_of(pagerank(g, cfg_resume, mode="shuffle"))
    assert np.allclose(full, resumed, rtol=0, atol=1e-14)
    assert resumed.sum() == pytest.approx(1.0, abs=1e-9)


def test_cc_shuffle_resume_same_labels(ckpt_dir):
    """Shuffle-mode CC resumes from a mid-run label table and reaches
    the same fixpoint as an uninterrupted run."""
    tbl = named_graph_edges("barbell")
    g = build_graph(ray.data.from_arrow(tbl))

    cfg_plain = EngineConfig(num_partitions=4, max_iterations=20)
    cc_full = dataset_to_numpy(
        connected_components(g, cfg_plain, mode="shuffle").sort("vid"),
        "component_id",
    )["component_id"]

    cfg_ck = EngineConfig(
        num_partitions=4, max_iterations=20,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    cc1 = dataset_to_numpy(
        connected_components(g, cfg_ck, mode="shuffle").sort("vid"),
        "component_id",
    )["component_id"]
    assert os.path.isdir(os.path.join(ckpt_dir, "cc"))
    # second run resumes from the converged checkpoint
    cc2 = dataset_to_numpy(
        connected_components(g, cfg_ck, mode="shuffle").sort("vid"),
        "component_id",
    )["component_id"]
    assert np.array_equal(cc_full, cc1)
    assert np.array_equal(cc1, cc2)


def lp_labels_of(ds):
    out = dataset_to_numpy(ds.sort("url"), "url", "label")
    return dict(zip([str(u) for u in out["url"]],
                    [str(x) for x in out["label"]]))


def test_labelprop_broadcast_resume_bit_identical(ckpt_dir):
    from imtag_ray.pipelines.labelprop import label_propagation
    from imtag_ray.sources.synth import gurl

    tbl = named_graph_edges("barbell")
    g = build_graph(ray.data.from_arrow(tbl))
    seeds = {gurl(0): "a", gurl(24): "b"}

    cfg_full = EngineConfig(num_partitions=4, max_iterations=8)
    full = lp_labels_of(label_propagation(g, seeds, cfg_full, mode="broadcast"))

    cfg_half = EngineConfig(
        num_partitions=4, max_iterations=3,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    label_propagation(g, seeds, cfg_half, mode="broadcast")
    iters = sorted(os.listdir(os.path.join(ckpt_dir, "labelprop")))
    assert iters == ["iter=00000", "iter=00001", "iter=00002"]

    cfg_resume = EngineConfig(
        num_partitions=4, max_iterations=8,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    resumed = lp_labels_of(
        label_propagation(g, seeds, cfg_resume, mode="broadcast")
    )
    assert full == resumed


def test_labelprop_shuffle_resume_equivalent(ckpt_dir):
    """Dataset-state LP (the scale path) resumes from a mid-run
    checkpoint to the same labels as an uninterrupted run."""
    from imtag_ray.pipelines.labelprop import label_propagation
    from imtag_ray.sources.synth import gurl

    tbl = named_graph_edges("gnp")
    g = build_graph(ray.data.from_arrow(tbl))
    seeds = {gurl(i): f"c{i % 3}" for i in range(0, 30, 7)}

    cfg_full = EngineConfig(num_partitions=4, max_iterations=8)
    full = lp_labels_of(label_propagation(g, seeds, cfg_full, mode="shuffle"))

    cfg_half = EngineConfig(
        num_partitions=4, max_iterations=2,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    label_propagation(g, seeds, cfg_half, mode="shuffle")
    assert sorted(os.listdir(os.path.join(ckpt_dir, "labelprop"))) == [
        "iter=00000", "iter=00001",
    ]
    cfg_resume = EngineConfig(
        num_partitions=4, max_iterations=8,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    resumed = lp_labels_of(
        label_propagation(g, seeds, cfg_resume, mode="shuffle")
    )
    assert full == resumed


def test_labelprop_checkpoint_not_resumed_across_seeds(ckpt_dir):
    """A checkpoint written under one seeding must NOT be picked up by a
    run with different seeds (the lineage fingerprint folds the seed
    assignment in)."""
    from imtag_ray.pipelines.labelprop import label_propagation
    from imtag_ray.sources.synth import gurl

    tbl = named_graph_edges("two_cliques")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg = EngineConfig(
        num_partitions=4, max_iterations=8,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    label_propagation(g, {gurl(0): "red", gurl(5): "blue"}, cfg,
                      mode="broadcast")
    # different seeding: clique colors swapped — stale-resume would
    # reproduce the OLD colors
    out = lp_labels_of(
        label_propagation(g, {gurl(0): "blue", gurl(5): "red"}, cfg,
                          mode="broadcast")
    )
    assert out[gurl(1)] == "blue"
    assert out[gurl(6)] == "red"


@pytest.mark.parametrize("mode", ["broadcast", "shuffle"])
def test_cc_nonconverged_checkpoint_does_not_short_circuit(ckpt_dir, mode):
    """A run that raised 'did not converge' leaves periodic checkpoints
    WITHOUT the converged flag; resuming with the same too-small budget
    must raise again (never silently return possibly-wrong labels), and
    resuming with a bigger budget must finish and match a clean run."""
    tbl = named_graph_edges("barbell")
    g = build_graph(ray.data.from_arrow(tbl))
    cfg_tiny = EngineConfig(
        num_partitions=4, max_iterations=1,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(g, cfg_tiny, mode=mode)
    # same exhausted budget on resume: must raise again, not return
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(g, cfg_tiny, mode=mode)
    cfg_big = EngineConfig(
        num_partitions=4, max_iterations=20,
        checkpoint_dir=ckpt_dir, checkpoint_every=1,
    )
    resumed = dataset_to_numpy(
        connected_components(g, cfg_big, mode=mode).sort("vid"),
        "component_id",
    )["component_id"]
    clean = dataset_to_numpy(
        connected_components(
            g, EngineConfig(num_partitions=4, max_iterations=20), mode=mode
        ).sort("vid"),
        "component_id",
    )["component_id"]
    assert np.array_equal(resumed, clean)
    # and the converged resume short-circuits to the same labels
    again = dataset_to_numpy(
        connected_components(g, cfg_big, mode=mode).sort("vid"),
        "component_id",
    )["component_id"]
    assert np.array_equal(again, clean)
