"""The ``python -m imtag_ray`` / ``ray job submit`` entry point.

Driven IN-PROCESS against the session Ray cluster (the CLI's guarded
``ray.init`` is a no-op when a session exists — the same behaviour it
has under ``ray job submit``, where the job supervisor owns the
session). A subprocess drive would start a second local cluster, which
this host cannot host concurrently (see .claude/skills/verify gotchas).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

from imtag_ray.__main__ import main
from imtag_ray.sources.synth import generate_pages
from imtag_ray.util import dataset_to_numpy


@pytest.fixture(scope="module")
def pages_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("job_pages")
    p = str(d / "pages.parquet")
    pq.write_table(generate_pages(300, seed=7), p)
    return p


def read_metrics(out_dir):
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        return [json.loads(line) for line in f]


def test_full_job_end_to_end(pages_path, tmp_path):
    out = str(tmp_path / "out")
    summary = main([
        "full", "--input", pages_path, "--output", out,
        "--num-partitions", "4", "--max-iterations", "12",
    ])
    assert summary["stage"] == "full" and summary["event"] == "done"
    for stage in ("pagerank", "cc", "triangles"):
        target = os.path.join(out, stage)
        assert os.path.exists(target + "._SUCCESS")
        assert summary[stage] > 0
    # extraction wrote its own resumable outputs
    assert os.path.exists(os.path.join(out, "extracted", "edges._SUCCESS"))

    # per-iteration metrics + lineage lines landed
    recs = read_metrics(out)
    pr_iters = [r for r in recs if r["stage"] == "pagerank" and "delta_l1" in r]
    assert len(pr_iters) >= 2
    assert pr_iters[0]["iteration"] == 0
    assert all("iter_wall_s" in r for r in pr_iters)
    cc_iters = [r for r in recs
                if r["stage"] == "cc" and "iteration" in r]
    assert len(cc_iters) >= 1

    # CLI pagerank output == library pagerank on the same pages
    from imtag_ray.config import EngineConfig
    from imtag_ray.pipelines.extraction import extract_edges
    from imtag_ray.pipelines.pagerank import pagerank
    from imtag_ray.sources.pages import read_pages
    from imtag_ray.stages.graph_build import build_graph

    cfg = EngineConfig(num_partitions=4, max_iterations=12)
    g = build_graph(extract_edges(read_pages(pages_path,
                                             columns=["url", "html"]), cfg),
                    cfg)
    lib = dataset_to_numpy(pagerank(g, cfg).sort("vid"), "vid", "rank")
    got = (
        ray.data.read_parquet(os.path.join(out, "pagerank")).sort("vid")
    )
    got = dataset_to_numpy(got, "vid", "rank")
    assert np.array_equal(lib["vid"], got["vid"])
    assert np.allclose(lib["rank"], got["rank"], atol=1e-12)


def test_resubmit_skips_finished_stage(pages_path, tmp_path):
    out = str(tmp_path / "out")
    args = ["pagerank", "--input", pages_path, "--output", out,
            "--num-partitions", "4", "--max-iterations", "5"]
    first = main(args)
    assert first["rows"] > 0 and "skipped" not in first
    again = main(args)
    assert again["skipped"] == "already complete"
    assert again["rows"] == first["rows"]


def test_labelprop_job_with_seed_flags(pages_path, tmp_path):
    out = str(tmp_path / "out")
    # find two real urls in the extracted graph
    from imtag_ray.config import EngineConfig
    from imtag_ray.pipelines.extraction import extract_edges
    from imtag_ray.sources.pages import read_pages
    from imtag_ray.stages.graph_build import build_graph

    cfg = EngineConfig(num_partitions=4)
    g = build_graph(extract_edges(read_pages(pages_path,
                                             columns=["url", "html"]), cfg),
                    cfg)
    urls = dataset_to_numpy(g.vertices.limit(8), "url")["url"]
    summary = main([
        "labelprop", "--input", pages_path, "--output", out,
        "--num-partitions", "4", "--max-iterations", "6",
        "--seed", f"{urls[0]}=left", "--seed", f"{urls[5]}=right",
    ])
    assert summary["rows"] == g.num_vertices
    tab = pq.read_table(os.path.join(out, "labelprop"))
    labels = set(tab.column("label").to_pylist())
    assert labels <= {"", "left", "right"} and len(labels) > 1


def test_checkpointed_job_resumes(pages_path, tmp_path):
    """Kill-and-resubmit story: a job capped at 2 iterations leaves
    checkpoints; the resubmitted uncapped job resumes from them and
    converges to the uninterrupted answer."""
    out1 = str(tmp_path / "a")
    out2 = str(tmp_path / "b")
    ck = str(tmp_path / "ckpt")
    base = ["pagerank", "--input", pages_path,
            "--num-partitions", "4", "--checkpoint-dir", ck,
            "--checkpoint-every", "1"]
    main(base + ["--output", out1, "--max-iterations", "2"])
    assert os.listdir(os.path.join(ck, "pagerank"))  # lineage on disk
    resumed = main(base + ["--output", out2, "--max-iterations", "40"])
    assert resumed["rows"] > 0
    # resumed run starts past the checkpointed iterations
    recs = [r for r in read_metrics(out2)
            if r["stage"] == "pagerank" and "delta_l1" in r]
    assert recs[0]["iteration"] >= 2

    uninterrupted = str(tmp_path / "c")
    full = main(["pagerank", "--input", pages_path, "--output", uninterrupted,
                 "--num-partitions", "4", "--max-iterations", "40"])
    a = pq.read_table(os.path.join(out2, "pagerank")).sort_by("vid")
    b = pq.read_table(os.path.join(uninterrupted, "pagerank")).sort_by("vid")
    assert full["rows"] == resumed["rows"]
    assert np.allclose(np.asarray(a.column("rank")),
                       np.asarray(b.column("rank")), atol=1e-9)


def test_missing_input_errors():
    with pytest.raises(SystemExit):
        main(["pagerank", "--output", "/tmp/nope"])


def test_cc_inc_job_matches_cold_cc(pages_path, tmp_path):
    """cc-inc: run cc on a base edge subset, feed its labels as --prior
    to an incremental run over the full edges; components must equal a
    cold cc run, and the refreshed labels output must be loadable as
    the next run's prior."""
    import pyarrow as pa

    from imtag_ray.pipelines.cc import connected_components_urls
    from imtag_ray.stages.graph_build import build_graph
    from imtag_ray.pipelines.extraction import extract_edges
    from imtag_ray.config import EngineConfig
    from imtag_ray.sources.pages import read_pages

    cfg = EngineConfig(num_partitions=4)
    pages = read_pages(pages_path, columns=["url", "html"])
    edges = extract_edges(pages, cfg).materialize()
    full_path = str(tmp_path / "edges_full.parquet")
    base_path = str(tmp_path / "edges_base.parquet")
    t = pa.concat_tables(
        [b for b in edges.iter_batches(batch_format="pyarrow")]
    ).combine_chunks()
    pq.write_table(t.select(["src_url", "dst_url"]), full_path)
    keep = (
        np.arange(t.num_rows) % 4 != 0
    )  # deterministic 3/4 base subset
    pq.write_table(
        t.select(["src_url", "dst_url"]).filter(pa.array(keep)), base_path
    )

    g_base = build_graph(
        ray.data.read_parquet(base_path, columns=["src_url", "dst_url"]),
        cfg,
    )
    prior_path = str(tmp_path / "prior")
    connected_components_urls(g_base, cfg).write_parquet(prior_path)

    out = str(tmp_path / "inc_out")
    summary = main([
        "cc-inc", "--edges", full_path, "--prior", prior_path,
        "--output", out, "--num-partitions", "4",
    ])
    assert summary["event"] == "done" and summary["rows"] > 0
    assert os.path.exists(os.path.join(out, "components") + "._SUCCESS")
    assert os.path.exists(os.path.join(out, "labels") + "._SUCCESS")

    cold_out = str(tmp_path / "cold_out")
    main([
        "cc", "--edges", full_path, "--output", cold_out,
        "--num-partitions", "4",
    ])
    inc = dataset_to_numpy(
        ray.data.read_parquet(os.path.join(out, "components")),
        "url", "component_id",
    )
    cold = dataset_to_numpy(
        ray.data.read_parquet(os.path.join(cold_out, "cc")),
        "url", "component_id",
    )
    mi = dict(zip([str(u) for u in inc["url"]], inc["component_id"]))
    mc = dict(zip([str(u) for u in cold["url"]], cold["component_id"]))
    assert mi == mc

    # refreshed labels are consistent: every url maps to a root in its
    # own component, and roots map to themselves
    lab = dataset_to_numpy(
        ray.data.read_parquet(os.path.join(out, "labels")),
        "url", "root_url",
    )
    lm = dict(zip([str(u) for u in lab["url"]],
                  [str(r) for r in lab["root_url"]]))
    assert set(lm) == set(mi)
    for u, r in lm.items():
        assert mi[u] == mi[r]
        assert lm[r] == r
