#!/usr/bin/env python
"""Headline benchmark for the imtag_ray engine.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "edges_per_sec_per_iter": ..., ...}

Pipelines benched over $GRAFT_SF_DIR (default /root/testdata/sf0.1):
  extract    — synthetic F1 pages (cached parquet) → LinkExtractor actor pool
  build      — copart graph build (self-join, dedup, vid dictionary)
  pagerank   — 10 fixed power iterations, broadcast vertex state
               (the headline: edges/sec per PageRank iteration)
  cc         — connected components to convergence
  triangles  — per-vertex triangle counts
  dedup      — exact dedup over documents
  knn        — brute-force cosine top-k over embeddings

--scaling: runs the same job in two fresh processes (RAY_GRAFT_CPUS=8
and 32) and reports both throughputs + scaling efficiency
(BASELINE.md two-scale protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("GRAFT_BENCH_PAGES", "60000"))
PR_ITERS = 10


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def cached_pages(n_pages: int) -> str:
    """Generate (once) and cache the F1 synthetic pages parquet."""
    import pyarrow.parquet as pq

    path = f"/tmp/imtag_ray_bench/pages_{n_pages}.parquet"
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from imtag_ray.sources.synth import generate_pages

        log(f"generating {n_pages} synthetic pages (one-time)...")
        tbl = generate_pages(n_pages, seed=100)
        pq.write_table(tbl, path + ".tmp")
        os.rename(path + ".tmp", path)
    return path


def run_bench() -> dict:
    import ray
    import ray.data

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False
    # match shuffle reduce-partition count to the cluster instead of the
    # 200-partition default (huge fixed overhead at this scale)
    ctx.min_parallelism = NUM_CPUS

    from imtag_ray.config import EngineConfig
    from imtag_ray.pipelines.cc import connected_components
    from imtag_ray.pipelines.pagerank import pagerank
    from imtag_ray.pipelines.queries import copart_edge_urls
    from imtag_ray.pipelines.triangles import triangle_counts
    from imtag_ray.stages.extract import LinkExtractor
    from imtag_ray.stages.graph_build import build_graph

    cfg = EngineConfig(
        num_partitions=max(8, NUM_CPUS),
        extract_concurrency=max(2, NUM_CPUS // 2),
        extract_batch_size=512,
    )
    queries: dict[str, float] = {}
    extras: dict[str, float] = {}

    # warm the page cache (untimed read)
    pages_path = cached_pages(N_PAGES)
    ray.data.read_parquet(pages_path).count()

    # --- extract -----------------------------------------------------------
    t0 = time.perf_counter()
    pages = ray.data.read_parquet(pages_path, columns=["url", "html"])
    edges_raw = pages.map_batches(
        LinkExtractor, batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
    ).materialize()
    n_links = edges_raw.count()
    queries["extract"] = time.perf_counter() - t0
    extras["extract_pages_per_sec"] = round(N_PAGES / queries["extract"], 1)
    extras["extract_links_per_sec"] = round(n_links / queries["extract"], 1)
    log(f"extract: {n_links} links in {queries['extract']:.2f}s")

    # --- graph build (bench graph = extracted pages graph) -----------------
    t0 = time.perf_counter()
    graph = build_graph(edges_raw, cfg)
    queries["build"] = time.perf_counter() - t0
    log(
        f"build: V={graph.num_vertices} E={graph.num_edges} "
        f"in {queries['build']:.2f}s"
    )

    # --- pagerank (headline) ----------------------------------------------
    pr_cfg = EngineConfig(
        num_partitions=cfg.num_partitions, max_iterations=PR_ITERS,
        pagerank_tol=0,
    )
    t0 = time.perf_counter()
    pr = pagerank(graph, pr_cfg, mode="broadcast")
    pr.count()
    queries["pagerank"] = time.perf_counter() - t0
    eps = graph.num_edges * PR_ITERS / queries["pagerank"]
    extras["edges_per_sec_per_iter"] = round(eps, 1)
    extras["pagerank_iters"] = PR_ITERS
    extras["num_edges"] = graph.num_edges
    extras["num_vertices"] = graph.num_vertices
    log(f"pagerank: {PR_ITERS} iters in {queries['pagerank']:.2f}s "
        f"→ {eps/1e6:.2f}M edges/s/iter")

    # --- connected components ---------------------------------------------
    rounds = []
    t0 = time.perf_counter()
    cc = connected_components(
        graph, cfg, mode="broadcast",
        on_round=lambda r, lab: rounds.append(r),
    )
    cc.count()
    queries["cc"] = time.perf_counter() - t0
    extras["cc_rounds"] = len(rounds)
    log(f"cc: {len(rounds)} rounds in {queries['cc']:.2f}s")

    # --- triangles ---------------------------------------------------------
    t0 = time.perf_counter()
    tc = triangle_counts(graph, cfg, mode="broadcast")
    tc.count()
    queries["triangles"] = time.perf_counter() - t0
    log(f"triangles in {queries['triangles']:.2f}s")

    # --- training-data ops over sf tables ---------------------------------
    from imtag_ray.dedup.exact import dedup_exact_ids

    t0 = time.perf_counter()
    docs = ray.data.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"]
    )
    dedup_exact_ids(docs, "text", "doc_id").count()
    queries["dedup"] = time.perf_counter() - t0

    from imtag_ray.pipelines.dataops import embed_knn_q

    t0 = time.perf_counter()
    embed_knn_q(SF_DIR)
    queries["knn"] = time.perf_counter() - t0

    ray.shutdown()
    result = {
        "metric": "edges/sec per PageRank iteration (broadcast vertex "
                  "state, F1 pages graph)",
        "value": round(queries["pagerank"], 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in queries.items()},
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }
    result.update(extras)
    return result


def run_scaling() -> dict:
    import subprocess

    out = {}
    for ncpu in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        log(f"--- scaling run at num_cpus={ncpu} ---")
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        out[ncpu] = json.loads(p.stdout.strip().splitlines()[-1])
    lo, hi = out[8], out[32]
    eff = (lo["edges_per_sec_per_iter"] and
           hi["edges_per_sec_per_iter"] / (4 * lo["edges_per_sec_per_iter"]))
    return {
        "metric": "scaling efficiency N→4N (8→32 cpus), edges/sec/iter",
        "edges_per_sec_per_iter_8": lo["edges_per_sec_per_iter"],
        "edges_per_sec_per_iter_32": hi["edges_per_sec_per_iter"],
        "pagerank_sec_8": lo["queries"]["pagerank"],
        "pagerank_sec_32": hi["queries"]["pagerank"],
        "scaling_efficiency": round(eff, 3),
        "sf": SF_DIR,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
