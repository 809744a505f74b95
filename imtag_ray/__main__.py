"""``ray job submit`` entry point for the engine's pipelines.

The north-star launch path (BASELINE.json ``north_rule``) is a fixed-size
multi-node Ray cluster driven with ``ray job submit``; this module is the
submittable job script:

    ray job submit --working-dir . -- \
        python -m imtag_ray full --input /data/pages --output /data/out \
            --checkpoint-dir /data/ckpt --checkpoint-every 5

    # or a single stage
    python -m imtag_ray pagerank --input /data/pages --output /tmp/pr

Under ``ray job submit`` the job supervisor pre-sets ``RAY_ADDRESS``, so
the guarded ``ray.init()`` here connects to the submitted-to cluster;
standalone it starts a local session (this file is a CLI entry point and
therefore OWNS its Ray session — unlike ``__ray_entry__.py``, which must
never init). Every iterative stage appends one JSON line per iteration
to ``<output>/metrics.jsonl`` (iteration, wall, convergence delta, and
the checkpoint lineage path when checkpointing is on), and every output
directory is written atomically with a ``_SUCCESS`` marker so a resubmit
of a partially-failed job skips finished stages and resumes iterative
ones from their latest checkpoint.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

from .config import EngineConfig


def _connect(args) -> None:
    import ray

    if ray.is_initialized():
        return  # driving process (or a test) already owns a session
    kwargs = {"include_dashboard": False, "logging_level": "ERROR"}
    if args.num_cpus is not None:
        kwargs["num_cpus"] = args.num_cpus
    # ray job submit / an existing cluster sets RAY_ADDRESS; ray.init()
    # with no explicit address honours it and otherwise starts local.
    ray.init(**kwargs)


def _cfg_from(args) -> EngineConfig:
    cfg = EngineConfig()
    if args.num_partitions is not None:
        cfg.num_partitions = args.num_partitions
    if args.max_iterations is not None:
        cfg.max_iterations = args.max_iterations
    if getattr(args, "damping", None) is not None:
        cfg.pagerank_damping = args.damping
    if args.mode in ("broadcast", "shuffle"):
        cfg.vertex_state = args.mode
    if args.checkpoint_dir:
        cfg.checkpoint_dir = args.checkpoint_dir
        cfg.checkpoint_every = args.checkpoint_every
    return cfg


class _MetricsLog:
    """Append-only per-iteration metrics JSONL (lineage + metrics, per
    the north rule). One file per job output dir; safe to re-open on
    resume — lines carry the stage name and a monotonic timestamp."""

    def __init__(self, out_dir: str, stage: str):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, "metrics.jsonl")
        self.stage = stage
        self._t0 = time.monotonic()
        self._last = self._t0

    def iter_cb(self, ckpt_dir: str | None, key: str):
        # pagerank calls on_iter(it, state, delta); cc calls
        # on_round(rnd, labels) — record the convergence scalar only
        # when the trailing argument is one
        def cb(it: int, *rest) -> None:
            now = time.monotonic()
            rec = {
                "stage": self.stage,
                "iteration": int(it),
                "iter_wall_s": round(now - self._last, 4),
                "total_wall_s": round(now - self._t0, 4),
            }
            if rest and isinstance(rest[-1], (int, float)):
                rec[key] = float(rest[-1])
            if ckpt_dir:
                rec["checkpoint_root"] = ckpt_dir
            self._last = now
            with open(self.path, "a") as f:
                f.write(json.dumps(rec) + "\n")

        return cb

    def final(self, **fields) -> dict:
        rec = {
            "stage": self.stage,
            "event": "done",
            "total_wall_s": round(time.monotonic() - self._t0, 4),
            **fields,
        }
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        return rec


def _write_result(ds, target: str, cfg: EngineConfig) -> int:
    """Atomically write a result Dataset as partitioned parquet with a
    ``_SUCCESS`` marker (resubmit-safe). Returns the row count."""
    tmp = target + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    ds.write_parquet(tmp)
    if os.path.isdir(target):
        shutil.rmtree(target)
    os.rename(tmp, target)
    open(target + "._SUCCESS", "w").close()
    import ray.data

    return ray.data.read_parquet(target).count()


def _done(target: str) -> bool:
    return os.path.exists(target + "._SUCCESS")


def _load_graph(args, cfg: EngineConfig):
    """pages parquet → extracted edges → Graph; or pre-extracted edges
    parquet via --edges."""
    import ray.data

    from .stages.graph_build import build_graph
    from .util import read_parquet_clean

    if args.edges:
        edges = read_parquet_clean(args.edges, columns=["src_url", "dst_url"])
    else:
        from .pipelines.extraction import extract_edges
        from .sources.pages import read_pages

        pages = read_pages(args.input, columns=["url", "html"])
        edges = extract_edges(pages, cfg)
    return build_graph(edges, cfg)


def _parse_seeds(args) -> dict[str, str]:
    if args.seeds_file:
        with open(args.seeds_file) as f:
            return json.load(f)
    seeds = {}
    for kv in args.seed or []:
        url, _, label = kv.rpartition("=")
        if not url:
            raise SystemExit(f"--seed needs URL=LABEL, got {kv!r}")
        seeds[url] = label
    if not seeds:
        raise SystemExit("labelprop needs --seed URL=LABEL or --seeds-file")
    return seeds


def cmd_extract(args) -> dict:
    from .pipelines.extraction import run_extraction

    cfg = _cfg_from(args)
    mlog = _MetricsLog(args.output, "extract")
    counts = run_extraction(args.input, args.output, cfg)
    return mlog.final(**counts)


def _run_graph_stage(args, stage: str, graph=None) -> dict:
    cfg = _cfg_from(args)
    target = os.path.join(args.output, stage)
    mlog = _MetricsLog(args.output, stage)
    if _done(target):
        import ray.data

        rows = ray.data.read_parquet(target).count()
        return mlog.final(rows=rows, skipped="already complete")

    graph = graph if graph is not None else _load_graph(args, cfg)
    mode = args.mode if args.mode in ("broadcast", "shuffle", "blocks",
                                      "ranges") else None
    cb = mlog.iter_cb(cfg.checkpoint_dir, "delta_l1" if stage == "pagerank"
                      else "changed")
    if stage == "pagerank":
        from .pipelines.pagerank import pagerank

        out = pagerank(graph, cfg, mode=mode, on_iter=cb)
    elif stage == "cc":
        from .pipelines.cc import connected_components

        out = connected_components(graph, cfg, mode=mode, on_round=cb)
    elif stage == "labelprop":
        from .pipelines.labelprop import label_propagation

        out = label_propagation(graph, _parse_seeds(args), cfg, mode=mode)
    elif stage == "triangles":
        from .pipelines.triangles import triangle_counts

        out = triangle_counts(graph, cfg, mode=mode)
    else:  # pragma: no cover
        raise ValueError(stage)
    rows = _write_result(out, target, cfg)
    return mlog.final(rows=rows, num_vertices=graph.num_vertices,
                      num_edges=graph.num_edges)


def cmd_full(args) -> dict:
    """pages → extraction → graph → pagerank + cc + triangles, all
    resumable stage-by-stage."""
    cfg = _cfg_from(args)
    summary = {}
    ex_out = os.path.join(args.output, "extracted")
    mlog = _MetricsLog(args.output, "full")
    from .pipelines.extraction import run_extraction

    summary["extract"] = run_extraction(args.input, ex_out, cfg)
    args.edges = os.path.join(ex_out, "edges")
    graph = None
    for stage in ("pagerank", "cc", "triangles"):
        if graph is None and not _done(os.path.join(args.output, stage)):
            graph = _load_graph(args, cfg)  # build ONCE for all stages
        summary[stage] = _run_graph_stage(args, stage, graph)
    return mlog.final(**{k: v.get("rows", v) for k, v in summary.items()
                         if isinstance(v, dict)})


def cmd_cc_inc(args) -> dict:
    """Incremental connected components: warm-start from a previous
    run's url-keyed labels (``--prior``, parquet of (url, root_url) —
    either the ``labels`` output of a previous cc-inc job or
    cc.connected_components_urls) over the NEW graph; writes the
    component table AND the refreshed labels the next crawl delta
    consumes. Resubmit-safe like every other stage."""
    import ray.data

    from .pipelines.cc import (
        connected_components_incremental,
        labels_urls_from_components,
    )
    from .util import read_parquet_clean

    cfg = _cfg_from(args)
    mlog = _MetricsLog(args.output, "cc-inc")
    comp_t = os.path.join(args.output, "components")
    labels_t = os.path.join(args.output, "labels")
    if not _done(comp_t):
        graph = _load_graph(args, cfg)
        prior = read_parquet_clean(args.prior, columns=["url", "root_url"])
        out = connected_components_incremental(
            graph, prior, cfg,
            on_round=mlog.iter_cb(cfg.checkpoint_dir, "label_sum"),
        )
        rows = _write_result(out, comp_t, cfg)
    else:
        rows = ray.data.read_parquet(comp_t).count()
    if not _done(labels_t):
        lab = labels_urls_from_components(
            ray.data.read_parquet(comp_t), cfg
        )
        _write_result(lab, labels_t, cfg)
    return mlog.final(rows=rows, components=comp_t, labels=labels_t)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m imtag_ray",
        description="Submit imtag_ray pipelines as a Ray job",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--input", help="pages parquet file/dir "
                        "(url, warc_ts, html, text, lang)")
        sp.add_argument("--edges", help="pre-extracted (src_url, dst_url) "
                        "edge parquet — skips extraction")
        sp.add_argument("--output", required=True)
        sp.add_argument("--num-partitions", type=int, default=None)
        sp.add_argument("--max-iterations", type=int, default=None)
        sp.add_argument("--mode", default=None,
                        choices=["broadcast", "shuffle", "blocks", "ranges"],
                        help="vertex-state strategy (default: auto by size)")
        sp.add_argument("--checkpoint-dir", default=None)
        sp.add_argument("--checkpoint-every", type=int, default=5)
        sp.add_argument("--num-cpus", type=int, default=None,
                        help="standalone-local only; ignored on a cluster")

    for name, fn in (("extract", cmd_extract),
                     ("pagerank", None), ("cc", None),
                     ("cc-inc", cmd_cc_inc),
                     ("labelprop", None), ("triangles", None),
                     ("full", cmd_full)):
        sp = sub.add_parser(name)
        common(sp)
        if name == "pagerank":
            sp.add_argument("--damping", type=float, default=None)
        if name == "cc-inc":
            sp.add_argument("--prior", required=True,
                            help="parquet of (url, root_url) from a "
                                 "previous run's labels output")
        if name == "labelprop":
            sp.add_argument("--seed", action="append",
                            help="URL=LABEL (repeatable)")
            sp.add_argument("--seeds-file",
                            help="JSON file mapping url -> label")
        sp.set_defaults(func=fn or (lambda a, _n=name: _run_graph_stage(a, _n)))
    return p


def main(argv=None) -> dict:
    args = build_parser().parse_args(argv)
    if args.cmd != "extract" and not (args.input or args.edges):
        raise SystemExit("need --input pages or --edges edge-table")
    if args.cmd == "extract" and not args.input:
        raise SystemExit("extract needs --input pages")
    _connect(args)
    summary = args.func(args)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
