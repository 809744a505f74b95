"""Extraction pipeline: pages Parquet → edges + texts (SURVEY.md §3.4
Stage 1; the M1 'minimum slice': read → map_batches actor pool → write).

Output layout is resumable: one output directory per input shard when
``shard_key`` is set, written via temp-dir + rename, so a rerun skips
finished shards (ray_guide 'Sources & sinks').
"""

from __future__ import annotations

import os

import ray.data

from ..config import DEFAULT_CONFIG, EngineConfig
from ..sources.pages import read_pages
from ..stages.extract import link_extract_fn, text_extract_fn


def extract_edges(
    pages: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """pages → (src_url, dst_url) raw edge rows (duplicates kept; dedup is
    the graph build's job). Stateless tasks (regex state lives in the
    long-lived workers; swap in the LinkExtractor actor class when the
    parser carries heavy per-worker state)."""
    return pages.map_batches(
        link_extract_fn,
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        zero_copy_batch=True,
    )


def extract_texts(
    pages: "ray.data.Dataset", cfg: EngineConfig = DEFAULT_CONFIG
) -> "ray.data.Dataset":
    """pages → (url, text) with the PINNED extractor (byte-identity
    invariant per BASELINE.json input_hint)."""
    return pages.map_batches(
        text_extract_fn,
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        zero_copy_batch=True,
    )


def run_extraction(
    pages_path: str,
    out_dir: str,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> dict:
    """End-to-end: read pages (column-pruned) → write edges/ and texts/
    Parquet. Returns counts. Skips an output that already completed
    (marker file) — shard-level resumability."""
    os.makedirs(out_dir, exist_ok=True)
    results = {}
    for name, fn, columns in (
        ("edges", extract_edges, ["url", "html"]),
        ("texts", extract_texts, ["url", "html"]),
    ):
        target = os.path.join(out_dir, name)
        marker = target + "._SUCCESS"
        if os.path.exists(marker):
            results[name] = ray.data.read_parquet(target).count()
            continue
        ds = fn(read_pages(pages_path, columns=columns), cfg)
        tmp = target + ".tmp"
        ds.write_parquet(tmp)
        if os.path.isdir(target):
            import shutil

            shutil.rmtree(target)
        os.rename(tmp, target)
        open(marker, "w").close()
        results[name] = ray.data.read_parquet(target).count()
    return results
