"""Extraction pipeline: byte-identity, golden edges, resumable output."""

import os

import pyarrow as pa
import pytest
import ray.data

from imtag_ray.config import EngineConfig
from imtag_ray.pipelines.extraction import extract_edges, extract_texts, run_extraction
from imtag_ray.sources.synth import generate_pages
from imtag_ray.stages.extract import extract_links

CFG = EngineConfig(extract_concurrency=2, extract_batch_size=128)


@pytest.fixture(scope="module")
def pages_tbl():
    return generate_pages(300, seed=100)


def test_text_byte_identity(pages_tbl):
    ds = ray.data.from_arrow(pages_tbl)
    out = extract_texts(ds, CFG).take_batch(400, batch_format="pyarrow")
    golden = dict(
        zip(pages_tbl["url"].to_pylist(), pages_tbl["text"].to_pylist())
    )
    assert len(out["url"]) == 300
    for u, t in zip(out["url"].to_pylist(), out["text"].to_pylist()):
        assert t == golden[u], u  # BYTE-identical per url


def test_edges_match_pure_python_rescan(pages_tbl):
    """Golden edges via an independent driver-side scan (FIXTURES.md F2:
    order-insensitive set compare after normalization)."""
    ds = ray.data.from_arrow(pages_tbl)
    out = extract_edges(ds, CFG).take_all()
    got = {(r["src_url"], r["dst_url"]) for r in out}
    expected = set()
    for u, h in zip(pages_tbl["url"].to_pylist(), pages_tbl["html"].to_pylist()):
        for dst in extract_links(u, h or b""):
            expected.add((u, dst))
    assert got == expected
    # duplicates preserved pre-dedup: row count ≥ distinct count
    assert len(out) >= len(got)


def test_run_extraction_resumable(tmp_path, pages_tbl):
    src = str(tmp_path / "pages.parquet")
    import pyarrow.parquet as pq

    pq.write_table(pages_tbl, src)
    out_dir = str(tmp_path / "out")
    r1 = run_extraction(src, out_dir, CFG)
    assert r1["edges"] > 0 and r1["texts"] == 300
    assert os.path.exists(os.path.join(out_dir, "edges._SUCCESS"))
    # rerun skips completed shards (markers untouched, same counts)
    m0 = os.path.getmtime(os.path.join(out_dir, "edges") )
    r2 = run_extraction(src, out_dir, CFG)
    assert r2 == r1
    assert os.path.getmtime(os.path.join(out_dir, "edges")) == m0
