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


def test_extract_anchors_text_and_entities():
    from imtag_ray.stages.extract import extract_anchors

    html = (
        b'<html><body>'
        b'<a href="https://x.example/a">link 0 &amp; more</a>'
        b'<a href="/rel">with <b>inner</b>  tags</a>'
        b'<a href="https://self.example/p">self</a>'
        b'</body></html>'
    )
    out = extract_anchors("https://self.example/p", html)
    assert out == [
        ("https://x.example/a", "link 0 & more"),
        ("https://self.example/rel", "with inner tags"),
    ]  # self-link dropped, entities unescaped, inner tags stripped


def test_anchor_extract_fn_matches_link_extract_multiset():
    """Anchor edges (src, dst) as a multiset must equal extract_links'
    edge multiset on the F1 pages (same href parse, same normalize)."""
    import collections

    import pyarrow as pa

    from imtag_ray.sources.synth import generate_pages
    from imtag_ray.stages.extract import anchor_extract_fn, link_extract_fn

    pages = generate_pages(120, seed=100)
    batch = pa.table({"url": pages["url"], "html": pages["html"]})
    a = anchor_extract_fn(batch)
    l = link_extract_fn(batch)
    ma = collections.Counter(
        zip(a["src_url"].to_pylist(), a["dst_url"].to_pylist())
    )
    ml = collections.Counter(
        zip(l["src_url"].to_pylist(), l["dst_url"].to_pylist())
    )
    assert ma == ml
    # every anchor text went through the pinned pipeline (no raw tags)
    assert all("<" not in t for t in a["anchor"].to_pylist())
