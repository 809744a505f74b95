"""Deterministic synthetic fixtures (FIXTURES.md F1–F4, F6).

Everything is seeded (seed=100 by convention, matching the reference's
own seeded randomness: srand(100) at src/morphology.cpp:50 and the
noise seed at test/imtag_test.cpp:23). No wall clock, no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.extract import extract_text

SEED = 100

# ---------------------------------------------------------------------------
# F1 — pages generator (primary input shape per BASELINE.json input_hint)
# ---------------------------------------------------------------------------


def generate_pages(
    n_pages: int, seed: int = SEED, n_sites: int | None = None
) -> pa.Table:
    """Deterministic Common-Crawl-style pages.

    Out-link targets are Zipf(α≈2.0)-distributed over the url universe
    (hub skew); each page gets 1–40 anchors with absolute / relative /
    fragment / duplicate href variants; ~1% of pages have empty html
    (dangling vertices). The stored ``text`` column is produced by the
    SAME pinned extractor used at run time, so byte-identity is checked
    as strict equality.
    """
    rng = np.random.RandomState(seed)
    if n_sites is None:
        n_sites = max(1, n_pages // 50)
    site = rng.randint(0, n_sites, size=n_pages)
    urls = [f"https://site{site[i]}.example/p{i}" for i in range(n_pages)]

    n_links = rng.randint(1, 41, size=n_pages)
    empty = rng.rand(n_pages) < 0.01
    langs = ["en", "de", "fr", "es"]

    # Zipf targets over page indices (clipped), giving power-law in-degree.
    total_links = int(n_links.sum())
    zipf_raw = rng.zipf(2.0, size=total_links)
    targets = (zipf_raw - 1) % n_pages

    html_col: list[bytes] = []
    text_col: list[str] = []
    ts_col = np.arange(n_pages, dtype="int64") * 1000  # epoch + i*1000 ms
    pos = 0
    for i in range(n_pages):
        k = int(n_links[i])
        tgt = targets[pos : pos + k]
        pos += k
        if empty[i]:
            html_col.append(b"")
            text_col.append("")
            continue
        anchors = []
        for j, t in enumerate(tgt):
            t = int(t)
            t_site = int(site[t])
            variant = (i + j) % 5
            if variant == 0:
                href = f"https://site{t_site}.example/p{t}"
            elif variant == 1 and t_site == int(site[i]):
                href = f"/p{t}"  # root-relative, same host
            elif variant == 2:
                href = f"https://site{t_site}.example/p{t}#frag{j}"
            elif variant == 3:
                href = f"HTTPS://SITE{t_site}.EXAMPLE/p{t}"  # case variant
            else:
                href = f"https://site{t_site}.example/p{t}"
            anchors.append(f'<a href="{href}">link {j} &amp; more</a>')
            if variant == 2:  # duplicate anchor → duplicate edge for dedup
                anchors.append(f'<a href="{href}">dup</a>')
        body = (
            f"<html><head><title>Page {i}</title>"
            f"<style>.x{{color:red}}</style></head>"
            f"<body><h1>Site {site[i]} page {i}</h1>"
            f"<script>var x = {i};</script>"
            f"<!-- comment {i} -->"
            f"<p>Deterministic paragraph for page {i}, lang "
            f"{langs[i % 4]}. {'words ' * (i % 7)}</p>"
            + "".join(anchors)
            + "</body></html>"
        )
        raw = body.encode("utf-8")
        html_col.append(raw)
        text_col.append(extract_text(raw))

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts_col).cast(pa.timestamp("ms")),
            "html": pa.array(html_col, type=pa.binary()),
            "text": pa.array(text_col, type=pa.large_string()),
            "lang": pa.array([langs[i % 4] for i in range(n_pages)]),
        }
    )


# ---------------------------------------------------------------------------
# Pages derived from the driver's `documents` table (SQL-checkable links)
# ---------------------------------------------------------------------------

N_HUBS = 10
MAX_FANOUT = 6


def doc_link_targets(doc_id: int, n_docs: int) -> list[int]:
    """Deterministic out-link formula for document-derived pages.

    Expressible in ANSI SQL (see __ray_entry__.oracle_sql), so the whole
    extract→normalize→dedup pipeline can be differentially checked by
    DuckDB without DuckDB running the HTML parser: the oracle computes
    the formula, the engine parses the HTML that encodes it.

    Skew: every page links to hub ``doc_id % N_HUBS``; plus
    ``1 + doc_id % (MAX_FANOUT-1)`` spread links at stride 7.
    Self-links are dropped (by the extractor and by the oracle alike).
    """
    out = [doc_id % N_HUBS]
    k = 1 + doc_id % (MAX_FANOUT - 1)
    out.extend((doc_id * 7 + 13 * j) % n_docs for j in range(1, k + 1))
    return [t for t in out if t != doc_id]


def doc_url(doc_id: int) -> str:
    return f"https://docs.example/d{doc_id}"


def pages_from_documents(doc_ids, texts, n_total: int | None = None) -> pa.Table:
    """Wrap each document as an HTML page whose anchors follow
    ``doc_link_targets``; ``text`` golden = pinned extractor output.

    ``n_total`` is the corpus-wide document count for the link formula —
    pass it when synthesizing a BATCH of a larger corpus (the
    distributed path: map_batches over the documents Dataset with the
    count broadcast); defaults to len(doc_ids) for whole-corpus calls."""
    doc_ids = list(doc_ids)
    n = n_total if n_total is not None else len(doc_ids)
    urls = [doc_url(d) for d in doc_ids]
    html_col = []
    text_col = []
    for d, body_text in zip(doc_ids, texts):
        anchors = "".join(
            f'<a href="{doc_url(t)}">d{t}</a>' for t in doc_link_targets(int(d), n)
        )
        raw = (
            f"<html><body><p>{body_text or ''}</p>{anchors}</body></html>"
        ).encode("utf-8")
        html_col.append(raw)
        text_col.append(extract_text(raw))
    ts = (np.asarray(doc_ids, dtype="int64") * 1000).astype("int64")
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts).cast(pa.timestamp("ms")),
            "html": pa.array(html_col, type=pa.binary()),
            "text": pa.array(text_col, type=pa.large_string()),
            "lang": pa.array(["en"] * len(doc_ids)),
        }
    )


# ---------------------------------------------------------------------------
# F3 — lattice fixtures (exact CCL conformance vs imtag semantics)
# ---------------------------------------------------------------------------


def pixel_url(row: int, col: int) -> str:
    """Lexicographic url order == row-major scan order, so canonical
    min-url relabeling reproduces the reference's first-appearance dense
    relabel (compressed_freeze, src/disjoint_set.hpp:73-96)."""
    return f"px://{row:05d}/{col:05d}"


LANDS_WATERS = np.array(
    # The worked example documented at src/morphology.cpp:234-263 —
    # the reference's own golden spec (3 land components, 2 holes).
    [
        [1, 1, 1, 1, 0, 0, 1, 0],
        [1, 1, 1, 1, 0, 0, 1, 0],
        [0, 0, 0, 0, 0, 0, 1, 0],
        [1, 1, 1, 1, 1, 0, 1, 0],
    ],
    dtype=bool,
)


def lattice_vertices(img: np.ndarray) -> list[str]:
    rows, cols = np.nonzero(img)
    return [pixel_url(int(r), int(c)) for r, c in zip(rows, cols)]


def lattice_edges(img: np.ndarray, connectivity: str = "cross") -> pa.Table:
    """Edges between foreground pixels under the reference's overlap
    predicates (src/SegmentImageImpl.cpp:53-76): CROSS = 4-neighbor
    (strict column sharing), EIGHT_WAY = 8-neighbor (diagonal touch),
    HORIZONTAL = left-right only (intended semantics; the reference's
    HORIZONTAL code path crashes, SURVEY.md §2.11)."""
    if connectivity == "cross":
        offsets = [(0, 1), (1, 0)]
    elif connectivity == "eight":
        offsets = [(0, 1), (1, 0), (1, 1), (1, -1)]
    elif connectivity == "horizontal":
        offsets = [(0, 1)]
    else:
        raise ValueError(connectivity)
    src, dst = [], []
    R, C = img.shape
    for dr, dc in offsets:
        a_r0 = max(0, -dr)
        a_r1 = R - max(0, dr)
        a_c0 = max(0, -dc)
        a_c1 = C - max(0, dc)
        a = img[a_r0:a_r1, a_c0:a_c1]
        b = img[a_r0 + dr : a_r1 + dr, a_c0 + dc : a_c1 + dc]
        rr, cc = np.nonzero(a & b)
        for r, c in zip(rr, cc):
            src.append(pixel_url(int(r + a_r0), int(c + a_c0)))
            dst.append(pixel_url(int(r + a_r0 + dr), int(c + a_c0 + dc)))
    return pa.table(
        {"src_url": pa.array(src, type=pa.string()),
         "dst_url": pa.array(dst, type=pa.string())}
    )


def noise_image(shape=(256, 256), seed: int = SEED) -> np.ndarray:
    """Seeded Gaussian salt with forced cross neighborhoods — the pattern
    of the reference's addNoise test generator
    (test/imtag_test.cpp:20-44, seed 100)."""
    rng = np.random.RandomState(seed)
    salt = rng.normal(0.0, 0.1, size=shape) > 0.35
    img = salt.copy()
    img[:-1, :] |= salt[1:, :]
    img[1:, :] |= salt[:-1, :]
    img[:, :-1] |= salt[:, 1:]
    img[:, 1:] |= salt[:, :-1]
    return img


def serpentine_image(n: int = 31) -> np.ndarray:
    """Single snake-path component of length ~n²/2 — worst-case graph
    diameter for naive per-hop label propagation (F3c pathological);
    exercises the pointer-jumping / star-contraction shortcutting."""
    img = np.zeros((n, n), dtype=bool)
    img[::2, :] = True
    for i, r in enumerate(range(1, n, 2)):
        img[r, n - 1 if i % 2 == 0 else 0] = True
    return img


def checkerboard_image(n: int = 64) -> np.ndarray:
    """Max component count under CROSS (every pixel isolated)."""
    img = np.zeros((n, n), dtype=bool)
    img[::2, ::2] = True
    img[1::2, 1::2] = True
    return img


# ---------------------------------------------------------------------------
# F4 — small named graphs (algorithm oracles)
# ---------------------------------------------------------------------------


def gurl(i: int) -> str:
    return f"https://g.example/v{i:06d}"


def named_graph_edges(name: str, seed: int = SEED) -> pa.Table:
    """Edge tables (directed as listed; CC treats them as undirected) for
    the F4 fixture instances."""
    import networkx as nx

    if name == "two_cliques":
        g = nx.disjoint_union(nx.complete_graph(5), nx.complete_graph(7))
    elif name == "star":
        g = nx.star_graph(1000)
    elif name == "cycle":
        g = nx.cycle_graph(50)
    elif name == "barbell":
        g = nx.barbell_graph(10, 5)
    elif name == "gnp":
        g = nx.gnp_random_graph(500, 0.02, seed=seed)
    elif name == "powerlaw":
        g = nx.barabasi_albert_graph(2000, 3, seed=seed)
    else:
        raise ValueError(name)
    src = [gurl(u) for u, v in g.edges()]
    dst = [gurl(v) for u, v in g.edges()]
    return pa.table(
        {"src_url": pa.array(src, type=pa.string()),
         "dst_url": pa.array(dst, type=pa.string())}
    )
