"""BM25 / group top-k / deterministic sampling / histogram quantiles /
near-dedup keep: differential tests vs plain python+numpy references."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from imtag_ray.dedup.cluster import near_dedup_keep
from imtag_ray.pipelines.scoring import (
    bm25_scores,
    int_quantiles_by_group,
    sample_stratified,
    top_k_per_group,
)
from imtag_ray.util import dataset_to_numpy

DOCS = [
    (0, "table table hash merge", "en", "s0"),
    (1, "spark spark spark", "en", "s0"),
    (2, "the quick brown fox", "de", "s0"),
    (3, "", "de", "s1"),
    (4, "   ", "fr", "s1"),
    (5, "hash table spark merge hash", "fr", "s1"),
    (6, "merge", "zh", "s2"),
    (7, "a b c d e f g h i j", "zh", "s2"),
]
TERMS = ["hash", "merge", "spark", "table"]


def docs_ds(blocks=3):
    t = pa.table(
        {
            "doc_id": pa.array([d[0] for d in DOCS], pa.int64()),
            "text": pa.array([d[1] for d in DOCS], pa.string()),
            "lang": pa.array([d[2] for d in DOCS], pa.string()),
            "source": pa.array([d[3] for d in DOCS], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(blocks)


def bm25_ref(k1=1.2, b=0.75):
    toks = [d[1].lower().split() for d in DOCS]
    dls = np.array([len(t) for t in toks], dtype=float)
    n = len(DOCS)
    avgdl = dls.sum() / n
    scores = np.zeros(n)
    for term in TERMS:
        df = sum(1 for t in toks if term in t)
        idf = np.log((n - df + 0.5) / (df + 0.5) + 1.0)
        for i, t in enumerate(toks):
            tf = t.count(term)
            if tf:
                scores[i] += (
                    idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dls[i] / avgdl))
                )
    return scores


def test_bm25_matches_reference():
    out = dataset_to_numpy(
        bm25_scores(docs_ds(), "doc_id", "text", TERMS).sort("doc_id"),
        "doc_id", "bm25",
    )
    np.testing.assert_allclose(out["bm25"], bm25_ref(), rtol=1e-12)
    assert list(out["doc_id"]) == [d[0] for d in DOCS]


def test_bm25_empty_corpus():
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    out = bm25_scores(ray.data.from_arrow(empty), "doc_id", "text", TERMS)
    assert out.count() == 0


def test_top_k_per_group_matches_pandas():
    df = pd.DataFrame(
        {
            "source": [d[3] for d in DOCS],
            "doc_id": [d[0] for d in DOCS],
            "n_chars": [len(d[1]) for d in DOCS],
        }
    )
    # ties in n_chars break by doc_id ascending
    df.loc[df.doc_id == 1, "n_chars"] = df.loc[df.doc_id == 0, "n_chars"].iloc[0]
    t = pa.table(
        {c: pa.array(df[c].to_numpy()) for c in ("source", "doc_id", "n_chars")}
    )
    want = (
        df.sort_values(["source", "n_chars", "doc_id"],
                       ascending=[True, False, True])
        .groupby("source")
        .head(2)
        .reset_index(drop=True)
    )
    out = (
        top_k_per_group(
            ray.data.from_arrow(t).repartition(3),
            "source", "n_chars", "doc_id", k=2,
            keep_cols=["source", "doc_id", "n_chars"],
        )
        .sort(["source", "rnk"])
        .to_pandas()
    )
    assert list(out["doc_id"]) == list(want["doc_id"])
    assert list(out["n_chars"]) == list(want["n_chars"])
    assert all(
        out.groupby("source")["rnk"].apply(
            lambda s: list(s) == list(range(1, len(s) + 1))
        )
    )


def test_sample_stratified_deterministic():
    pm = {"en": 400, "de": 300, "fr": 100}
    out1 = dataset_to_numpy(
        sample_stratified(docs_ds(), "doc_id", "lang", pm, 250).sort("doc_id"),
        "doc_id",
    )["doc_id"]
    out2 = dataset_to_numpy(
        sample_stratified(docs_ds(2), "doc_id", "lang", pm, 250).sort("doc_id"),
        "doc_id",
    )["doc_id"]
    assert np.array_equal(out1, out2)  # partitioning-invariant
    want = [
        d[0]
        for d in DOCS
        if int(hashlib.md5(f"smp:{d[0]}".encode()).hexdigest()[:16], 16) % 1000
        < pm.get(d[2], 250)
    ]
    assert list(out1) == want


def test_sample_rate_approx():
    n = 20000
    t = pa.table(
        {"doc_id": pa.array(np.arange(n), pa.int64()),
         "lang": pa.array(["en"] * n, pa.string())}
    )
    out = sample_stratified(
        ray.data.from_arrow(t), "doc_id", "lang", {"en": 100}
    )
    frac = out.count() / n
    assert 0.08 < frac < 0.12


def quantile_ref(vals, pct):
    vals = np.sort(np.asarray(vals, dtype=np.int64))
    n = len(vals)
    cum = np.arange(1, n + 1)
    return int(vals[np.searchsorted(100 * cum, pct * n, side="left")])


def test_int_quantiles_by_group():
    rng = np.random.RandomState(7)
    langs = np.repeat(["de", "en", "fr"], [100, 300, 57])
    vals = np.concatenate(
        [
            rng.randint(0, 50, 100),
            rng.randint(10, 400, 300),
            rng.randint(0, 5, 57),
        ]
    ).astype(np.int64)
    t = pa.table({"lang": pa.array(langs), "n_tokens": pa.array(vals)})
    out = (
        int_quantiles_by_group(
            ray.data.from_arrow(t).repartition(5),
            "lang", "n_tokens", [50, 90, 99],
        )
        .sort("lang")
        .to_pandas()
    )
    for i, lang in enumerate(["de", "en", "fr"]):
        sub = vals[langs == lang]
        for p in (50, 90, 99):
            assert out.iloc[i][f"p{p}"] == quantile_ref(sub, p), (lang, p)


def _near_keep(texts_by_id):
    t = pa.table(
        {
            "doc_id": pa.array(sorted(texts_by_id), pa.int64()),
            "text": pa.array(
                [texts_by_id[k] for k in sorted(texts_by_id)], pa.string()
            ),
        }
    )
    out = near_dedup_keep(
        ray.data.from_arrow(t).repartition(2), "doc_id", "text",
        threshold=0.5, rounds=6,
    )
    return sorted(dataset_to_numpy(out, "doc_id")["doc_id"])


def test_near_dedup_keep_clusters():
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    other = (
        "one two three four five six seven eight nine ten eleven "
        "twelve thirteen fourteen fifteen sixteen"
    )
    docs = {
        1: base, 5: base, 9: base,        # exact-dup cluster → keep 1
        2: other, 7: other,               # second cluster → keep 2
        3: "completely unrelated text about ray data pipelines",
        4: "another standalone document with its own words entirely",
    }
    assert _near_keep(docs) == [1, 2, 3, 4]


def test_near_dedup_keep_no_dups():
    docs = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "one two three four five six",
        3: "red green blue yellow purple orange",
    }
    assert _near_keep(docs) == [1, 2, 3]


def test_near_dedup_keep_all_shingleless():
    # empty/whitespace docs: every pair is jaccard-1.0 → one cluster
    docs = {4: "", 8: "   ", 15: ""}
    assert _near_keep(docs) == [4]


def test_vector_centroids_matches_numpy():
    from imtag_ray.pipelines.scoring import vector_centroids

    rng = np.random.RandomState(11)
    n, dim = 137, 8
    labels = rng.randint(0, 4, n).astype(np.int64)
    vecs = rng.rand(n, dim).astype(np.float32)
    t = pa.table(
        {
            "label": pa.array(labels),
            "embedding": pa.array(
                [v for v in vecs.tolist()], pa.list_(pa.float32())
            ),
        }
    )
    out = (
        vector_centroids(
            ray.data.from_arrow(t).repartition(5), "label", "embedding", dim
        )
        .sort(["label", "dim"])
        .to_pandas()
    )
    want = np.stack(
        [vecs[labels == g].astype(np.float64).mean(axis=0) for g in range(4)]
    )
    got = out["centroid"].to_numpy().reshape(4, dim)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    assert list(out["label"]) == [g for g in range(4) for _ in range(dim)]
    assert list(out["dim"]) == list(range(dim)) * 4


def test_near_dedup_keep_paths_agree():
    # the driver fast path (default gate) and the fully distributed
    # path (gate forced to 0) must produce the identical keep set
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = {
        1: base, 5: base, 9: base,
        2: "one two three four five six seven eight",
        3: "one two three four five six seven eight",
    }
    t = pa.table(
        {"doc_id": pa.array(sorted(docs), pa.int64()),
         "text": pa.array([docs[k] for k in sorted(docs)], pa.string())}
    )
    ds = ray.data.from_arrow(t).repartition(2)
    fast = sorted(
        dataset_to_numpy(
            near_dedup_keep(ds, "doc_id", "text", threshold=0.5, rounds=6),
            "doc_id",
        )["doc_id"]
    )
    dist = sorted(
        dataset_to_numpy(
            near_dedup_keep(
                ds, "doc_id", "text", threshold=0.5, rounds=6,
                driver_cluster_max_pairs=0,
            ),
            "doc_id",
        )["doc_id"]
    )
    assert fast == dist == [1, 2]
