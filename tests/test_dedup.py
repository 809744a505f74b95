"""Dedup operators: exact, MinHash-LSH, SimHash, n-gram Jaccard."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.dedup.exact import dedup_exact, dedup_exact_ids
from imtag_ray.dedup.minhash import (
    _MERSENNE,
    exact_jaccard,
    minhash_dup_pairs,
    mulmod61,
    signature_of_text,
    survivors_from_pairs,
    token_shingles,
)
from imtag_ray.dedup.ngram import ngram_dup_pairs, ngram_jaccard
from imtag_ray.dedup.simhash import simhash64, simhash_dup_pairs


def as_table(x) -> pa.Table:
    """Pipelines return a Dataset (or a Table) — normalize for asserts."""
    if isinstance(x, pa.Table):
        return x
    return pa.Table.from_pandas(x.to_pandas(), preserve_index=False)


def docs_table():
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base, "s0"),
        (1, base, "s0"),                      # exact dup of 0
        (2, base + " extra token", "s0"),     # near dup of 0
        (3, "completely different words entirely unrelated content here", "s1"),
        (4, base.replace("quick", "slow"), "s0"),  # near dup
        (5, "", "s1"),                        # empty
        (6, "the quick brown fox jumps over the lazy dog again and again", "s1"),  # exact dup, other source
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_dedup_exact():
    ds = ray.data.from_arrow(docs_table())
    out = dedup_exact_ids(ds, "text", "doc_id").to_pandas()
    surv = dict(zip(out["doc_id"], out["n_copies"]))
    assert surv[0] == 3  # docs 0,1,6 identical → min id 0 survives
    assert 1 not in surv and 6 not in surv
    assert surv[5] == 1
    full = dedup_exact(ds, "text", "doc_id").to_pandas()
    assert sorted(full["doc_id"]) == [0, 2, 3, 4, 5]


def test_mulmod61_exact_vs_python_ints():
    rng = np.random.RandomState(7)
    x = rng.randint(0, 2**63, size=500, dtype=np.int64).astype(np.uint64)
    x = x * np.uint64(2) + np.uint64(1)  # exercise the full 64-bit range
    a = rng.randint(1, _MERSENNE, size=500, dtype=np.int64).astype(np.uint64)
    got = mulmod61(x, a)
    exp = np.array(
        [(int(xx) * int(aa)) % _MERSENNE for xx, aa in zip(x, a)],
        dtype=np.uint64,
    )
    assert np.array_equal(got, exp)


def test_minhash_identical_signatures():
    s1 = signature_of_text("a b c d e f g h")
    s2 = signature_of_text("a b c d e f g h")
    assert np.array_equal(s1, s2)
    s3 = signature_of_text("totally different text body")
    assert not np.array_equal(s1, s3)
    assert np.all(signature_of_text("") == _MERSENNE)  # empty sentinel


def test_minhash_estimates_jaccard():
    a = "w" + " w".join(str(i) for i in range(100))
    b = "w" + " w".join(str(i) for i in range(80))  # high overlap
    sa = signature_of_text(a, num_perm=256)
    sb = signature_of_text(b, num_perm=256)
    est = (sa == sb).mean()
    true = exact_jaccard(token_shingles(a, 3), token_shingles(b, 3))
    assert abs(est - true) < 0.15


def test_minhash_dup_pairs_finds_dups():
    ds = ray.data.from_arrow(docs_table())
    pairs = as_table(
        minhash_dup_pairs(ds, "doc_id", "text", threshold=0.5, num_partitions=4)
    )
    found = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in found and (0, 6) in found and (1, 6) in found
    assert (0, 2) in found  # near dup above 0.5
    assert not any(3 in p for p in found)  # unrelated doc clean
    # verified jaccard values are EXACT set jaccard
    jac = dict(zip(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()),
                   pairs["jaccard"].to_pylist()))
    assert jac[(0, 1)] == 1.0 and jac[(0, 6)] == 1.0
    ids = docs_table()["doc_id"].to_numpy()
    surv = survivors_from_pairs(ids, pairs)
    assert 0 in surv and 1 not in surv and 6 not in surv
    assert 3 in surv and 5 in surv


def test_simhash_properties():
    h1 = simhash64("the quick brown fox jumps over the lazy dog")
    h2 = simhash64("the quick brown fox jumps over the lazy dogs")
    h3 = simhash64("an utterly different sentence about data engines")
    assert h1 == simhash64("the quick brown fox jumps over the lazy dog")
    d12 = bin(h1 ^ h2).count("1")
    d13 = bin(h1 ^ h3).count("1")
    assert d12 < d13
    assert simhash64("") == 0


def test_simhash_dup_pairs():
    ds = ray.data.from_arrow(docs_table())
    pairs = as_table(simhash_dup_pairs(ds, "doc_id", "text", hamming_k=8))
    found = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in found and (0, 6) in found  # exact dups: distance 0
    hs = dict(
        zip(pairs["id_a"].to_pylist(), pairs["hamming"].to_pylist())
    )


def test_ngram_jaccard_scalar():
    assert ngram_jaccard("abc", "abc") == 1.0
    assert ngram_jaccard("", "") == 1.0
    assert 0 < ngram_jaccard("abcdef", "abcxef") < 1


def test_ngram_dup_pairs_within_source():
    ds = ray.data.from_arrow(docs_table())
    pairs = as_table(
        ngram_dup_pairs(ds, "doc_id", "text", "source", threshold=0.55)
    )
    found = set(zip(pairs["id_a"].to_pylist(), pairs["id_b"].to_pylist()))
    assert (0, 1) in found          # same source exact dup
    assert (0, 6) not in found      # dup but DIFFERENT source (blocking)
    assert (0, 4) in found          # near dup same source


def test_near_dup_pipelines_empty_results_keep_schema():
    """A corpus with NO near-dups must yield typed empty outputs (an
    all-empty groupby/sort chain can otherwise lose its schema)."""
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma delta epsilon",
                    "zebra yak xylophone walrus vulture",
                    "one two three four five six",
                ],
                pa.string(),
            ),
        }
    )
    ds = ray.data.from_arrow(tbl)
    mh = minhash_dup_pairs(ds, "doc_id", "text", threshold=0.9,
                           num_partitions=2).to_pandas()
    assert list(mh.columns) == ["id_a", "id_b", "jaccard"] and len(mh) == 0
    sh = simhash_dup_pairs(ds, "doc_id", "text", hamming_k=1).to_pandas()
    assert list(sh.columns) == ["id_a", "id_b", "hamming"] and len(sh) == 0


def test_ngram_pairs_vectorized_matches_scalar_oracle():
    """Differential: the vectorized co-occurrence kernel must equal the
    scalar set-based ngram_jaccard for every pair, including empty and
    whitespace-only docs, at several thresholds (incl. <=0 full-grid)."""
    import itertools
    import random

    import pandas as pd

    rng = random.Random(42)
    alphabet = "abcdefg "
    rows = []
    for did in range(40):
        kind = rng.random()
        if kind < 0.15:
            text = rng.choice(["", "   ", None])
        else:
            text = "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 60)))
        rows.append({"doc_id": did, "text": text, "source": f"s{did % 3}"})
    df = pd.DataFrame(rows)
    ds = ray.data.from_pandas(df)

    for threshold in (0.0, 0.2, 0.6, 1.0):
        got = ngram_dup_pairs(ds, "doc_id", "text", "source", threshold=threshold)
        gdf = got.to_pandas() if hasattr(got, "to_pandas") else got
        if hasattr(gdf, "to_pandas"):
            gdf = gdf.to_pandas()
        got_map = {
            (a, b): j
            for a, b, j in zip(gdf["id_a"], gdf["id_b"], gdf["jaccard"])
        }
        expect = {}
        for src, grp in df.groupby("source"):
            for (i, ra), (j, rb) in itertools.combinations(grp.iterrows(), 2):
                a, b = sorted((ra["doc_id"], rb["doc_id"]))
                jac = ngram_jaccard(ra["text"] or "", rb["text"] or "")
                if jac >= threshold:
                    expect[(a, b)] = jac
        assert set(got_map) == set(expect), threshold
        for k in expect:
            assert got_map[k] == pytest.approx(expect[k], abs=1e-12), (k, threshold)


def test_minhash_all_shingleless_corpus():
    """ADVICE r2: a corpus where EVERY doc is shingle-less (empty /
    whitespace / None text) must not crash the verification joins —
    all sentinel signatures collide, and every pair is J=1.0."""
    import pandas as pd

    df = pd.DataFrame(
        {"doc_id": [0, 1, 2], "text": ["", "   ", None]}
    )
    ds = ray.data.from_pandas(df)
    out = minhash_dup_pairs(ds, "doc_id", "text", threshold=0.5,
                            num_partitions=2)
    got = out.to_pandas() if hasattr(out, "to_pandas") else out
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert pairs == {(0, 1), (0, 2), (1, 2)}
    assert (got["jaccard"] == 1.0).all()


def test_batched_levenshtein_matches_scalar():
    import itertools

    from imtag_ray.dedup.lev import _encode_prefix, batched_levenshtein

    def scalar_lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[len(b)]

    words = ["", "a", "kitten", "sitting", "flaw", "lawn",
             "intention", "execution", "abcdefgh", "abcdefghx"]
    pairs = list(itertools.combinations(range(len(words)), 2)) + [
        (i, i) for i in range(len(words))
    ]
    ia = [p[0] for p in pairs]
    ib = [p[1] for p in pairs]
    M, lens = _encode_prefix(words, 16)
    got = batched_levenshtein(
        M[ia], lens[ia].astype("int64"), M[ib], lens[ib].astype("int64")
    )
    want = [scalar_lev(words[a], words[b]) for a, b in pairs]
    assert list(got) == want


# --- prefix-filter global similarity join -------------------------------


def _brute_jaccard_pairs(texts: dict, threshold: float, k: int = 3):
    """All-pairs exact Jaccard over nonempty hashed-shingle sets."""
    sets = {
        i: set(token_shingles(t, k).tolist()) for i, t in texts.items()
    }
    out = {}
    ids = sorted(i for i, s in sets.items() if s)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            j = inter / union
            if j >= threshold:
                out[(a, b)] = round(j, 9)
    return out


def _prefix_engine(texts: dict, threshold: float):
    import ray.data

    from imtag_ray.dedup.prefix import prefix_jaccard_pairs

    tbl = pa.table(
        {"doc_id": pa.array(sorted(texts), pa.int64()),
         "text": [texts[i] for i in sorted(texts)]}
    )
    df = prefix_jaccard_pairs(
        ray.data.from_arrow(tbl), "doc_id", "text", threshold=threshold
    ).to_pandas()
    return {
        (int(r.id_a), int(r.id_b)): round(float(r.jaccard), 9)
        for r in df.itertuples()
    }


def test_prefix_pairs_matches_bruteforce():
    base = "the quick brown fox jumps over the lazy dog again and again"
    texts = {
        0: base,
        1: base,  # exact dup
        2: base + " with a small tail change here",
        3: "completely different words entirely unrelated content",
        4: "the quick brown fox jumps over the lazy dog",  # near dup
        5: "",  # shingle-less: excluded
        6: "   ",  # whitespace-only: excluded
        7: "short one",
    }
    for t in (0.3, 0.5, 0.8):
        assert _prefix_engine(texts, t) == _brute_jaccard_pairs(texts, t)


def test_prefix_pairs_random_corpus_matches_bruteforce():
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(3, 25))))
        for i in range(40)
    }
    # plant exact dups to exercise jaccard == 1.0
    texts[40] = texts[0]
    texts[41] = texts[1]
    assert _prefix_engine(texts, 0.5) == _brute_jaccard_pairs(texts, 0.5)


def test_prefix_pairs_threshold_zero_rejected():
    import ray.data

    from imtag_ray.dedup.prefix import prefix_jaccard_pairs

    tbl = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a b c"]})
    with pytest.raises(ValueError):
        prefix_jaccard_pairs(ray.data.from_arrow(tbl), "doc_id", "text", 0.0)


def _brute_containment_pairs(texts: dict, threshold: float, k: int = 3):
    sets = {
        i: set(token_shingles(t, k).tolist()) for i, t in texts.items()
    }
    out = {}
    ids = sorted(i for i, s in sets.items() if s)
    for a in ids:
        for b in ids:
            if a == b:
                continue
            inter = len(sets[a] & sets[b])
            c = inter / len(sets[a])
            if c >= threshold:
                out[(a, b)] = round(c, 9)
    return out


def _containment_engine(texts: dict, threshold: float):
    import ray.data

    from imtag_ray.dedup.prefix import containment_pairs

    tbl = pa.table(
        {"doc_id": pa.array(sorted(texts), pa.int64()),
         "text": [texts[i] for i in sorted(texts)]}
    )
    df = containment_pairs(
        ray.data.from_arrow(tbl), "doc_id", "text", threshold=threshold
    ).to_pandas()
    return {
        (int(r.id_a), int(r.id_b)): round(float(r.containment), 9)
        for r in df.itertuples()
    }


def test_containment_pairs_matches_bruteforce():
    big = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
           "lambda mu nu xi omicron pi rho sigma tau upsilon")
    texts = {
        0: big,
        1: "delta epsilon zeta eta theta",  # fully inside 0, low jaccard
        2: "unrelated words entirely different content here",
        3: big + " phi chi psi omega",
        4: "",
    }
    for t in (0.5, 0.8, 1.0):
        got = _containment_engine(texts, t)
        want = _brute_containment_pairs(texts, t)
        assert got == want, (t, got, want)
    # the asymmetric case symmetric Jaccard misses: 1 ⊂ 0
    assert (1, 0) in _brute_containment_pairs(texts, 0.8)


def test_containment_pairs_random_matches_bruteforce():
    rng = np.random.default_rng(71)
    vocab = [f"w{i}" for i in range(25)]
    texts = {
        i: " ".join(rng.choice(vocab, size=int(rng.integers(3, 20))))
        for i in range(30)
    }
    texts[30] = " ".join(texts[0].split()[:6])  # prefix of doc 0
    assert _containment_engine(texts, 0.7) == _brute_containment_pairs(
        texts, 0.7
    )
