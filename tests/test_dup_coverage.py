"""doc_dup_coverage: per-document duplicated-5-gram token coverage
(ExactSubstr-style dedup signal). Hand-computed fixtures cover the
dup path, the no-dup (finish(None)) path, short docs, and empty-doc
exclusion; SQL parity runs in test_entry.py's oracle sweep."""

import pyarrow as pa
import pyarrow.parquet as pq

from imtag_ray.pipelines.dataops import doc_dup_coverage_q


def _write_docs(tmp_path, texts):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _rows(ds):
    df = ds.to_pandas()
    return sorted(
        (int(r.doc_id), int(r.n_tokens), int(r.dup_tokens))
        for r in df.itertuples()
    )


def test_dup_coverage_cross_doc_gram(ray_session, tmp_path):
    sf = _write_docs(
        tmp_path,
        [
            "a b c d e f",  # shares "a b c d e" with doc 1 → pos 1-5 covered
            "a b c d e x",
            "z z z z",      # 4 tokens: too short for any 5-gram
            "   ",          # blank after trim: excluded entirely
        ],
    )
    assert _rows(doc_dup_coverage_q(sf)) == [(0, 6, 5), (1, 6, 5), (2, 4, 0)]


def test_dup_coverage_within_doc_repeat_not_dup(ray_session, tmp_path):
    # the same 5-gram twice in ONE doc has df=1 — not a cross-doc dup
    sf = _write_docs(tmp_path, ["a b c d e a b c d e", "p q r s t u"])
    assert _rows(doc_dup_coverage_q(sf)) == [(0, 10, 0), (1, 6, 0)]


def test_dup_coverage_overlapping_grams_union(ray_session, tmp_path):
    # doc 0/1 share BOTH 5-grams of a 6-token span: covered positions
    # are the UNION (6 tokens), not the sum (10)
    sf = _write_docs(tmp_path, ["a b c d e f", "x a b c d e f"])
    assert _rows(doc_dup_coverage_q(sf)) == [(0, 6, 6), (1, 7, 6)]
