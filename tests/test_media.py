"""Multimodal plumbing: schemas, actor stages, stubbed decode paths."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from imtag_ray.multimodal.media import (
    MEDIA_SCHEMA,
    FrameSampler,
    ImageFeatures,
    image_features,
    sample_frames,
    synth_media,
)


def test_synth_media_schema():
    tbl = synth_media(50)
    assert tbl.schema.equals(MEDIA_SCHEMA)
    # deterministic
    assert synth_media(50).equals(tbl)


def test_image_features_pipeline():
    tbl = synth_media(40)
    ds = ray.data.from_arrow(tbl).repartition(2)
    feats = image_features(ds, concurrency=2, batch_size=16)
    out = feats.take_all()
    assert len(out) == 40
    dim = len(out[0]["feature"])
    assert all(len(r["feature"]) == dim for r in out)
    # fake decoder is deterministic → rerun identical
    out2 = image_features(ray.data.from_arrow(tbl), concurrency=2).take_all()
    m1 = {r["media_id"]: list(r["feature"]) for r in out}
    m2 = {r["media_id"]: list(r["feature"]) for r in out2}
    assert m1 == m2


def test_frame_sampler_flatmap_shape():
    tbl = synth_media(30)
    ds = ray.data.from_arrow(tbl)
    frames = sample_frames(ds, concurrency=2).take_all()
    durs = dict(zip(tbl["media_id"].to_pylist(), tbl["duration_ms"].to_pylist()))
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for mid, idxs in by_media.items():
        expect = min(8, max(1, (durs[mid] if durs[mid] > 0 else 0) // 1000))
        assert sorted(idxs) == list(range(expect))


def test_stubbed_decode_raises():
    feat = ImageFeatures(decode="raise")
    batch = synth_media(3)
    with pytest.raises(NotImplementedError):
        feat(batch)
