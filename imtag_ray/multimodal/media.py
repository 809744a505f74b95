"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (driver brief).

The decode kernels themselves are STUBBED (image/audio libraries are
not available in this container): ``decode=None`` uses a deterministic
fake decoder so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested; passing a real decode
callable (e.g. PIL/torchaudio based) makes the same stages production
kernels. ``decode="raise"`` exercises the NotImplementedError path.

Batch-size guidance (ray_guide 'Memory-aware'): large binary payloads
need SMALL batch_size so batch × concurrency fits the worker heap —
these stages default to 32 rows/batch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),     # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),        # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def _fake_decode_image(payload: bytes, out_hw=(8, 8)) -> np.ndarray:
    """Deterministic stand-in for an image decoder: bytes → uint8 HxWx3
    derived from md5(payload). Stable across processes."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:4], "big")
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(*out_hw, 3), dtype=np.uint8)


class ImageFeatures:
    """Actor-pool stage: media batch → (media_id, feature: list<float>).

    __init__ loads the decoder/model ONCE per actor (the stateful-stage
    pattern, SURVEY.md §7.2). With decode=None a deterministic fake
    decoder keeps the plumbing testable in this container.
    """

    def __init__(self, decode=None, resize_hw=(8, 8)):
        if decode == "raise":
            def decode(_payload):  # pragma: no cover - explicit stub
                raise NotImplementedError(
                    "real image decoding requires an image library not "
                    "present in this container; inject decode=callable"
                )
        self._decode = decode or (
            lambda payload: _fake_decode_image(payload, resize_hw)
        )
        self.resize_hw = resize_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            img = self._decode(p or b"")
            # mean-pool per channel + downsampled grayscale → fixed vector
            f = np.concatenate(
                [img.mean(axis=(0, 1)) / 255.0, img.mean(axis=2).ravel() / 255.0]
            ).astype(np.float32)
            feats.append(f)
        mat = np.stack(feats) if feats else np.zeros((0, 3), np.float32)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "feature": pa.array(
                    [row.tolist() for row in mat], type=pa.list_(pa.float32())
                ),
            }
        )


class FrameSampler:
    """Actor-pool stage: video batch → one row per sampled frame
    (media_id, frame_idx, frame_payload). 1→k flat-map shape; the fake
    sampler derives k from duration_ms (1 frame / second)."""

    def __init__(self, decode=None, max_frames: int = 8):
        if decode == "raise":
            def decode(_payload, _idx):  # pragma: no cover
                raise NotImplementedError("real frame extraction stubbed")
        self._decode = decode or (
            lambda payload, idx: hashlib.md5(
                (payload or b"") + idx.to_bytes(4, "big")
            ).digest()
        )
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        out_id, out_idx, out_bytes = [], [], []
        for i, p, d in zip(ids, payloads, durs):
            n = min(self.max_frames, max(1, (d or 0) // 1000))
            for f in range(n):
                out_id.append(i)
                out_idx.append(f)
                out_bytes.append(self._decode(p, f))
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame_payload": pa.array(out_bytes, pa.binary()),
            }
        )


def image_features(
    media: "ray.data.Dataset", concurrency: int | tuple = 2,
    batch_size: int = 32, decode=None,
) -> "ray.data.Dataset":
    return media.map_batches(
        ImageFeatures, fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def sample_frames(
    media: "ray.data.Dataset", concurrency: int | tuple = 2,
    batch_size: int = 32, decode=None,
) -> "ray.data.Dataset":
    return media.map_batches(
        FrameSampler, fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def synth_media(n: int, seed: int = 100) -> pa.Table:
    """Deterministic synthetic media table matching MEDIA_SCHEMA."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    payloads = [rng.bytes(rng.randint(64, 512)) for _ in range(n)]
    mimes = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([str(k) for k in kinds]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array([mimes[str(k)] for k in kinds]),
            "width": pa.array(
                np.where(kinds == "image", rng.randint(16, 512, n), -1), pa.int32()
            ),
            "height": pa.array(
                np.where(kinds == "image", rng.randint(16, 512, n), -1), pa.int32()
            ),
            "duration_ms": pa.array(
                np.where(kinds != "image", rng.randint(0, 8000, n), -1), pa.int32()
            ),
        }
    )
