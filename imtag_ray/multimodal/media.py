"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (driver brief).

Image decode is REAL: a pure-numpy codec layer handles BMP (24/32-bit
uncompressed), PPM (P6) and PNG (sources.png) with byte-sniffing
dispatch — no external imaging library needed. Formats outside that
set raise NotImplementedError (inject ``decode=callable`` to plug in
PIL etc.). Video frame EXTRACTION stays a documented deterministic
stub (no codec is implementable in pure numpy); the Ray-side plumbing
(schema, small-batch sizing, actor state) is identical either way.

Batch-size guidance (ray_guide 'Memory-aware'): large binary payloads
need SMALL batch_size so batch × concurrency fits the worker heap —
these stages default to 32 rows/batch.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa
import ray.data


# ---------------------------------------------------------------------------
# pure-numpy image codecs (BMP / PPM / PNG)
# ---------------------------------------------------------------------------


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BITMAPINFOHEADER BMP → (H, W, 3) uint8."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp not in (24, 32) or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}")
    flip = h > 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)
    img = rows[:, : w * nch].reshape(h, w, nch)
    if flip:
        img = img[::-1]
    return img[:, :, [2, 1, 0]].copy()  # BGR(A) → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → 24-bit bottom-up BMP bytes (test vector
    generator; also the write path for Image::write parity)."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    data = np.zeros((h, stride), dtype=np.uint8)
    data[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    body = data.tobytes()
    header = b"BM" + struct.pack(
        "<IHHI", 14 + 40 + len(body), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + body


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) → (H, W, 3) uint8."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    parts, pos = [], 2
    while len(parts) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to EOL
            while payload[pos : pos + 1] not in (b"\n", b""):
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        parts.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    return np.frombuffer(
        payload, dtype=np.uint8, count=w * h * 3, offset=pos
    ).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.astype(np.uint8).tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode → (H, W, 3) uint8. Supported: BMP, PPM(P6), PNG."""
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from ..sources.png import read_png_bytes

        img = read_png_bytes(payload)
        if img.shape[2] == 1:
            return np.repeat(img, 3, axis=2)
        return img[:, :, :3]
    raise NotImplementedError(
        "unsupported image format (BMP/PPM/PNG are decoded pure-numpy; "
        "inject decode=callable for other codecs)"
    )


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    """Encode (H, W, 3) uint8 by format name — the engine analogue of
    the reference's by-extension image write dispatch
    (test/deps/stb_image_library.cpp:48-73: .png/.bmp/... chosen from
    the filename). fmt: 'png' | 'bmp' | 'ppm'."""
    f = fmt.lower().lstrip(".")
    if f == "png":
        from ..sources.png import write_png_bytes

        return write_png_bytes(img)
    if f == "bmp":
        return encode_bmp(img)
    if f in ("ppm", "p6"):
        return encode_ppm(img)
    raise NotImplementedError(f"unsupported image write format {fmt!r}")


def resize_nearest(img: np.ndarray, out_hw: tuple) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (vectorized)."""
    oh, ow = out_hw
    h, w = img.shape[:2]
    ri = (np.arange(oh) * h // oh).clip(0, h - 1)
    ci = (np.arange(ow) * w // ow).clip(0, w - 1)
    return img[ri[:, None], ci[None, :]]


# ---------------------------------------------------------------------------
# pure-numpy audio codec (WAV / PCM16)
# ---------------------------------------------------------------------------


def decode_wav(payload: bytes) -> tuple:
    """RIFF/WAVE PCM16 → (sample_rate, (n, channels) float32 in [-1,1])."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    sr = nch = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if cid == b"fmt ":
            fmt, nch, sr = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV fmt={fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
    return sr, samples.reshape(-1, nch)


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """(n,) or (n, ch) float32 in [-1,1] → PCM16 WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    nch = samples.shape[1]
    pcm = np.clip(samples * 32768.0, -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, nch, sample_rate, sample_rate * nch * 2, nch * 2, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(pcm))
        + b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )


class AudioFeatures:
    """Actor-pool stage: media batch → (media_id, sample_rate,
    duration_ms, rms, zcr). decode=None uses the REAL pure-numpy WAV
    decoder; inject a callable for other codecs."""

    def __init__(self, decode=None):
        self._decode = decode or decode_wav

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        srs, durs, rmss, zcrs = [], [], [], []
        for p in payloads:
            sr, x = self._decode(p or b"")
            mono = x.mean(axis=1)
            srs.append(sr)
            durs.append(int(len(mono) * 1000 / max(sr, 1)))
            rmss.append(float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0)
            zcrs.append(
                float(np.mean(np.abs(np.diff(np.signbit(mono)))))
                if len(mono) > 1 else 0.0
            )
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(srs, pa.int32()),
                "duration_ms": pa.array(durs, pa.int32()),
                "rms": pa.array(rmss, pa.float64()),
                "zcr": pa.array(zcrs, pa.float64()),
            }
        )


def audio_features(
    media: "ray.data.Dataset", concurrency: int | tuple = 2,
    batch_size: int = 32, decode=None,
) -> "ray.data.Dataset":
    return media.map_batches(
        AudioFeatures, fn_constructor_kwargs={"decode": decode},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )

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

    __init__ fixes the decoder ONCE per actor (the stateful-stage
    pattern, SURVEY.md §7.2). decode=None → the REAL pure-numpy codec
    layer (BMP/PPM/PNG); decode="fake" → deterministic md5-seeded
    stand-in (for opaque synthetic payloads); decode="raise" →
    NotImplementedError path; any callable → custom codec (PIL etc.).
    Decoded frames are nearest-neighbor resized to ``resize_hw`` before
    feature pooling, so output width is payload-independent.
    """

    def __init__(self, decode=None, resize_hw=(8, 8)):
        if decode == "raise":
            def decode(_payload):  # pragma: no cover - explicit stub
                raise NotImplementedError(
                    "decode explicitly disabled; inject decode=callable"
                )
        elif decode == "fake":
            def decode(payload, _hw=resize_hw):
                return _fake_decode_image(payload, _hw)
        self._decode = decode or decode_image
        self.resize_hw = resize_hw

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_numpy(zero_copy_only=False)
        payloads = batch.column("payload").to_pylist()
        feats = []
        for p in payloads:
            img = resize_nearest(self._decode(p or b""), self.resize_hw)
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
    """Deterministic synthetic media table matching MEDIA_SCHEMA.
    Image payloads are REAL encoded images (BMP/PPM alternating) so the
    default decode path exercises actual bytes→pixels work; audio/video
    payloads stay opaque bytes (their decoders are injected/stubbed)."""
    rng = np.random.RandomState(seed)
    kinds = np.array(["image", "audio", "video"])[rng.randint(0, 3, n)]
    widths = rng.randint(4, 33, n)
    heights = rng.randint(4, 33, n)
    durs = np.where(kinds != "image", rng.randint(0, 8000, n), -1).astype(
        np.int32
    )
    payloads = []
    mime_list = []
    SR = 8000
    for i, k in enumerate(kinds):
        if k == "image":
            img = rng.randint(0, 256, size=(heights[i], widths[i], 3), dtype=np.uint8)
            if i % 2 == 0:
                payloads.append(encode_bmp(img))
                mime_list.append("image/bmp")
            else:
                payloads.append(encode_ppm(img))
                mime_list.append("image/x-portable-pixmap")
        elif k == "audio":
            # real (tiny) PCM16 WAV: seeded tone + noise of duration_ms
            ns = max(1, int(durs[i]) * SR // 1000)
            ns = min(ns, SR)  # cap 1s so the table stays small
            t = np.arange(ns) / SR
            freq = 100 + 50 * (i % 8)
            x = 0.5 * np.sin(2 * np.pi * freq * t) + 0.05 * rng.randn(ns)
            payloads.append(encode_wav(SR, x.astype(np.float32)))
            mime_list.append("audio/wav")
        else:
            payloads.append(rng.bytes(int(rng.randint(64, 512))))
            mime_list.append("video/mp4")
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([str(k) for k in kinds]),
            "payload": pa.array(payloads, pa.binary()),
            "mime": pa.array(mime_list),
            "width": pa.array(
                np.where(kinds == "image", widths, -1), pa.int32()
            ),
            "height": pa.array(
                np.where(kinds == "image", heights, -1), pa.int32()
            ),
            "duration_ms": pa.array(durs, pa.int32()),
        }
    )
