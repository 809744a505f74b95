"""Minimal pure-numpy PNG reader (no external imaging library in this
environment) — enough to load the reference's own canonical test input
``test/blobs1.png`` (3840×2160 RGBA8, non-interlaced) and mirror the
stb_image greyscale conversion the reference test harness applies
(test/imtag_test.cpp:80 loads with nchannels=1).

Supports: 8-bit depth, color types 0 (grey), 2 (RGB), 6 (RGBA),
non-interlaced, all five scanline filters. Filters None/Sub/Up are
vectorized; Average/Paeth fall back to a per-byte loop (they carry a
left-neighbor dependency).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CHANNELS = {0: 1, 2: 3, 6: 4}


def read_png(path: str) -> np.ndarray:
    """→ (H, W, C) uint8 array."""
    return read_png_bytes(open(path, "rb").read())


def read_png_bytes(data: bytes) -> np.ndarray:
    """→ (H, W, C) uint8 array from in-memory PNG bytes."""
    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG file")
    pos = 8
    idat = []
    meta = None
    while pos < len(data):
        ln, typ = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or ctype not in _CHANNELS or inter != 0:
                raise NotImplementedError(
                    f"unsupported PNG (depth={depth} color={ctype} "
                    f"interlace={inter})"
                )
            meta = (w, h, _CHANNELS[ctype])
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None:
        raise ValueError("missing IHDR")
    w, h, nch = meta
    raw = zlib.decompress(b"".join(idat))
    return _unfilter(raw, w, h, nch)


def _unfilter(raw: bytes, w: int, h: int, nch: int) -> np.ndarray:
    stride = w * nch + 1
    if len(raw) != stride * h:
        raise ValueError("IDAT length mismatch")
    buf = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.zeros((h, w * nch), dtype=np.uint8)
    prev = np.zeros(w * nch, dtype=np.uint8)
    for y in range(h):
        ftype = int(buf[y, 0])
        row = buf[y, 1:]
        if ftype == 0:  # None
            cur = row.copy()
        elif ftype == 2:  # Up
            cur = row + prev  # uint8 wraps mod 256 — exactly the spec
        elif ftype == 1:  # Sub — per-lane cumulative sum mod 256
            lanes = row.reshape(w, nch).astype(np.int64)
            cur = (
                np.cumsum(lanes, axis=0) % 256
            ).astype(np.uint8).reshape(-1)
        elif ftype in (3, 4):  # Average / Paeth: left-dependency loop
            cur = _slow_filter(ftype, row, prev, nch)
        else:
            raise ValueError(f"bad filter {ftype} at row {y}")
        out[y] = cur
        prev = cur
    return out.reshape(h, w, nch)


def _slow_filter(
    ftype: int, row: np.ndarray, prev: np.ndarray, nch: int
) -> np.ndarray:
    n = len(row)
    cur = bytearray(n)
    rb = row.tobytes()
    pb = prev.tobytes()
    if ftype == 3:  # Average
        for i in range(n):
            a = cur[i - nch] if i >= nch else 0
            cur[i] = (rb[i] + ((a + pb[i]) >> 1)) & 0xFF
    else:  # Paeth
        for i in range(n):
            a = cur[i - nch] if i >= nch else 0
            b = pb[i]
            c = pb[i - nch] if i >= nch else 0
            p = a + b - c
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
            if pa_ <= pb_ and pa_ <= pc_:
                pred = a
            elif pb_ <= pc_:
                pred = b
            else:
                pred = c
            cur[i] = (rb[i] + pred) & 0xFF
    return np.frombuffer(bytes(cur), dtype=np.uint8)


_CTYPE_OF = {1: 0, 3: 2, 4: 6}  # channels → PNG color type


def write_png_bytes(img: np.ndarray, level: int = 6) -> bytes:
    """(H, W) or (H, W, C) uint8 array → PNG bytes (8-bit, color type
    grey/RGB/RGBA by channel count, non-interlaced, filter 0 per
    scanline). Closes the reference's by-extension write round-trip
    (test/deps/stb_image_library.cpp:48-73 writes PNG via
    stbi_write_png); decode(write(x)) == x bit-exactly for any uint8
    image this module's reader accepts."""
    a = np.ascontiguousarray(img)
    if a.dtype != np.uint8:
        raise ValueError(f"write_png_bytes needs uint8, got {a.dtype}")
    if a.ndim == 2:
        a = a[:, :, None]
    if a.ndim != 3 or a.shape[2] not in _CTYPE_OF:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, nch = a.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _CTYPE_OF[nch], 0, 0, 0)
    # filter byte 0 (None) per scanline — vectorized hstack, no row loop
    rows = np.hstack(
        [np.zeros((h, 1), dtype=np.uint8), a.reshape(h, w * nch)]
    )
    idat = zlib.compress(rows.tobytes(), level)

    def chunk(typ: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(typ + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + typ + body + struct.pack(">I", crc)

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def write_png(path: str, img: np.ndarray, level: int = 6) -> None:
    with open(path, "wb") as f:
        f.write(write_png_bytes(img, level))


def stb_grey(img: np.ndarray) -> np.ndarray:
    """stb_image's RGB(A)→1-channel conversion, byte-exact
    (stb_image.h stbi__compute_y: (r*77 + g*150 + 29*b) >> 8); the
    reference's test loads blobs1.png through exactly this path
    (test/imtag_test.cpp:80, stbi::Image(fname, 1))."""
    if img.ndim == 2 or img.shape[2] == 1:
        return img.reshape(img.shape[0], img.shape[1])
    r = img[:, :, 0].astype(np.uint32)
    g = img[:, :, 1].astype(np.uint32)
    b = img[:, :, 2].astype(np.uint32)
    return ((r * 77 + g * 150 + b * 29) >> 8).astype(np.uint8)
