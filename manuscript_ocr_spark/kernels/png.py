"""Pure-numpy PNG codec (no cv2/PIL — stdlib zlib only).

Implements the PNG specification (ISO/IEC 15948 / RFC 2083, public) for the
subset real page scans need: 8-bit depth, grayscale / RGB / RGBA,
non-interlaced, all five scanline filters on decode (None/Sub/Up/Average/
Paeth, spec §6), filter None on encode. This UNSTUBS the engine's codec
seam (functions/multimodal.decode_external) for PNG: media payloads can ship
codec-compressed and decode inside the Arrow batch loop with zero new
dependencies. JPEG remains environment-stubbed (a spec-correct DCT decoder
is out of scope offline).

Reference analog: cv2.imdecode/read_image
(/root/reference/src/manuscript/utils.py:477-497) — the reference loads
pages via image files; this codec is the engine's equivalent ingest step.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # colortype → samples per pixel (8-bit only)


class PngError(ValueError):
    pass


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W) uint8 grayscale or (H, W, C) uint8 array."""
    if data[:8] != _SIGNATURE:
        raise PngError("not a PNG stream (bad signature)")
    pos = 8
    width = height = None
    channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        # crc = data[pos+8+length : pos+12+length] — integrity is the
        # transport's job at 10^12 scale; decode verifies structure/shape
        pos += 12 + length
        if ctype == b"IHDR":
            width, height, depth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngError(f"unsupported bit depth {depth} (8 only)")
            if colortype not in _CHANNELS:
                raise PngError(f"unsupported color type {colortype}")
            if comp != 0 or filt != 0:
                raise PngError("nonstandard compression/filter method")
            if interlace != 0:
                raise PngError("interlaced PNG unsupported")
            channels = _CHANNELS[colortype]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")

    raw = zlib.decompress(bytes(idat))
    bpp = channels
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise PngError(
            f"IDAT size {len(raw)} != expected {height * (stride + 1)}"
        )
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = raw[:, 0]
    rows = raw[:, 1:]

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        row = rows[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 2:  # Up — vectorized (the common photographic filter)
            rec = (row.astype(np.int16) + prev).astype(np.uint8)
        elif f == 1:  # Sub: rec[i] = row[i] + rec[i-bpp] → per-lane cumsum
            lanes = row.reshape(width, bpp).astype(np.int64)
            rec = (np.cumsum(lanes, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(row[i]) + ((left + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                rec[i] = (int(row[i]) + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise PngError(f"unknown filter type {f} in row {y}")
        out[y] = rec
        prev = rec

    if channels == 1:
        return out.reshape(height, width)
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(image: np.ndarray, level: int = 6) -> bytes:
    """(H, W[, C]) uint8 array → PNG bytes (filter None rows; the page scans
    this engine ships are flat-background documents for which zlib alone
    already compresses ~20×, so per-row filter search would buy little)."""
    arr = np.ascontiguousarray(image, dtype=np.uint8)
    if arr.ndim == 2:
        colortype, channels = 0, 1
        h, w = arr.shape
    elif arr.ndim == 3 and arr.shape[2] in (1, 3, 4):
        h, w, channels = arr.shape
        if channels == 1:
            arr = arr.reshape(h, w)
            colortype = 0
        else:
            colortype = {3: 2, 4: 6}[channels]
    else:
        raise PngError(f"unsupported array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, colortype, 0, 0, 0)
    body = arr.reshape(h, w * channels)
    scan = np.empty((h, w * channels + 1), dtype=np.uint8)
    scan[:, 0] = 0  # filter None
    scan[:, 1:] = body
    idat = zlib.compress(scan.tobytes(), level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
