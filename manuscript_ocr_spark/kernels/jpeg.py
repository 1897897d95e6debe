"""Baseline JPEG codec (ITU-T T.81, public spec) — pure numpy, no external
codec libraries. Completes the image-codec seam next to kernels/png.py:
`decode_external('jpeg')` becomes real, so archival scans shipped as JPEG
payloads decode inside the Arrow batch loop (the reference ingests pages via
cv2.imread — utils.py:477-497; this is the engine's equivalent).

Decoder (the interop-critical half): baseline sequential DCT (SOF0),
8-bit, grayscale or YCbCr with arbitrary sampling factors up to 2×2
(4:4:4 / 4:2:2 / 4:2:0), Huffman and quantization tables read FROM THE
STREAM (so files produced by libjpeg/PIL decode too), byte-unstuffing,
restart intervals (DRI/RSTn with DC-predictor reset). Progressive (SOF2)
and arithmetic coding are rejected with a clear error.

Encoder (offline test vector source + genuine encode capability):
4:4:4 or 4:2:0, quality-scaled Annex-K quantization tables, fixed-length
canonical Huffman codes (12 DC symbols at 5 bits, 162 AC symbols at 8 bits —
valid per the DHT canonical-code rules and self-describing in the stream;
optimal tables would shave bytes, but the engine's compression format of
choice is PNG — JPEG encode exists for interop and for exercising every
decoder path, including restart intervals).

The DCT is the exact orthonormal matrix form (C·block·Cᵀ), so decode is the
true inverse of encode up to quantization error — round-trip PSNR is the
test oracle.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegError(ValueError):
    pass


# --- shared constants -----------------------------------------------------

def _zigzag_order():
    """(64,) flat indices of the zigzag scan over an 8×8 block, generated
    from the diagonal rule (T.81 Figure A.6)."""
    order = []
    for s in range(15):
        cells = [(i, s - i) for i in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            cells = cells[::-1]  # even diagonals run bottom-left → top-right
        order.extend(i * 8 + j for i, j in cells)
    return np.array(order, dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# Annex K.1/K.2 base quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 1..100 → scaled table clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 / q if q < 50 else 200 - 2 * q
    out = np.floor((tbl * scale + 50) / 100)
    return np.clip(out, 1, 255)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n.reshape(8, 1)
    c = np.cos((2 * n + 1) * k * np.pi / 16)
    c[0] *= np.sqrt(0.5)
    return c * 0.5  # orthonormal: C @ C.T = I


_C = _dct_matrix()


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


# --- canonical Huffman ------------------------------------------------------

def _build_codes(counts, symbols):
    """DHT (16 counts + symbol list) → {symbol: (code, length)} canonical
    assignment (T.81 Annex C)."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Length-indexed canonical decode table: (first_code, first_index) per
    length, symbol lookup by offset — the Annex F.2.2 procedure."""

    def __init__(self, counts, symbols):
        self.symbols = symbols
        self.min_code = {}
        self.max_code = {}
        self.val_ptr = {}
        code = 0
        k = 0
        for length in range(1, 17):
            n = counts[length - 1]
            if n:
                self.val_ptr[length] = k
                self.min_code[length] = code
                self.max_code[length] = code + n - 1
                code += n
                k += n
            else:
                self.max_code[length] = -1
            code <<= 1

    def decode(self, reader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            mx = self.max_code.get(length, -1)
            if mx >= 0 and code <= mx:
                return self.symbols[self.val_ptr[length] + code - self.min_code[length]]
        raise JpegError("invalid Huffman code in entropy stream")


# fixed-length encoder tables (valid canonical codes; see module docstring)
_DC_SYMBOLS = list(range(12))
_DC_COUNTS = [0, 0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_AC_SYMBOLS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_DC_CODES = _build_codes(_DC_COUNTS, _DC_SYMBOLS)
_AC_CODES = _build_codes(_AC_COUNTS, _AC_SYMBOLS)


# --- bit I/O ------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # a real marker: behave as EOI-padded stream
                    self.pos -= 1
                    b = 0
            self.acc = b
            self.nbits = 8
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0

    def skip_rst(self):
        """Consume an expected RSTn marker at a restart boundary."""
        self.align()
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF and (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise JpegError("missing restart marker")


def _magnitude(v: int):
    """coefficient → (size, raw bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _extend(raw: int, size: int) -> int:
    if size == 0:
        return 0
    if raw < (1 << (size - 1)):
        return raw - (1 << size) + 1
    return raw


# --- encoder --------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray):
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def _ycbcr_to_rgb(y, cb, cr):
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_to(plane: np.ndarray, h: int, w: int) -> np.ndarray:
    ph, pw = plane.shape
    return np.pad(plane, ((0, h - ph), (0, w - pw)), mode="edge")


def _encode_block(writer, block, qtbl, prev_dc, dc_codes, ac_codes) -> int:
    coef = np.rint(_fdct(block - 128.0) / qtbl).astype(np.int64)
    zz = coef.ravel()[ZIGZAG]
    dc = int(zz[0])
    size, raw = _magnitude(dc - prev_dc)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(raw, size)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            writer.write(c, ln)
            run -= 16
        size, raw = _magnitude(v)
        c, ln = ac_codes[(run << 4) | size]
        writer.write(c, ln)
        writer.write(raw, size)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        writer.write(c, ln)
    return dc


def _dht_segment(tclass: int, tid: int, counts, symbols) -> bytes:
    body = bytes([tclass << 4 | tid]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qtbl: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(v) for v in qtbl.ravel()[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    image: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JPEG bytes.
    subsample=True uses 4:2:0 chroma (2×2 box average), else 4:4:4.
    restart_interval > 0 emits DRI + RSTn every N MCUs."""
    arr = np.asarray(image)
    if arr.dtype != np.uint8 or arr.ndim not in (2, 3):
        raise JpegError(f"expected uint8 (H,W[,3]) image, got {arr.dtype}/{arr.shape}")
    h, w = arr.shape[:2]
    gray = arr.ndim == 2

    qy = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if gray:
        comps = [(arr.astype(np.float64), qy, 1, 1, 0)]
    else:
        y, cb, cr = _rgb_to_ycbcr(arr)
        if subsample:
            eh, ew = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = _pad_to(cb, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            crp = _pad_to(cr, eh, ew).reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))
            comps = [(y, qy, 2, 2, 0), (cbp, qc, 1, 1, 1), (crp, qc, 1, 1, 1)]
        else:
            comps = [(y, qy, 1, 1, 0), (cb, qc, 1, 1, 1), (cr, qc, 1, 1, 1)]

    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    padded = []
    for plane, qt, hf, vf, qid in comps:
        ph, pw = mcus_y * vf * 8, mcus_x * hf * 8
        padded.append((_pad_to(plane, ph, pw), qt, hf, vf, qid))

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += _dqt_segment(0, qy)
    if not gray:
        out += _dqt_segment(1, qc)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for i, (_, _, hf, vf, qid) in enumerate(padded, start=1):
        sof += bytes([i, (hf << 4) | vf, qid])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_COUNTS, _DC_SYMBOLS)
    out += _dht_segment(1, 0, _AC_COUNTS, _AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(1, ncomp + 1):
        sos += bytes([i, 0x00])  # DC/AC table 0 for every component
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    prev_dc = [0] * ncomp
    rst = 0
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.flush()
                out += writer.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                writer = _BitWriter()
                prev_dc = [0] * ncomp
            for ci, (plane, qt, hf, vf, _) in enumerate(padded):
                for by in range(vf):
                    for bx in range(hf):
                        y0 = (my * vf + by) * 8
                        x0 = (mx * hf + bx) * 8
                        block = plane[y0:y0 + 8, x0:x0 + 8]
                        prev_dc[ci] = _encode_block(
                            writer, block, qt, prev_dc[ci], _DC_CODES, _AC_CODES
                        )
            mcu_count += 1
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- decoder --------------------------------------------------------------------

def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W) uint8 gray or (H, W, 3) uint8 RGB."""
    if data[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG stream (no SOI)")
    pos = 2
    qtables = {}
    huff = {}
    frame = None
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise JpegError(f"expected marker at byte {pos}")
        marker = data[pos + 1]
        if marker == 0xFF:  # fill byte (T.81 B.1.1.2 allows 0xFF padding)
            pos += 1
            continue
        if marker == 0xD9:
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone markers (TEM/RSTn/SOI) carry no length segment
            pos += 2
            continue
        if pos + 4 > len(data):
            raise JpegError("truncated marker segment")
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec = body[b] >> 4
                tid = body[b] & 0x0F
                if prec != 0:
                    raise JpegError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.float64)
                tbl[ZIGZAG] = np.frombuffer(body[b + 1:b + 65], dtype=np.uint8)
                qtables[tid] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            b = 0
            while b < len(body):
                tclass = body[b] >> 4
                tid = body[b] & 0x0F
                counts = list(body[b + 1:b + 17])
                n = sum(counts)
                symbols = list(body[b + 17:b + 17 + n])
                huff[(tclass, tid)] = _HuffDecoder(counts, symbols)
                b += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = body[0]
            if prec != 8:
                raise JpegError(f"unsupported sample precision {prec}")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, hv, qid = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline sequential DCT (SOF0/1) is supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body)
        elif marker == 0xDA:  # SOS → entropy data follows
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = body[0]
            scan = {}
            for i in range(ns):
                cid = body[1 + 2 * i]
                tables = body[2 + 2 * i]
                scan[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                data, pos, frame, scan, qtables, huff, restart_interval
            )
        # APPn/COM and anything else: skipped
    raise JpegError("no scan data found")


def _decode_scan(data, pos, frame, scan, qtables, huff, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    planes = []
    for c in comps:
        ph = mcus_y * c["v"] * 8
        pw = mcus_x * c["h"] * 8
        planes.append(np.zeros((ph, pw), dtype=np.float64))

    reader = _BitReader(data, pos)
    prev_dc = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.skip_rst()
                prev_dc = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_tid, ac_tid = scan[c["id"]]
                dc_dec = huff[(0, dc_tid)]
                ac_dec = huff[(1, ac_tid)]
                qt = qtables[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.float64)
                        size = dc_dec.decode(reader)
                        diff = _extend(reader.receive(size), size)
                        prev_dc[ci] += diff
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = ac_dec.decode(reader)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            size = sym & 0x0F
                            if k > 63:
                                raise JpegError("AC index overflow")
                            zz[k] = _extend(reader.receive(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz
                        block = _idct(coef.reshape(8, 8) * qt) + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = p.repeat(vmax // c["v"], axis=0).repeat(hmax // c["h"], axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        return np.clip(full[0].round(), 0, 255).astype(np.uint8)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise JpegError(f"unsupported component count {len(full)}")
