"""ISO BMFF (MP4) box parser — container METADATA only (ISO/IEC 14496-12,
public spec).

Companion to kernels/mp3.py on the media seam: sample decode (H.264/AAC)
needs codec libraries this container doesn't ship and stays the documented
stub, but the container-level metadata a corpus pipeline queries at ingest
— duration, timescale, track count, which tracks are video/audio, brand —
is a pure box walk: every box is [size:u32][type:4cc][payload], boxes nest
(moov > mvhd + trak > tkhd/mdia > mdhd+hdlr), and the interesting leaves
are fixed-layout full boxes. A builder synthesizes valid minimal files
from known parameters so tests/fixtures assert the parser recovers them
from raw bytes.
"""

from __future__ import annotations

import struct


class Mp4Error(ValueError):
    pass


CONTAINER_BOXES = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts"}


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(version: int, flags: int, body: bytes) -> bytes:
    return struct.pack(">I", (version << 24) | flags) + body


def build_mp4(timescale: int, duration: int, tracks, brand: bytes = b"isom") -> bytes:
    """Minimal valid MP4: ftyp + moov(mvhd + one trak per (handler_4cc,
    track_timescale, track_duration)) + a dummy mdat. handler examples:
    b'vide', b'soun'."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0x200) + brand + b"mp41")
    mvhd = _box(b"mvhd", _full(0, 0, struct.pack(
        ">IIII", 0, 0, timescale, duration)
        + struct.pack(">iHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1)))
    traks = b""
    for tid, (handler, tts, tdur) in enumerate(tracks, start=1):
        tkhd = _box(b"tkhd", _full(0, 7, struct.pack(
            ">IIIII", 0, 0, tid, 0, tdur) + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0x0100, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", 0, 0)))
        mdhd = _box(b"mdhd", _full(0, 0, struct.pack(
            ">IIII", 0, 0, tts, tdur) + struct.pack(">HH", 0x55C4, 0)))
        hdlr = _box(b"hdlr", _full(0, 0, struct.pack(">I", 0) + handler
                                   + b"\x00" * 12 + b"engine\x00"))
        mdia = _box(b"mdia", mdhd + hdlr)
        traks += _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + traks)
    mdat = _box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (type, payload_start, payload_end) for the top-level boxes in
    [start, end); validates sizes (size==1 64-bit largesize supported,
    size==0 means to-end-of-file)."""
    end = len(data) if end is None else end
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise Mp4Error(f"truncated box header at byte {pos}")
        (size,) = struct.unpack(">I", data[pos:pos + 4])
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise Mp4Error(f"truncated largesize at byte {pos}")
            (size,) = struct.unpack(">Q", data[pos + 8:pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise Mp4Error(f"bad box size {size} at byte {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(data, start, end, btype):
    for t, s, e in walk_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def parse_mp4(data: bytes) -> dict:
    """{brand, timescale, duration, duration_ms, tracks:[{id-less:
    handler, timescale, duration, duration_ms}]}. Requires ftyp + moov with
    mvhd; tolerates unknown sibling boxes (skipped by the walk)."""
    top = list(walk_boxes(data))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types:
        raise Mp4Error("no ftyp box (not an ISO BMFF file)")
    fs, fe = _find(data, 0, len(data), b"ftyp")
    brand = data[fs:fs + 4].decode("latin1")
    mv = _find(data, 0, len(data), b"moov")
    if mv is None:
        raise Mp4Error("no moov box")
    mvhd = _find(data, mv[0], mv[1], b"mvhd")
    if mvhd is None:
        raise Mp4Error("moov without mvhd")
    ver = data[mvhd[0]]
    if ver == 0:
        _, _, timescale, duration = struct.unpack(
            ">IIII", data[mvhd[0] + 4:mvhd[0] + 20])
    elif ver == 1:
        _, _, timescale = struct.unpack(">QQI", data[mvhd[0] + 4:mvhd[0] + 24])
        (duration,) = struct.unpack(">Q", data[mvhd[0] + 24:mvhd[0] + 32])
    else:
        raise Mp4Error(f"unsupported mvhd version {ver}")
    tracks = []
    for t, s, e in walk_boxes(data, mv[0], mv[1]):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            raise Mp4Error("trak without mdia")
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        if mdhd is None or hdlr is None:
            raise Mp4Error("mdia missing mdhd/hdlr")
        mver = data[mdhd[0]]
        if mver == 0:
            _, _, tts, tdur = struct.unpack(
                ">IIII", data[mdhd[0] + 4:mdhd[0] + 20])
        else:
            _, _, tts = struct.unpack(">QQI", data[mdhd[0] + 4:mdhd[0] + 24])
            (tdur,) = struct.unpack(">Q", data[mdhd[0] + 24:mdhd[0] + 32])
        handler = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")
        tracks.append({
            "handler": handler, "timescale": tts, "duration": tdur,
            "duration_ms": int(round(tdur / tts * 1000)) if tts else 0,
        })
    return {
        "brand": brand,
        "timescale": timescale,
        "duration": duration,
        "duration_ms": int(round(duration / timescale * 1000)) if timescale else 0,
        "tracks": tracks,
    }
