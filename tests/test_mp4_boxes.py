"""ISO BMFF (MP4) box parser — container-metadata seam for
mm_video_mp4_stats. Builder synthesizes minimal valid files from known
parameters; the parser must recover them from bytes."""

from __future__ import annotations

import struct

import pytest

from manuscript_ocr_spark.kernels.mp4 import (
    Mp4Error,
    build_mp4,
    parse_mp4,
    walk_boxes,
)


def test_parse_recovers_spec():
    blob = build_mp4(1000, 5432, [(b"vide", 30000, 162960),
                                  (b"soun", 48000, 260736)])
    p = parse_mp4(blob)
    assert p["brand"] == "isom"
    assert p["timescale"] == 1000 and p["duration"] == 5432
    assert p["duration_ms"] == 5432
    assert [t["handler"] for t in p["tracks"]] == ["vide", "soun"]
    assert p["tracks"][0]["duration_ms"] == 5432
    assert p["tracks"][1]["timescale"] == 48000


def test_audio_only_and_odd_timescale():
    blob = build_mp4(90000, 90000 * 7 // 2, [(b"soun", 48000, 48000 * 7 // 2)])
    p = parse_mp4(blob)
    assert p["duration_ms"] == 3500
    assert len(p["tracks"]) == 1 and p["tracks"][0]["handler"] == "soun"


def test_unknown_sibling_boxes_skipped():
    blob = build_mp4(600, 1200, [(b"vide", 30000, 60000)])
    # splice an unknown top-level box between ftyp and moov
    boxes = list(walk_boxes(blob))
    ftyp_end = boxes[0][2]
    junk = struct.pack(">I", 8 + 5) + b"junk" + b"hello"
    spliced = blob[:ftyp_end] + junk + blob[ftyp_end:]
    p = parse_mp4(spliced)
    assert p["duration_ms"] == 2000 and len(p["tracks"]) == 1


def test_largesize_box():
    blob = build_mp4(1000, 100, [])
    # rewrite mdat as a 64-bit largesize box
    boxes = list(walk_boxes(blob))
    mdat = [b for b in boxes if b[0] == b"mdat"][0]
    start = mdat[1] - 8
    payload = blob[mdat[1]:mdat[2]]
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    p = parse_mp4(blob[:start] + large)
    assert p["duration_ms"] == 100


def test_truncation_and_garbage_rejected():
    blob = build_mp4(1000, 100, [(b"vide", 30000, 3000)])
    with pytest.raises(Mp4Error, match="box"):
        parse_mp4(blob[:-20])
    with pytest.raises(Mp4Error, match="ftyp"):
        parse_mp4(b"\x00" * 64)


def test_moov_required():
    blob = build_mp4(1000, 100, [])
    boxes = list(walk_boxes(blob))
    moov = [b for b in boxes if b[0] == b"moov"][0]
    # excise moov
    cut = blob[:moov[1] - 8] + blob[moov[2]:]
    with pytest.raises(Mp4Error, match="moov"):
        parse_mp4(cut)
