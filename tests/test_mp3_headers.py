"""MPEG-1 Layer III frame-header parser (round-4 optional item #9): the
container-metadata seam for mm_audio_mp3_stats. The builder synthesizes
streams from known parameters; the parser must recover them from bytes."""

from __future__ import annotations

import pytest

from manuscript_ocr_spark.kernels.mp3 import (
    BITRATES_KBPS,
    Mp3Error,
    build_frame_header,
    build_mp3_stream,
    frame_length,
    parse_mp3_frames,
    stream_stats,
)


def test_parse_recovers_spec():
    spec = [(9, 0, 0), (14, 0, 1), (1, 0, 0)]  # 128, 320(pad), 32 kbps @44.1k
    frames = parse_mp3_frames(build_mp3_stream(spec))
    assert [f["bitrate_kbps"] for f in frames] == [128, 320, 32]
    assert all(f["sample_rate"] == 44100 for f in frames)
    assert [f["padding"] for f in frames] == [0, 1, 0]
    assert frames[1]["frame_len"] == frame_length(320, 44100, 1)
    # frames tile the stream exactly
    assert frames[0]["offset"] == 0
    assert frames[1]["offset"] == frames[0]["frame_len"]


def test_id3v2_tag_skipped():
    spec = [(5, 1, 0)] * 4  # 64 kbps @48k
    blob = build_mp3_stream(spec, id3_payload=b"\x01" * 137)
    assert blob[:3] == b"ID3"
    s = stream_stats(blob)
    assert s["n_frames"] == 4 and s["sample_rate"] == 48000 and s["is_cbr"]
    assert s["duration_ms"] == round(4 * 1152 / 48000 * 1000)


def test_vbr_mean_bitrate():
    spec = [(1, 2, 0), (14, 2, 0)]  # 32 and 320 kbps @32k
    s = stream_stats(build_mp3_stream(spec))
    assert s["mean_bitrate_kbps"] == (32 + 320) / 2
    assert not s["is_cbr"]


def test_truncated_stream_rejected():
    blob = build_mp3_stream([(9, 0, 0)] * 2)
    with pytest.raises(Mp3Error, match="truncated"):
        parse_mp3_frames(blob[:-10])


def test_lost_sync_rejected():
    blob = bytearray(build_mp3_stream([(9, 0, 0)] * 2))
    blob[0] = 0x00
    with pytest.raises(Mp3Error, match="lost sync"):
        parse_mp3_frames(bytes(blob))


def test_mpeg2_rejected_with_clear_error():
    hdr = bytearray(build_frame_header(9, 0))
    hdr[1] &= ~0x08  # clear the MPEG-1 version bit
    with pytest.raises(Mp3Error, match="version"):
        parse_mp3_frames(bytes(hdr) + b"\x00" * 500)


def test_free_bitrate_rejected():
    hdr = bytearray(build_frame_header(9, 0))
    hdr[2] &= 0x0F  # bitrate index 0 = "free" format
    with pytest.raises(Mp3Error, match="bitrate"):
        parse_mp3_frames(bytes(hdr) + b"\x00" * 500)


def test_every_bitrate_and_samplerate_roundtrips():
    for bi in BITRATES_KBPS:
        for si in (0, 1, 2):
            frames = parse_mp3_frames(build_mp3_stream([(bi, si, 0)]))
            assert frames[0]["bitrate_kbps"] == BITRATES_KBPS[bi]
