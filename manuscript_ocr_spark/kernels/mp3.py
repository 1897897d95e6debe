"""MPEG-1 Layer III frame-HEADER parser (ISO/IEC 11172-3, public spec).

The round-3 codec seam note said MP3 "needs codec libraries"; that is true
for the audio SAMPLES (Huffman-coded MDCT subband data — out of scope), but
the container-level metadata a corpus pipeline actually queries — frame
count, duration, bitrate profile, sample rate, CBR/VBR — is pure header
arithmetic: each frame starts with a 4-byte header carrying sync, version,
layer, bitrate index, sample-rate index, and padding, and the frame length
follows as floor(144000·bitrate_kbps / sample_rate) + padding. This module
walks those headers (skipping a leading ID3v2 tag) without decoding audio —
the exact scope of the mm_audio_* parity item (reference behavior analog:
librosa/ffprobe duration+bitrate probes on ingest).

Also includes a frame-stream BUILDER (deterministic dummy payloads) so
tests and fixtures can synthesize valid streams from KNOWN parameters and
assert the parser recovers them from raw bytes.
"""

from __future__ import annotations

import numpy as np


class Mp3Error(ValueError):
    pass


# MPEG-1 Layer III tables (ISO/IEC 11172-3)
BITRATES_KBPS = {
    1: 32, 2: 40, 3: 48, 4: 56, 5: 64, 6: 80, 7: 96, 8: 112,
    9: 128, 10: 160, 11: 192, 12: 224, 13: 256, 14: 320,
}
SAMPLE_RATES = {0: 44100, 1: 48000, 2: 32000}
SAMPLES_PER_FRAME = 1152  # MPEG-1 Layer III


def frame_length(bitrate_kbps: int, sample_rate: int, padding: int) -> int:
    return (144000 * bitrate_kbps) // sample_rate + padding


def build_frame_header(bitrate_idx: int, samplerate_idx: int,
                       padding: int = 0) -> bytes:
    """4-byte MPEG-1 Layer III header: sync(11) version(2)=11 layer(2)=01
    no-CRC(1)=1 bitrate(4) samplerate(2) padding(1) private(1)
    mode(2)=stereo rest zero."""
    if bitrate_idx not in BITRATES_KBPS:
        raise Mp3Error(f"bad bitrate index {bitrate_idx}")
    if samplerate_idx not in SAMPLE_RATES:
        raise Mp3Error(f"bad samplerate index {samplerate_idx}")
    b0 = 0xFF
    b1 = 0b11111011  # sync tail(3) + version 11 (MPEG1) + layer 01 (III) + 1
    b2 = (bitrate_idx << 4) | (samplerate_idx << 2) | (padding << 1)
    b3 = 0x00  # stereo, no mode ext, no copyright/original/emphasis
    return bytes([b0, b1, b2, b3])


def build_mp3_stream(frames, id3_payload: bytes | None = None,
                     seed: int = 0) -> bytes:
    """Valid MPEG-1 Layer III byte stream from (bitrate_idx,
    samplerate_idx, padding) triples; payload bytes are deterministic
    noise that NEVER contains a false 0xFFEx sync word. Optionally
    prefixed with an ID3v2 tag wrapping id3_payload."""
    rng = np.random.default_rng(seed)
    out = bytearray()
    if id3_payload is not None:
        n = len(id3_payload)
        size = bytes([(n >> 21) & 0x7F, (n >> 14) & 0x7F,
                      (n >> 7) & 0x7F, n & 0x7F])  # syncsafe
        out += b"ID3\x03\x00\x00" + size + id3_payload
    for bi, si, pad in frames:
        hdr = build_frame_header(bi, si, pad)
        flen = frame_length(BITRATES_KBPS[bi], SAMPLE_RATES[si], pad)
        body = rng.integers(0, 0xFE, size=flen - 4, dtype=np.uint8)
        out += hdr + body.tobytes()  # bodies < 0xFE: no fake sync possible
    return bytes(out)


def _skip_id3v2(data: bytes, pos: int) -> int:
    if data[pos:pos + 3] == b"ID3" and len(data) >= pos + 10:
        size = ((data[pos + 6] & 0x7F) << 21) | ((data[pos + 7] & 0x7F) << 14) \
            | ((data[pos + 8] & 0x7F) << 7) | (data[pos + 9] & 0x7F)
        return pos + 10 + size
    return pos


def parse_mp3_frames(data: bytes) -> list[dict]:
    """Walk the frame headers → [{bitrate_kbps, sample_rate, padding,
    frame_len, offset}]. Skips a leading ID3v2 tag; rejects streams with
    no valid frame, bad indices, or truncated tails."""
    pos = _skip_id3v2(data, 0)
    frames = []
    n = len(data)
    while pos + 4 <= n:
        b0, b1, b2, _b3 = data[pos:pos + 4]
        if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
            raise Mp3Error(f"lost sync at byte {pos}")
        version = (b1 >> 3) & 0x03
        layer = (b1 >> 1) & 0x03
        if version != 0b11 or layer != 0b01:
            raise Mp3Error(
                f"unsupported MPEG version/layer bits {version}/{layer} "
                "(only MPEG-1 Layer III)"
            )
        bi = (b2 >> 4) & 0x0F
        si = (b2 >> 2) & 0x03
        pad = (b2 >> 1) & 0x01
        if bi not in BITRATES_KBPS:
            raise Mp3Error(f"bad/free bitrate index {bi} at byte {pos}")
        if si not in SAMPLE_RATES:
            raise Mp3Error(f"bad samplerate index {si} at byte {pos}")
        kbps = BITRATES_KBPS[bi]
        sr = SAMPLE_RATES[si]
        flen = frame_length(kbps, sr, pad)
        if pos + flen > n:
            raise Mp3Error(f"truncated final frame at byte {pos}")
        frames.append({
            "bitrate_kbps": kbps, "sample_rate": sr, "padding": pad,
            "frame_len": flen, "offset": pos,
        })
        pos += flen
    if not frames:
        raise Mp3Error("no MPEG frames found")
    return frames


def stream_stats(data: bytes) -> dict:
    """Aggregate header stats: n_frames, duration_ms (Σ 1152/sr per frame),
    mean_bitrate_kbps, sample_rate (of the first frame), is_cbr."""
    frames = parse_mp3_frames(data)
    dur = sum(SAMPLES_PER_FRAME / f["sample_rate"] for f in frames)
    rates = [f["bitrate_kbps"] for f in frames]
    return {
        "n_frames": len(frames),
        "duration_ms": int(round(dur * 1000)),
        "mean_bitrate_kbps": float(sum(rates)) / len(rates),
        "sample_rate": frames[0]["sample_rate"],
        "is_cbr": len(set(rates)) == 1,
    }
