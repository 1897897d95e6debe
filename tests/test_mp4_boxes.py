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


# --- sample tables (round-5: stts/stsz/stsc/stco) ---------------------------


def test_sample_tables_roundtrip_spec():
    """The parser must recover every sample's duration/size/offset/dts from
    the raw bytes exactly as the builder laid them out — and the payload at
    each recorded offset must be the deterministic generator bytes."""
    import itertools

    from manuscript_ocr_spark.kernels.mp4 import (
        build_mp4_with_samples,
        parse_mp4,
        parse_sample_tables,
        sample_payload_byte,
    )

    samples_v = [(1001, 50), (1001, 60), (999, 40), (1001, 55),
                 (1001, 45), (1000, 70), (1000, 30)]
    samples_a = [(1024, 20)] * 5
    blob, layout = build_mp4_with_samples(
        600, 4000, [(b"vide", 30000, samples_v), (b"soun", 48000, samples_a)])

    tabs = parse_sample_tables(blob)
    assert [t["handler"] for t in tabs] == ["vide", "soun"]
    v = tabs[0]
    assert v["timescale"] == 30000
    assert [s["size"] for s in v["samples"]] == [s for _, s in samples_v]
    assert [s["duration"] for s in v["samples"]] == [d for d, _ in samples_v]
    assert [s["offset"] for s in v["samples"]] == layout[0]["sample_offsets"]
    dts = [0] + list(itertools.accumulate(d for d, _ in samples_v))[:-1]
    assert [s["dts"] for s in v["samples"]] == dts

    s3 = v["samples"][3]
    got = blob[s3["offset"]:s3["offset"] + s3["size"]]
    assert got == bytes(sample_payload_byte(1, 3, b) for b in range(s3["size"]))
    # audio chunk follows the video chunks in mdat
    assert tabs[1]["samples"][0]["offset"] == layout[1]["sample_offsets"][0]
    # the metadata-only parser still reads the same blob
    p = parse_mp4(blob)
    assert p["timescale"] == 600 and len(p["tracks"]) == 2


def test_sample_tables_single_chunk_and_fixed_size():
    """n ≤ SAMPLES_PER_CHUNK collapses to a single stsc entry; a track of
    uniform durations round-trips through the stts run-length encoding."""
    from manuscript_ocr_spark.kernels.mp4 import (
        build_mp4_with_samples,
        parse_sample_tables,
    )

    samples = [(1000, 10), (1000, 20), (1000, 30)]
    blob, layout = build_mp4_with_samples(600, 3000, [(b"vide", 600, samples)])
    v = parse_sample_tables(blob)[0]
    assert len(v["samples"]) == 3
    assert [s["offset"] for s in v["samples"]] == layout[0]["sample_offsets"]
    assert [s["dts"] for s in v["samples"]] == [0, 1000, 2000]


def test_sample_tables_skip_metadata_only_tracks():
    """build_mp4 (no stbl) yields no sample-table tracks but still parses."""
    from manuscript_ocr_spark.kernels.mp4 import build_mp4, parse_sample_tables

    blob = build_mp4(600, 1200, [(b"vide", 30000, 60000)])
    assert parse_sample_tables(blob) == []


def test_sample_tables_reject_inconsistent_counts():
    """A corrupted stsz count (≠ stts coverage) must raise, not misread."""
    import struct

    import pytest

    from manuscript_ocr_spark.kernels.mp4 import (
        Mp4Error,
        build_mp4_with_samples,
        parse_sample_tables,
    )

    samples = [(1000, 10)] * 6
    blob, _ = build_mp4_with_samples(600, 6000, [(b"vide", 600, samples)])
    i = blob.index(b"stsz")
    # stsz payload: ver/flags u32, fixed u32, count u32 — shrink the count
    bad = bytearray(blob)
    bad[i + 12:i + 16] = struct.pack(">I", 5)
    with pytest.raises(Mp4Error):
        parse_sample_tables(bytes(bad))


def test_sowt_pcm_roundtrip_through_sample_tables():
    """A raw-PCM ('sowt') audio track: the sample-table walk + int16-LE
    decode must recover the exact generator waveform — a REAL payload
    decode through the container, not a stub."""
    import struct

    from manuscript_ocr_spark.kernels.mp4 import (
        audio_sample_entry_sowt,
        build_mp4_with_samples,
        decode_pcm_sowt,
        parse_sample_tables,
    )

    sr, ch = 8000, 2
    # 10 blocks of 16 stereo frames: deterministic sawtooth-ish int16
    frames_per_block, n_blocks = 16, 10
    pcm_vals = [
        ((i * 257 - 7 * c) % 65536) - 32768
        for i in range(frames_per_block * n_blocks) for c in range(ch)
    ]
    payload = struct.pack("<" + "h" * len(pcm_vals), *pcm_vals)
    block_bytes = frames_per_block * ch * 2
    samples = [(frames_per_block, block_bytes)] * n_blocks
    blob, layout = build_mp4_with_samples(
        600, 600 * frames_per_block * n_blocks // sr,
        [(b"soun", sr, samples,
          {"entry": audio_sample_entry_sowt(ch, sr), "payload": payload})])

    t = parse_sample_tables(blob)[0]
    assert t["handler"] == "soun"
    assert t["audio"] == {"format": "sowt", "channels": 2,
                          "sample_size_bits": 16, "sample_rate": sr}
    decoded = []
    for s in t["samples"]:
        decoded += decode_pcm_sowt(blob[s["offset"]:s["offset"] + s["size"]], ch)
    flat = [v for fr in decoded for v in fr]
    assert flat == pcm_vals  # bit-exact waveform recovery
    assert len(decoded) == frames_per_block * n_blocks

    # ragged payload rejected
    import pytest

    from manuscript_ocr_spark.kernels.mp4 import Mp4Error

    with pytest.raises(Mp4Error):
        decode_pcm_sowt(b"\x00\x01\x02", 2)


def test_twos_pcm_big_endian_roundtrip():
    """'twos' (big-endian) twin: same waveform, opposite byte order — both
    ISO/QuickTime raw-PCM registrations decode bit-exactly."""
    import struct

    import pytest

    from manuscript_ocr_spark.kernels.mp4 import (
        Mp4Error,
        audio_sample_entry_pcm,
        build_mp4_with_samples,
        decode_pcm,
        parse_sample_tables,
    )

    vals = [-32768, -1, 0, 1, 32767, 1234, -4321, 77]
    payload = struct.pack(">" + "h" * len(vals), *vals)
    blob, _ = build_mp4_with_samples(
        600, 8, [(b"soun", 8000, [(4, 8), (4, 8)],
                  {"entry": audio_sample_entry_pcm(1, 8000, b"twos"),
                   "payload": payload})])
    t = parse_sample_tables(blob)[0]
    assert t["audio"]["format"] == "twos"
    got = []
    for smp in t["samples"]:
        got += [v for fr in decode_pcm(
            blob[smp["offset"]:smp["offset"] + smp["size"]], "twos", 1)
            for v in fr]
    assert got == vals
    # sowt decode of twos bytes would byte-swap — formats must not alias
    assert decode_pcm(payload, "sowt", 1) != [tuple([v]) for v in vals]
    with pytest.raises(Mp4Error):
        decode_pcm(payload, "mp4a", 1)
    with pytest.raises(Mp4Error):
        audio_sample_entry_pcm(1, 8000, b"mp4a")
