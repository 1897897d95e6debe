"""ISO BMFF (MP4) box parser — container metadata + frame-accurate sample
tables (ISO/IEC 14496-12, public spec).

Companion to kernels/mp3.py on the media seam: decoding COMPRESSED sample
payloads (H.264/AAC) needs codec libraries this container doesn't ship and
stays the documented stub — but raw-PCM ('sowt') tracks ARE decoded for
real (int16 LE × channels, fully specified by the sample entry), and
everything a corpus pipeline queries at ingest is
a pure box walk: metadata (duration, timescale, track inventory, brand —
moov > mvhd + trak > tkhd/mdia > mdhd+hdlr) and, since round 5, the full
sample tables (stbl > stts/stsz/stsc/stco — §8.6.1/8.7.3/8.7.4/8.7.5), so
every video frame's exact dts, duration, byte offset and size are
recovered from raw bytes — frame-accurate sampling without a codec.
Builders synthesize valid minimal files from known parameters so
tests/fixtures assert the parsers recover them from raw bytes.
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


# --- sample tables (round-5: stts/stsz/stsc/stco — frame-accurate layout) ----

SAMPLES_PER_CHUNK = 4  # fixed builder chunking; stsc still parsed generally


def _stbl(samples, chunk_offsets, entry: bytes | None = None):
    """stbl with real sample tables for `samples` = [(duration_ticks,
    size_bytes), ...]: stsd (minimal dummy video entry unless a real
    sample entry is passed), stts (run-length deltas), stsz (per-sample
    sizes), stsc (SAMPLES_PER_CHUNK fixed, plus a trailing-partial entry
    when needed), stco (chunk offsets)."""
    n = len(samples)
    if entry is None:
        entry = _box(b"mp4v", b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _box(b"stsd", _full(0, 0, struct.pack(">I", 1) + entry))
    runs = []
    for dur, _ in samples:
        if runs and runs[-1][1] == dur:
            runs[-1][0] += 1
        else:
            runs.append([1, dur])
    stts = _box(b"stts", _full(0, 0, struct.pack(">I", len(runs))
                               + b"".join(struct.pack(">II", c, d) for c, d in runs)))
    stsz = _box(b"stsz", _full(0, 0, struct.pack(">II", 0, n)
                               + b"".join(struct.pack(">I", s) for _, s in samples)))
    n_chunks = (n + SAMPLES_PER_CHUNK - 1) // SAMPLES_PER_CHUNK
    entries = [(1, SAMPLES_PER_CHUNK, 1)]
    rem = n - (n_chunks - 1) * SAMPLES_PER_CHUNK
    if n_chunks > 1 and rem != SAMPLES_PER_CHUNK:
        entries.append((n_chunks, rem, 1))
    elif n_chunks == 1:
        entries = [(1, n, 1)]
    stsc = _box(b"stsc", _full(0, 0, struct.pack(">I", len(entries))
                               + b"".join(struct.pack(">III", *e) for e in entries)))
    stco = _box(b"stco", _full(0, 0, struct.pack(">I", len(chunk_offsets))
                               + b"".join(struct.pack(">I", o) for o in chunk_offsets)))
    return _box(b"stbl", stsd + stts + stsz + stsc + stco)


def sample_payload_byte(track_id: int, sample_idx: int, byte_idx: int) -> int:
    """Deterministic mdat content — the generator-spec contract a fixture
    oracle can recompute without the parser."""
    return (track_id * 31 + sample_idx * 7 + byte_idx * 3) % 251


def build_mp4_with_samples(timescale: int, duration: int, tracks) -> tuple:
    """Minimal valid MP4 WITH sample tables. tracks = [(handler_4cc,
    track_timescale, [(sample_duration_ticks, sample_size_bytes), ...])]
    or 4-tuples with a trailing dict {"entry": stsd-entry-bytes,
    "payload": full-mdat-bytes-for-the-track} — a real sample entry (e.g.
    audio_sample_entry_sowt) with real payload bytes (e.g. PCM) instead of
    the deterministic noise filler. mdat carries each sample's payload
    (sample_payload_byte noise unless overridden). Returns (blob, layout)
    where layout = [{track_id, chunk_offsets, sample_offsets}] — the
    WRITER's bookkeeping (derived while laying out, never by re-parsing),
    so fixture expectations stay generator-spec."""
    tracks = [t if len(t) == 4 else (*t, None) for t in tracks]
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isom" + b"mp41")

    def _moov(chunk_offsets_by_track):
        mvhd = _box(b"mvhd", _full(0, 0, struct.pack(
            ">IIII", 0, 0, timescale, duration)
            + struct.pack(">iHH", 0x00010000, 0x0100, 0)
            + b"\x00" * 8 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24 + struct.pack(">I", len(tracks) + 1)))
        traks = b""
        for tid, (handler, tts, samples, extra) in enumerate(tracks, start=1):
            tdur = sum(d for d, _ in samples)
            tkhd = _box(b"tkhd", _full(0, 7, struct.pack(
                ">IIIII", 0, 0, tid, 0, tdur) + b"\x00" * 8
                + struct.pack(">hhhh", 0, 0, 0x0100, 0)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
                + struct.pack(">II", 0, 0)))
            mdhd = _box(b"mdhd", _full(0, 0, struct.pack(
                ">IIII", 0, 0, tts, tdur) + struct.pack(">HH", 0x55C4, 0)))
            hdlr = _box(b"hdlr", _full(0, 0, struct.pack(">I", 0) + handler
                                       + b"\x00" * 12 + b"engine\x00"))
            stbl = _stbl(samples, chunk_offsets_by_track[tid - 1],
                         entry=(extra or {}).get("entry"))
            minf = _box(b"minf", stbl)
            mdia = _box(b"mdia", mdhd + hdlr + minf)
            traks += _box(b"trak", tkhd + mdia)
        return _box(b"moov", mvhd + traks)

    # two-pass: sizes don't depend on offset VALUES (fixed-width u32), so
    # lay out with zeros, compute the mdat payload start, then re-emit
    n_chunks = [
        max(1, (len(s) + SAMPLES_PER_CHUNK - 1) // SAMPLES_PER_CHUNK)
        for _, _, s, _x in tracks
    ]
    moov0 = _moov([[0] * c for c in n_chunks])
    mdat_payload_start = len(ftyp) + len(moov0) + 8

    layout = []
    mdat = b""
    pos = mdat_payload_start
    chunk_offsets_by_track = []
    for tid, (handler, tts, samples, extra) in enumerate(tracks, start=1):
        chunk_offsets = []
        sample_offsets = []
        payload = (extra or {}).get("payload")
        if payload is not None and len(payload) != sum(sz for _, sz in samples):
            raise Mp4Error(
                f"track {tid} payload is {len(payload)} bytes but the sample "
                f"sizes sum to {sum(sz for _, sz in samples)}")
        consumed = 0
        for i, (_, size) in enumerate(samples):
            if i % SAMPLES_PER_CHUNK == 0:
                chunk_offsets.append(pos)
            sample_offsets.append(pos)
            if payload is not None:
                mdat += payload[consumed:consumed + size]
                consumed += size
            else:
                mdat += bytes(
                    sample_payload_byte(tid, i, b) for b in range(size)
                )
            pos += size
        chunk_offsets_by_track.append(chunk_offsets)
        layout.append({
            "track_id": tid,
            "chunk_offsets": chunk_offsets,
            "sample_offsets": sample_offsets,
        })
    moov = _moov(chunk_offsets_by_track)
    assert len(moov) == len(moov0)
    return ftyp + moov + _box(b"mdat", mdat), layout


def parse_sample_tables(data: bytes) -> list:
    """Per-track frame-accurate sample tables: [{handler, timescale,
    samples: [{idx, dts, duration, size, offset}]}] from stts (decode-time
    deltas, expanded), stsz (sizes), stsc (samples-per-chunk runs, applied
    from first_chunk until the next entry per ISO 14496-12 §8.7.4) and
    stco (chunk offsets); within a chunk, sample offsets accumulate by
    size. Tracks without a complete stbl are skipped (metadata-only files
    from build_mp4 still parse via parse_mp4)."""
    mv = _find(data, 0, len(data), b"moov")
    if mv is None:
        raise Mp4Error("no moov box")
    out = []
    for t, s, e in walk_boxes(data, mv[0], mv[1]):
        if t != b"trak":
            continue
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, mdia[0], mdia[1], b"mdhd")
        hdlr = _find(data, mdia[0], mdia[1], b"hdlr")
        minf = _find(data, mdia[0], mdia[1], b"minf")
        if mdhd is None or hdlr is None or minf is None:
            continue
        stbl = _find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue
        audio_entry = parse_audio_sample_entry(data, stbl[0], stbl[1])
        boxes = {}
        for bt, bs, be in walk_boxes(data, stbl[0], stbl[1]):
            boxes[bt] = (bs, be)
        if not all(k in boxes for k in (b"stts", b"stsz", b"stsc", b"stco")):
            continue
        mver = data[mdhd[0]]
        if mver == 0:
            tts = struct.unpack(">I", data[mdhd[0] + 12:mdhd[0] + 16])[0]
        else:
            tts = struct.unpack(">I", data[mdhd[0] + 20:mdhd[0] + 24])[0]
        handler = data[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")

        bs, be = boxes[b"stts"]
        (n_runs,) = struct.unpack(">I", data[bs + 4:bs + 8])
        durations = []
        for i in range(n_runs):
            c, d = struct.unpack(">II", data[bs + 8 + 8 * i:bs + 16 + 8 * i])
            durations.extend([d] * c)

        bs, be = boxes[b"stsz"]
        fixed, n = struct.unpack(">II", data[bs + 4:bs + 12])
        if fixed:
            sizes = [fixed] * n
        else:
            sizes = list(struct.unpack(f">{n}I", data[bs + 12:bs + 12 + 4 * n]))
        if len(durations) != n:
            raise Mp4Error(f"stts covers {len(durations)} samples, stsz {n}")

        bs, be = boxes[b"stsc"]
        (n_ent,) = struct.unpack(">I", data[bs + 4:bs + 8])
        stsc = [struct.unpack(">III", data[bs + 8 + 12 * i:bs + 20 + 12 * i])
                for i in range(n_ent)]

        bs, be = boxes[b"stco"]
        (n_chunks,) = struct.unpack(">I", data[bs + 4:bs + 8])
        stco = list(struct.unpack(f">{n_chunks}I", data[bs + 8:bs + 8 + 4 * n_chunks]))

        # expand stsc runs across the stco chunk list
        spc_by_chunk = []
        for i, (first, spc, _desc) in enumerate(stsc):
            last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
            spc_by_chunk.extend([spc] * (last - first + 1))
        if len(spc_by_chunk) != n_chunks:
            raise Mp4Error("stsc does not cover the stco chunk list")

        samples = []
        dts = 0
        si = 0
        for ci, chunk_off in enumerate(stco):
            off = chunk_off
            for _ in range(spc_by_chunk[ci]):
                if si >= n:
                    break
                samples.append({
                    "idx": si, "dts": dts, "duration": durations[si],
                    "size": sizes[si], "offset": off,
                })
                dts += durations[si]
                off += sizes[si]
                si += 1
        if si != n:
            raise Mp4Error(f"chunk layout yields {si} samples, stsz says {n}")
        track = {"handler": handler, "timescale": tts, "samples": samples}
        if audio_entry is not None:
            fmt, channels, bits, rate = audio_entry
            track["audio"] = {"format": fmt, "channels": channels,
                              "sample_size_bits": bits, "sample_rate": rate}
        out.append(track)
    return out


# --- raw-PCM audio in ISO BMFF (round-5: a REAL payload decode path) ---------
#
# 'sowt' (16-bit little-endian PCM, QuickTime/ISO registered) is the one
# audio codec whose "decode" is fully specified by the sample entry alone:
# channels x int16 frames, no entropy coding. That makes it the honest
# bridge across the codec seam — the sample-table walk feeds a REAL sample
# decode with a generator-spec oracle, while compressed codecs (H.264/AAC/
# MP3 payloads) remain the documented stub.


def audio_sample_entry_pcm(channels: int, sample_rate: int,
                           fmt: bytes = b"sowt") -> bytes:
    """AudioSampleEntry box (ISO 14496-12 §12.2.3 layout, version 0) for a
    raw 16-bit PCM codec: 'sowt' (little-endian) or 'twos'
    (big-endian)."""
    if fmt not in (b"sowt", b"twos"):
        raise Mp4Error(f"not a raw-PCM sample-entry format: {fmt!r}")
    body = (
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref index
        + struct.pack(">HH", 0, 0) + b"\x00" * 4     # version/revision/vendor
        + struct.pack(">HH", channels, 16)           # channelcount, samplesize
        + struct.pack(">HH", 0, 0)                   # compression, packet size
        + struct.pack(">I", (sample_rate & 0xFFFF) << 16)  # 16.16 rate
    )
    return _box(fmt, body)


def audio_sample_entry_sowt(channels: int, sample_rate: int) -> bytes:
    return audio_sample_entry_pcm(channels, sample_rate, b"sowt")


def parse_audio_sample_entry(data: bytes, stbl_start: int, stbl_end: int):
    """(format_4cc, channels, sample_size_bits, sample_rate) from the first
    stsd entry of an stbl, or None when the entry isn't audio-shaped."""
    stsd = _find(data, stbl_start, stbl_end, b"stsd")
    if stsd is None:
        return None
    (count,) = struct.unpack(">I", data[stsd[0] + 4:stsd[0] + 8])
    if count < 1:
        return None
    es = stsd[0] + 8
    (esize,) = struct.unpack(">I", data[es:es + 4])
    fmt = data[es + 4:es + 8].decode("latin1")
    if esize < 36:
        return None
    base = es + 8
    channels, bits = struct.unpack(">HH", data[base + 16:base + 20])
    (rate_fx,) = struct.unpack(">I", data[base + 24:base + 28])
    return fmt, channels, bits, rate_fx >> 16


def decode_pcm(payload: bytes, fmt: str, channels: int):
    """Raw-PCM sample payload -> list of per-frame int16 tuples
    (interleaved): 'sowt' little-endian, 'twos' big-endian (the two ISO/
    QuickTime raw 16-bit registrations). Exact integers; raises on a
    ragged payload or a non-PCM format."""
    if fmt == "sowt":
        order = "<"
    elif fmt == "twos":
        order = ">"
    else:
        raise Mp4Error(f"not a raw-PCM format: {fmt!r}")
    if len(payload) % (2 * channels):
        raise Mp4Error(
            f"{fmt} payload of {len(payload)} bytes is not a whole number "
            f"of {channels}-channel int16 frames")
    vals = struct.unpack(order + "h" * (len(payload) // 2), payload)
    return [tuple(vals[i:i + channels]) for i in range(0, len(vals), channels)]


def decode_pcm_sowt(payload: bytes, channels: int):
    return decode_pcm(payload, "sowt", channels)
