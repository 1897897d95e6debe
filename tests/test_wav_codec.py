"""WAV codec (kernels/wav.py) — the audio half of the multimodal column
story: round-trips, header scanning, malformed rejection, and the fixture's
oracle assumptions (canonical 44-byte header)."""

from __future__ import annotations

import numpy as np
import pytest

from manuscript_ocr_spark.kernels.wav import (
    WavError,
    decode_wav,
    encode_wav,
    wav_header_size,
)


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(7)
    mono = rng.integers(-32768, 32768, size=1000, dtype=np.int16)
    sr, back = decode_wav(encode_wav(mono, 16000))
    assert sr == 16000
    np.testing.assert_array_equal(back[:, 0], mono)

    stereo = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    sr, back = decode_wav(encode_wav(stereo, 8000))
    assert sr == 8000 and back.shape == (500, 2)
    np.testing.assert_array_equal(back, stereo)


def test_canonical_header_is_44_bytes():
    """The hex-arithmetic DuckDB oracle slices hex(wav) at byte 44; pin that
    the stdlib writer emits the canonical header our fixture relies on."""
    blob = encode_wav(np.zeros(10, np.int16), 16000)
    assert wav_header_size(blob) == 44
    assert len(blob) == 44 + 20


def test_malformed_rejected():
    with pytest.raises(WavError):
        decode_wav(b"RIFFxxxxJUNK")
    with pytest.raises(WavError):
        wav_header_size(b"\x89PNG\r\n\x1a\nnot audio")


def test_fixture_clips_decode():
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.functions.multimodal import (
        AUDIO_SR,
        N_AUDIO_CLIPS,
        _ensure_wav_media,
    )

    rows = pq.read_table(_ensure_wav_media()).to_pylist()
    assert len(rows) == N_AUDIO_CLIPS
    for r in rows[:5]:
        sr, x = decode_wav(r["wav"])
        assert sr == AUDIO_SR and x.shape[1] == 1 and len(x) >= AUDIO_SR // 5
        assert wav_header_size(r["wav"]) == 44
