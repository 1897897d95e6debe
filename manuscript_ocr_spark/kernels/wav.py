"""WAV (RIFF PCM) decode — stdlib `wave` + numpy, no external audio libs.

The audio half of the multimodal column story: clips ride as binary WAV
payloads and decode inside the Arrow batch loop, exactly like pages
(kernels/png.py). 16-bit PCM only (the archival/interchange default);
compressed codecs (MP3/AAC) stay behind the documented decode_external stub.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class WavError(ValueError):
    pass


def decode_wav(blob: bytes):
    """WAV bytes → (sample_rate, (n_samples, n_channels) int16 array)."""
    try:
        with wave.open(io.BytesIO(blob)) as w:
            if w.getsampwidth() != 2:
                raise WavError(
                    f"unsupported sample width {w.getsampwidth()} (16-bit only)"
                )
            sr = w.getframerate()
            nch = w.getnchannels()
            frames = w.readframes(w.getnframes())
    except wave.Error as e:
        raise WavError(str(e)) from e
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, nch)
    return sr, samples


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n, [channels]) int16 array → canonical 44-byte-header WAV bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr.reshape(-1, 1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(arr.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(arr.tobytes())
    return buf.getvalue()


def wav_header_size(blob: bytes) -> int:
    """Byte offset of the PCM data in a RIFF stream (scan to the 'data'
    chunk — 44 for the canonical header the stdlib writer emits)."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE stream")
    pos = 12
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        if cid == b"data":
            return pos + 8
        pos += 8 + size + (size & 1)
    raise WavError("no data chunk")
