"""Property-based codec tests (hypothesis): PNG/WAV round-trips must be
EXACT for arbitrary payloads; JPEG must stay within a PSNR floor on smooth
content and always reproduce shape/dtype."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from manuscript_ocr_spark.kernels.jpeg import decode_jpeg, encode_jpeg
from manuscript_ocr_spark.kernels.png import decode_png, encode_png
from manuscript_ocr_spark.kernels.wav import decode_wav, encode_wav


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 40),
    c=st.sampled_from([0, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_exact(h, w, c, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w) if c == 0 else (h, w, c)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img))
    np.testing.assert_array_equal(back, img)


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 3000),
    ch=st.integers(1, 2),
    sr=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wav_roundtrip_exact(n, ch, sr, seed):
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32768, size=(n, ch), dtype=np.int16)
    got_sr, back = decode_wav(encode_wav(pcm, sr))
    assert got_sr == sr
    np.testing.assert_array_equal(back, pcm)


@settings(max_examples=15, deadline=None)
@given(
    h=st.integers(8, 48),
    w=st.integers(8, 48),
    rgb=st.booleans(),
    subsample=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_jpeg_shape_dtype_and_smooth_psnr(h, w, rgb, subsample, seed):
    rng = np.random.default_rng(seed)
    # smooth content: random low-order 2D polynomial surface
    y, x = np.mgrid[0:h, 0:w].astype(np.float64)
    a = rng.uniform(-1, 1, 5)
    surf = 128 + 100 * (
        a[0] * x / max(w, 1) + a[1] * y / max(h, 1)
        + a[2] * (x * y) / max(w * h, 1)
        + a[3] * (x / max(w, 1)) ** 2 + a[4] * (y / max(h, 1)) ** 2
    ) / 3
    g = np.clip(surf, 0, 255).astype(np.uint8)
    img = np.stack([g, g[::-1], g[:, ::-1]], axis=-1) if rgb else g
    back = decode_jpeg(encode_jpeg(img, quality=90, subsample=subsample and rgb))
    assert back.shape == img.shape and back.dtype == np.uint8
    mse = np.mean((img.astype(float) - back.astype(float)) ** 2)
    psnr = 99.0 if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)
    assert psnr >= 28.0, psnr
