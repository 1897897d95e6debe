"""Image kernels (pure numpy): resize, letterbox, crop, normalize.

cv2/PIL are not available in this environment, so the resize kernels are
numpy re-implementations of cv2's INTER_LINEAR (half-pixel-center bilinear)
and INTER_AREA (box average) semantics, used identically by the oracle and
the Spark UDFs — the invariant only needs oracle ≡ Spark. Fixture pages are
generated at the detector-native input size (FIXTURES.md §2) so the
detector's page resize (reference: infer.py:304) degenerates to identity
and cannot introduce resampling divergence; the recognizer letterbox
(ResizeAndPadA, reference: _trba/data/transforms.py:62-120) does resample
and uses these kernels on both sides.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=4096)
def _axis_weights(src: int, dst: int, interp: str) -> np.ndarray:
    """Cached (dst, src) weight matrix — crops repeat sizes heavily, and the
    matrices are tiny relative to the per-crop einsum."""
    if interp == "area":
        return _axis_weights_area(src, dst)
    return _axis_weights_linear(src, dst)


def _axis_weights_linear(src: int, dst: int) -> np.ndarray:
    """(dst, src) bilinear weight matrix with cv2 half-pixel centers."""
    w = np.zeros((dst, src), dtype=np.float64)
    if src == dst:
        np.fill_diagonal(w, 1.0)
        return w
    scale = src / dst
    for d in range(dst):
        x = (d + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        frac = x - x0
        x0c = min(max(x0, 0), src - 1)
        x1c = min(max(x0 + 1, 0), src - 1)
        w[d, x0c] += 1.0 - frac
        w[d, x1c] += frac
    return w


def _axis_weights_area(src: int, dst: int) -> np.ndarray:
    """(dst, src) box-average weight matrix (INTER_AREA for shrinking)."""
    if dst >= src:
        return _axis_weights_linear(src, dst)
    w = np.zeros((dst, src), dtype=np.float64)
    scale = src / dst
    for d in range(dst):
        lo = d * scale
        hi = (d + 1) * scale
        i0 = int(np.floor(lo))
        i1 = int(np.ceil(hi))
        for i in range(i0, min(i1, src)):
            overlap = min(hi, i + 1) - max(lo, i)
            if overlap > 0:
                w[d, i] = overlap
        w[d] /= scale
    return w


def resize(img: np.ndarray, new_w: int, new_h: int, interp: str = "linear") -> np.ndarray:
    """Resize HxWxC (or HxW) uint8/float image via separable weight matrices.

    interp: 'linear' (cv2.INTER_LINEAR analog) or 'area' (cv2.INTER_AREA
    analog for shrinking; falls back to linear when enlarging, as cv2 does).
    """
    img = np.asarray(img)
    h, w = img.shape[:2]
    if (w, h) == (new_w, new_h):
        return img.copy()
    squeeze = img.ndim == 2
    arr = img[:, :, None].astype(np.float64) if squeeze else img.astype(np.float64)
    wy = _axis_weights(h, new_h, interp)
    wx = _axis_weights(w, new_w, interp)
    c = arr.shape[2]
    # separable resize as two plain 2D GEMMs (einsum's generic loop and
    # batched 3D matmul both hit pathological slow paths on small shapes;
    # this is the recognizer's per-crop hot path)
    out = (wy @ arr.reshape(h, w * c)).reshape(new_h, w, c)
    out = np.ascontiguousarray(out.transpose(0, 2, 1)).reshape(new_h * c, w)
    out = (out @ wx.T).reshape(new_h, c, new_w).transpose(0, 2, 1)
    if np.issubdtype(img.dtype, np.integer):
        out = np.clip(np.rint(out), 0, 255).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out[:, :, 0] if squeeze else out


def luminance(image: np.ndarray) -> np.ndarray:
    """(H, W) float gray from 2D or 3D input; channel mean for 3D. For
    replicated channels the mean equals the channel exactly (3x/3 rounds to
    x in IEEE double for all uint8 x), so the 2D fast path and an RGB input
    produce bit-identical downstream results."""
    return image if image.ndim == 2 else image.mean(axis=2)


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Gray→RGB / RGBA→RGB coercion.
    Reference: _trba/__init__.py:277-281, transforms.py:86-89."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 4:
        return img[:, :, :3].copy()
    return img


def resize_and_pad(
    img: np.ndarray,
    img_h: int = 64,
    img_w: int = 256,
    align_h: str = "left",
    align_v: str = "center",
) -> np.ndarray:
    """Aspect-preserving letterbox into (img_h, img_w) with white padding.

    scale = min(H/h, W/w); INTER_AREA when shrinking on either axis, else
    INTER_LINEAR; left/center alignment clamped into the canvas.
    Reference: ResizeAndPadA, _trba/data/transforms.py:62-120. 2D input
    letterboxes as 2D (single-channel fast path — identical values to
    letterboxing replicated RGB and taking the channel mean); 3D/RGBA input
    keeps the reference's 3-channel behavior.
    """
    img = np.asarray(img)
    if img.ndim == 3:
        img = to_rgb(img)
    h, w = img.shape[:2]

    scale = min(img_h / max(h, 1), img_w / max(w, 1))
    new_w = max(1, int(round(w * scale)))
    new_h = max(1, int(round(h * scale)))

    interp = "area" if (new_h < h or new_w < w) else "linear"
    img_resized = resize(img, new_w, new_h, interp=interp)

    shape = (img_h, img_w) if img.ndim == 2 else (img_h, img_w, 3)
    canvas = np.full(shape, 255, dtype=img.dtype)

    if align_h == "left":
        x0 = 0
    elif align_h == "right":
        x0 = img_w - new_w
    else:
        x0 = (img_w - new_w) // 2

    if align_v == "top":
        y0 = 0
    elif align_v == "bottom":
        y0 = img_h - new_h
    else:
        y0 = (img_h - new_h) // 2

    x0 = max(0, min(x0, img_w - new_w))
    y0 = max(0, min(y0, img_h - new_h))

    canvas[y0 : y0 + new_h, x0 : x0 + new_w] = img_resized
    return canvas


def extract_word_image(image: np.ndarray, polygon: np.ndarray):
    """Axis-aligned crop of the polygon's bbox, clamped to image bounds.
    Returns None for empty crops. Reference: _pipeline.py:204-221."""
    try:
        polygon = np.asarray(polygon)
        x_min, y_min = np.min(polygon, axis=0)
        x_max, y_max = np.max(polygon, axis=0)

        h, w = image.shape[:2]
        x1 = max(0, int(x_min))
        y1 = max(0, int(y_min))
        x2 = min(w, int(x_max))
        y2 = min(h, int(y_max))

        region_image = image[y1:y2, x1:x2]
        return region_image if region_image.size > 0 else None
    except Exception:
        return None


def normalize_unit(img: np.ndarray) -> np.ndarray:
    """uint8 → float32 in [-1, 1]: (x/255 - 0.5) / 0.5.
    Reference: Normalize(mean=0.5, std=0.5), infer.py:127-132 and
    _trba/data/transforms.py:190."""
    return (img.astype(np.float32) / 255.0 - 0.5) / 0.5
