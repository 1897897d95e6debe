"""Visualization kernel (debug sink, SURVEY.md §2 S8).

Draw detected quads and reading-order indices onto a page image — the
reference's draw_quads/visualize_page (utils.py:42-220) re-expressed in pure
numpy (PIL absent): 2px rectangle strokes on the axis-aligned bbox of each
quad, the order number rendered with the glyph bank's digit glyphs above the
box. Output is a plain uint8 array → binary column → parquet sink.
"""

from __future__ import annotations

import numpy as np

from ..models.glyphs import GLYPH_SIZE

STROKE = 90
LABEL_INK = 0


def draw_box(canvas: np.ndarray, x0: int, y0: int, x1: int, y1: int, value: int = STROKE, width: int = 2):
    h, w = canvas.shape[:2]
    x0 = max(0, min(x0, w - 1))
    x1 = max(0, min(x1, w - 1))
    y0 = max(0, min(y0, h - 1))
    y1 = max(0, min(y1, h - 1))
    canvas[y0 : y0 + width, x0:x1] = value
    canvas[max(y1 - width, 0) : y1, x0:x1] = value
    canvas[y0:y1, x0 : x0 + width] = value
    canvas[y0:y1, max(x1 - width, 0) : x1] = value


def draw_number(canvas: np.ndarray, x: int, y: int, number: int, glyphs: np.ndarray, stoi: dict):
    """Render a decimal number with the glyph bank's digit glyphs at (x, y)."""
    for i, ch in enumerate(str(number)):
        g = glyphs[stoi[ch] - 3]
        gx = x + i * (GLYPH_SIZE + 2)
        gy = y
        if gy + GLYPH_SIZE > canvas.shape[0] or gx + GLYPH_SIZE > canvas.shape[1]:
            return
        region = canvas[gy : gy + GLYPH_SIZE, gx : gx + GLYPH_SIZE]
        region[g == 1] = LABEL_INK


def visualize_page(image: np.ndarray, quads: np.ndarray, weights: dict, show_order: bool = True) -> np.ndarray:
    """Page (2D gray or 3D) + (N, 9) quads → annotated uint8 gray image."""
    canvas = (image.copy() if image.ndim == 2 else image.mean(axis=2)).astype(np.uint8)
    for order, quad in enumerate(quads):
        pts = quad[:8].reshape(4, 2)
        x0, y0 = int(pts[:, 0].min()), int(pts[:, 1].min())
        x1, y1 = int(pts[:, 0].max()), int(pts[:, 1].max())
        draw_box(canvas, x0, y0, x1, y1)
        if show_order:
            draw_number(canvas, x0 + 2, max(y0 - GLYPH_SIZE - 2, 0), order, weights["glyphs"], weights["stoi"])
    return canvas
