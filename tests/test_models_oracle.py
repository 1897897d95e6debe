"""Deterministic stand-in model + oracle tests.

The models must be exactly reproducible (same seed → same weights → same
outputs) because both the oracle and the Spark UDFs rely on them; accuracy
against gt_pages is also asserted so recognition output is meaningful text,
not noise (FIXTURES.md §3).
"""

import numpy as np
import pytest

from manuscript_ocr_spark.fixtures import PAGE_SIZE, render_page
from manuscript_ocr_spark.models import (
    DetectorConfig,
    build_weights,
    deserialize_weights,
    detect_quads,
    recognize,
    serialize_weights,
)
from manuscript_ocr_spark.kernels.image import extract_word_image, to_rgb
from manuscript_ocr_spark.oracle import page_to_line_texts


@pytest.fixture(scope="module")
def weights():
    return build_weights()


@pytest.fixture(scope="module")
def cfg():
    return DetectorConfig(target_size=PAGE_SIZE)


def test_weights_deterministic(weights):
    w2 = build_weights()
    np.testing.assert_array_equal(weights["glyphs"], w2["glyphs"])
    assert weights["itos"] == w2["itos"]


def test_glyphs_pairwise_distinct(weights):
    g = weights["glyphs"]
    n = len(g)
    for i in range(n):
        for j in range(i + 1, n):
            assert np.sum(g[i] != g[j]) >= 4  # 2x-upsampled coarse distance ≥1


def test_weights_serialize_roundtrip(weights):
    blob = serialize_weights(weights)
    w2 = deserialize_weights(blob)
    np.testing.assert_array_equal(weights["glyphs"], w2["glyphs"])
    assert w2["itos"] == weights["itos"]
    assert w2["eos_id"] == weights["eos_id"]
    assert w2["max_len"] == weights["max_len"]


def test_detector_finds_gt_words(weights, cfg):
    # normal pages: every gt word yields exactly one detection whose center
    # matches, and vice versa
    gray, gt = render_page(0, weights)
    pixels = to_rgb(gray)
    quads = detect_quads(pixels, cfg)
    assert len(quads) == len(gt)
    gt_centers = sorted(
        (
            (g["polygon"][0][0] + g["polygon"][2][0]) / 2,
            (g["polygon"][0][1] + g["polygon"][2][1]) / 2,
        )
        for g in gt
    )
    det_centers = sorted(
        (
            float((q[0] + q[2]) / 2),
            float((q[1] + q[5]) / 2),
        )
        for q in quads
    )
    for (gx, gy), (dx, dy) in zip(gt_centers, det_centers):
        assert abs(gx - dx) < 3 and abs(gy - dy) < 3


def test_detector_empty_page(weights, cfg):
    pixels = np.full((PAGE_SIZE, PAGE_SIZE, 3), 255, dtype=np.uint8)
    assert detect_quads(pixels, cfg).shape == (0, 9)


def test_recognizer_exact_on_gt_crops(weights, cfg):
    # crops taken at the DETECTED (expanded) boxes must recognize to the gt
    # text of the word whose rect contains the box center
    total = correct = 0
    for p in range(6):
        gray, gt = render_page(p, weights)
        pixels = to_rgb(gray)
        for quad in detect_quads(pixels, cfg):
            poly = np.array(quad[:8].reshape(4, 2), dtype=np.int32)
            crop = extract_word_image(pixels, poly)
            if crop is None:
                continue
            cx = (poly[:, 0].min() + poly[:, 0].max()) / 2
            cy = (poly[:, 1].min() + poly[:, 1].max()) / 2
            match = [
                g
                for g in gt
                if g["polygon"][0][0] <= cx <= g["polygon"][2][0]
                and g["polygon"][0][1] <= cy <= g["polygon"][2][1]
            ]
            if not match:
                continue
            res = recognize([crop], weights)[0]
            total += 1
            if res["text"] == match[0]["text"]:
                correct += 1
            assert 0.0 < res["confidence"] <= 1.0
    assert total > 10
    assert correct == total


def test_recognizer_empty_crop(weights):
    crop = np.full((20, 40, 3), 255, dtype=np.uint8)
    res = recognize([crop], weights)[0]
    assert res["text"] == ""


def test_recognizer_batching_consistent(weights, cfg):
    gray, gt = render_page(0, weights)
    pixels = to_rgb(gray)
    quads = detect_quads(pixels, cfg)
    crops = []
    for quad in quads:
        poly = np.array(quad[:8].reshape(4, 2), dtype=np.int32)
        c = extract_word_image(pixels, poly)
        if c is not None:
            crops.append(c)
    r1 = recognize(crops, weights, batch_size=2)
    r2 = recognize(crops, weights, batch_size=32)
    assert r1 == r2


def test_oracle_lines_match_gt(weights, cfg):
    for p in range(8):
        gray, gt = render_page(p, weights)
        lines = page_to_line_texts(to_rgb(gray), weights, cfg)
        per_line = {}
        for g in gt:
            per_line.setdefault(g["line"], []).append((g["pos"], g["text"]))
        gt_lines = [
            " ".join(t for _, t in sorted(v)) for _, v in sorted(per_line.items())
        ]
        assert lines == gt_lines, f"page {p}"
