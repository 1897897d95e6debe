"""Geometry-kernel spec tests.

Exact-value tests ported from the reference's own unit suite
(/root/reference/tests/detectors/east/test_lanms.py:18-189) — the reference
tests ARE the spec for our numpy ports.
"""

import numpy as np
import pytest

from manuscript_ocr_spark.kernels import (
    clip_polygon,
    compute_intersection,
    locality_aware_nms,
    normalize_polygon,
    polygon_area,
    polygon_intersection,
    polygon_iou,
    should_merge,
    standard_nms,
)


def test_polygon_area_square():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    np.testing.assert_allclose(polygon_area(poly), 1.0, rtol=1e-5)


def test_polygon_area_triangle():
    poly = np.array([[0, 0], [2, 0], [0, 2]], dtype=np.float64)
    np.testing.assert_allclose(polygon_area(poly), 2.0, rtol=1e-5)


def test_compute_intersection():
    p1 = np.array([0, 0], dtype=np.float64)
    p2 = np.array([2, 2], dtype=np.float64)
    A = np.array([0, 2], dtype=np.float64)
    B = np.array([2, 0], dtype=np.float64)
    inter = compute_intersection(p1, p2, A, B)
    np.testing.assert_allclose(inter, np.array([1.0, 1.0]), rtol=1e-5)


def test_clip_polygon():
    subject = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    A = np.array([2, 5], dtype=np.float64)
    B = np.array([2, -1], dtype=np.float64)
    clipped, count = clip_polygon(subject, A, B)
    expected = np.array([[2, 0], [4, 0], [4, 4], [2, 4]], dtype=np.float64)
    np.testing.assert_allclose(clipped, expected, rtol=1e-5)
    assert count == 4


def test_polygon_intersection():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    inter_poly = polygon_intersection(poly1, poly2)
    expected = np.array([[2, 2], [4, 2], [4, 4], [2, 4]], dtype=np.float64)
    np.testing.assert_allclose(inter_poly, expected, rtol=1e-5)


def test_polygon_iou():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    assert np.isclose(polygon_iou(poly1, poly2), 4 / 28, rtol=1e-5)


def test_should_merge():
    poly1 = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly2 = np.array([[2, 2], [6, 2], [6, 6], [2, 6]], dtype=np.float64)
    assert should_merge(poly1, poly2, 0.1)
    assert not should_merge(poly1, poly2, 0.2)


def test_normalize_polygon():
    ref = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64)
    poly = np.array([[4, 4], [0, 4], [0, 0], [4, 0]], dtype=np.float64)
    np.testing.assert_allclose(normalize_polygon(ref, poly), ref, rtol=1e-5)


def test_standard_nms():
    polys = [
        np.array([[0, 0], [4, 0], [4, 4], [0, 4]], dtype=np.float64),
        np.array([[1, 1], [5, 1], [5, 5], [1, 5]], dtype=np.float64),
        np.array([[10, 10], [14, 10], [14, 14], [10, 14]], dtype=np.float64),
    ]
    scores = [0.9, 0.8, 0.7]
    kept_polys, kept_scores = standard_nms(polys, scores, 0.1)
    assert len(kept_polys) == 2
    # highest score survives first
    assert kept_scores[0] == pytest.approx(0.9)


def test_locality_aware_nms():
    boxes = np.array(
        [
            [0, 0, 4, 0, 4, 4, 0, 4, 0.9],
            [1, 1, 5, 1, 5, 5, 1, 5, 0.8],
            [10, 10, 14, 10, 14, 14, 10, 14, 0.7],
            [11, 11, 15, 11, 15, 15, 11, 15, 0.6],
        ],
        dtype=np.float32,
    )
    final_boxes = locality_aware_nms(boxes, 0.1)
    assert final_boxes.shape[0] == 2
    assert final_boxes.dtype == np.float32


def test_locality_aware_nms_weighted_merge_values():
    # two identical-position boxes merge to the score-weighted average
    boxes = np.array(
        [
            [0, 0, 4, 0, 4, 4, 0, 4, 0.6],
            [0, 0, 4, 0, 4, 4, 0, 4, 0.2],
        ],
        dtype=np.float32,
    )
    out = locality_aware_nms(boxes, 0.1)
    assert out.shape[0] == 1
    np.testing.assert_allclose(out[0, :8], [0, 0, 4, 0, 4, 4, 0, 4], atol=1e-5)
    assert out[0, 8] == pytest.approx(0.6, abs=1e-6)  # running max score


def test_polygon_area_degenerate():
    poly = np.array([[0, 0], [1, 0]], dtype=np.float64)
    assert polygon_area(poly) == pytest.approx(0.0)


def test_compute_intersection_parallel():
    p1 = np.array([0, 0], dtype=np.float64)
    p2 = np.array([1, 1], dtype=np.float64)
    A = np.array([2, 2], dtype=np.float64)
    B = np.array([3, 3], dtype=np.float64)
    np.testing.assert_allclose(compute_intersection(p1, p2, A, B), p1, rtol=1e-5)


def test_polygon_intersection_no_overlap():
    poly1 = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    poly2 = np.array([[2, 2], [3, 2], [3, 3], [2, 3]], dtype=np.float64)
    assert polygon_intersection(poly1, poly2).shape == (0, 2)


def test_polygon_iou_extremes():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    assert polygon_iou(poly, poly) == pytest.approx(1.0)
    other = np.array([[2, 2], [3, 2], [3, 3], [2, 3]], dtype=np.float64)
    assert polygon_iou(poly, other) == pytest.approx(0.0)


def test_should_merge_at_threshold():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    assert not should_merge(poly, poly, 1.0)
    assert should_merge(poly, poly, 0.999)


def test_clip_polygon_no_clip():
    subject = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    A = np.array([100, 0], dtype=np.float64)
    B = np.array([100, 1], dtype=np.float64)
    clipped, count = clip_polygon(subject, A, B)
    np.testing.assert_allclose(clipped, subject, rtol=1e-5)
    assert count == subject.shape[0]


def test_clip_polygon_full_clip():
    subject = np.array([[1, 1], [2, 1], [2, 2], [1, 2]], dtype=np.float64)
    A = np.array([0, 0], dtype=np.float64)
    B = np.array([0, 1], dtype=np.float64)
    clipped, count = clip_polygon(subject, A, B)
    assert clipped.shape == (0, 2)
    assert count == 0


def test_normalize_polygon_variants():
    ref = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=np.float64)
    variants = []
    for start in range(4):
        variants.append(np.vstack([ref[(i + start) % 4] for i in range(4)]))
        variants.append(np.vstack([ref[(start - i) % 4] for i in range(4)]))
    for var in variants:
        np.testing.assert_allclose(normalize_polygon(ref, var), ref, rtol=1e-5)


def test_standard_nms_empty():
    kept_polys, kept_scores = standard_nms(
        np.zeros((0, 4, 2)), np.zeros((0,)), 0.5
    )
    assert kept_polys.size == 0 and kept_scores.size == 0


def test_locality_aware_nms_empty():
    out = locality_aware_nms(np.zeros((0, 9), dtype=np.float32), 0.5)
    assert out.shape == (0, 9)
