"""Box post-processing + reading-order kernel tests.

Semantics pinned against the reference implementations
(/root/reference/src/manuscript/detectors/_east/utils.py:328-644,
infer.py:134-233, _pipeline.py:104-123).
"""

import numpy as np
import pytest

from manuscript_ocr_spark.kernels import (
    convert_to_axis_aligned,
    decode_quads_from_maps,
    expand_boxes,
    reading_order_indices,
    remove_area_anomalies,
    remove_fully_contained_boxes,
    resolve_intersections,
    scale_boxes_to_original,
    sort_boxes_reading_order,
    sort_boxes_reading_order_with_resolutions,
)


# --- decode_quads_from_maps (utils.py:328-381) ---

def test_decode_empty_below_threshold():
    score = np.zeros((8, 8), dtype=np.float32)
    geo = np.zeros((8, 8, 8), dtype=np.float32)
    out = decode_quads_from_maps(score, geo, score_thresh=0.6, scale=4.0)
    assert out.shape == (0, 9)
    assert out.dtype == np.float32


def test_decode_single_pixel_quad():
    score = np.zeros((8, 8), dtype=np.float32)
    score[2, 3] = 0.9
    geo = np.zeros((8, 8, 8), dtype=np.float32)
    # offsets (in map units) to 4 vertices of a quad around pixel (y=2,x=3)
    geo[2, 3] = [-1, -1, 1, -1, 1, 1, -1, 1]
    out = decode_quads_from_maps(score, geo, score_thresh=0.6, scale=4.0)
    assert out.shape == (1, 9)
    # vx = x*4 + dx*4, vy = y*4 + dy*4
    np.testing.assert_allclose(out[0, :8], [8, 4, 16, 4, 16, 12, 8, 12])
    assert out[0, 8] == pytest.approx(0.9, abs=1e-6)


def test_decode_leading_channel_squeeze():
    score = np.zeros((1, 8, 8), dtype=np.float32)
    score[0, 1, 1] = 0.8
    geo = np.zeros((8, 8, 8), dtype=np.float32)
    out = decode_quads_from_maps(score, geo, score_thresh=0.5, scale=4.0)
    assert out.shape == (1, 9)


def test_decode_quantization_dedup():
    # 4 adjacent pixels in one 2x2 cell collapse to the single cell center
    score = np.zeros((8, 8), dtype=np.float32)
    score[2:4, 2:4] = 0.9
    geo = np.zeros((8, 8, 8), dtype=np.float32)
    out_q1 = decode_quads_from_maps(score, geo, 0.6, 4.0, quantization=1)
    out_q2 = decode_quads_from_maps(score, geo, 0.6, 4.0, quantization=2)
    assert out_q1.shape[0] == 4
    assert out_q2.shape[0] == 1
    # cell center of (2..3, 2..3) with q=2 is (3, 3)
    np.testing.assert_allclose(out_q2[0, 0], 12.0)  # x=3 * scale 4


# --- expand_boxes (utils.py:384-422) ---

def test_expand_boxes_noop():
    quads = np.array([[0, 0, 4, 0, 4, 4, 0, 4, 0.9]], dtype=np.float32)
    out = expand_boxes(quads, 0.0, 0.0)
    np.testing.assert_array_equal(out, quads)


def test_expand_boxes_square_symmetric():
    quads = np.array([[10, 10, 20, 10, 20, 20, 10, 20, 0.9]], dtype=np.float32)
    out = expand_boxes(quads, 0.5, 0.5)
    coords = out[0, :8].reshape(4, 2)
    # square expands symmetrically outward: each vertex moves along the
    # diagonal by 0.5*min_edge/sqrt(2) per axis ≈ 3.5355
    d = 0.5 * 10 / np.sqrt(2)
    expected = np.array(
        [[10 - d, 10 - d], [20 + d, 10 - d], [20 + d, 20 + d], [10 - d, 20 + d]]
    )
    np.testing.assert_allclose(coords, expected, atol=1e-3)
    assert out[0, 8] == pytest.approx(0.9, abs=1e-6)


# --- scale / axis-align (infer.py:134-172) ---

def test_scale_boxes_to_original():
    quads = np.array([[0, 0, 640, 0, 640, 640, 0, 640, 0.5]], dtype=np.float32)
    out = scale_boxes_to_original(quads, (320, 1280), target_size=640)
    np.testing.assert_allclose(out[0, 0:8:2], [0, 1280, 1280, 0])
    np.testing.assert_allclose(out[0, 1:8:2], [0, 0, 320, 320])


def test_convert_to_axis_aligned():
    # rotated quad → bbox corners in TL,TR,BR,BL order
    quads = np.array([[2, 0, 4, 2, 2, 4, 0, 2, 0.5]], dtype=np.float32)
    out = convert_to_axis_aligned(quads)
    np.testing.assert_allclose(out[0, :8], [0, 0, 4, 0, 4, 4, 0, 4])


# --- containment / anomaly filters (infer.py:194-233) ---

def test_remove_fully_contained():
    quads = np.array(
        [
            [0, 0, 10, 0, 10, 10, 0, 10, 0.9],   # big
            [2, 2, 4, 2, 4, 4, 2, 4, 0.8],       # inside big → dropped
            [20, 20, 24, 20, 24, 24, 20, 24, 0.7],  # separate → kept
        ],
        dtype=np.float32,
    )
    out = remove_fully_contained_boxes(quads)
    assert out.shape[0] == 2
    assert out[0, 0] == 0 and out[1, 0] == 20


def test_remove_fully_contained_identical_boxes_drop_one():
    # verbatim reference behavior (infer.py:194-214): equal areas pass the
    # `areas[jdx] + 1e-6 < inner_area` guard, so of two IDENTICAL boxes the
    # first-scanned one is dropped and exactly one survives
    q = [0, 0, 4, 0, 4, 4, 0, 4, 0.5]
    quads = np.array([q, q], dtype=np.float32)
    assert remove_fully_contained_boxes(quads).shape[0] == 1


def _unit_quads(n, size=1.0):
    rows = []
    for i in range(n):
        x = i * 10.0
        rows.append([x, 0, x + size, 0, x + size, size, x, size, 0.9])
    return np.array(rows, dtype=np.float32)


def test_area_anomaly_filter():
    quads = _unit_quads(35)
    big = np.array([[0, 100, 50, 100, 50, 150, 0, 150, 0.9]], dtype=np.float32)
    all_quads = np.vstack([quads, big])
    out = remove_area_anomalies(all_quads, sigma_threshold=5.0, min_box_count=30)
    assert out.shape[0] == 35  # the 2500-area outlier is dropped


def test_area_anomaly_below_count_noop():
    quads = _unit_quads(10)
    out = remove_area_anomalies(quads, min_box_count=30)
    assert out.shape[0] == 10


def test_area_anomaly_zero_std_noop():
    quads = _unit_quads(40)
    out = remove_area_anomalies(quads, min_box_count=30)
    assert out.shape[0] == 40


# --- resolve_intersections / reading order (utils.py:500-644) ---

def test_resolve_intersections_disjoint_noop():
    boxes = [(0, 0, 10, 10), (20, 20, 30, 30)]
    assert resolve_intersections(boxes) == boxes


def test_resolve_intersections_shrinks_overlap():
    boxes = [(0, 0, 12, 10), (10, 0, 22, 10)]
    out = resolve_intersections(boxes)
    assert not (
        out[0][2] > out[1][0]
        and out[1][2] > out[0][0]
        and out[0][3] > out[1][1]
        and out[1][3] > out[0][1]
    )
    # left edges never move (only right/bottom shrink)
    assert out[0][0] == 0 and out[1][0] == 10


def test_sort_reading_order_docstring_example():
    boxes = [(10, 10, 50, 30), (60, 10, 100, 30), (10, 50, 50, 70)]
    out = sort_boxes_reading_order(boxes)
    assert out == [(10, 10, 50, 30), (60, 10, 100, 30), (10, 50, 50, 70)]


def test_sort_reading_order_two_lines_shuffled():
    l1a, l1b = (0, 0, 20, 10), (30, 1, 50, 11)
    l2a, l2b = (0, 30, 20, 40), (30, 31, 50, 41)
    out = sort_boxes_reading_order([l2b, l1b, l2a, l1a])
    assert out == [l1a, l1b, l2a, l2b]


def test_sort_reading_order_empty():
    assert sort_boxes_reading_order([]) == []


def test_sort_with_resolutions_overlapping():
    # overlapping boxes on one line still come out left-to-right as ORIGINALS
    a, b = (10, 10, 55, 30), (50, 10, 100, 30)
    out = sort_boxes_reading_order_with_resolutions([b, a])
    assert out == [a, b]


def test_reading_order_indices_first_match_duplicates():
    # duplicate bboxes shrink in lockstep through resolve_intersections and
    # the reference's first-match re-association (_pipeline.py:113-122) then
    # resolves BOTH occurrences to the first duplicate's index; the heavily
    # shrunk duplicates end up on the top line (cy→0) ahead of `a` (cy=5)
    a = (0, 0, 20, 10)
    dup1, dup2 = (40, 0, 60, 10), (40, 0, 60, 10)
    order = reading_order_indices([dup1, dup2, a])
    assert order == [0, 0, 2]


def test_zero_height_boxes_never_merge_and_emit_no_warning():
    from manuscript_ocr_spark.kernels.ordering import reading_order_line_groups
    # avg_h == 0 with the default x_gap_ratio=inf used to compute 0*inf=NaN
    # via a RuntimeWarning-emitting multiply; the NaN fall-through (each box
    # its own line) is the INTENDED behavior — pinned here, warning-free.
    import warnings

    flat = [(0, 5, 10, 5), (20, 5, 30, 5), (0, 5, 10, 5)]
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        groups = reading_order_line_groups(flat)
        out = sort_boxes_reading_order(flat)
    assert groups == [[b] for b in flat]  # no merging on zero-height pages
    assert out == flat

    # finite x_gap_ratio on a zero-height page: limit is exactly 0, so
    # same-y boxes DO merge when touching/overlapping
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        touching = reading_order_line_groups(
            [(0, 5, 10, 5), (10, 5, 20, 5)], x_gap_ratio=2.0
        )
    assert touching == [[(0, 5, 10, 5), (10, 5, 20, 5)]]
