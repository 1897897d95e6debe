"""Hypothesis property tests over the pure-numpy kernel library — invariants
that must hold for ANY input, complementing the reference-pinned example
tests (SURVEY.md §5). No Spark session needed: these run on raw kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from manuscript_ocr_spark.kernels.geometry import (
    polygon_area,
    polygon_iou,
    standard_nms,
)
from manuscript_ocr_spark.kernels.ordering import reading_order_indices
from manuscript_ocr_spark.kernels.textproc import (
    BOILERPLATE_TAGS,
    lang_id,
    strip_boilerplate,
    token_count,
)

coord = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32)


@st.composite
def quads(draw):
    # convex-ish CCW quad from a jittered rectangle (degenerate-safe)
    x0 = draw(st.floats(0, 500)); y0 = draw(st.floats(0, 500))
    w = draw(st.floats(1, 300)); h = draw(st.floats(1, 300))
    return np.array([[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]],
                    dtype=np.float64)


@given(quads(), st.integers(0, 3))
def test_area_invariant_under_vertex_rotation(q, k):
    assert abs(polygon_area(q) - polygon_area(np.roll(q, k, axis=0))) < 1e-6


@given(quads(), st.floats(0.1, 10))
def test_area_scales_quadratically(q, s):
    a = polygon_area(q)
    assert abs(polygon_area(q * s) - a * s * s) <= 1e-9 * max(1.0, a * s * s)


@given(quads())
def test_self_iou_is_one(q):
    assert abs(polygon_iou(q, q) - 1.0) < 1e-6


@given(quads(), quads())
def test_iou_symmetric_and_bounded(q1, q2):
    i12 = polygon_iou(q1, q2)
    i21 = polygon_iou(q2, q1)
    assert abs(i12 - i21) < 1e-6
    assert -1e-9 <= i12 <= 1.0 + 1e-9


@st.composite
def nms_inputs(draw):
    n = draw(st.integers(1, 12))
    polys = np.stack([draw(quads()) for _ in range(n)])
    scores = np.array(draw(st.lists(
        st.floats(0.01, 1.0, allow_nan=False), min_size=n, max_size=n)))
    return polys, scores


@settings(max_examples=40, deadline=None)
@given(nms_inputs(), st.floats(0.05, 0.95))
def test_nms_output_subset_and_no_overlaps(inp, thr):
    polys, scores = inp
    kept, kept_scores = standard_nms(polys, scores, thr)
    assert len(kept) == len(kept_scores) <= len(polys)
    # every kept poly is one of the inputs
    for k in kept:
        assert any(np.allclose(k, p) for p in polys)
    # greedy NMS guarantee: no two kept boxes overlap above the threshold
    for i in range(len(kept)):
        for j in range(i + 1, len(kept)):
            assert polygon_iou(kept[i], kept[j]) <= thr + 1e-9


@st.composite
def rect_boxes(draw):
    n = draw(st.integers(0, 15))
    out = []
    for _ in range(n):
        x0 = draw(st.integers(0, 800)); y0 = draw(st.integers(0, 800))
        out.append((x0, y0, x0 + draw(st.integers(1, 200)),
                    y0 + draw(st.integers(1, 200))))
    return out


@settings(max_examples=60, deadline=None)
@given(rect_boxes())
def test_reading_order_is_permutation(boxes):
    # the reference re-associates by FIRST matching box (the J1 duplicate
    # quirk, kept verbatim), so a true permutation is only guaranteed for
    # distinct boxes
    boxes = list(dict.fromkeys(boxes))
    idx = list(reading_order_indices(boxes))
    assert sorted(idx) == list(range(len(boxes)))


def test_reading_order_duplicate_boxes_first_match_quirk():
    """Duplicate boxes map to the FIRST index (reference J1 semantics)."""
    idx = list(reading_order_indices([(0, 0, 10, 10), (0, 0, 10, 10)]))
    assert idx == [0, 0]


texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=400
)


@given(texts)
def test_strip_boilerplate_idempotent_and_clean(t):
    once = strip_boilerplate(t)
    assert strip_boilerplate(once) == once
    for tag in BOILERPLATE_TAGS:
        assert ("{{%s}}" % tag not in once) or ("{{/%s}}" % tag not in t.replace(once, ""))
    # never introduces characters, never leaves leading/trailing space
    assert once == once.strip()


@given(texts)
def test_token_count_matches_split(t):
    assert token_count(t) == len(t.split())


@given(texts)
def test_lang_id_total_and_stable(t):
    lid = lang_id(t)
    assert lid in ("en", "de", "fr", "es", "und")
    assert lang_id(t) == lid
