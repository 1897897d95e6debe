"""§2.7 closure (round-4 verdict item #7): the three training-only kernels
— shrink_poly / order_vertices_clockwise (ref dataset.py:16-56),
quad_to_rbox (ref utils.py:28-32), pack_attention_targets (ref
transforms.py:123-157) — as eval/data-prep kernels with hand-computed spec
values, mirroring how A9/W7 were closed in round 3."""

from __future__ import annotations

import numpy as np

from manuscript_ocr_spark.kernels.geometry import (
    min_area_rect,
    order_vertices_clockwise,
    quad_to_rbox,
    shrink_poly,
)
from manuscript_ocr_spark.kernels.textproc import pack_attention_targets


class TestOrderVerticesClockwise:
    def test_scrambled_rect(self):
        got = order_vertices_clockwise([[10, 0], [0, 0], [0, 5], [10, 5]])
        np.testing.assert_array_equal(
            got, [[0, 0], [10, 0], [10, 5], [0, 5]])

    def test_diamond_collapse_quirk(self):
        """The reference's sum/diff rule DEGENERATES on a diamond (vertices
        on the axes): the left vertex wins BOTH min-sum (tl) and max-diff
        (bl), and the right vertex wins both max-sum (br) and min-diff
        (tr). Pinned as a quirk — parity with dataset.py:16-24 means
        reproducing it, not fixing it."""
        quad = [[5, 0], [9, 3], [5, 6], [1, 3]]
        got = order_vertices_clockwise(quad)
        # sums: 5, 12, 11, 4 → tl = (1,3), br = (9,3)
        # diffs (y−x): −5, −6, 1, 2 → tr = (9,3), bl = (1,3)
        np.testing.assert_array_equal(got[0], [1, 3])   # tl: min sum
        np.testing.assert_array_equal(got[2], [9, 3])   # br: max sum
        np.testing.assert_array_equal(got[1], [9, 3])   # tr: min (y−x)
        np.testing.assert_array_equal(got[3], [1, 3])   # bl: max (y−x)

    def test_mildly_rotated_quad(self):
        """A non-degenerate rotated rect orders correctly."""
        quad = [[9, 1], [11, 6], [2, 4], [4, 9]]  # scrambled
        got = order_vertices_clockwise(quad)
        np.testing.assert_array_equal(got[0], [2, 4])
        np.testing.assert_array_equal(got[1], [9, 1])
        np.testing.assert_array_equal(got[2], [11, 6])
        np.testing.assert_array_equal(got[3], [4, 9])

    def test_flat_input_accepted(self):
        got = order_vertices_clockwise([0, 0, 4, 0, 4, 2, 0, 2])
        assert got.shape == (4, 2) and got.dtype == np.float32


class TestShrinkPoly:
    def test_axis_aligned_rect_hand_computed(self):
        """10×4 clockwise rect, ratio 0.3: every corner's two edges are 10
        and 4, offset = 0.3·4 = 1.2 along the averaged inward normal
        (±1/√2, ±1/√2) — each corner moves 1.2/√2 ≈ 0.8485 inward in x AND
        y (up to the reference's 1e-6 edge-length epsilon)."""
        rect = [[0, 0], [10, 0], [10, 4], [0, 4]]  # clockwise in image coords
        got = shrink_poly(rect, 0.3)
        d = 1.2 / np.sqrt(2.0)
        want = np.array([
            [0 + d, 0 + d], [10 - d, 0 + d], [10 - d, 4 - d], [0 + d, 4 - d]
        ])
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_orientation_invariant_inward(self):
        """Counter-clockwise input shrinks INWARD too (the area-sign rule)."""
        ccw = [[0, 0], [0, 4], [10, 4], [10, 0]]
        got = shrink_poly(ccw, 0.3)
        assert got[:, 0].min() > 0 and got[:, 0].max() < 10
        assert got[:, 1].min() > 0 and got[:, 1].max() < 4

    def test_ratio_zero_is_identity(self):
        rect = np.array([[0, 0], [8, 0], [8, 8], [0, 8]], dtype=np.float32)
        np.testing.assert_allclose(shrink_poly(rect, 0.0), rect, atol=1e-5)

    def test_non_quad_rejected(self):
        import pytest

        with pytest.raises(ValueError, match="4 vertices"):
            shrink_poly([[0, 0], [1, 0], [1, 1]])


class TestQuadToRbox:
    def test_axis_aligned(self):
        r = quad_to_rbox([0, 0, 10, 0, 10, 4, 0, 4])
        assert r.shape == (5,) and r.dtype == np.float32
        np.testing.assert_allclose(r[:2], [5.0, 2.0], atol=1e-5)
        assert sorted([round(float(r[2]), 4), round(float(r[3]), 4)]) == [4.0, 10.0]
        # pinned convention: angle in [0, 90)
        assert 0.0 <= float(r[4]) < 90.0

    def test_rotated_45_square(self):
        # diamond with vertices on axes: min rect is the 45°-rotated square
        r = quad_to_rbox([2, 0, 4, 2, 2, 4, 0, 2])
        np.testing.assert_allclose(r[:2], [2.0, 2.0], atol=1e-6)
        s = 2.0 * np.sqrt(2.0)
        np.testing.assert_allclose(sorted([r[2], r[3]]), [s, s], atol=1e-5)
        np.testing.assert_allclose(r[4], 45.0, atol=1e-5)

    def test_score_tail_ignored(self):
        a = quad_to_rbox([0, 0, 6, 0, 6, 2, 0, 2])
        b = quad_to_rbox([0, 0, 6, 0, 6, 2, 0, 2, 0.9])
        np.testing.assert_array_equal(a, b)

    def test_min_area_beats_aabb(self):
        """A thin 45° strip: the rotated min rect is far smaller than the
        axis-aligned bbox — proves the calipers actually rotate."""
        quad = [0, 0, 10, 10, 9, 11, -1, 1]
        (cx, cy), (w, h), ang = min_area_rect(np.array(quad).reshape(4, 2))
        area = w * h
        aabb_area = 11.0 * 11.0
        np.testing.assert_allclose(area, np.sqrt(200) * np.sqrt(2), rtol=1e-6)
        assert area < aabb_area / 5
        np.testing.assert_allclose(ang, 45.0, atol=1e-6)

    def test_rect_point_set_roundtrip(self):
        """The returned (c, wh, angle) describes a rectangle whose corner
        set covers the input rect's corners (boxPoints-analog check)."""
        quad = np.array([[1, 1], [7, 3], [6, 6], [0, 4]], dtype=np.float64)
        (cx, cy), (w, h), ang = min_area_rect(quad)
        t = np.radians(ang)
        u = np.array([np.cos(t), np.sin(t)])
        v = np.array([-np.sin(t), np.cos(t)])
        c = np.array([cx, cy])
        corners = [c + du * u * w / 2 + dv * v * h / 2
                   for du in (-1, 1) for dv in (-1, 1)]
        # every input point inside the rect (within epsilon)
        for p in quad:
            rel = p - c
            assert abs(rel @ u) <= w / 2 + 1e-6
            assert abs(rel @ v) <= h / 2 + 1e-6
        # at least one input vertex ON the rect boundary (tight fit)
        on_edge = sum(
            min(abs(abs((p - c) @ u) - w / 2), abs(abs((p - c) @ v) - h / 2)) < 1e-6
            for p in quad
        )
        assert on_edge >= 2
        assert len(corners) == 4


class TestPackAttentionTargets:
    STOI = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "<BLANK>": 3,
            "a": 4, "b": 5, "c": 6}

    def test_hand_computed(self):
        text_in, target_y, lengths = pack_attention_targets(
            ["ab", "c"], self.STOI, max_len=4)
        np.testing.assert_array_equal(
            text_in, [[1, 4, 5, 0, 0], [1, 6, 0, 0, 0]])
        np.testing.assert_array_equal(
            target_y, [[4, 5, 2, 0, 0], [6, 2, 0, 0, 0]])
        np.testing.assert_array_equal(lengths, [3, 2])

    def test_unknown_chars_skipped_and_truncation(self):
        text_in, target_y, lengths = pack_attention_targets(
            ["aXbcab"], self.STOI, max_len=3)
        # X skipped → "abcab" truncated to 3: a b c
        np.testing.assert_array_equal(text_in, [[1, 4, 5, 6]])
        np.testing.assert_array_equal(target_y, [[4, 5, 6, 2]])
        np.testing.assert_array_equal(lengths, [4])

    def test_blank_dropped_and_empty_label(self):
        stoi = dict(self.STOI)
        text_in, target_y, lengths = pack_attention_targets(
            ["", "a"], stoi, max_len=2, drop_blank=True)
        np.testing.assert_array_equal(target_y[0], [2, 0, 0])  # EOS at 0
        np.testing.assert_array_equal(lengths, [1, 2])

    def test_blank_kept_when_not_dropping(self):
        # a char mapping TO the blank id is kept with drop_blank=False
        stoi = {"<PAD>": 0, "<SOS>": 1, "<EOS>": 2, "<BLANK>": 3, "_": 3, "a": 4}
        ti_drop, _, _ = pack_attention_targets(["_a"], stoi, 3, drop_blank=True)
        ti_keep, _, _ = pack_attention_targets(["_a"], stoi, 3, drop_blank=False)
        np.testing.assert_array_equal(ti_drop, [[1, 4, 0, 0]])
        np.testing.assert_array_equal(ti_keep, [[1, 3, 4, 0]])
