"""A9/W7 closure: the dice + OHEM math of the reference's EASTLoss
(detectors/_east/loss.py:5-62) as evaluation operators, pinned by
hand-computed values and an end-to-end detector-vs-rasterized-GT check."""

from __future__ import annotations

import numpy as np
import pytest

from manuscript_ocr_spark.kernels.evalmetrics import (
    dice_loss,
    east_eval_loss,
    ohem_topk_mean,
    rasterize_gt_score,
)


def test_dice_hand_values():
    gt = np.array([[1.0, 1.0], [0.0, 0.0]])
    pred = np.array([[1.0, 0.0], [0.0, 0.0]])
    # 1 - 2*1 / (2 + 1 + 1e-5)
    assert dice_loss(gt, pred) == pytest.approx(1.0 - 2.0 / (3.0 + 1e-5))
    assert dice_loss(gt, gt) == pytest.approx(1e-5 / (4.0 + 1e-5), abs=1e-9)


def test_ohem_topk_mean_hand_values():
    flat = np.array([5.0, 1.0, 3.0, 2.0])
    # ratio 0.5 → k = max(int(2), 1) = 2 → mean(5, 3) = 4
    assert ohem_topk_mean(flat, 0.5) == 4.0
    # ratio 0.1 → k = max(int(0.4), 1) = 1 → 5 (the int() truncation quirk)
    assert ohem_topk_mean(flat, 0.1) == 5.0
    # ratio 1.0 → whole array
    assert ohem_topk_mean(flat, 1.0) == pytest.approx(2.75)


def test_east_eval_loss_reference_semantics():
    gt_s = np.zeros((4, 4))
    gt_s[0, 0] = 1.0
    gt_s[0, 1] = 1.0
    pred_s = gt_s.copy()
    gt_g = np.zeros((4, 4, 8))
    pred_g = np.zeros((4, 4, 8))
    pred_g[0, 0, :] = 0.25  # L1 per-pixel = 2.0 at the one differing pixel

    # no-positive early exit (loss.py:28-30)
    assert east_eval_loss(np.zeros((4, 4)), pred_s, gt_g, pred_g) == 0.0

    # masked-mean path: dice(gt,gt) + sum(masked L1)/(Σgt + 1e-5)
    want_dice = 1.0 - 2.0 * 2.0 / (4.0 + 1e-5)
    want_geo = 2.0 / (2.0 + 1e-5)
    got = east_eval_loss(gt_s, pred_s, gt_g, pred_g)
    assert got == pytest.approx(want_dice + want_geo)

    # OHEM path: per-image top-k mean over ALL map pixels (masked), k = 8
    got_ohem = east_eval_loss(gt_s, pred_s, gt_g, pred_g, use_ohem=True)
    k = max(int(0.5 * 16), 1)
    flat = np.sort((np.abs(gt_g - pred_g).sum(-1) * gt_s).ravel())[-k:]
    assert got_ohem == pytest.approx(want_dice + flat.mean())

    # focal weighting (loss.py:44-47): loss * (1 - exp(-loss))^gamma
    got_focal = east_eval_loss(gt_s, pred_s, gt_g, pred_g, use_focal_geo=True)
    l = 2.0 * (1.0 - np.exp(-2.0)) ** 2.0
    assert got_focal == pytest.approx(want_dice + l / (2.0 + 1e-5))

    # channel-first geo layout accepted
    got_cf = east_eval_loss(
        gt_s, pred_s, np.moveaxis(gt_g, -1, 0), np.moveaxis(pred_g, -1, 0)
    )
    assert got_cf == pytest.approx(got)

    # batch form: duplicated item → same per-item OHEM average, and the
    # dice term sums over the WHOLE batch (reference torch.sum semantics),
    # so only the 1e-5 epsilon contribution halves
    got_b = east_eval_loss(
        np.stack([gt_s, gt_s]), np.stack([pred_s, pred_s]),
        np.stack([gt_g, gt_g]), np.stack([pred_g, pred_g]), use_ohem=True,
    )
    want_b = (1.0 - 2.0 * 4.0 / (8.0 + 1e-5)) + flat.mean()
    assert got_b == pytest.approx(want_b)


def test_detector_maps_score_well_against_rasterized_gt():
    """End to end: the stand-in detector's raw score map vs the GT word
    rasterization on real fixture pages — dice loss near 0 for normal pages
    (the eval usage of the A9 math)."""
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.fixtures import PAGE_SIZE, ensure_tier
    from manuscript_ocr_spark.models.east_tiny import forward
    from manuscript_ocr_spark.oracle import decode_media

    d = ensure_tier("sf-small")
    media = {m["media_ref"]: m for m in pq.read_table(f"{d}/media.parquet").to_pylist()}
    gt = {g["media_ref"]: g["words"] for g in pq.read_table(f"{d}/gt_pages.parquet").to_pylist()}

    checked = 0
    for ref, words in gt.items():
        m = media[ref]
        if not words or m["width"] != PAGE_SIZE:
            continue  # empty or half-size scan pages
        img = decode_media(m["pixels"], m["height"], m["width"], m["channels"])
        score, _ = forward(img, 0.6)
        mask = rasterize_gt_score(words, score.shape[0], score.shape[1])
        if dice_loss(mask, (score > 0.6).astype(float)) < 0.15:
            checked += 1
        if checked >= 10:
            break
    assert checked >= 10
