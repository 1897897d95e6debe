"""Evaluation kernels: CER / WER / accuracy and detection F1@IoU matching.

Ports of the reference's offline eval ops (SURVEY.md §2 A7 / J2):
- character_error_rate / word_error_rate / compute_accuracy —
  reference: src/manuscript/recognizers/_trba/training/metrics.py:6-33
  (Levenshtein / jiwer are unavailable offline; `levenshtein` below is the
  classic DP edit distance, identical to Levenshtein.distance, and WER is
  edit distance over whitespace tokens — jiwer's default behavior).
- compute_f1 — greedy one-to-one pred↔GT polygon matching at IoU ≥ τ,
  reference: src/manuscript/detectors/_east/utils.py:435-474 (shapely IoU
  replaced by the clip-based kernels.geometry.polygon_iou; equal values for
  valid simple polygons).

At the Spark level CER maps to F.levenshtein + ratio expressions (see the
eval_edit_distance query); F1 matching is a per-image greedy loop, run
per-page inside a UDF or driver-side for test harnesses.
"""

from __future__ import annotations

import numpy as np

from .geometry import polygon_iou


def levenshtein(a, b) -> int:
    """Classic DP edit distance over sequence elements (chars or tokens)."""
    if a == b:
        return 0
    if len(a) == 0:
        return len(b)
    if len(b) == 0:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            curr[j] = min(
                prev[j] + 1,          # deletion
                curr[j - 1] + 1,      # insertion
                prev[j - 1] + (ca != cb),  # substitution
            )
        prev = curr
    return prev[-1]


def character_error_rate(reference: str, hypothesis: str) -> float:
    """CER = char edit distance / len(reference); empty reference → 0.0 if
    hypothesis empty else inf. Reference: metrics.py:6-14."""
    if len(reference) == 0:
        return float("inf") if len(hypothesis) > 0 else 0.0
    return levenshtein(reference, hypothesis) / len(reference)


def word_error_rate(reference: str, hypothesis: str) -> float:
    """WER = word-level edit distance / len(reference words).
    Reference: metrics.py:17-22 (jiwer default: whitespace tokens)."""
    ref = reference.split()
    hyp = hypothesis.split()
    if len(ref) == 0:
        return float("inf") if len(hyp) > 0 else 0.0
    return levenshtein(ref, hyp) / len(ref)


def compute_accuracy(references, hypotheses) -> float:
    """Exact-match fraction. Reference: metrics.py:25-33."""
    total = len(references)
    if total == 0:
        return 0.0
    hits = sum(1 for r, h in zip(references, hypotheses) if r == h)
    return hits / total


def compute_f1(preds, thresh, gt_segs, processed_ids) -> float:
    """Detection F1 at IoU ≥ thresh with greedy one-to-one matching.

    preds: [{"image_id", "segmentation": flat [x0,y0,...] list}], scanned in
    order; each pred matches the highest-IoU unused GT of its image; a match
    below thresh (or no GT left) counts as FP; unmatched GT are FN.
    Reference: utils.py:435-474 (verbatim control flow; clip-based IoU).
    """
    gt_polys = {
        iid: [np.asarray(seg, dtype=np.float64).reshape(-1, 2) for seg in gt_segs.get(iid, [])]
        for iid in processed_ids
    }
    used = {iid: [False] * len(gt_polys.get(iid, [])) for iid in processed_ids}
    tp = fp = 0
    for p in preds:
        image_id = p["image_id"]
        pred_poly = np.asarray(p["segmentation"], dtype=np.float64).reshape(-1, 2)
        if pred_poly.shape[0] < 3:
            fp += 1
            continue
        best_iou, bj = 0, -1
        for j, gt_polygon in enumerate(gt_polys.get(image_id, [])):
            if used[image_id][j] or gt_polygon.shape[0] < 3:
                continue
            iou = polygon_iou(pred_poly, gt_polygon)
            if iou > best_iou:
                best_iou, bj = iou, j
        if best_iou >= thresh:
            tp += 1
            used[image_id][bj] = True
        else:
            fp += 1
    total_gt = sum(len(v) for v in gt_polys.values())
    fn = total_gt - tp
    prec = tp / (tp + fp) if tp + fp > 0 else 0
    rec = tp / (tp + fn) if tp + fn > 0 else 0
    return 2 * prec * rec / (prec + rec) if (prec + rec) > 0 else 0


# ---------------------------------------------------------------------------
# Detector map-level metrics (SURVEY.md §2 A9 / W7 — the dice and OHEM math
# of the reference's EASTLoss, re-expressed as EVALUATION operators: at
# inference time they score a detector's raw maps against rasterized GT,
# closing the last two §2 components without shipping a training loop)
# ---------------------------------------------------------------------------

def dice_loss(gt_score: np.ndarray, pred_score: np.ndarray) -> float:
    """1 − 2·Σ(gt·pred) / (Σgt + Σpred + 1e-5) — verbatim semantics of
    compute_dice_loss (reference: detectors/_east/loss.py:5-8); float64."""
    gt = np.asarray(gt_score, dtype=np.float64)
    pred = np.asarray(pred_score, dtype=np.float64)
    inter = float((gt * pred).sum())
    union = float(gt.sum()) + float(pred.sum()) + 1e-5
    return 1.0 - (2.0 * inter / union)


def ohem_topk_mean(flat: np.ndarray, ratio: float) -> float:
    """Mean of the k = max(int(ratio·N), 1) LARGEST losses — the OHEM
    selection of EASTLoss (loss.py:51-57, torch.topk largest=True). Order
    inside the top-k is irrelevant for the mean, so np.partition suffices."""
    flat = np.asarray(flat, dtype=np.float64).ravel()
    k = max(int(ratio * flat.size), 1)
    if k >= flat.size:
        return float(flat.mean())
    top = np.partition(flat, flat.size - k)[flat.size - k:]
    return float(top.mean())


def east_eval_loss(
    gt_score: np.ndarray,
    pred_score: np.ndarray,
    gt_geo: np.ndarray,
    pred_geo: np.ndarray,
    use_ohem: bool = False,
    ohem_ratio: float = 0.5,
    use_focal_geo: bool = False,
    focal_gamma: float = 2.0,
    geo_channels: str = "auto",
) -> float:
    """EASTLoss.forward as a numpy eval metric — verbatim reference
    semantics (loss.py:25-62):
    - no positive GT pixels → 0.0 (loss.py:28-30);
    - dice term over the score maps;
    - geometry term: per-pixel L1 summed over the 8 geo channels, optional
      focal weighting exp-based (loss.py:44-47), masked by gt_score;
    - OHEM: per-batch-item mean of the top-(ratio·N) masked losses averaged
      over the batch (loss.py:51-58); else masked sum / (Σgt + 1e-5).

    Shapes: scores (H, W) or (B, H, W); geo (H, W, 8)/(8, H, W) or the
    batch forms. geo_channels picks the channel axis: "last" (the engine's
    (H, W, 8) layout), "first" ((8, H, W)), or "auto", which resolves by the
    unique size-8 axis and RAISES when both candidate axes are 8 (e.g. a
    channels-first map whose W == 8) instead of silently guessing — the
    round-3 heuristic could pick the wrong axis for 8-pixel-wide maps."""
    gt_s = np.asarray(gt_score, dtype=np.float64)
    pr_s = np.asarray(pred_score, dtype=np.float64)
    if gt_s.ndim == 2:
        gt_s = gt_s[None]
        pr_s = pr_s[None]
    gt_g = np.asarray(gt_geo, dtype=np.float64)
    pr_g = np.asarray(pred_geo, dtype=np.float64)
    if gt_g.ndim == 3:
        gt_g = gt_g[None]
        pr_g = pr_g[None]
    # normalize geo to (B, H, W, 8)
    if geo_channels == "auto":
        first8, last8 = gt_g.shape[1] == 8, gt_g.shape[-1] == 8
        if first8 and last8:
            raise ValueError(
                "geo map axis ambiguous: both axis 1 and the last axis have "
                f"size 8 (shape {gt_g.shape}); pass geo_channels='first' or "
                "'last' explicitly"
            )
        if not first8 and not last8:
            raise ValueError(
                f"geo map has no size-8 channel axis (shape {gt_g.shape})"
            )
        geo_channels = "first" if first8 else "last"
    if geo_channels == "first":
        gt_g = np.moveaxis(gt_g, 1, -1)
        pr_g = np.moveaxis(pr_g, 1, -1)
    elif geo_channels != "last":
        raise ValueError(f"geo_channels must be auto|first|last, got {geo_channels!r}")

    if gt_s.sum() < 1:
        return 0.0

    dice = dice_loss(gt_s, pr_s)

    geo_loss_map = np.abs(gt_g - pr_g).sum(axis=-1)  # (B, H, W)
    if use_focal_geo:
        p_t = np.exp(-geo_loss_map)
        geo_loss_map = geo_loss_map * (1.0 - p_t) ** focal_gamma
    geo_loss_map = geo_loss_map * gt_s

    if use_ohem:
        geo = 0.0
        for b in range(geo_loss_map.shape[0]):
            geo += ohem_topk_mean(geo_loss_map[b], ohem_ratio)
        geo /= geo_loss_map.shape[0]
    else:
        geo = float(geo_loss_map.sum()) / (float(gt_s.sum()) + 1e-5)
    return dice + geo


def rasterize_gt_score(gt_words, map_h: int, map_w: int, stride: int = 4) -> np.ndarray:
    """GT word polygons → the stride-4 binary score map the detector is
    judged against (axis-aligned fill of each polygon's bbox at map
    resolution — the fixture words ARE grid-aligned rectangles)."""
    m = np.zeros((map_h, map_w), dtype=np.float64)
    for wd in gt_words:
        poly = np.asarray(wd["polygon"], dtype=np.float64)
        x0 = int(np.floor(poly[:, 0].min() / stride))
        y0 = int(np.floor(poly[:, 1].min() / stride))
        x1 = int(np.ceil(poly[:, 0].max() / stride))
        y1 = int(np.ceil(poly[:, 1].max() / stride))
        m[max(0, y0):min(map_h, y1), max(0, x0):min(map_w, x1)] = 1.0
    return m
