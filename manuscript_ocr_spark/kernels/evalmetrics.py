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
