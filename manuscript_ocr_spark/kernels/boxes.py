"""Quad decode / expand / filter kernels (pure numpy).

Re-expressions of the reference detector's post-processing stack
(reference: src/manuscript/detectors/_east/utils.py:328-422 and
infer.py:134-233). These run inside the detect pandas UDF: the score/geo maps
never become Spark columns — only the final (N, 9) quad arrays leave the UDF
as exploded box rows.
"""

from __future__ import annotations

import numpy as np

from .geometry import is_quad_inside, polygon_area_batch


def decode_quads_from_maps(
    score_map: np.ndarray,
    geo_map: np.ndarray,
    score_thresh: float,
    scale: float,
    quantization: int = 1,
) -> np.ndarray:
    """Thresholded score pixels → quantization dedup → per-pixel quad decode.

    Returns float32 (N, 9) rows [x0,y0,...,x3,y3,score]. The quantization
    step snaps candidates to a q-grid (cell center) and keeps unique cells —
    the reference's pre-aggregation that shrinks NMS input ~q² times
    (reference: utils.py:328-381; semantics, not just an optimization).

    Vectorized over all candidate pixels (the reference loops per pixel;
    the arithmetic `v = p * scale + off * scale` is identical in float32).
    """
    score_map = np.asarray(score_map)
    if score_map.ndim == 3 and score_map.shape[0] == 1:
        score_map = score_map.squeeze(0)

    ys, xs = np.where(score_map > score_thresh)
    if len(ys) == 0:
        return np.zeros((0, 9), dtype=np.float32)

    if quantization > 1:
        ys_quant = (ys // quantization) * quantization + quantization // 2
        xs_quant = (xs // quantization) * quantization + quantization // 2
        # scalar-key unique (round-8): np.unique(..., axis=0) sorts rows
        # through a structured-dtype view — several times slower than the
        # 1-D path. With K > max(xs_quant), y*K + x preserves (y, x) lex
        # order exactly, so the decoded cell set AND its order match the
        # 2-D unique bit-for-bit (pure integer arithmetic).
        K = np.int64(score_map.shape[1] + quantization)
        keys = np.unique(ys_quant.astype(np.int64) * K + xs_quant)
        ys = keys // K
        xs = keys % K

    # Quantized coordinates may exceed map bounds at the edge cells; the
    # reference indexes geo_map[y, x] directly, so clamp identically never
    # happens — quantized centers are guaranteed in-bounds for even map dims.
    offs = geo_map[ys, xs]  # (N, 8): [dx0, dy0, dx1, dy1, dx2, dy2, dx3, dy3]
    xs_f = xs.astype(np.float64) * scale
    ys_f = ys.astype(np.float64) * scale
    quads = np.empty((len(ys), 9), dtype=np.float64)
    for i in range(4):
        quads[:, 2 * i] = xs_f + offs[:, 2 * i] * scale
        quads[:, 2 * i + 1] = ys_f + offs[:, 2 * i + 1] * scale
    quads[:, 8] = score_map[ys, xs]
    return quads.astype(np.float32)


def expand_boxes(
    quads: np.ndarray, expand_w: float = 0.0, expand_h: float = 0.0
) -> np.ndarray:
    """Inverse of the training-time shrink: move each vertex outward along the
    averaged adjacent-edge normals by `expand * min(edge_len)` per axis.
    Reference: utils.py:384-422 (vectorized there too; ported verbatim).
    """
    if len(quads) == 0 or (expand_w == 0 and expand_h == 0):
        return quads

    coords = quads[:, :8].reshape(-1, 4, 2)
    scores = quads[:, 8:9]

    x, y = coords[:, :, 0], coords[:, :, 1]
    area = np.sum(x * np.roll(y, -1, axis=1) - np.roll(x, -1, axis=1) * y, axis=1)
    sign = np.sign(area).reshape(-1, 1, 1)
    sign[sign == 0] = 1

    p_prev = np.roll(coords, 1, axis=1)
    p_curr = coords
    p_next = np.roll(coords, -1, axis=1)

    edge1 = p_curr - p_prev
    edge2 = p_next - p_curr
    len1 = np.linalg.norm(edge1, axis=2, keepdims=True)
    len2 = np.linalg.norm(edge2, axis=2, keepdims=True)

    n1 = sign * np.stack([edge1[..., 1], -edge1[..., 0]], axis=2) / (len1 + 1e-6)
    n2 = sign * np.stack([edge2[..., 1], -edge2[..., 0]], axis=2) / (len2 + 1e-6)
    n_avg = n1 + n2
    norm = np.linalg.norm(n_avg, axis=2, keepdims=True)
    n_avg = np.divide(n_avg, norm, out=np.zeros_like(n_avg), where=norm > 0)

    offset = np.minimum(len1, len2)

    scale_xy = np.array([1 + expand_w, 1 + expand_h], dtype=np.float32).reshape(1, 1, 2)
    delta = (scale_xy - 1.0) * offset

    new_coords = p_curr + delta * n_avg

    expanded = np.hstack([new_coords.reshape(-1, 8), scores])
    return expanded.astype(np.float32)


def scale_boxes_to_original(
    boxes: np.ndarray, orig_size: tuple, target_size: int
) -> np.ndarray:
    """Scale x coords by orig_w/target, y by orig_h/target.
    Reference: infer.py:134-147."""
    if len(boxes) == 0:
        return boxes
    orig_h, orig_w = orig_size
    scale_x = orig_w / target_size
    scale_y = orig_h / target_size
    scaled = boxes.copy()
    scaled[:, 0:8:2] *= scale_x
    scaled[:, 1:8:2] *= scale_y
    return scaled


def convert_to_axis_aligned(quads: np.ndarray) -> np.ndarray:
    """Quad → axis-aligned min/max rectangle (vertex order TL,TR,BR,BL).
    Reference: infer.py:149-172."""
    if len(quads) == 0:
        return quads
    aligned = quads.copy()
    coords = aligned[:, :8].reshape(-1, 4, 2)
    x_min = coords[:, :, 0].min(axis=1)
    x_max = coords[:, :, 0].max(axis=1)
    y_min = coords[:, :, 1].min(axis=1)
    y_max = coords[:, :, 1].max(axis=1)
    rects = np.stack(
        [x_min, y_min, x_max, y_min, x_max, y_max, x_min, y_max], axis=1
    )
    aligned[:, :8] = rects.reshape(-1, 8)
    return aligned


def remove_fully_contained_boxes(quads: np.ndarray) -> np.ndarray:
    """Drop any quad fully inside a strictly larger surviving quad.

    Smallest-area-first scan; equality tolerance 1e-6 on areas; a dropped box
    can no longer contain others. Per-page N is small, so the O(N²) scan runs
    in-UDF (the Spark-level analog — self-join on page + containment predicate
    + left_anti — would shuffle for nothing). Reference: infer.py:194-214.
    """
    if len(quads) <= 1:
        return quads
    coords = quads[:, :8].reshape(-1, 4, 2)
    areas = polygon_area_batch(coords)
    keep = np.ones(len(quads), dtype=bool)
    order = np.argsort(areas)

    # fast path: every quad axis-aligned (the default axis_aligned pipeline) →
    # containment is bbox interval containment; same scan order and tie rules,
    # inner jdx-loop replaced by a vectorized any()
    x = coords[:, :, 0]
    y = coords[:, :, 1]
    xmn, xmx = x.min(axis=1), x.max(axis=1)
    ymn, ymx = y.min(axis=1), y.max(axis=1)
    all_rects = bool(
        np.all(x[:, 0] == x[:, 3])
        and np.all(x[:, 1] == x[:, 2])
        and np.all(y[:, 0] == y[:, 1])
        and np.all(y[:, 2] == y[:, 3])
    )
    if all_rects:
        n = len(quads)
        if n <= 1024:  # bounds the n² predicate intermediates per UDF worker
            # precompute the containment predicate matrix in one broadcast
            # (round-8; same trick as standard_nms): M[j, i] == True iff j
            # could contain i under the EXACT same comparisons the rowwise
            # scan ran — pure predicates, no rounding, so keep decisions
            # are identical. The greedy smallest-first scan then only
            # masks rows of M with the live keep vector.
            M = (
                ((areas + 1e-6)[:, None] >= areas[None, :])
                & (xmn[:, None] <= xmn[None, :])
                & (xmx[:, None] >= xmx[None, :])
                & (ymn[:, None] <= ymn[None, :])
                & (ymx[:, None] >= ymx[None, :])
            )
            np.fill_diagonal(M, False)
            for idx in order:
                if not keep[idx]:
                    continue
                if (M[:, idx] & keep).any():
                    keep[idx] = False
            return quads[keep]
        for idx in order:
            if not keep[idx]:
                continue
            cand = (
                keep
                & (areas + 1e-6 >= areas[idx])
                & (xmn <= xmn[idx])
                & (xmx >= xmx[idx])
                & (ymn <= ymn[idx])
                & (ymx >= ymx[idx])
            )
            cand[idx] = False
            if cand.any():
                keep[idx] = False
        return quads[keep]

    for idx in order:
        if not keep[idx]:
            continue
        inner = coords[idx]
        inner_area = areas[idx]
        for jdx in range(len(quads)):
            if idx == jdx or not keep[jdx]:
                continue
            if areas[jdx] + 1e-6 < inner_area:
                continue
            if is_quad_inside(inner, coords[jdx]):
                keep[idx] = False
                break
    return quads[keep]


def remove_area_anomalies(
    quads: np.ndarray,
    sigma_threshold: float = 5.0,
    min_box_count: int = 30,
    enabled: bool = True,
) -> np.ndarray:
    """If more than `min_box_count` boxes: drop area > mean + sigma·std.

    No-op when std == 0 or when the filter would drop everything.
    Reference: infer.py:216-233. (Per-page agg — the Spark-level analog is
    groupBy(page).agg(mean, stddev_pop) + rejoin; kept in-UDF to preserve
    float32 tie behavior and avoid a shuffle.)
    """
    if not enabled or len(quads) == 0 or len(quads) <= min_box_count:
        return quads
    coords = quads[:, :8].reshape(-1, 4, 2)
    areas = polygon_area_batch(coords).astype(np.float32)
    mean = float(np.mean(areas))
    std = float(np.std(areas))
    if std == 0.0:
        return quads
    threshold = mean + sigma_threshold * std
    keep = areas <= threshold
    if not np.any(keep):
        return quads
    return quads[keep]
