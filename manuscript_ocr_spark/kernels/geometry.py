"""Polygon geometry kernels (pure numpy).

Faithful re-expressions of the reference's numba-JIT geometry kernels
(reference: src/manuscript/detectors/_east/lanms.py:7-207). numba is not
available in this environment, so the kernels are pure numpy; semantics —
including tie behavior, float64 math, and the order-dependent merge scans —
match the reference exactly. These run *inside* Arrow-vectorized pandas UDFs
at the Spark level; per-page candidate counts are small (≤ a few thousand),
so O(N²) scans are bounded per task.
"""

from __future__ import annotations

import numpy as np


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace absolute area. Reference: lanms.py:7-14."""
    poly = np.asarray(poly, dtype=np.float64)
    n = poly.shape[0]
    if n == 0:
        return 0.0
    x = poly[:, 0]
    y = poly[:, 1]
    area = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return float(np.abs(area) / 2.0)


def compute_intersection(p1, p2, A, B) -> np.ndarray:
    """Line-line intersection of segment (p1,p2) with clip edge (A,B).

    Parallel lines (denom == 0) return p1. Reference: lanms.py:17-29.
    """
    p1 = np.asarray(p1, dtype=np.float64)
    p2 = np.asarray(p2, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    BAx = p2[0] - p1[0]
    BAy = p2[1] - p1[1]
    DCx = B[0] - A[0]
    DCy = B[1] - A[1]
    denom = BAx * DCy - BAy * DCx
    CAx = A[0] - p1[0]
    CAy = A[1] - p1[1]
    if denom == 0:
        return p1
    t = (CAx * DCy - CAy * DCx) / denom
    return np.array([p1[0] + t * BAx, p1[1] + t * BAy], dtype=np.float64)


def clip_polygon(subject: np.ndarray, A, B):
    """Sutherland-Hodgman clip of `subject` against half-plane left of A→B.

    Returns (clipped (k,2) float64, k). Inside test uses >= 0 cross product,
    exactly as the reference. Reference: lanms.py:32-57.
    """
    subject = np.asarray(subject, dtype=np.float64)
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    out = []
    n = subject.shape[0]
    ex = B[0] - A[0]
    ey = B[1] - A[1]
    for i in range(n):
        curr = subject[i]
        prev = subject[(i - 1) % n]
        curr_inside = ex * (curr[1] - A[1]) - ey * (curr[0] - A[0]) >= 0
        prev_inside = ex * (prev[1] - A[1]) - ey * (prev[0] - A[0]) >= 0
        if curr_inside:
            if not prev_inside:
                out.append(compute_intersection(prev, curr, A, B))
            out.append(curr)
        elif prev_inside:
            out.append(compute_intersection(prev, curr, A, B))
    if not out:
        return np.empty((0, 2), dtype=np.float64), 0
    arr = np.stack(out).astype(np.float64)
    return arr, arr.shape[0]


def polygon_intersection(poly1: np.ndarray, poly2: np.ndarray) -> np.ndarray:
    """Clip poly1 successively by every edge of poly2. Reference: lanms.py:60-77."""
    poly1 = np.asarray(poly1, dtype=np.float64)
    poly2 = np.asarray(poly2, dtype=np.float64)
    current = poly1.copy()
    m = poly2.shape[0]
    for i in range(m):
        A = poly2[i]
        B = poly2[(i + 1) % m]
        current, count = clip_polygon(current, A, B)
        if count == 0:
            break
    return current


def _as_rect(poly: np.ndarray):
    """If the quad is an axis-aligned rectangle in TL,TR,BR,BL vertex order,
    return (x0, y0, x1, y1); else None. Candidate quads and their NMS merges
    are axis-aligned rects for grid-rendered pages, so this fast path covers
    almost every IoU evaluation without changing semantics (rect∩rect via
    interval math equals the Sutherland-Hodgman clip result)."""
    # one C-level tolist() then pure-Python float compares: numpy scalar
    # indexing/comparison per element is ~10x slower on this hot path
    p = poly.ravel().tolist()
    return _rect_of_flat(p)


def _rect_of_flat(p: list):
    """_as_rect over an already-flat 8-float list (the LANMS loop's form)."""
    if (
        p[0] == p[6]
        and p[2] == p[4]
        and p[1] == p[3]
        and p[5] == p[7]
        and p[2] >= p[0]
        and p[5] >= p[1]
    ):
        return p[0], p[1], p[2], p[5]
    return None


def polygon_iou(poly1: np.ndarray, poly2: np.ndarray) -> float:
    """Clip-based IoU; intersection counted only when >2 vertices survive.

    Reference: lanms.py:80-91. Axis-aligned rect pairs take an equivalent
    interval-math fast path (see _as_rect).
    """
    poly1 = np.asarray(poly1, dtype=np.float64)
    poly2 = np.asarray(poly2, dtype=np.float64)
    if poly1.shape[0] == 4 and poly2.shape[0] == 4:
        r1 = _as_rect(poly1)
        r2 = _as_rect(poly2)
        if r1 is not None and r2 is not None:
            ix = min(r1[2], r2[2]) - max(r1[0], r2[0])
            iy = min(r1[3], r2[3]) - max(r1[1], r2[1])
            inter = ix * iy if (ix > 0 and iy > 0) else 0.0
            a1 = (r1[2] - r1[0]) * (r1[3] - r1[1])
            a2 = (r2[2] - r2[0]) * (r2[3] - r2[1])
            union = a1 + a2 - inter
            if union <= 0:
                return 0.0
            return inter / union
    inter_poly = polygon_intersection(poly1, poly2)
    inter_area = 0.0
    if inter_poly.shape[0] > 2:
        inter_area = polygon_area(inter_poly)
    area1 = polygon_area(np.asarray(poly1, dtype=np.float64))
    area2 = polygon_area(np.asarray(poly2, dtype=np.float64))
    union_area = area1 + area2 - inter_area
    if union_area <= 0:
        return 0.0
    return inter_area / union_area


def should_merge(poly1, poly2, iou_threshold: float) -> bool:
    """Strict > threshold predicate. Reference: lanms.py:94-96."""
    return polygon_iou(poly1, poly2) > iou_threshold


# the 8 candidate vertex orders normalize_polygon scans: forward cyclic
# shifts with start 0..3, then reflections with start 0..3 — in exactly the
# reference's scan order, so first-minimum selection reproduces its strict-<
# tie behavior
_NORM_ORDERS = np.array(
    [[(s + i) % 4 for i in range(4)] for s in range(4)]
    + [[(s - i) % 4 for i in range(4)] for s in range(4)],
    dtype=np.int64,
)


# flattened (x, y) index pairs per candidate order, precomputed for the
# pure-Python scan below
_NORM_ORDERS_FLAT = [
    [(2 * j, 2 * j + 1) for j in order] for order in _NORM_ORDERS.tolist()
]


def _gen_normalize_flat():
    """Build the unrolled normalize-scan at import time from
    _NORM_ORDERS_FLAT (one source of truth for the candidate orders).
    The generated body runs the EXACT per-vertex accumulation of the
    loop form — d = ((t0 + t1) + t2) + t3 with t_i = (dx_i*dx_i +
    dy_i*dy_i), left-to-right — and the same sequential strict-<
    first-minimum scan; unrolling only removes CPython loop/indexing
    overhead on a path called once per LANMS merge (~650×/bench page)."""
    lines = [
        "def _normalize_flat(r, p):",
        "    r0, r1, r2, r3, r4, r5, r6, r7 = r",
        "    p0, p1, p2, p3, p4, p5, p6, p7 = p",
    ]
    for k, idx in enumerate(_NORM_ORDERS_FLAT):
        terms = []
        for i in range(4):
            xi, yi = idx[i]
            terms.append(
                f"((r{2 * i} - p{xi}) * (r{2 * i} - p{xi})"
                f" + (r{2 * i + 1} - p{yi}) * (r{2 * i + 1} - p{yi}))"
            )
        # left-to-right fold: (((t0) + t1) + t2) + t3
        expr = terms[0]
        for t in terms[1:]:
            expr = f"({expr} + {t})"
        lines.append(f"    d{k} = {expr}")
    # identical scan to the loop form, INCLUDING the 1e20 seed (so
    # pathological inputs — NaNs, >1e20 distances — resolve exactly as
    # the reference scalar scan would)
    lines.append("    best_k = 0")
    lines.append("    min_d = 1e20")
    for k in range(len(_NORM_ORDERS_FLAT)):
        lines.append(f"    if d{k} < min_d:")
        lines.append(f"        min_d = d{k}")
        lines.append(f"        best_k = {k}")
    lines.append("    return _NORM_RETURNS[best_k](p)")
    # per-order return builders (avoid an 8-way if-chain in the hot body)
    src = "\n".join(lines)
    ns: dict = {}
    builders = []
    for idx in _NORM_ORDERS_FLAT:
        flat = ", ".join(f"p[{c}]" for xy in idx for c in xy)
        bns: dict = {}
        exec(f"def _b(p):\n    return [{flat}]", bns)
        builders.append(bns["_b"])
    ns["_NORM_RETURNS"] = builders
    exec(src, ns)
    return ns["_normalize_flat"]


#: normalize_polygon over flat 8-float Python lists (x0,y0..x3,y3) — the
#: allocation-free core the LANMS loop calls; bit-identical to the loop
#: form (see _gen_normalize_flat).
_normalize_flat = _gen_normalize_flat()


def normalize_polygon(ref: np.ndarray, poly: np.ndarray) -> np.ndarray:
    """Best cyclic shift / reflection of `poly` minimizing vertex distance to
    `ref` (ties resolved toward the forward order and earliest start, as the
    strict `<` scans imply). Reference: lanms.py:99-130.

    Pure-Python float scan over the 8 candidate orders (this is the LANMS
    hot path — tens of thousands of calls per dense page; CPython float
    arithmetic beats 8-element numpy ops at this size). Bit-identical to the
    reference scalar scan: per-vertex terms are dx·dx + dy·dy accumulating
    LEFT-TO-RIGHT (the same IEEE double sequence — Python floats ARE
    doubles), and the strict < keeps the FIRST minimum.
    """
    r = np.asarray(ref, dtype=np.float64).ravel().tolist()
    p = np.asarray(poly, dtype=np.float64).ravel().tolist()
    return np.asarray(_normalize_flat(r, p), dtype=np.float64).reshape(4, 2)


def standard_nms(polys, scores, iou_threshold: float):
    """Greedy score-descending NMS over polygons.

    `np.argsort(-scores)` tie order (stable ascending over negated scores)
    matches the reference bit-for-bit. Reference: lanms.py:133-153.
    """
    polys_arr = np.ascontiguousarray(polys, dtype=np.float64)
    scores_arr = np.ascontiguousarray(scores, dtype=np.float64)
    if polys_arr.size == 0:
        return polys_arr, scores_arr
    order = np.argsort(-scores_arr)

    # vectorized path for all-axis-aligned rectangles (the dominant case for
    # this engine): the inner suppression scan computes IoU of the kept box
    # against every later box in one numpy op. Arithmetic is the same IEEE
    # double sequence as the scalar rect fast path, and only boxes after i in
    # score order can be suppressed — identical greedy semantics.
    x = polys_arr[:, :, 0]
    y = polys_arr[:, :, 1]
    all_rects = bool(
        np.all(x[:, 0] == x[:, 3])
        and np.all(x[:, 1] == x[:, 2])
        and np.all(y[:, 0] == y[:, 1])
        and np.all(y[:, 2] == y[:, 3])
        and np.all(x[:, 1] >= x[:, 0])
        and np.all(y[:, 2] >= y[:, 0])
    )
    if all_rects:
        ox0 = x[order, 0]
        oy0 = y[order, 0]
        ox1 = x[order, 1]
        oy1 = y[order, 2]
        areas = (ox1 - ox0) * (oy1 - oy0)
        n = len(order)
        suppressed_o = np.zeros(n, dtype=np.bool_)
        keep_pos = []
        # Precompute the over-threshold matrix in one broadcast op when it
        # fits (round-8: the rowwise min/max/where chain re-ran ~6 numpy
        # kernels per kept box — ~40% of LANMS wall time at ~180 groups per
        # bench page). Each matrix element runs the IDENTICAL IEEE ops in
        # the identical order as the rowwise form (min, max, subtract,
        # multiply, add, divide are all exactly rounded scalar ops), so the
        # greedy scan suppresses the same set bit-for-bit. Above the guard
        # the original rowwise path runs unchanged — the guard bounds the
        # transient n² float64 intermediates to ~25 MB per call (this runs
        # inside up-to-32 concurrent Python UDF workers), and the big
        # intermediates are dropped as soon as the boolean matrix exists.
        if 1 < n <= 1024:
            ix_m = np.minimum(ox1[:, None], ox1[None, :]) - np.maximum(
                ox0[:, None], ox0[None, :])
            iy_m = np.minimum(oy1[:, None], oy1[None, :]) - np.maximum(
                oy0[:, None], oy0[None, :])
            inter_m = np.where((ix_m > 0) & (iy_m > 0), ix_m * iy_m, 0.0)
            del ix_m, iy_m
            union_m = areas[:, None] + areas[None, :] - inter_m
            over_m = np.where(
                union_m > 0,
                inter_m / np.where(union_m > 0, union_m, 1.0),
                0.0,
            ) > iou_threshold
            del inter_m, union_m
            for i in range(n):
                if suppressed_o[i]:
                    continue
                keep_pos.append(i)
                if i + 1 >= n:
                    break
                suppressed_o[i + 1:] |= over_m[i, i + 1:]
            keep_idx = order[np.array(keep_pos, dtype=np.int64)]
            return polys_arr[keep_idx], scores_arr[keep_idx]
        for i in range(n):
            if suppressed_o[i]:
                continue
            keep_pos.append(i)
            if i + 1 >= n:
                break
            ix = np.minimum(ox1[i], ox1[i + 1 :]) - np.maximum(ox0[i], ox0[i + 1 :])
            iy = np.minimum(oy1[i], oy1[i + 1 :]) - np.maximum(oy0[i], oy0[i + 1 :])
            inter = np.where((ix > 0) & (iy > 0), ix * iy, 0.0)
            union = areas[i] + areas[i + 1 :] - inter
            iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
            suppressed_o[i + 1 :] |= iou > iou_threshold
        keep_idx = order[np.array(keep_pos, dtype=np.int64)]
        return polys_arr[keep_idx], scores_arr[keep_idx]

    keep_idx = []
    suppressed = np.zeros(polys_arr.shape[0], dtype=np.bool_)
    for i in range(order.shape[0]):
        idx = order[i]
        if suppressed[idx]:
            continue
        keep_idx.append(idx)
        for j in range(i + 1, order.shape[0]):
            idx_j = order[j]
            if suppressed[idx_j]:
                continue
            if should_merge(polys_arr[idx], polys_arr[idx_j], iou_threshold):
                suppressed[idx_j] = True
    keep_idx = np.array(keep_idx, dtype=np.int64)
    return polys_arr[keep_idx], scores_arr[keep_idx]


def locality_aware_nms(boxes: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Locality-aware NMS over (n, 9) rows [x0..y3, score].

    Sort by x0, linearly merge each box into the previous merged group when
    IoU exceeds the threshold — vertices aligned by `normalize_polygon`, the
    merge is a running score-weighted vertex average, the group score a
    running max — then apply `standard_nms` to the merged groups. This is an
    order-dependent sessionization-style aggregate: at the Spark level it must
    run inside a per-page UDF, never as a distributive aggregate.
    Reference: lanms.py:156-207.
    """
    if boxes is None or len(boxes) == 0:
        return np.zeros((0, 9), dtype=np.float32)

    boxes_sorted = np.ascontiguousarray(boxes, dtype=np.float64)[
        np.argsort(boxes[:, 0])
    ]
    # ONE C-level conversion for the whole page, then the merge loop runs
    # on flat Python float lists (round-8: per-box reshape/_as_rect
    # conversions and per-merge (4,2) numpy elementwise ops dominated the
    # LANMS profile at ~650 merges/page; Python floats ARE IEEE doubles and
    # every multiply/add/divide below is the same exactly-rounded scalar op
    # numpy applied per element, so merged vertices are bit-identical)
    rows = boxes_sorted.tolist()

    merged_polys = []      # flat 8-float lists
    merged_scores = []
    weight_sums = []

    last_rect = None

    for box in rows:
        p = box[:8]
        score = box[8]
        rect = _rect_of_flat(p)

        if merged_polys:
            last_poly = merged_polys[-1]
            if rect is not None and last_rect is not None:
                ix = min(rect[2], last_rect[2]) - max(rect[0], last_rect[0])
                iy = min(rect[3], last_rect[3]) - max(rect[1], last_rect[1])
                inter = ix * iy if (ix > 0 and iy > 0) else 0.0
                a1 = (rect[2] - rect[0]) * (rect[3] - rect[1])
                a2 = (last_rect[2] - last_rect[0]) * (last_rect[3] - last_rect[1])
                union = a1 + a2 - inter
                merge = union > 0 and inter / union > iou_threshold
            else:
                merge = should_merge(
                    np.asarray(p, dtype=np.float64).reshape(4, 2),
                    np.asarray(last_poly, dtype=np.float64).reshape(4, 2),
                    iou_threshold,
                )
            if merge:
                aligned = _normalize_flat(last_poly, p)
                w = weight_sums[-1]
                total_weight = w + score
                merged_polys[-1] = [
                    (last_poly[i] * w + aligned[i] * score) / total_weight
                    for i in range(8)
                ]
                weight_sums[-1] = total_weight
                if score > merged_scores[-1]:
                    merged_scores[-1] = score
                last_rect = _rect_of_flat(merged_polys[-1])
                continue

        merged_polys.append(list(p))
        merged_scores.append(score)
        weight_sums.append(score)
        last_rect = rect

    merged_polys_arr = (
        np.asarray(merged_polys, dtype=np.float64).reshape(-1, 4, 2)
        if merged_polys else np.empty((0, 4, 2))
    )
    merged_scores_arr = np.array(merged_scores, dtype=np.float64)

    kept_polys, kept_scores = standard_nms(
        merged_polys_arr, merged_scores_arr, iou_threshold
    )

    if kept_polys.size == 0:
        return np.zeros((0, 9), dtype=np.float32)

    final_boxes = np.concatenate(
        [kept_polys.reshape(kept_polys.shape[0], -1), kept_scores[:, None]], axis=1
    )
    return final_boxes.astype(np.float32)


def polygon_area_batch(polys: np.ndarray) -> np.ndarray:
    """Vectorized shoelace area over (N, 4, 2). Reference: infer.py:174-182."""
    polys = np.asarray(polys)
    if polys.size == 0:
        return np.zeros((0,), dtype=np.float32)
    x = polys[:, :, 0]
    y = polys[:, :, 1]
    return 0.5 * np.abs(
        np.sum(x * np.roll(y, -1, axis=1) - y * np.roll(x, -1, axis=1), axis=1)
    )


def point_in_polygon(point, polygon: np.ndarray) -> bool:
    """Boundary-inclusive point-in-polygon (replaces cv2.pointPolygonTest >= 0).

    A point is inside when it is on the boundary or strictly interior of the
    convex/simple quad. Uses the even-odd ray cast plus an explicit on-edge
    check so boundary points count as inside, matching
    `cv2.pointPolygonTest(..., measureDist=False) >= 0`
    (reference: infer.py:184-192).
    """
    px, py = float(point[0]), float(point[1])
    poly = np.asarray(polygon, dtype=np.float64)
    n = poly.shape[0]
    inside = False
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        # on-edge check: collinear and within the segment bbox
        cross = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        if abs(cross) < 1e-9:
            if min(x1, x2) - 1e-9 <= px <= max(x1, x2) + 1e-9 and min(
                y1, y2
            ) - 1e-9 <= py <= max(y1, y2) + 1e-9:
                return True
        if (y1 > py) != (y2 > py):
            xin = x1 + (py - y1) * (x2 - x1) / (y2 - y1)
            if px < xin:
                inside = not inside
    return inside


def is_quad_inside(inner: np.ndarray, outer: np.ndarray) -> bool:
    """All 4 vertices of `inner` inside-or-on `outer`. Reference: infer.py:184-192."""
    inner = np.asarray(inner, dtype=np.float32)
    for point in inner:
        if not point_in_polygon(point, outer):
            return False
    return True


# --- training/data-prep kernels (round 4: SURVEY §2.7 closure) -----------------

def order_vertices_clockwise(poly) -> np.ndarray:
    """Quad vertices → (tl, tr, br, bl) float32 via the sum/diff rule:
    tl = argmin(x+y), br = argmax(x+y), tr = argmin(y−x), bl = argmax(y−x).
    Reference: dataset.py:16-24 (verbatim semantics, including its tie
    behavior: np.argmin/argmax pick the FIRST extremal vertex)."""
    poly = np.asarray(poly, dtype=np.float64).reshape(-1, 2)
    s = poly.sum(axis=1)
    diff = np.diff(poly, axis=1).flatten()
    tl = poly[np.argmin(s)]
    br = poly[np.argmax(s)]
    tr = poly[np.argmin(diff)]
    bl = poly[np.argmax(diff)]
    return np.array([tl, tr, br, bl], dtype=np.float32)


def shrink_poly(poly, shrink_ratio: float = 0.3, dtype=np.float32) -> np.ndarray:
    """Shrink a quad inward along averaged edge normals — the EAST training
    score-map shrink. Per vertex: inward normals of the two incident edges
    (signed by polygon orientation), averaged and renormalized; offset =
    shrink_ratio · min(len(edge_in), len(edge_out)).
    Reference: dataset.py:27-56 (verbatim semantics incl. the 1e-6 length
    epsilon and the area>0 sign rule). dtype: the reference computes in
    float32 (the default, ~1e-3 absolute error on page-scale coords); pass
    np.float64 when downstream comparisons need closed-form precision
    (same algorithm, only the working precision changes)."""
    poly = np.asarray(poly, dtype=dtype).reshape(-1, 2)
    n = poly.shape[0]
    if n != 4:
        raise ValueError("Expected quadrilateral with 4 vertices")
    area = 0.0
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        area += x1 * y2 - x2 * y1
    sign = 1.0 if area > 0 else -1.0
    out = np.zeros_like(poly)
    for i in range(n):
        p_prev = poly[(i - 1) % n]
        p_curr = poly[i]
        p_next = poly[(i + 1) % n]
        e1 = p_curr - p_prev
        l1 = float(np.linalg.norm(e1))
        n1 = sign * np.array([e1[1], -e1[0]]) / (l1 + 1e-6)
        e2 = p_next - p_curr
        l2 = float(np.linalg.norm(e2))
        n2 = sign * np.array([e2[1], -e2[0]]) / (l2 + 1e-6)
        n_avg = n1 + n2
        norm = float(np.linalg.norm(n_avg))
        if norm > 0:
            n_avg = n_avg / norm
        out[i] = p_curr - shrink_ratio * min(l1, l2) * n_avg
    return out.astype(dtype)


def min_area_rect(points) -> tuple:
    """Minimum-area enclosing rotated rectangle of a point set →
    ((cx, cy), (w, h), angle_deg) — the cv2.minAreaRect analog the
    reference's quad_to_rbox wraps (utils.py:28-32), computed by rotating
    calipers over the convex hull (the optimal rect shares a side with the
    hull). Convention divergence, documented: cv2's angle convention has
    flipped across OpenCV versions; this kernel pins a DETERMINISTIC one —
    angle ∈ [0, 90) measured counter-clockwise from +x to the rect side
    reported as w — describing the same rectangle point set."""
    pts = np.asarray(points, dtype=np.float64).reshape(-1, 2)
    hull = _convex_hull(pts)
    best = None
    m = hull.shape[0]
    for i in range(m):
        e = hull[(i + 1) % m] - hull[i]
        ln = float(np.hypot(e[0], e[1]))
        if ln < 1e-12:
            continue
        ux, uy = e[0] / ln, e[1] / ln          # edge direction
        proj_u = hull @ np.array([ux, uy])     # along edge
        proj_v = hull @ np.array([-uy, ux])    # along normal
        w = float(proj_u.max() - proj_u.min())
        h = float(proj_v.max() - proj_v.min())
        area = w * h
        if best is None or area < best[0] - 1e-12:
            cu = (proj_u.max() + proj_u.min()) / 2.0
            cv = (proj_v.max() + proj_v.min()) / 2.0
            cx = cu * ux - cv * uy
            cy = cu * uy + cv * ux
            ang = np.degrees(np.arctan2(uy, ux)) % 180.0
            best = (area, (cx, cy), (w, h), ang)
    _, (cx, cy), (w, h), ang = best
    # normalize: angle in [0, 90), swapping sides when needed
    if ang >= 90.0:
        ang -= 90.0
        w, h = h, w
    return ((float(cx), float(cy)), (float(w), float(h)), float(ang))


def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew's monotone chain (counter-clockwise, no duplicate endpoint)."""
    pts = np.unique(pts, axis=0)
    if pts.shape[0] <= 2:
        return pts
    order = np.lexsort((pts[:, 1], pts[:, 0]))
    p = pts[order]

    def half(seq):
        out = []
        for q in seq:
            while len(out) >= 2 and np.cross(out[-1] - out[-2], q - out[-1]) <= 0:
                out.pop()
            out.append(q)
        return out

    lower = half(p)
    upper = half(p[::-1])
    return np.array(lower[:-1] + upper[:-1])


def quad_to_rbox(quad) -> np.ndarray:
    """(x0..y3[, score]) quad → (cx, cy, w, h, angle) float32 rotated box.
    Reference: utils.py:28-32 (cv2.minAreaRect over the 4 vertices); see
    min_area_rect for the pinned angle convention."""
    pts = np.asarray(quad, dtype=np.float32).ravel()[:8].reshape(4, 2)
    (cx, cy), (w, h), ang = min_area_rect(pts)
    return np.array([cx, cy, w, h, ang], dtype=np.float32)
