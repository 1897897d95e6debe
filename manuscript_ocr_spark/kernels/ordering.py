"""Reading-order kernels (pure numpy / Python).

The core ordering semantics of the engine: greedy y-line clustering then
left-to-right within a line, preceded by an iterative overlap-shrink pass.
These are order-dependent (line assignment depends on insertion order and
running line means), so they are NOT expressible as Spark aggregates — they
run inside the per-page UDF, and the resulting per-box `order` index is what
Spark's final `sort_array` keys on.

Reference: src/manuscript/detectors/_east/utils.py:500-644.
"""

from __future__ import annotations

import numpy as np


def _intersect(b1, b2) -> bool:
    return not (b1[2] <= b2[0] or b2[2] <= b1[0] or b1[3] <= b2[1] or b2[3] <= b1[1])


def resolve_intersections(boxes):
    """Iteratively shrink any two intersecting bboxes by 10% of their extent
    (right/bottom edges), up to 50 fixed-point iterations.
    Boxes are (x_min, y_min, x_max, y_max) int tuples.
    Reference: utils.py:500-547.
    """
    resolved = list(boxes)
    max_iterations = 50

    for _ in range(max_iterations):
        changed = False
        for i in range(len(resolved)):
            for j in range(i + 1, len(resolved)):
                if _intersect(resolved[i], resolved[j]):
                    x0, y0, x1, y1 = resolved[i]
                    x0b, y0b, x1b, y1b = resolved[j]
                    resolved[i] = (
                        x0,
                        y0,
                        int(x1 - (x1 - x0) * 0.1),
                        int(y1 - (y1 - y0) * 0.1),
                    )
                    resolved[j] = (
                        x0b,
                        y0b,
                        int(x1b - (x1b - x0b) * 0.1),
                        int(y1b - (y1b - y0b) * 0.1),
                    )
                    changed = True
        if not changed:
            break

    return resolved


def reading_order_line_groups(boxes, y_tol_ratio=0.6, x_gap_ratio=np.inf):
    """The greedy line clustering of `sort_boxes_reading_order`, returning the
    line structure instead of the flattened list: a list of lines, each a list
    of boxes, lines sorted by mean y-center and boxes within a line by x_min.
    Exactly the reference algorithm (utils.py:550-607) with the final flatten
    factored out — the line boundaries drive per-line span emission.
    """
    if not boxes:
        return []

    avg_h = np.mean([b[3] - b[1] for b in boxes])
    # avg_h == 0 (a page of zero-height boxes, e.g. the duplicate-boxes
    # shrink-in-lockstep quirk fixture) with the default x_gap_ratio=inf
    # makes `avg_h * x_gap_ratio` 0*inf = NaN; NaN comparisons are False,
    # so such boxes never merge into lines. That fall-through is the
    # intended (and test-pinned) behavior — compute the limit explicitly
    # so it holds by design rather than via a RuntimeWarning-emitting
    # multiply.
    if avg_h == 0 and np.isinf(x_gap_ratio):
        x_gap_limit = np.nan
    else:
        x_gap_limit = avg_h * x_gap_ratio
    lines = []

    for b in sorted(boxes, key=lambda b: (b[1] + b[3]) / 2):
        cy = (b[1] + b[3]) / 2
        placed = False

        for ln in lines:
            line_cy = np.mean([(v[1] + v[3]) / 2 for v in ln])
            last_x1 = max(v[2] for v in ln)

            if (
                abs(cy - line_cy) <= avg_h * y_tol_ratio
                and (b[0] - last_x1) <= x_gap_limit
            ):
                ln.append(b)
                placed = True
                break

        if not placed:
            lines.append([b])

    lines.sort(key=lambda ln: np.mean([(b[1] + b[3]) / 2 for b in ln]))
    for ln in lines:
        ln.sort(key=lambda b: b[0])

    return lines


def sort_boxes_reading_order(boxes, y_tol_ratio=0.6, x_gap_ratio=np.inf):
    """Greedy line clustering, then top-to-bottom / left-to-right flatten.

    Iterate boxes by y-center (Python `sorted`, stable); attach a box to the
    first existing line whose running mean y-center is within
    `avg_h * y_tol_ratio` and whose rightmost edge is within
    `avg_h * x_gap_ratio` of the box's left edge; otherwise start a new line.
    Lines sort by mean y-center, boxes within a line by x_min.
    Reference: utils.py:550-607.
    """
    return [
        b
        for ln in reading_order_line_groups(
            boxes, y_tol_ratio=y_tol_ratio, x_gap_ratio=x_gap_ratio
        )
        for b in ln
    ]


def sort_boxes_reading_order_with_resolutions(
    boxes, y_tol_ratio=0.6, x_gap_ratio=np.inf
):
    """resolve_intersections then sort_boxes_reading_order.

    NOTE (verbatim reference quirk, utils.py:638-644): the shrunk→original
    mapping is a dict keyed by the shrunk box, so if two distinct originals
    shrink to the same tuple, the LAST original wins for BOTH positions —
    i.e. one original can be emitted twice and another dropped. Reproduced
    exactly for bit-equality with the reference.
    """
    compressed = resolve_intersections(boxes)
    mapping = {c: o for c, o in zip(compressed, boxes)}

    sorted_compressed = sort_boxes_reading_order(
        compressed, y_tol_ratio=y_tol_ratio, x_gap_ratio=x_gap_ratio
    )
    return [mapping[b] for b in sorted_compressed]


def reading_order_line_index_groups(boxes, y_tol_ratio=0.6, x_gap_ratio=np.inf):
    """Reading-order line groups as ORIGINAL indices, through the full
    pipeline path: resolve_intersections → greedy clustering (on the shrunk
    boxes) → shrunk→original dict mapping (verbatim collapse quirk) →
    first-match index re-association. Flattening this equals
    `reading_order_indices`; the line boundaries drive per-line span emission
    in both the oracle and the Spark UDF.
    """
    boxes = [tuple(b) for b in boxes]
    compressed = resolve_intersections(boxes)
    mapping = {c: o for c, o in zip(compressed, boxes)}
    groups = reading_order_line_groups(
        compressed, y_tol_ratio=y_tol_ratio, x_gap_ratio=x_gap_ratio
    )
    out = []
    for ln in groups:
        idxs = []
        for cb in ln:
            ob = mapping[cb]
            for idx, b in enumerate(boxes):
                if b == ob:
                    idxs.append(idx)
                    break
        out.append(idxs)
    return out


def reading_order_indices(boxes, y_tol_ratio=0.6, x_gap_ratio=np.inf):
    """Return the reading-order permutation as indices into `boxes`,
    reproducing the reference pipeline's sort + first-match re-association
    (J1, src/manuscript/_pipeline.py:104-123): for each sorted bbox, the
    FIRST input box with an equal bbox tuple is taken (duplicates resolve to
    the earliest index each time, which can emit an index twice and skip
    another — verbatim reference behavior).
    """
    boxes = [tuple(b) for b in boxes]
    sorted_boxes = sort_boxes_reading_order_with_resolutions(
        boxes, y_tol_ratio=y_tol_ratio, x_gap_ratio=x_gap_ratio
    )
    order = []
    for bx in sorted_boxes:
        for idx, b in enumerate(boxes):
            if b == bx:
                order.append(idx)
                break
    return order
