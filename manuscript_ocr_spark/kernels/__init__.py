"""Pure-numpy kernel library — zero Spark dependencies.

These kernels implement every geometric / ordering / image / text operator of
the reference pipeline (SURVEY.md §2.5-2.7) and are shared verbatim by:
  - the single-process oracle (manuscript_ocr_spark.oracle), and
  - the Spark pandas-UDF pipeline (manuscript_ocr_spark.pipeline),
which is what guarantees the span-sequence-equality invariant.
"""

from .geometry import (
    clip_polygon,
    compute_intersection,
    is_quad_inside,
    locality_aware_nms,
    normalize_polygon,
    point_in_polygon,
    polygon_area,
    polygon_area_batch,
    polygon_intersection,
    polygon_iou,
    should_merge,
    standard_nms,
)
from .boxes import (
    convert_to_axis_aligned,
    decode_quads_from_maps,
    expand_boxes,
    remove_area_anomalies,
    remove_fully_contained_boxes,
    scale_boxes_to_original,
)
from .ordering import (
    reading_order_indices,
    reading_order_line_groups,
    reading_order_line_index_groups,
    resolve_intersections,
    sort_boxes_reading_order,
    sort_boxes_reading_order_with_resolutions,
)
from .image import (
    extract_word_image,
    normalize_unit,
    resize,
    resize_and_pad,
    to_rgb,
)
from .textproc import (
    decode_tokens,
    lang_id,
    load_charset_lines,
    mean_prob_confidence,
    quality_score,
    strip_boilerplate,
    token_count,
)

__all__ = [n for n in dir() if not n.startswith("_")]
