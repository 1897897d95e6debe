"""Multimodal-column operators: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with (width, height, channels /
sample_rate / fps) metadata, processed by Arrow-batched mapInPandas UDFs —
the Spark-side plumbing (schema, partitioning, UDF signature, bounded batch
shape) is real and tested; the codec steps that need image/audio libraries
(absent in this container) are STUBBED behind decode_external() which raises
NotImplementedError, while raw uint8 payloads (our fixture pages) take the
real numpy path.

These run over the engine's media fixture table (binary pixels), not the
driver's testdata (which has no binary columns) → rows-only correctness
checks (no oracle_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F


def decode_external(payload: bytes, codec: str):
    """Stub for codec-compressed media (JPEG/PNG/MP3/MP4...). The container
    ships no cv2/PIL/ffmpeg; on a real cluster this dispatches to the codec
    library inside the same Arrow batch loop."""
    raise NotImplementedError(
        f"codec '{codec}' decode requires an image/audio library not present "
        "in this environment; raw uint8 payloads take the numpy path"
    )


def decode_raw(payload: bytes, height: int, width: int, channels: int) -> np.ndarray:
    from ..oracle import decode_media

    return decode_media(payload, height, width, channels)


def _stats_udf(iterator):
    for pdf in iterator:
        refs, widths, heights, lumas, inks = [], [], [], [], []
        for ref, h, w, c, px in zip(
            pdf["media_ref"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
        ):
            img = decode_raw(px, int(h), int(w), int(c))
            from ..kernels.image import luminance

            gray = luminance(img)
            refs.append(ref)
            widths.append(int(w))
            heights.append(int(h))
            lumas.append(round(float(gray.mean()), 3))
            inks.append(round(float((gray < 230).mean()), 5))
        yield pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "width": pd.Series(widths, dtype="int32"),
                "height": pd.Series(heights, dtype="int32"),
                "mean_luma": pd.Series(lumas, dtype="float64"),
                "ink_fraction": pd.Series(inks, dtype="float64"),
            }
        )


def media_decode_stats(spark, sf_dir):
    """Feature-extract over binary media payloads (decode → luma/ink stats);
    partitioned by media_ref like the OCR path. sf_dir is unused — media
    payloads live in the engine's fixture tier, not the TPC-H testdata."""
    from ..fixtures import ensure_tier

    d = ensure_tier("sf-small")
    media = spark.read.parquet(f"{d}/media.parquet")
    media = media.repartition(spark.sparkContext.defaultParallelism, "media_ref")
    return media.mapInPandas(
        _stats_udf,
        schema="media_ref string, width int, height int, mean_luma double, ink_fraction double",
    )


def _thumbnail_udf(iterator):
    from ..kernels.image import resize

    for pdf in iterator:
        refs, blobs = [], []
        for ref, h, w, c, px in zip(
            pdf["media_ref"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
        ):
            img = decode_raw(px, int(h), int(w), int(c))
            thumb = resize(img, 32, 32, interp="area")
            refs.append(ref)
            blobs.append(thumb.tobytes())
        yield pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "thumb": pd.Series(blobs, dtype="object"),
            }
        )


def media_thumbnails(spark, sf_dir):
    """Resize path (32×32 area-average thumbnails), binary-in binary-out."""
    from ..fixtures import ensure_tier

    d = ensure_tier("sf-small")
    media = spark.read.parquet(f"{d}/media.parquet")
    out = media.mapInPandas(
        _thumbnail_udf, schema="media_ref string, thumb binary"
    )
    return out.select("media_ref", F.length("thumb").alias("thumb_bytes"))


FRAME_HEIGHT = 16
FRAME_STRIDE = 2


def _frame_sample_udf(iterator):
    """Deterministic fake "video": each page payload is treated as a stack
    of FRAME_HEIGHT-row frames (a real build swaps this decode for an
    av/ffmpeg codec — the Spark-side plumbing, batch shape, and sampling
    logic stay identical); every FRAME_STRIDE-th frame is emitted."""
    for pdf in iterator:
        refs, idxs, blobs = [], [], []
        for ref, h, w, c, px in zip(
            pdf["media_ref"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
        ):
            img = decode_raw(px, int(h), int(w), int(c))
            n_frames = img.shape[0] // FRAME_HEIGHT
            for f in range(0, n_frames, FRAME_STRIDE):
                frame = img[f * FRAME_HEIGHT:(f + 1) * FRAME_HEIGHT]
                refs.append(ref)
                idxs.append(f)
                blobs.append(frame.tobytes())
        yield pd.DataFrame(
            {
                "media_ref": pd.Series(refs, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame": pd.Series(blobs, dtype="object"),
            }
        )


def media_frame_sample(spark, sf_dir):
    """Frame-sampling path (every 2nd fixed-height frame per payload) —
    one input row fans out to many output rows inside the Arrow batch, the
    shape a video-frame extraction job has at scale."""
    from ..fixtures import ensure_tier

    d = ensure_tier("sf-small")
    media = spark.read.parquet(f"{d}/media.parquet")
    out = media.mapInPandas(
        _frame_sample_udf, schema="media_ref string, frame_idx int, frame binary"
    )
    return out.select(
        "media_ref", "frame_idx", F.length("frame").alias("frame_bytes")
    )


# rows-only checks: binary media exists only in the engine's fixtures
QUERIES = {
    "mm_media_decode_stats": (media_decode_stats, None),
    "mm_media_thumbnails": (media_thumbnails, None),
    "mm_media_frame_sample": (media_frame_sample, None),
}