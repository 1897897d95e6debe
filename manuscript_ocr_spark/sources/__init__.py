"""Sources / sinks (SURVEY.md §2.1).

Readers: parquet fixture tables (S1-S2 analog: the media table IS the
decodable image source; binary-file directory scans map to
spark.read.format('binaryFile') when images live on a filesystem).
Sinks: extraction output parquet (pipeline / checkpoint), visualization
sink (S8), metrics sink (S9: split_ocr_metrics + checkpoint manifests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_docs(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_media(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_binary_images(spark: SparkSession, dir_glob: str) -> DataFrame:
    """Directory of image files → (path, modificationTime, length, content).
    The reference's build_file_index/read_image path (S1-S3) when pages live
    as files rather than table payloads; codec decode then happens in the
    multimodal UDFs (stubbed offline — see functions/multimodal.py)."""
    return spark.read.format("binaryFile").load(dir_glob)


def write_visualizations(media: DataFrame, weights: dict, cfg, out_path: str):
    """S8 debug sink: render detection boxes + reading order onto each page,
    write (media_ref, width, height, vis binary) parquet."""
    import numpy as np
    import pandas as pd

    from ..models.glyphs import serialize_weights
    from ..pipeline import make_ocr_udf  # noqa: F401 (session confs shared)

    spark = media.sparkSession
    wbc = spark.sparkContext.broadcast(serialize_weights(weights))

    def vis_batches(iterator):
        from ..kernels.ordering import reading_order_indices
        from ..kernels.vis import visualize_page
        from ..models.east_tiny import DetectorConfig, detect_quads
        from ..oracle import decode_media
        from ..pipeline import _get_weights

        w = _get_weights(wbc.value)
        for pdf in iterator:
            refs, widths, heights, blobs = [], [], [], []
            for ref, h, wd, c, px in zip(
                pdf["media_ref"], pdf["height"], pdf["width"], pdf["channels"], pdf["pixels"]
            ):
                img = decode_media(px, int(h), int(wd), int(c))
                quads = detect_quads(img, cfg)
                boxes = []
                for q in quads:
                    poly = np.array(q[:8].reshape(4, 2), dtype=np.int32)
                    boxes.append(
                        (int(poly[:, 0].min()), int(poly[:, 1].min()),
                         int(poly[:, 0].max()), int(poly[:, 1].max()))
                    )
                order = reading_order_indices(boxes)
                ordered = quads[order] if len(order) else quads
                vis = visualize_page(img, ordered, w, show_order=True)
                refs.append(ref)
                widths.append(int(wd))
                heights.append(int(h))
                blobs.append(vis.tobytes())
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype="object"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "vis": pd.Series(blobs, dtype="object"),
                }
            )

    out = media.mapInPandas(
        vis_batches, schema="media_ref string, width int, height int, vis binary"
    )
    out.write.mode("overwrite").parquet(out_path)
    return out_path
