"""Incremental / streaming surfaces.

The reference is strictly synchronous single-image (SURVEY.md §2.9 — no
streaming operators exist), so the engine's streaming layer is the natural
extension, not a port:

1. `run_incremental_extraction` — Structured Streaming over the docs table
   with Trigger.AvailableNow + foreachBatch: each micro-batch of newly
   arrived documents runs the SAME batch pipeline (extract_spans) against
   the static media table and appends to the output; the streaming
   checkpointLocation gives exactly-once file-source progress across
   restarts (the streaming counterpart of operators/checkpoint.py).

2. `windowed_event_counts` — watermarked tumbling-window aggregation
   (the standard late-data pattern) over an event stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

DOCS_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField(
            "spans",
            ArrayType(
                StructType(
                    [
                        StructField("kind", StringType()),
                        StructField("text", StringType()),
                        StructField("media_ref", StringType()),
                        StructField("offset", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def run_incremental_extraction(
    spark: SparkSession,
    docs_dir: str,
    media: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    **extract_kwargs,
):
    """Process all docs parquet files that arrived since the last run
    (Trigger.AvailableNow), extract spans per micro-batch, append parquet.
    Restart-safe via the streaming checkpoint; returns after draining."""
    from ..pipeline import extract_spans

    reader = spark.readStream.schema(DOCS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(docs_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        out = extract_spans(batch_df, media, **extract_kwargs)
        out.write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q.lastProgress


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type — works on a
    streaming OR batch events DataFrame (same plan both ways)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
