"""Skew stress tier (SURVEY.md §9.5, north_rule "salted and range-partitioned
to defuse skew from pages with dense line counts").

The OCR stage's cost skew comes from dense pages (~10× the median page) and
from coarse scans (few files → few tasks). The defusal is the explicit hash
spread to many partitions per core before the UDF. Asserted via the in-band
per-task metrics (partition_id, pages, wall_ms): with the spread ON the
per-task page load is bounded and the work fans out across many tasks; with
it OFF (ocr_partitions=1, the degenerate scan) everything piles into one
task. Page-count asserts are deterministic; wall-times are printed for the
BENCH notes, not asserted (shared host)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def skew_tables(spark, tmp_path_factory):
    from manuscript_ocr_spark.fixtures import write_fixtures

    # larger page pool → several dense pages (kind probability 5%)
    out = tmp_path_factory.mktemp("skewfix") / "tier"
    write_fixtures(str(out), n_docs=80, n_pages=96, with_expected=False)
    docs = spark.read.parquet(f"{out}/docs.parquet")
    media = spark.read.parquet(f"{out}/media.parquet")
    return docs, media


def _task_metrics(spark, media, refs, ocr_partitions=None):
    from manuscript_ocr_spark.fixtures import PAGE_SIZE
    from manuscript_ocr_spark.models import (
        DetectorConfig,
        build_weights,
        serialize_weights,
    )
    from manuscript_ocr_spark.pipeline import ocr_media_lines, split_ocr_metrics

    bc = spark.sparkContext.broadcast(serialize_weights(build_weights()))
    lines = ocr_media_lines(
        media,
        refs,
        bc,
        DetectorConfig(target_size=PAGE_SIZE),
        emit_metrics=True,
        ocr_partitions=ocr_partitions,
        broadcast_refs=True,
    )
    _, metrics = split_ocr_metrics(lines)
    return metrics.collect()


def test_spread_bounds_per_task_load(spark, skew_tables):
    _, media = skew_tables
    refs = media.select("media_ref").distinct()
    n_pages = media.count()

    fine = _task_metrics(spark, media, refs)  # default: parallelism × 8
    busy = [r for r in fine if r["pages"] > 0]
    assert sum(r["pages"] for r in fine) == n_pages
    # spread: many tasks carry work, none carries a pile
    assert len(busy) >= 8
    assert max(r["pages"] for r in busy) <= max(4, n_pages // 8)

    coarse = _task_metrics(spark, media, refs, ocr_partitions=1)
    coarse_busy = [r for r in coarse if r["pages"] > 0]
    assert len(coarse_busy) == 1  # everything piles into one task
    assert coarse_busy[0]["pages"] == n_pages

    # straggler quantification for the BENCH notes (not asserted: shared host)
    fine_max = max(r["wall_ms"] for r in fine)
    coarse_max = max(r["wall_ms"] for r in coarse)
    print(
        f"\nskew defusal: fine max-task {fine_max} ms over {len(busy)} busy "
        f"tasks vs coarse single-task {coarse_max} ms "
        f"(stage critical path ratio ~{coarse_max / max(fine_max, 1):.1f}x)"
    )


def test_hot_page_still_ocrd_once(spark, skew_tables):
    """A hot media_ref (every doc referencing the same page) must not
    multiply OCR work: the distinct-refs semi-join dedups the scan, so the
    page count in task metrics stays at the DISTINCT page count."""
    docs, media = skew_tables
    hot = docs.select(
        "doc_id",
        F.transform(
            "spans",
            lambda s: F.struct(
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                F.when(s["kind"] == "media", F.lit("page-0000"))
                .otherwise(s["media_ref"])
                .alias("media_ref"),
                s["offset"].alias("offset"),
            ),
        ).alias("spans"),
    )
    refs = (
        hot.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .distinct()
    )
    metrics = _task_metrics(spark, media, refs)
    assert sum(r["pages"] for r in metrics) == 1
