"""Iceberg-native checkpoint sink (SURVEY §9 item 1) — env-skipped here (no
Iceberg runtime jars in the sandbox); a jar-equipped CI runs the full
crash→resume cycle against a local hadoop catalog. The probe itself and the
no-jars fail-fast run everywhere."""

from __future__ import annotations

import pytest

from manuscript_ocr_spark.operators.iceberg import (
    extract_with_checkpoint_iceberg,
    iceberg_available,
    require_iceberg,
)


def _iceberg_session(tmp_path):
    from manuscript_ocr_spark.session import get_spark

    return get_spark(
        master="local[4]",
        app_name="iceberg-ckpt-test",
        extra_confs={
            "spark.sql.catalog.local": "org.apache.iceberg.spark.SparkCatalog",
            "spark.sql.catalog.local.type": "hadoop",
            "spark.sql.catalog.local.warehouse": str(tmp_path / "warehouse"),
            "spark.sql.extensions": (
                "org.apache.iceberg.spark.extensions."
                "IcebergSparkSessionExtensions"
            ),
        },
    )


def test_require_iceberg_fails_fast_without_jars(spark):
    if iceberg_available(spark):
        pytest.skip("Iceberg jars present — the fail-fast path is for hosts without them")
    with pytest.raises(RuntimeError, match="parquet emulation"):
        require_iceberg(spark)


def test_iceberg_crash_resume_snapshot_commits(spark, tmp_path):
    """Crash after 2 bucket commits → resume skips exactly those buckets
    (discovered from the live table, not any side file), final table equals
    the direct pipeline output, and the snapshot log shows one commit per
    bucket — the manifest-JSON semantics mapped 1:1 onto Iceberg."""
    if not iceberg_available(spark):
        pytest.skip("Iceberg runtime jars not on the classpath in this env")
    spark.stop()
    spark = _iceberg_session(tmp_path)

    from pyspark.sql import functions as F

    from manuscript_ocr_spark.fixtures import PAGE_SIZE, ensure_tier
    from manuscript_ocr_spark.models.east_tiny import DetectorConfig
    from manuscript_ocr_spark.pipeline import extract_spans, load_fixture_tables

    docs, media = load_fixture_tables(spark, ensure_tier("sf-small"))
    cfg = DetectorConfig(target_size=PAGE_SIZE)
    table = "local.db.spans_ckpt"

    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint_iceberg(
            docs, media, table, str(tmp_path / "stage1"),
            n_buckets=4, fail_after=2, cfg=cfg,
        )
    r2 = extract_with_checkpoint_iceberg(
        docs, media, table, str(tmp_path / "stage2"), n_buckets=4, cfg=cfg
    )
    assert sorted(r2["skipped"]) == [0, 1] and sorted(r2["committed"]) == [2, 3]

    got = (
        spark.table(table)
        .drop("__bucket")
        .select("doc_id", F.to_json("spans").alias("js"))
        .collect()
    )
    want = (
        extract_spans(docs, media, cfg=cfg)
        .select("doc_id", F.to_json("spans").alias("js"))
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))

    # one snapshot per committed bucket
    snaps = spark.sql(f"SELECT * FROM {table}.snapshots").count()
    assert snaps == 4
