"""Checkpoint/resume + incremental streaming tests.

The resume semantics mirror the north_rule: kill after partial commit,
rerun, assert (a) committed buckets are skipped, (b) the final table equals
the plain batch pipeline's output, (c) per-bucket manifests carry
rows/latency/version lineage.
"""

import json
import os

import pytest
from pyspark.sql import functions as F


def _spans_key(rows):
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in r["spans"]
        ]
        for r in rows
    }


@pytest.fixture(scope="module")
def small_tables(spark, sf_small_dir):
    from manuscript_ocr_spark.pipeline import load_fixture_tables

    docs, media = load_fixture_tables(spark, sf_small_dir)
    # keep the resume test fast: 60 docs still span several buckets
    docs = docs.limit(60).cache()
    docs.count()
    return docs, media


def test_resume_after_partial_failure(spark, small_tables, tmp_path):
    from manuscript_ocr_spark.operators import (
        committed_buckets,
        extract_with_checkpoint,
        read_checkpointed,
    )
    from manuscript_ocr_spark.pipeline import extract_spans

    docs, media = small_tables
    out_dir = str(tmp_path / "ckpt")

    # first run dies after 2 committed buckets
    with pytest.raises(RuntimeError, match="injected failure"):
        extract_with_checkpoint(docs, media, out_dir, n_buckets=4, fail_after=2)
    first = committed_buckets(out_dir)
    assert len(first) == 2

    # resume: completes the remaining buckets, does NOT recompute committed
    result = extract_with_checkpoint(docs, media, out_dir, n_buckets=4)
    assert sorted(result["skipped"]) == sorted(first)
    assert len(result["committed"]) == 2
    assert set(result["committed"]) | set(first) == {0, 1, 2, 3}

    # manifests carry lineage
    for b, m in committed_buckets(out_dir).items():
        assert m["engine_version"]
        assert m["wall_ms"] >= 0
        assert m["rows"] >= 0
        assert m["n_buckets"] == 4

    # final table == plain batch pipeline output
    got = _spans_key(read_checkpointed(spark, out_dir).collect())
    want = _spans_key(extract_spans(docs, media).collect())
    assert got == want


def test_rerun_is_noop(spark, small_tables, tmp_path):
    from manuscript_ocr_spark.operators import extract_with_checkpoint

    docs, media = small_tables
    out_dir = str(tmp_path / "ckpt2")
    r1 = extract_with_checkpoint(docs, media, out_dir, n_buckets=2)
    assert len(r1["committed"]) == 2
    # manifest mtimes must not change on the noop rerun
    mdir = os.path.join(out_dir, "_manifest")
    before = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    r2 = extract_with_checkpoint(docs, media, out_dir, n_buckets=2)
    assert r2["committed"] == [] and sorted(r2["skipped"]) == [0, 1]
    after = {f: os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)}
    assert before == after


def test_ocr_task_metrics(spark, small_tables):
    from manuscript_ocr_spark.models.glyphs import build_weights, serialize_weights
    from manuscript_ocr_spark.models.east_tiny import DetectorConfig
    from manuscript_ocr_spark.fixtures import PAGE_SIZE
    from manuscript_ocr_spark.pipeline import ocr_media_lines, split_ocr_metrics

    docs, media = small_tables
    wbc = spark.sparkContext.broadcast(serialize_weights(build_weights()))
    refs = media.select("media_ref").distinct()
    lines = ocr_media_lines(
        media, refs, wbc, DetectorConfig(target_size=PAGE_SIZE), emit_metrics=True
    )
    data, metrics = split_ocr_metrics(lines)
    m = metrics.collect()
    assert len(m) >= 1
    assert sum(r["pages"] for r in m) == media.count()
    assert all(r["wall_ms"] >= 0 and r["partition_id"] >= 0 for r in m)
    # data rows are unaffected by the sentinel
    assert data.filter(F.col("media_ref").startswith("__")).count() == 0


def test_incremental_streaming_matches_batch(spark, small_tables, tmp_path):
    from manuscript_ocr_spark.pipeline import extract_spans
    from manuscript_ocr_spark.streaming import run_incremental_extraction

    docs, media = small_tables
    docs_dir = str(tmp_path / "docs_stream")
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "stream_ckpt")

    half1 = docs.filter(F.col("doc_id") < "doc-000030")
    half2 = docs.filter(F.col("doc_id") >= "doc-000030")

    # first arrival + drain
    half1.write.mode("append").parquet(docs_dir)
    run_incremental_extraction(spark, docs_dir, media, out_dir, ckpt)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == half1.count()

    # second arrival: only the NEW files are processed (exactly-once)
    half2.write.mode("append").parquet(docs_dir)
    run_incremental_extraction(spark, docs_dir, media, out_dir, ckpt)
    got = _spans_key(spark.read.parquet(out_dir).collect())
    want = _spans_key(extract_spans(docs, media).collect())
    assert got == want


def test_windowed_event_counts_batch(spark):
    from manuscript_ocr_spark.streaming import windowed_event_counts

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = windowed_event_counts(events).collect()
    assert len(out) > 0
    total = sum(r["n"] for r in out)
    assert total == events.count()
