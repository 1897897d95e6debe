"""Model-realistic bench tier (round-4 verdict item #1): the
realistic_bench weights run the DETERMINISTIC stand-in pipeline plus one
calibrated real-architecture numpy EAST forward per page — so extraction
output must be IDENTICAL to the stand-in run, and the broadcast blob must
round-trip the combined weights."""

from __future__ import annotations

import numpy as np


def test_realistic_weights_roundtrip():
    from manuscript_ocr_spark.models.glyphs import (
        deserialize_weights,
        serialize_weights,
    )
    from manuscript_ocr_spark.models.numpy_twins import build_realistic_weights

    w = build_realistic_weights(target_size=128)
    back = deserialize_weights(serialize_weights(w))
    assert back["kind"] == "realistic_bench"
    assert back["bench_target_size"] == 128
    assert back["standin"]["itos"] == w["standin"]["itos"]
    np.testing.assert_array_equal(
        back["east"]["tensors"]["decoder.block1.conv1x1.0.weight"],
        w["east"]["tensors"]["decoder.block1.conv1x1.0.weight"],
    )


def test_realistic_page_output_identical_to_standin():
    from manuscript_ocr_spark.models import DetectorConfig, build_weights
    from manuscript_ocr_spark.models.numpy_twins import build_realistic_weights
    from manuscript_ocr_spark.fixtures import PAGE_SIZE, ensure_tier
    from manuscript_ocr_spark.oracle import decode_media, page_to_line_texts

    import pyarrow.parquet as pq

    tier = ensure_tier("sf-small")
    rows = pq.read_table(f"{tier}/media.parquet").to_pylist()[:5]
    cfg = DetectorConfig(target_size=PAGE_SIZE)
    standin = build_weights()
    realistic = build_realistic_weights(target_size=128)  # small burn for CI
    for m in rows:
        img = decode_media(m["pixels"], m["height"], m["width"], m["channels"])
        a = page_to_line_texts(img, standin, cfg)
        b = page_to_line_texts(img, realistic, cfg)
        assert a == b


def test_realistic_extract_spans_identical(spark):
    from manuscript_ocr_spark.fixtures import ensure_tier
    from manuscript_ocr_spark.models.numpy_twins import build_realistic_weights
    from manuscript_ocr_spark.pipeline import extract_spans, load_fixture_tables

    docs, media = load_fixture_tables(spark, ensure_tier("sf-small"))
    docs = docs.limit(8)

    def spans_of(w):
        out = extract_spans(docs, media, weights=w)
        return {r["doc_id"]: [tuple(s) for s in r["spans"]] for r in out.collect()}

    assert spans_of(None) == spans_of(build_realistic_weights(target_size=128))
