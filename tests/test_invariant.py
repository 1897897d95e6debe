"""THE invariant test (BASELINE.json north_rule / input_hint):

per-doc span-sequence equality (kind, text, media_ref, order) between the
Spark pipeline's output and the single-process reference-faithful oracle
(expected_spans, produced by oracle.doc_to_spans over the same fixtures) —
array order IS the order, compared element-wise.
"""

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def results(spark, sf_small_dir):
    from manuscript_ocr_spark.pipeline import extract_spans, load_fixture_tables

    docs, media = load_fixture_tables(spark, sf_small_dir)
    out = extract_spans(docs, media)
    rows = {r["doc_id"]: r["spans"] for r in out.collect()}

    expected_tbl = pq.read_table(f"{sf_small_dir}/expected_spans.parquet")
    expected = {
        d: s for d, s in zip(
            expected_tbl["doc_id"].to_pylist(), expected_tbl["spans"].to_pylist()
        )
    }
    return rows, expected


def test_all_docs_present(results):
    rows, expected = results
    assert set(rows) == set(expected)
    assert len(rows) == 200


def test_span_sequence_equality(results):
    rows, expected = results
    mismatches = []
    for doc_id, exp_spans in expected.items():
        got = [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in rows[doc_id]
        ]
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in exp_spans
        ]
        if got != want:
            mismatches.append((doc_id, got, want))
    assert not mismatches, (
        f"{len(mismatches)} docs mismatch; first: {mismatches[0]}"
    )


def test_some_docs_have_ocr_and_text_spans(results):
    # sanity that the fixture actually exercises both paths
    rows, _ = results
    kinds = {s["kind"] for spans in rows.values() for s in spans}
    assert kinds == {"text", "ocr_line"}
    n_spans = sum(len(s) for s in rows.values())
    assert n_spans > 300


def test_empty_doc_possible(results):
    rows, expected = results
    empties = [d for d, s in expected.items() if len(s) == 0]
    for d in empties:
        assert rows[d] == []


def test_invariant_with_custom_min_text_size(spark, sf_small_dir):
    """F2 end-to-end: with min_text_size=40 many words fall below the crop
    floor; Spark and oracle must agree on exactly which spans survive."""
    import numpy as np
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.fixtures import PAGE_SIZE
    from manuscript_ocr_spark.models import DetectorConfig, build_weights
    from manuscript_ocr_spark.oracle import decode_media, doc_to_spans
    from manuscript_ocr_spark.pipeline import extract_spans, load_fixture_tables

    docs, media = load_fixture_tables(spark, sf_small_dir)
    docs = docs.limit(30)
    out = extract_spans(docs, media, min_text_size=40)
    got = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in r["spans"]
        ]
        for r in out.collect()
    }

    weights = build_weights()
    cfg = DetectorConfig(target_size=PAGE_SIZE)
    media_tbl = pq.read_table(f"{sf_small_dir}/media.parquet").to_pylist()
    media_pixels = {
        m["media_ref"]: decode_media(
            m["pixels"], m["height"], m["width"], m["channels"]
        )
        for m in media_tbl
    }
    docs_tbl = pq.read_table(f"{sf_small_dir}/docs.parquet").to_pylist()
    page_cache = {}
    differs_somewhere = False
    default_expected = {
        d: s
        for d, s in zip(
            pq.read_table(f"{sf_small_dir}/expected_spans.parquet")["doc_id"].to_pylist(),
            pq.read_table(f"{sf_small_dir}/expected_spans.parquet")["spans"].to_pylist(),
        )
    }
    for row in docs_tbl[:30]:
        want = [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in doc_to_spans(
                row["spans"], media_pixels, weights, cfg,
                min_text_size=40, page_cache=page_cache,
            )
        ]
        assert got[row["doc_id"]] == want, row["doc_id"]
        default = [
            (s["kind"], s["text"], s["media_ref"], s["offset"], s["seq"])
            for s in default_expected[row["doc_id"]]
        ]
        if want != default:
            differs_somewhere = True
    # the knob must actually change behavior on this fixture
    assert differs_somewhere
