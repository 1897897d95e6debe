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
