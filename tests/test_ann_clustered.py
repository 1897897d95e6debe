"""Clustered-fixture ANN recall (round-5 verdict item 7): the testdata
embeddings are i.i.d. random — in 64-d, near-equidistant — so coverage
recall there is the coarse quantizer's FLOOR, not its operating point.
This pins the operating point on a Gaussian-mixture fixture with real
cluster structure: at the default nprobe=2 the trained coarse stage covers
(essentially) ALL true neighbors, justifying the default; the random floor
stays measurably lower (the documented caveat, now quantified in-repo).
Curve tool: tools/ann_recall_curve.py; table in SURVEY §12."""

import sys

sys.path.insert(0, "/root/repo/tools")


def test_clustered_coverage_recall_at_default_nprobe(spark):
    from ann_recall_curve import coverage_curve

    from manuscript_ocr_spark.fixtures import ensure_clustered_embeddings
    from manuscript_ocr_spark.functions.similarity import IVF_NPROBE

    clustered = ensure_clustered_embeddings()
    curve, nq, ncells = coverage_curve(spark, clustered)
    assert nq >= 50 and ncells > IVF_NPROBE
    # the operating point: on clustered data the default nprobe covers the
    # exact top-10 almost completely (measured 1.000 at build time)
    assert curve[IVF_NPROBE] >= 0.95, curve
    # and the curve is monotone in nprobe
    ps = sorted(curve)
    assert all(curve[a] <= curve[b] + 1e-9 for a, b in zip(ps, ps[1:]))


def test_clustered_fixture_deterministic(tmp_path):
    """Two materializations produce byte-identical parquet content
    (fixed-seed RandomState; regeneration can never silently shift the
    measured curve)."""
    import duckdb

    from manuscript_ocr_spark.fixtures import ensure_clustered_embeddings

    d1 = ensure_clustered_embeddings(base_dir=str(tmp_path / "a"))
    d2 = ensure_clustered_embeddings(base_dir=str(tmp_path / "b"))
    h = [
        duckdb.sql(
            f"SELECT count(*), sum(vec_id), "
            f"sum(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) "
            f"FROM '{d}/embeddings.parquet'"
        ).fetchall()[0]
        for d in (d1, d2)
    ]
    assert h[0] == h[1] and h[0][0] == 2000


def test_clustered_end_to_end_pq_recall(spark):
    """Full-system operating point: IVF-PQ search (trained coarse stage +
    5-bit residual codes + ADC ranking, default nprobe) on the clustered
    tier must recover most of the exact cosine top-10 — coverage was
    measured at 1.000 here, so what this pins is the PQ quantization loss
    at the operating point, end to end through the materialized index."""
    from manuscript_ocr_spark.fixtures import ensure_clustered_embeddings
    from manuscript_ocr_spark.functions.similarity import (
        TOPK,
        cosine_topk,
        ivfpq_build,
        ivfpq_search,
    )

    d = ensure_clustered_embeddings()
    idx = ivfpq_build(spark, d)
    exact = {r["vec_id"] for r in cosine_topk(spark, d).collect()}
    got = {r["vec_id"] for r in ivfpq_search(spark, d, idx).collect()}
    recall = len(exact & got) / TOPK
    assert recall >= 0.7, f"clustered end-to-end PQ recall: {recall}"
