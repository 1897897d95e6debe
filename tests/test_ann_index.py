"""Materialized ANN index build/search split (round-4 verdict item 2):
build once to parquet, search scans the index — idempotent, deterministic,
partition-pruned to the probed cells, and keyed by build constants so a
constant change can never reuse a stale index."""

import os
import shutil

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def pq_index(spark):
    from manuscript_ocr_spark.functions.similarity import ivfpq_build

    return ivfpq_build(spark, SF)


def test_ivfpq_build_is_idempotent(spark, pq_index):
    from manuscript_ocr_spark.functions.similarity import ivfpq_build

    marker = os.path.join(pq_index, "codes.parquet", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    assert ivfpq_build(spark, SF) == pq_index
    assert os.path.getmtime(marker) == mtime  # no rewrite


def test_ivfpq_rebuild_bit_identical(spark, pq_index):
    from manuscript_ocr_spark.functions.similarity import (
        ivfpq_build,
        ivfpq_search,
    )

    before = [tuple(r) for r in ivfpq_search(spark, SF, pq_index).collect()]
    rebuilt = ivfpq_build(spark, SF, force=True)
    after = [tuple(r) for r in ivfpq_search(spark, SF, rebuilt).collect()]
    assert before == after  # exact-integer training → deterministic index


def test_ivfpq_search_prunes_to_probed_cells(spark, pq_index):
    from manuscript_ocr_spark.functions.similarity import ivfpq_search
    from manuscript_ocr_spark.plans import explain_str, scans

    df = ivfpq_search(spark, SF, pq_index)
    code_scans = [s for s in scans(df) if "codes.parquet" in s["location"]]
    assert code_scans
    # the cell predicate must be a PARTITION filter on the codes scan (the
    # 10^12-row win), not a post-scan filter
    text = explain_str(df, "formatted")
    assert "PartitionFilters" in text
    import re

    m = re.search(r"codes\.parquet.*?PartitionFilters: \[([^\]]*)\]", text, re.S)
    assert m and "cell" in m.group(1), text[:2000]


def test_index_dir_keys_on_constants(spark):
    from manuscript_ocr_spark.functions import similarity as S

    d1 = S._ivfpq_index_dir(SF)
    assert f"M{S.PQ_M}" in d1 and f"K{S.PQ_K}" in d1 and S.PQ_INDEX_VERSION in d1
    assert os.path.basename(d1) == "sf0.01"  # tier-scoped


def test_ivf_kmeans_split_matches_singleshot(spark):
    """Search over the materialized k-means index returns exactly what the
    (previously per-call-trained) chain returns — the DuckDB oracle for
    sim_ivf_kmeans_topk is unchanged, so equality with it is covered by the
    registry gate; here: idempotence + determinism of the split itself."""
    from manuscript_ocr_spark.functions.similarity import (
        ivf_kmeans_build,
        ivf_kmeans_search,
        ivf_kmeans_topk,
    )

    idx = ivf_kmeans_build(spark, SF)
    a = [tuple(r) for r in ivf_kmeans_search(spark, SF, idx).collect()]
    b = [tuple(r) for r in ivf_kmeans_topk(spark, SF).collect()]
    assert a == b and len(a) > 0
