"""Round-3 verdict/advice items, pinned by tests:

- dangling media refs: extract_spans omits the span (doc's other spans still
  emit) and ocr_dangling_refs counts exactly what was dropped.
- registry laziness: enumerating queries() must not materialize fixtures.
- cache hygiene: composing dedup queries leaves no persisted RDDs behind.
- long-chain components: a path graph of diameter ≥ 12 converges with real
  lineage truncation (localCheckpoint), not a 12-join-deep plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from manuscript_ocr_spark.fixtures import ensure_tier
from manuscript_ocr_spark.models.east_tiny import DetectorConfig
from manuscript_ocr_spark.fixtures import PAGE_SIZE


@pytest.fixture(scope="module")
def spark():
    from manuscript_ocr_spark.session import get_spark

    s = get_spark(master="local[4]", app_name="round3-tests")
    yield s


@pytest.fixture(scope="module")
def fixture_dir():
    return ensure_tier("sf-small")


def test_dangling_refs_omitted_not_fatal(spark, fixture_dir):
    """A media span whose ref has no media row is dropped; the doc's other
    spans match the single-process oracle run on the dangling-free spans."""
    from manuscript_ocr_spark.pipeline import extract_spans

    docs = spark.read.parquet(f"{fixture_dir}/docs_dangling.parquet")
    media = spark.read.parquet(f"{fixture_dir}/media.parquet")
    out = {
        r["doc_id"]: [s.asDict() for s in r["spans"]]
        for r in extract_spans(docs, media, cfg=DetectorConfig(target_size=PAGE_SIZE)).collect()
    }

    # oracle on the same docs with dangling spans removed
    import pyarrow.parquet as pq
    from manuscript_ocr_spark.models.glyphs import build_weights
    from manuscript_ocr_spark.oracle import decode_media, doc_to_spans

    media_tbl = pq.read_table(f"{fixture_dir}/media.parquet").to_pylist()
    media_pixels = {
        m["media_ref"]: decode_media(
            m["pixels"], m["height"], m["width"], m["channels"]
        )
        for m in media_tbl
    }
    weights = build_weights()
    cfg = DetectorConfig(target_size=PAGE_SIZE)
    dang = pq.read_table(f"{fixture_dir}/docs_dangling.parquet").to_pylist()
    n_dangling_spans = 0
    cache = {}
    for d in dang:
        kept, dropped = [], 0
        for s in d["spans"]:
            if s["kind"] == "media" and s["media_ref"] not in media_pixels:
                dropped += 1
            else:
                kept.append(s)
        n_dangling_spans += dropped
        expected = doc_to_spans(kept, media_pixels, weights, cfg, page_cache=cache)
        assert out[d["doc_id"]] == expected, d["doc_id"]
    assert n_dangling_spans >= 12  # every dangling doc drops ≥ 1 span

    # the audit query accounts for exactly the dropped spans
    from manuscript_ocr_spark.functions.ocr import dangling_refs

    audit = dangling_refs(spark, fixture_dir).collect()
    assert sum(r["n_spans"] for r in audit) == n_dangling_spans
    assert all(r["media_ref"] not in media_pixels for r in audit)


def test_dedup_composition_leaves_no_cached_rdds(spark):
    """Composing components + keep_list + jaccard_verify in one session must
    leave executor storage empty (VERDICT r3 item #3: builders may persist
    only what they release before returning)."""
    from manuscript_ocr_spark.functions.dedup import (
        dedup_components,
        dedup_keep_list,
        jaccard_verify_pairs,
    )

    sc = spark.sparkContext._jsc.sc()
    # getOrCreate shares the suite-wide session: measure THIS composition's
    # delta (a fresh session runs this at 0 == 0; see standalone run)
    before = sc.getPersistentRDDs().size()
    sf = "/root/testdata/sf0.001"
    dedup_components(spark, sf).collect()
    dedup_keep_list(spark, sf).collect()
    jaccard_verify_pairs(spark, sf).collect()
    after = sc.getPersistentRDDs().size()
    assert after == before, f"dedup composition leaked {after - before} cached RDDs"


def test_long_chain_components_converge_with_bounded_plans(spark, tmp_path):
    """Path graph of diameter 15 (> 3 checkpoint windows): min-label
    propagation converges, every node lands in the root component, and the
    returned frame is a parquet scan (no join chain, no cached state)."""
    from manuscript_ocr_spark.functions.dedup import _cc_propagate

    n = 16
    docs = spark.createDataFrame([(f"n{i:02d}",) for i in range(n)], ["doc_id"])
    edges = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n - 1)],
        ["doc_a", "doc_b"],
    )
    before = spark.sparkContext._jsc.sc().getPersistentRDDs().size()
    labels = _cc_propagate(spark, docs, edges, checkpoint_dir=str(tmp_path))
    rows = labels.collect()
    assert len(rows) == n
    assert all(r["label"] == "n00" for r in rows)
    # lineage truly truncated: the result plan is a file scan, not 15 joins
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        labels.explain("simple")
    text = buf.getvalue()
    assert "Join" not in text and "parquet" in text.lower()
    # getOrCreate shares the suite session: assert THIS call's delta is zero
    assert spark.sparkContext._jsc.sc().getPersistentRDDs().size() == before


def test_stratified_sample_scale_path(spark):
    """The scale path (threshold prefilter + bounded window) must equal the
    window form bit-for-bit, and its plan must filter BEFORE the Window —
    never a per-stratum sort of the full table (VERDICT r3 item #4)."""
    import io
    from contextlib import redirect_stdout

    from manuscript_ocr_spark.functions.text import (
        _stratified_window_form,
        stratified_sample,
    )

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        got = sorted(
            tuple(r) for r in stratified_sample(spark, sf).collect()
        )
        want = sorted(
            tuple(r) for r in _stratified_window_form(docs).collect()
        )
        assert got == want and len(got) > 0

    q = stratified_sample(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    # the Window's input is the prefiltered scan: the md5-prefix filter is
    # in the plan, below (after, in formatted order) the Window node
    assert "Window" in plan and "substring" in plan
    w_pos = plan.index("Window")
    f_pos = plan.index("substring")
    assert f_pos > w_pos  # formatted output lists children after parents


def test_stratified_sample_widen_retry_path(spark, monkeypatch):
    """Exactness is guaranteed by the verify-and-widen loop, not by the
    md5-uniformity assumption: force a pathologically small initial
    oversample so the first threshold keeps too few rows, and assert the
    retry still converges to the exact window-form output."""
    import manuscript_ocr_spark.functions.text as t

    monkeypatch.setattr(t, "SAMPLE_OVERSAMPLE", 0.05)
    sf = "/root/testdata/sf0.001"
    got = sorted(tuple(r) for r in t.stratified_sample(spark, sf).collect())
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    want = sorted(tuple(r) for r in t._stratified_window_form(docs).collect())
    assert got == want and len(got) > 0


def test_file_directory_ingestion_matches_table_path(spark, fixture_dir, tmp_path):
    """S3 closure: pages living as FILES (binaryFile scan + filename-encoded
    dims) must extract identically to the parquet media table — the
    reference's file-index predict loop, columnar. Raw planes only (codec
    decode is the documented env stub); 12 pages exercised end to end."""
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.pipeline import extract_spans
    from manuscript_ocr_spark.sources import media_from_raw_files

    media_rows = pq.read_table(f"{fixture_dir}/media.parquet").to_pylist()[:12]
    img_dir = tmp_path / "pages"
    img_dir.mkdir()
    refs = set()
    for m in media_rows:
        name = f"{m['media_ref']}_{m['width']}x{m['height']}x{m['channels']}.gray"
        (img_dir / name).write_bytes(m["pixels"])
        refs.add(m["media_ref"])

    from pyspark.sql import functions as F

    file_media = media_from_raw_files(spark, str(img_dir))
    got_rows = {
        r["media_ref"]: (r["width"], r["height"], r["channels"], bytes(r["pixels"]))
        for r in file_media.collect()
    }
    assert set(got_rows) == refs
    for m in media_rows:
        assert got_rows[m["media_ref"]] == (
            m["width"], m["height"], m["channels"], m["pixels"]
        )

    # end-to-end: extraction over file-backed media == table-backed media,
    # on docs whose media spans all live in the file subset
    docs = spark.read.parquet(f"{fixture_dir}/docs.parquet")
    ok_docs = docs.filter(
        F.forall(
            "spans",
            lambda s: (s["kind"] != "media") | s["media_ref"].isin(list(refs)),
        )
    ).limit(25)
    table_media = spark.read.parquet(f"{fixture_dir}/media.parquet")
    cfg = DetectorConfig(target_size=PAGE_SIZE)
    a = {r["doc_id"]: r["spans"] for r in extract_spans(ok_docs, file_media, cfg=cfg).collect()}
    b = {r["doc_id"]: r["spans"] for r in extract_spans(ok_docs, table_media, cfg=cfg).collect()}
    assert len(a) > 0 and a == b


def test_lsh_hot_bucket_cap(spark, tmp_path):
    """The opt-in max_bucket_size guard drops degenerate buckets (one hot
    band value shared by k docs would emit k²/2 pairs at corpus scale)
    without touching pairs from healthy buckets — and the default (None)
    keeps the exact oracle-mirrored semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from manuscript_ocr_spark.functions.dedup import minhash_lsh_pairs

    # 30 identical "template" docs (one hot bucket) + 2 genuine near-dups
    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, base, "en", "src0", len(base)) for i in range(30)]
    near = "a manuscript page holds many lines of careful writing every day"
    docs += [(100, near, "en", "src0", len(near)),
             (101, near + " x", "en", "src0", len(near) + 2)]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": [d[1] for d in docs],
            "lang": [d[2] for d in docs],
            "source": [d[3] for d in docs],
            "n_chars": pa.array([d[4] for d in docs], pa.int64()),
        }
    )
    sf = str(tmp_path)
    pq.write_table(tbl, f"{sf}/documents.parquet")

    full = minhash_lsh_pairs(spark, sf).collect()
    capped = minhash_lsh_pairs(spark, sf, max_bucket_size=10).collect()
    full_pairs = {(r["doc_a"], r["doc_b"]) for r in full}
    capped_pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    # uncapped: the 30-doc clique alone is 435 pairs
    assert len(full_pairs) >= 435 + 1
    # capped: the clique is gone, the genuine near-dup pair survives
    assert capped_pairs == {(100, 101)}


def test_winnowing_overlap_guarantee(spark, tmp_path):
    """Schleimer et al.'s core property: two documents sharing a verbatim
    substring of ≥ k+w−1 chars MUST share at least one winnowing
    fingerprint; unrelated random docs (distinct alphabets) share none."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.text import (
        WINNOW_K,
        WINNOW_W,
        winnowing_fingerprints,
    )

    shared = "the archbishop canonized zygomorphic flowers quickly"
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    docs = [
        (0, "aaaa bbbb cccc " + shared + " dddd eeee"),
        (1, shared + " ffff gggg hhhh iiii jjjj kkkk"),
        (2, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": [d[1] for d in docs],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": pa.array([len(d[1]) for d in docs], pa.int64()),
        }
    )
    pq.write_table(tbl, f"{tmp_path}/documents.parquet")

    # expose the fingerprint SETS (the registered query returns summaries)
    base = winnowing_fingerprints(spark, str(tmp_path))
    # rebuild sets through the same expressions by re-deriving fp
    from manuscript_ocr_spark.functions import text as T

    kg, w = T.WINNOW_K, T.WINNOW_W
    hashes = (
        f"transform(sequence(1, length(text) - {kg - 1}), "
        f"i -> aggregate(sequence(0, {kg - 1}), 0L, "
        f"(acc, j) -> (acc * {T.WINNOW_B} + ascii(substr(text, i + j, 1))) % {T.WINNOW_M}))"
    )
    mins = (
        f"transform(sequence(1, size(hs) - {w - 1}), "
        f"p -> array_min(slice(hs, p, {w})))"
    )
    fps = {
        r["doc_id"]: set(r["fp"])
        for r in spark.read.parquet(f"{tmp_path}/documents.parquet")
        .withColumn("hs", F.expr(hashes))
        .withColumn("fp", F.array_distinct(F.expr(mins)))
        .select("doc_id", "fp")
        .collect()
    }
    assert fps[0] & fps[1], "overlapping docs must share a fingerprint"
    assert not (fps[0] & fps[2]) and not (fps[1] & fps[2])
    assert base.count() == 3


def test_registry_soak_no_cache_growth(spark):
    """Blanket no-leak guarantee: execute EVERY registered query (except the
    OCR pipeline, covered by its own suite) in one session and assert zero
    persistent-RDD delta — catches any future builder that persists without
    releasing. Also a smoke that all 63 queries actually run at sf0.001."""
    import __spark_entry__ as entry

    sc = spark.sparkContext._jsc.sc()
    before = sc.getPersistentRDDs().size()
    qs = entry.queries()
    ran = 0
    for name, builder in sorted(qs.items()):
        if name == "ocr_extract_spans":
            continue
        n = builder(spark, "/root/testdata/sf0.001").count()
        assert n >= 0
        ran += 1
    assert ran >= 60
    assert sc.getPersistentRDDs().size() == before, "a query builder leaked cache"


def test_queries_enumeration_is_lazy(tmp_path, monkeypatch):
    """queries() must not touch fixture tiers (ADVICE r2: lazy SQL entries
    were resolved eagerly). Point the fixture root at an empty dir and
    enumerate — nothing may be written there."""
    import os

    monkeypatch.setenv("MSOCR_FIXTURES_DIR", str(tmp_path))
    import __spark_entry__ as entry

    qs = entry.queries()
    assert "ocr_extract_spans" in qs and "mm_media_decode_stats" in qs
    assert os.listdir(str(tmp_path)) == []
