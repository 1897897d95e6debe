"""Distributed BPE merge learning (round-7 registry candidate, tested
today): the Spark trainer must agree with BOTH the unrolled-CTE DuckDB
mirror and an independent pure-Python BPE learner, and the three
engines' replace primitives must share left-to-right non-overlapping
semantics (the merge-application contract)."""

import re

import duckdb
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _python_bpe(n_merges):
    """Classic Sennrich BPE over the same whitespace-token frequency
    table, recomputed from the raw parquet with Python's own regex and
    str.replace — no Spark, no DuckDB."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    freqs = {}
    for t in tbl["text"].to_pylist():
        if t is None or not t.strip():
            continue
        for w in re.split(r"\s+", t.strip()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: " ".join(list(w)) + " </w>" for w in freqs}
    merges = []
    for i in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, l, r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        seqs = {w: (" " + s + " ").replace(pat, rep).strip()
                for w, s in seqs.items()}
    return merges


def test_bpe_merges_match_duckdb_and_python(spark):
    from manuscript_ocr_spark.functions.text import (
        BPE_MERGES_SQL,
        bpe_learn_merges,
    )

    sp = [tuple(r) for r in bpe_learn_merges(spark, SF).collect()]
    assert len(sp) == 24
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = [tuple(r) for r in con.execute(BPE_MERGES_SQL).fetchall()]
    assert sp == ora
    assert sp == _python_bpe(24)
    # the learned table is a real merge sequence: multi-char subwords
    # appear as merge inputs in later iterations
    assert any(len(l) > 1 or len(r.replace("</w>", "x")) > 1
               for _, l, r, _ in sp[8:])


def test_replace_semantics_agree_across_engines(spark):
    """Merge application is left-to-right NON-OVERLAPPING replace; on a
    run of repeated symbols the three engines must collapse the same
    occurrences (' a a a a ' merging (a,a) → ' aa a a ': the scan
    resumes after the replacement, so the overlapping second match is
    skipped)."""
    from pyspark.sql import functions as F

    s, pat, rep = " a a a a ", " a a ", " aa "
    py = s.replace(pat, rep)
    duck = duckdb.connect().execute(
        "SELECT replace(?, ?, ?)", [s, pat, rep]).fetchone()[0]
    spark_v = spark.range(1).select(
        F.replace(F.lit(s), F.lit(pat), F.lit(rep)).alias("r")
    ).collect()[0]["r"]
    assert py == duck == spark_v == " aa a a "


def test_bpe_tokenize_stats_matches_duckdb_and_python(spark):
    """Applying the learned merges: per-doc subword counts must agree
    with the mirror (which reuses the training chain's final vocab CTE —
    training and application must BOTH match for this to pass) and with
    a pure-Python tokenization over the Python learner's final
    sequences."""
    from manuscript_ocr_spark.functions.text import (
        BPE_TOKENIZE_SQL,
        bpe_tokenize_stats,
    )

    sp = {int(r["doc_id"]): (int(r["n_words"]), int(r["n_subwords"]))
          for r in bpe_tokenize_stats(spark, SF).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = {int(d): (int(w), int(s)) for d, w, s in
           con.execute(BPE_TOKENIZE_SQL).fetchall()}
    assert sp == ora and len(sp) == 500

    # independent Python tokenization: rebuild final sequences with the
    # Python learner, then count per doc
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    freqs = {}
    docs = []
    for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
        words = [w for w in re.split(r"\s+", (t or "").strip()) if w]
        docs.append((d, words))
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: " ".join(list(w)) + " </w>" for w in freqs}
    for _, l, r, _ in _python_bpe(24):
        pat, rep = f" {l} {r} ", f" {l}{r} "
        seqs = {w: (" " + s + " ").replace(pat, rep).strip()
                for w, s in seqs.items()}
    n_sub = {w: len(s.split(" ")) for w, s in seqs.items()}
    for d, words in docs:
        if not words:
            continue
        assert sp[d] == (len(words), sum(n_sub[w] for w in words)), d
    # subword segmentation is real: compression strictly below the
    # character count and at or above the word count
    assert all(w <= s for w, s in sp.values())


def _python_bpe_from_texts(texts, max_merges):
    """The pure-Python learner over arbitrary texts; stops at pair
    exhaustion and returns the (possibly shorter) merge list."""
    freqs = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: " ".join(list(w)) + " </w>" for w in freqs}
    merges = []
    for i in range(max_merges):
        counts = {}
        for w, f in freqs.items():
            syms = seqs[w].split(" ")
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, l, r, c))
        pat, rep = f" {l} {r} ", f" {l}{r} "
        seqs = {w: (" " + s + " ").replace(pat, rep).strip()
                for w, s in seqs.items()}
    return merges


try:
    from hypothesis import given, settings, strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False


if _HAS_HYP:
    _word = st.text(alphabet="abé.0", min_size=1, max_size=6)
    _corpus = st.lists(
        st.lists(_word, min_size=1, max_size=12).map(" ".join),
        min_size=1, max_size=4,
    )

    @settings(max_examples=6, deadline=None)
    @given(_corpus)
    def test_bpe_property_three_way_equivalence(spark, texts):
        """Property: on ARBITRARY small corpora (repeated symbols,
        multi-byte chars, punctuation, heavy count ties) the Spark
        trainer, the DuckDB mirror, and the Python learner produce the
        identical merge sequence — including identical early exhaustion.
        Stresses the tie-break total order and the non-overlapping
        replace across all three engines."""
        import pandas as pd

        from manuscript_ocr_spark.functions.text import (
            _bpe_merges_sql,
            bpe_learn_merges,
        )

        want = _python_bpe_from_texts(texts, 4)
        m = len(want)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        if m == 0:
            with pytest.raises(ValueError, match="exhausted"):
                bpe_learn_merges(spark, None, n_merges=1, docs=docs)
            return
        got = [tuple(r) for r in
               bpe_learn_merges(spark, None, n_merges=m, docs=docs).collect()]
        assert got == want
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({
            "doc_id": range(len(texts)), "text": texts}))
        ora = [tuple(r) for r in con.execute(_bpe_merges_sql(m)).fetchall()]
        assert ora == want
        # exhaustion parity: one more merge than exists must raise
        if len(_python_bpe_from_texts(texts, m + 1)) == m:
            with pytest.raises(ValueError, match="exhausted"):
                bpe_learn_merges(spark, None, n_merges=m + 1, docs=docs)
