"""Distributed BPE merge learning: the Spark trainer must agree with
BOTH the unrolled-CTE DuckDB mirror and an independent pure-Python
Sennrich learner whose merge application is a literal symbol-LIST scan
(a different primitive from the engines' terminator-encoded replace —
the three-way agreement is only meaningful because the Python twin does
NOT share the replace device)."""

import re

import duckdb
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.01"


def _scan_merge(syms, l, r):
    """Greedy left-to-right non-overlapping merge of (l, r) over a
    symbol list — textbook Sennrich semantics, the independent ground
    truth the engines' replace encoding must reproduce."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _python_bpe(n_merges):
    """Classic Sennrich BPE over the same whitespace-token frequency
    table, recomputed from the raw parquet with Python's own regex and
    a symbol-list scan — no Spark, no DuckDB, no str.replace."""
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    freqs = {}
    for t in tbl["text"].to_pylist():
        if t is None or not t.strip():
            continue
        for w in re.split(r"\s+", t.strip()):
            if w and "\x1e" not in w:
                freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for i in range(n_merges):
        counts = {}
        for w, f in freqs.items():
            syms = seqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, l, r, c))
        seqs = {w: _scan_merge(s, l, r) for w, s in seqs.items()}
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


def test_merge_application_is_greedy_across_engines(spark):
    """The terminator-encoded replace must equal the greedy symbol-list
    scan in Spark AND DuckDB on the order-sensitive shapes (runs of a
    repeated symbol, back-to-back distinct pairs — the round-6 ADVICE
    divergence cases), plus a fuzz sweep."""
    import random

    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.text import (
        _BPE_APPLY_SQL,
        _bpe_apply_merge_expr,
        _bpe_pat_rep,
    )

    rng = random.Random(7)
    alphabet = ["a", "b", "ab", "aa", "c", "</w>"]
    cases = [
        (["a", "b", "a", "b"], "a", "b"),          # back-to-back pair
        (["a", "a", "a", "a"], "a", "a"),          # even run
        (["a", "a", "a", "a", "a"], "a", "a"),     # odd run ≥5 (the
        #                                            fixpoint-replace trap)
        (["a", "a", "a"], "a", "a"),
        (["a", "b", "a", "b", "a", "b"], "a", "b"),
    ] + [
        ([rng.choice(alphabet) for _ in range(rng.randint(1, 9))],
         rng.choice(alphabet), rng.choice(alphabet))
        for _ in range(40)
    ]
    con = duckdb.connect()
    rows, exprs = [], []
    for i, (syms, l, r) in enumerate(cases):
        s = " ".join(syms)
        want = " ".join(_scan_merge(syms, l, r))
        pat, rep = _bpe_pat_rep(l, r)
        duck = con.execute(
            "SELECT " + _BPE_APPLY_SQL.format(sym="?", pat="?", rep="?"),
            [s, pat, rep]).fetchone()[0]
        assert duck == want, (syms, l, r)
        rows.append((i, s, want))
        exprs.append((i, pat, rep))
    df = spark.createDataFrame(rows, "i int, s string, want string")
    # each case's (pat, rep) is a literal pair, so route every row to its
    # own applied expression via one coalesce(when...) — a single job
    merged = F.coalesce(*[
        F.when(F.col("i") == i,
               _bpe_apply_merge_expr(F.col("s"), pat, rep))
        for i, pat, rep in exprs
    ])
    for r in df.select("i", merged.alias("got"), "want").collect():
        assert r["got"] == r["want"], cases[r["i"]]


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
        words = [w for w in re.split(r"\s+", (t or "").strip())
                 if w and "\x1e" not in w]
        docs.append((d, words))
        for w in words:
            freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}
    for _, l, r, _ in _python_bpe(24):
        seqs = {w: _scan_merge(s, l, r) for w, s in seqs.items()}
    n_sub = {w: len(s) for w, s in seqs.items()}
    for d, words in docs:
        if not words:
            continue
        assert sp[d] == (len(words), sum(n_sub[w] for w in words)), d
    # subword segmentation is real: compression strictly below the
    # character count and at or above the word count
    assert all(w <= s for w, s in sp.values())


def _python_bpe_from_texts(texts, max_merges):
    """The pure-Python scan-based learner over arbitrary texts; stops at
    pair exhaustion and returns the (possibly shorter) merge list."""
    freqs = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w and "\x1e" not in w:
                freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for i in range(max_merges):
        counts = {}
        for w, f in freqs.items():
            syms = seqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (l, r), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((i + 1, l, r, c))
        seqs = {w: _scan_merge(s, l, r) for w, s in seqs.items()}
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


def _python_bpe_batched(texts, n_rounds, top_k):
    """Independent Python twin of the BATCHED trainer contract: per
    round, rank pairs, pool the top_k, keep candidates symbol-disjoint
    from every higher-ranked pool member (symbols = {lhs, rhs, lhs+rhs}),
    apply kept merges with the scan merger. Re-implemented here, not
    imported, so the test is a real second opinion."""
    freqs = {}
    for t in texts:
        for w in re.split(r"\s+", t.strip()):
            if w and "\x1e" not in w:
                freqs[w] = freqs.get(w, 0) + 1
    seqs = {w: list(w) + ["</w>"] for w in freqs}
    merges = []
    for rnd in range(1, n_rounds + 1):
        counts = {}
        for w, f in freqs.items():
            syms = seqs[w]
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        pool = [(l, r, c) for (l, r), c in
                sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]]
        sel = []
        for i, (l, r, c) in enumerate(pool):
            syms = {l, r, l + r}
            if all(not ({pl, pr, pl + pr} & syms)
                   for pl, pr, _ in pool[:i]):
                sel.append((l, r, c))
        for j, (l, r, c) in enumerate(sel, start=1):
            merges.append((len(merges) + 1, rnd, j, l, r, c))
        for l, r, _ in sel:
            seqs = {w: _scan_merge(s, l, r) for w, s in seqs.items()}
    return merges


def test_bpe_batched_matches_duckdb_and_python(spark):
    """The batched trainer must agree with BOTH its unrolled-CTE DuckDB
    mirror and the independent Python twin at the registry defaults, and
    must actually batch (some round selects more than one merge on the
    fixture corpus)."""
    from manuscript_ocr_spark.functions.text import (
        BPE_BATCHED_SQL,
        bpe_learn_merges_batched,
    )

    sp = [tuple(r) for r in
          bpe_learn_merges_batched(spark, SF).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = [tuple(r) for r in con.execute(BPE_BATCHED_SQL).fetchall()]
    assert sp == ora
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    texts = [t for t in tbl["text"].to_pylist() if t and t.strip()]
    assert sp == _python_bpe_batched(texts, 6, 4)
    rounds = {}
    for _, rnd, _, _, _, _ in sp:
        rounds[rnd] = rounds.get(rnd, 0) + 1
    assert max(rounds.values()) > 1, rounds  # batching is real


def test_bpe_batched_topk1_equals_sequential(spark):
    """top_k=1 degenerates the batched contract to exact sequential
    Sennrich BPE: same pairs, same counts, same order."""
    from manuscript_ocr_spark.functions.text import (
        bpe_learn_merges,
        bpe_learn_merges_batched,
    )

    n = 6
    seq = [(r["merge_idx"], r["lhs"], r["rhs"], r["pair_count"])
           for r in bpe_learn_merges(spark, SF, n_merges=n).collect()]
    bat = [(r["merge_idx"], r["lhs"], r["rhs"], r["pair_count"])
           for r in bpe_learn_merges_batched(
               spark, SF, n_rounds=n, top_k=1).collect()]
    assert bat == seq


def test_bpe_vocab_closure_and_layout(spark):
    """The emitted vocabulary must (a) match the DuckDB mirror, (b) be
    CLOSED over the trained word table — every symbol a tokenization of
    any corpus word produces has an id — and (c) follow the id layout:
    codepoint-ordered alphabet first, then merge outputs in merge
    order."""
    from manuscript_ocr_spark.functions.text import (
        BPE_VOCAB_SQL,
        _bpe_train,
        bpe_vocab,
    )

    sp = [tuple(r) for r in bpe_vocab(spark, SF).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    ora = sorted(con.execute(BPE_VOCAB_SQL).fetchall())
    assert sorted(sp) == ora

    ids = {t: i for i, t, _, _ in sp}
    assert len(ids) == len(sp)  # tokens unique, ids unique
    alpha = [t for _, t, s, _ in sp if s == "alphabet"]
    assert alpha == sorted(alpha)  # codepoint order
    assert "</w>" in ids
    merge_rows = [(mi, t) for _, t, s, mi in sp if s == "merge"]
    assert merge_rows == sorted(merge_rows)  # merge order, keep-first

    # closure: every symbol of the final trained vocab table has an id
    _, words = _bpe_train(spark, SF, 24)
    from pyspark.sql import functions as F

    syms = {r["s"] for r in words.select(
        F.explode(F.split("symseq", " ")).alias("s")).distinct().collect()}
    assert syms <= set(ids), syms - set(ids)


if _HAS_HYP:
    @settings(max_examples=4, deadline=None)
    @given(_corpus)
    def test_bpe_batched_property_three_way_equivalence(spark, texts):
        """Property: on ARBITRARY small corpora the batched trainer, its
        unrolled-CTE mirror, and the independent Python twin produce the
        identical (round, sel_rank, merge) table — including rounds that
        select nothing (pair exhaustion passes the vocab through in all
        three engines)."""
        import pandas as pd

        from manuscript_ocr_spark.functions.text import (
            _bpe_batched_sql,
            bpe_learn_merges_batched,
        )

        n_rounds, top_k = 2, 2
        want = _python_bpe_batched(texts, n_rounds, top_k)
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        got = [tuple(r) for r in bpe_learn_merges_batched(
            spark, None, n_rounds=n_rounds, top_k=top_k,
            docs=docs).collect()]
        assert got == want
        con = duckdb.connect()
        con.register("documents", pd.DataFrame({
            "doc_id": range(len(texts)), "text": texts}))
        ora = [tuple(r) for r in
               con.execute(_bpe_batched_sql(n_rounds, top_k)).fetchall()]
        assert ora == want


def test_bpe_build_idempotent_and_keyed(spark, tmp_path):
    """The materialized training artifact follows the ANN index
    contract: second call is a no-op read, and the tier key carries the
    corpus fingerprint so a different corpus keys a different dir."""
    import os

    from manuscript_ocr_spark.functions.text import bpe_build

    idx = bpe_build(spark, SF, base_dir=str(tmp_path))
    marker = os.path.join(idx, "merges.parquet", "_SUCCESS")
    mtime = os.path.getmtime(marker)
    assert bpe_build(spark, SF, base_dir=str(tmp_path)) == idx
    assert os.path.getmtime(marker) == mtime  # no rewrite

    from manuscript_ocr_spark.functions.similarity import _ann_index_dir

    other = _ann_index_dir("/elsewhere/sf0.01", "bpe-x",
                           data_file="documents.parquet")
    assert os.path.basename(other) != os.path.basename(idx)


def test_bpe_encode_consistent_with_tokenize_and_vocab(spark):
    """The id stream must be internally consistent: per doc, the number
    of encoded tokens equals tokenize's n_subwords, positions are a
    dense 0..n-1 sequence, and decoding ids through the vocab
    reconstructs each document's exact subword token sequence."""
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.text import (
        bpe_encode,
        bpe_tokenize_stats,
        bpe_vocab,
    )

    enc = bpe_encode(spark, SF)
    per_doc = {int(r["doc_id"]): (int(r["n"]), int(r["mx"]))
               for r in enc.groupBy("doc_id").agg(
                   F.count("*").alias("n"), F.max("pos").alias("mx"))
               .collect()}
    stats = {int(r["doc_id"]): int(r["n_subwords"])
             for r in bpe_tokenize_stats(spark, SF).collect()}
    assert set(per_doc) == set(stats)
    for d, (n, mx) in per_doc.items():
        assert n == stats[d] and mx == n - 1, d

    # decode one doc end-to-end via the vocab and compare to the
    # Python-learner tokenization
    id2tok = {int(r["token_id"]): r["token"]
              for r in bpe_vocab(spark, SF).collect()}
    d0 = min(per_doc)
    got = [id2tok[int(r["token_id"])] for r in
           enc.filter(F.col("doc_id") == d0).orderBy("pos").collect()]
    tbl = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"])
    text = dict(zip(tbl["doc_id"].to_pylist(),
                    tbl["text"].to_pylist()))[d0]
    words = [w for w in re.split(r"\s+", text.strip())
             if w and "\x1e" not in w]
    seqs = {w: list(w) + ["</w>"] for w in set(words)}
    for _, l, r, _ in _python_bpe(24):
        seqs = {w: _scan_merge(s, l, r) for w, s in seqs.items()}
    want = [tok for w in words for tok in seqs[w]]
    assert got == want


def test_bpe_pack_stats_invariants(spark):
    """Packing accounting: chunk sizes are seq_len except each doc's
    final chunk, pads only on final chunks, chunk indices dense from 0,
    and totals reconcile with tokenize's per-doc subword counts."""
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.text import (
        BPE_SEQ_LEN,
        bpe_pack_stats,
        bpe_tokenize_stats,
    )

    rows = bpe_pack_stats(spark, SF).collect()
    stats = {int(r["doc_id"]): int(r["n_subwords"])
             for r in bpe_tokenize_stats(spark, SF).collect()}
    by_doc = {}
    for r in rows:
        assert int(r["n_tokens"]) + int(r["n_pad"]) == BPE_SEQ_LEN
        by_doc.setdefault(int(r["doc_id"]), {})[int(r["chunk_idx"])] = (
            int(r["n_tokens"]))
    assert set(by_doc) == set(stats)
    for d, chunks in by_doc.items():
        idxs = sorted(chunks)
        assert idxs == list(range(len(idxs))), d  # dense from 0
        assert sum(chunks.values()) == stats[d], d
        for i in idxs[:-1]:
            assert chunks[i] == BPE_SEQ_LEN, (d, i)  # only last is short
