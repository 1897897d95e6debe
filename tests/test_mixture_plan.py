"""corpus_mixture_plan (round-7 registry candidate, tested today):
temperature-flattened multinomial source mixing — DuckDB mirror
cross-check plus the closed-form invariants at the degenerate
temperatures."""

import duckdb
import pytest

SF = "/root/testdata/sf0.01"


def _duck(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    return con.execute(sql).fetchdf()


def _rows(df):
    cols = sorted(df.columns)
    return [tuple(r) for r in
            df[cols].sort_values(cols).itertuples(index=False)]


def test_mixture_plan_matches_duckdb(spark):
    from manuscript_ocr_spark.functions.text import (
        MIXTURE_PLAN_SQL,
        corpus_mixture_plan,
    )

    sp = corpus_mixture_plan(spark, SF).toPandas()
    ora = _duck(MIXTURE_PLAN_SQL)
    assert sorted(sp.columns) == sorted(ora.columns)
    assert _rows(sp) == _rows(ora)
    assert len(sp) == 20  # one row per fixture source
    # weights form a distribution (pre-round sum within rounding slack)
    assert abs(sp["weight"].sum() - 1.0) < 2e-5
    assert (sp["sample_rate"] > 0).all()
    assert sp["expected_tokens"].sum() == pytest.approx(20000, abs=20)


def test_mixture_plan_degenerate_temperatures(spark):
    """T=1 is proportional sampling: every source gets the SAME rate
    (target/total) and expected tokens ∝ its size. T=0 is a uniform
    source mix: every weight is exactly 1/K."""
    from manuscript_ocr_spark.functions.text import corpus_mixture_plan

    p1 = corpus_mixture_plan(spark, SF, temperature=1.0).toPandas()
    total = p1["n_tokens"].sum()
    rate = round(20000 / total, 6)
    assert set(p1["sample_rate"]) == {rate}
    for _, r in p1.iterrows():
        assert r["expected_tokens"] == int(
            20000 * (r["n_tokens"] / total) + 0.5)

    p0 = corpus_mixture_plan(spark, SF, temperature=0.0).toPandas()
    assert set(p0["weight"]) == {round(1 / len(p0), 6)}
    # T<1 flattens: the largest source's weight shrinks vs proportional,
    # the smallest grows
    p07 = corpus_mixture_plan(spark, SF).toPandas().set_index("source")
    prop = p1.set_index("source")
    big = prop["n_tokens"].idxmax()
    small = prop["n_tokens"].idxmin()
    assert p07.loc[big, "weight"] < prop.loc[big, "weight"]
    assert p07.loc[small, "weight"] > prop.loc[small, "weight"]


def test_mixture_draw_matches_duckdb_and_composes(spark):
    """The executable sample draw: engine-deterministic (md5 uniform, no
    RNG state), mirror-equal, and composed from the plan's own rates —
    per source, draw count within the Bernoulli envelope of
    rate × n_docs."""
    from manuscript_ocr_spark.functions.text import (
        MIXTURE_DRAW_SQL,
        corpus_mixture_draw,
        corpus_mixture_plan,
    )

    sp = corpus_mixture_draw(spark, SF).toPandas()
    ora = _duck(MIXTURE_DRAW_SQL)
    assert _rows(sp) == _rows(ora) and len(sp) > 0
    # composition: per-source draws ≈ rate·n_docs (fractional Bernoulli,
    # so within the all-or-nothing envelope)
    plan = corpus_mixture_plan(spark, SF).toPandas().set_index("source")
    counts = sp.groupby("source").size()
    for src, row in plan.iterrows():
        expect = row["sample_rate"] * row["n_docs"]
        assert abs(counts.get(src, 0) - expect) <= row["n_docs"]

    # determinism: a second run is identical (no RNG state anywhere)
    again = corpus_mixture_draw(spark, SF).toPandas()
    assert _rows(again) == _rows(sp)


def test_mixture_draw_upsampling_epochs(spark):
    """rate > 1 emits floor(rate) guaranteed epochs per doc plus a
    fractional extra — the low-resource upsampling shape. Forced by a
    target far above the corpus token total; mirror-equal there too."""
    from manuscript_ocr_spark.functions.text import (
        _mixture_draw_sql,
        corpus_mixture_draw,
        corpus_mixture_plan,
    )

    big = 10_000_000
    plan = corpus_mixture_plan(spark, SF, target_tokens=big).toPandas()
    assert (plan["sample_rate"] > 1).all()
    sp = corpus_mixture_draw(spark, SF, target_tokens=big).toPandas()
    ora = _duck(_mixture_draw_sql(target_tokens=big))
    assert _rows(sp) == _rows(ora)
    # every doc appears at least floor(rate) times, at most floor+1
    plan_i = plan.set_index("source")
    per_doc = sp.groupby(["source", "doc_id"]).size()
    for (src, _doc), n in per_doc.items():
        lo = int(plan_i.loc[src, "sample_rate"])
        assert n in (lo, lo + 1)
    assert sp["copy"].max() >= 2  # the epoch branch genuinely fired


def test_prepare_training_corpus_composition(spark):
    """The end-to-end preparation query: mirror-equal, draws ONLY
    kept documents, and the mixture genuinely re-plans over the
    surviving corpus (selection changes at least one source's rate vs
    the unfiltered plan)."""
    from pyspark.sql import functions as F

    from manuscript_ocr_spark.functions.text import (
        PREPARE_CORPUS_SQL,
        corpus_mixture_plan,
        corpus_select,
        prepare_training_corpus,
    )
    from manuscript_ocr_spark.functions.text import _docs

    sp = prepare_training_corpus(spark, SF).toPandas()
    ora = _duck(PREPARE_CORPUS_SQL)
    assert _rows(sp) == _rows(ora) and len(sp) > 0

    kept = {int(r["doc_id"])
            for r in corpus_select(spark, SF).filter("keep").collect()}
    assert set(sp["doc_id"].astype(int)) <= kept
    assert len(kept) < 500  # selection actually drops documents here

    full_plan = corpus_mixture_plan(spark, SF).toPandas().set_index("source")
    kept_ids = corpus_select(spark, SF).filter("keep").select("doc_id")
    kept_docs = _docs(spark, SF).join(kept_ids, "doc_id")
    kept_plan = corpus_mixture_plan(
        spark, SF, docs=kept_docs).toPandas().set_index("source")
    common = kept_plan.index.intersection(full_plan.index)
    assert len(common) > 0
    assert (kept_plan.loc[common, "n_docs"]
            != full_plan.loc[common, "n_docs"]).any()
    assert (kept_plan.loc[common, "sample_rate"]
            != full_plan.loc[common, "sample_rate"]).any()
