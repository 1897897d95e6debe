"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship extraction slice over /root/testdata/sf0.001 —
  documents are wrapped into the interleaved spans shape (text spans) and
  routed through the engine's span pipeline (boilerplate strip + reassembly),
  plus the OCR path over the engine's deterministic media fixtures.
- queries(): every implemented operator from SURVEY.md §2 that is
  demonstrable over the testdata tables, plus the training-data-pipeline
  operators (dedup / similarity / text analysis / multimodal) and the OCR
  pipeline itself (rows-only).
- oracle_sql(): DuckDB-runnable ANSI SQL mirrors (omitted for the
  non-SQL-expressible OCR/multimodal ops → rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: interleaved-span extraction.

    Wraps each document row into the docs(doc_id, spans) shape with one text
    span, unions the engine's deterministic media fixtures as media spans,
    and runs the full extract_spans pipeline (strip + OCR + reassemble).
    """
    from manuscript_ocr_spark.fixtures import ensure_tier
    from manuscript_ocr_spark.pipeline import extract_spans

    sf_dir = "/root/testdata/sf0.001"
    docs_raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    text_docs = docs_raw.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            )
        ).alias("spans"),
    )

    fx = ensure_tier("sf-small")
    fixture_docs = spark.read.parquet(f"{fx}/docs.parquet").limit(50)
    media = spark.read.parquet(f"{fx}/media.parquet")

    docs = text_docs.unionByName(fixture_docs)
    return extract_spans(docs, media)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from manuscript_ocr_spark.functions import all_queries

    # no SQL resolution here: enumerating queries must never materialize
    # fixture tiers (lazy oracles embed fixture paths; oracle_sql() pays that)
    return {name: builder for name, (builder, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from manuscript_ocr_spark.functions import all_queries

    return {
        name: sql
        for name, (_, sql) in all_queries(resolve_sql=True).items()
        if sql is not None
    }
