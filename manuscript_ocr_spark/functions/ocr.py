"""The flagship extraction query + its hard DuckDB oracle, and the
dangling-ref audit companion.

ocr_extract_spans: the full detect → recognize → reorder → reassemble
pipeline (pipeline.extract_spans) over the deterministic fixture tier,
exploded to one row per output span. The DuckDB oracle REBUILDS the span
sequences independently in SQL: text spans are boilerplate-stripped with the
same regexes the engine uses (portability proven by the text_boilerplate_strip
oracle), OCR spans are joined from expected_page_lines.parquet — per-page
line texts produced by the single-process numpy oracle at fixture-generation
time (reference semantics: src/manuscript/_pipeline.py:56-176 + get_text
193-202) — and the interleave/sort by (offset, seq) happens engine-side in
the SQL. Only the per-page OCR line texts come from the numpy oracle; every
distributed step (strip, dedup-by-ref join, per-doc regroup, ordering) is
recomputed by DuckDB and hash-compared.

ocr_dangling_refs: the audit promised by extract_spans' divergence note — a
media span whose ref has no media row is OMITTED by the pipeline (the
single-process oracle raises KeyError instead); this query counts what was
dropped (refs LEFT ANTI media) so lineage can account for it at 10^12 docs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _fixture_dir() -> str:
    from ..fixtures import ensure_tier

    return ensure_tier("sf-small")


def _strip_sql_expr(col: str) -> str:
    """DuckDB boilerplate-strip of `col` — same construction as
    functions.text._boilerplate_sql (regexes from kernels.textproc)."""
    from ..kernels.textproc import BOILERPLATE_TAGS, BOILERPLATE_TAG_RES

    expr = col
    for tag in BOILERPLATE_TAGS:
        pat = BOILERPLATE_TAG_RES[tag].replace("'", "''")
        expr = f"regexp_replace({expr}, '{pat}', '', 'g')"
    return rf"trim(regexp_replace({expr}, '\s+', ' ', 'g'))"


# --- the flagship query -------------------------------------------------------

def extract_spans_query(spark, sf_dir):
    """The flagship OCR pipeline over the engine's deterministic fixture tier
    (sf_dir has no binary media). Exploded to one row per output span so the
    driver's row/hash compare is span-granular."""
    from ..pipeline import extract_spans, load_fixture_tables

    d = _fixture_dir()
    docs, media = load_fixture_tables(spark, d)
    out = extract_spans(docs, media)
    return out.select("doc_id", F.posexplode("spans").alias("pos", "s")).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
        F.col("s.seq").alias("seq"),
    )


def _extract_spans_sql() -> str:
    d = _fixture_dir()
    strip = _strip_sql_expr("s.text")
    return f"""
WITH raw AS (
  SELECT doc_id, unnest(spans) AS s
  FROM read_parquet('{d}/docs.parquet')
),
txt AS (
  SELECT doc_id,
         'text' AS kind,
         {strip} AS text,
         CAST(NULL AS VARCHAR) AS media_ref,
         CAST(s."offset" AS INT) AS "offset",
         0 AS seq
  FROM raw WHERE s.kind = 'text'
),
med AS (
  SELECT r.doc_id,
         'ocr_line' AS kind,
         l.text AS text,
         r.s.media_ref AS media_ref,
         CAST(r.s."offset" AS INT) AS "offset",
         CAST(l.line_idx AS INT) AS seq
  FROM raw r
  JOIN read_parquet('{d}/expected_page_lines.parquet') l
    ON l.media_ref = r.s.media_ref
  WHERE r.s.kind = 'media'
)
SELECT doc_id, kind, text, media_ref, "offset", seq
FROM txt WHERE text IS NOT NULL AND length(text) > 0
UNION ALL
SELECT doc_id, kind, text, media_ref, "offset", seq FROM med
"""


# --- dangling-ref audit ---------------------------------------------------------

def dangling_refs(spark, sf_dir):
    """Media refs referenced by docs (incl. the dangling fixture docs) with
    no media row, and how many spans each drops. Scale shape: aggregate refs
    FIRST (distinct refs ≪ spans), then one keyed LEFT ANTI join against the
    media table — both sides hash-partitioned on media_ref, no broadcast of
    the (huge at 10^12) media side."""
    d = _fixture_dir()
    docs = spark.read.parquet(f"{d}/docs.parquet").unionByName(
        spark.read.parquet(f"{d}/docs_dangling.parquet")
    )
    media = spark.read.parquet(f"{d}/media.parquet")
    refs = (
        docs.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
        .groupBy("media_ref")
        .agg(F.count("*").cast("int").alias("n_spans"))
    )
    return refs.join(media.select("media_ref"), "media_ref", "left_anti")


def _dangling_refs_sql() -> str:
    d = _fixture_dir()
    return f"""
WITH refs AS (
  SELECT s.media_ref AS media_ref
  FROM (
    SELECT unnest(spans) AS s FROM read_parquet('{d}/docs.parquet')
    UNION ALL
    SELECT unnest(spans) AS s FROM read_parquet('{d}/docs_dangling.parquet')
  ) WHERE s.kind = 'media'
),
agg AS (SELECT media_ref, CAST(count(*) AS INT) AS n_spans FROM refs GROUP BY 1)
SELECT a.media_ref, a.n_spans
FROM agg a
WHERE NOT EXISTS (
  SELECT 1 FROM read_parquet('{d}/media.parquet') m
  WHERE m.media_ref = a.media_ref
)
"""


QUERIES = {
    "ocr_extract_spans": (extract_spans_query, _extract_spans_sql),
    "ocr_dangling_refs": (dangling_refs, _dangling_refs_sql),
}
