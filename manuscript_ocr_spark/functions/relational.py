"""Relational operator analogs over the TPC-H-ish testdata tables.

Each query demonstrates a SURVEY.md §2 operator family's Spark mapping on
SQL-checkable data (the OCR kernels themselves are exercised by the pytest
invariant; these pin the *relational* semantics — filters, aggregations,
joins, windows, ordering — against an independent DuckDB oracle):

- rel_pricing_summary   → A2/A7-style grouped aggregation (TPC-H Q1 shape)
- rel_anomaly_filter    → F5 area-anomaly filter as mean+5σ per group
- rel_get_text_analog   → A5 get_text: ordered string_agg per group
- rel_window_rank       → W1-style ordering: rank within partition
- rel_join_revenue      → J-family equi-join + broadcast dim (Q3 shape)
- rel_hourly_events     → time-bucketed aggregation (streaming-analog)
- rel_validation_counts → F7 label-row validation with per-reason counters
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def pricing_summary(spark, sf_dir):
    """TPC-H Q1 pricing summary (fixed 'shipdate cutoff' predicate)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def anomaly_filter(spark, sf_dir):
    """F5 analog: per returnflag group, drop rows with extendedprice >
    mean + 5σ (population σ, matching the reference's np.std); report
    kept/dropped counts per group."""
    li = _t(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_pop("l_extendedprice").alias("sigma"),
    )
    joined = li.join(F.broadcast(stats), "l_returnflag")
    flagged = joined.select(
        "l_returnflag",
        (F.col("l_extendedprice") <= F.col("mu") + 5 * F.col("sigma")).alias("keep"),
    )
    return flagged.groupBy("l_returnflag").agg(
        F.sum(F.col("keep").cast("int")).cast("long").alias("n_kept"),
        F.sum((~F.col("keep")).cast("int")).cast("long").alias("n_dropped"),
    )


ANOMALY_FILTER_SQL = """
WITH stats AS (
  SELECT l_returnflag, avg(l_extendedprice) mu, stddev_pop(l_extendedprice) sigma
  FROM lineitem GROUP BY 1
)
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN l.l_extendedprice <= s.mu + 5 * s.sigma THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(sum(CASE WHEN l.l_extendedprice <= s.mu + 5 * s.sigma THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped
FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
GROUP BY 1
"""


def get_text_analog(spark, sf_dir):
    """A5 get_text analog: per order, linenumbers sorted ascending and joined
    with spaces (sort_array(collect_list) + concat_ws ≡ ordered string_agg)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(
            F.concat_ws(
                " ", F.sort_array(F.collect_list(F.col("l_linenumber").cast("string")))
            ).alias("line_text"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


GET_TEXT_SQL = """
SELECT l_orderkey,
       string_agg(CAST(l_linenumber AS VARCHAR), ' '
                  ORDER BY CAST(l_linenumber AS VARCHAR)) AS line_text,
       count(*) AS n_lines
FROM lineitem GROUP BY 1
"""


def window_rank(spark, sf_dir):
    """W1-style ordering: first 3 events per user by (ts, event_id)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", F.col("rn").cast("int").alias("rn"))
    )


WINDOW_RANK_SQL = """
SELECT user_id, event_id, CAST(rn AS INT) AS rn FROM (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events
) WHERE rn <= 3
"""


def join_revenue(spark, sf_dir):
    """Q3-shape join: revenue per order priority — lineitem ⋈ orders with the
    dimension side broadcast (the docs×media join pattern at fixture scale)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


JOIN_REVENUE_SQL = """
SELECT o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
"""


def hourly_events(spark, sf_dir):
    """Streaming-analog tumbling-hour aggregation over events (the batch
    equivalent of the structured-streaming windowed count; see
    streaming/incremental.py for the Trigger.AvailableNow form)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.sum("value"), 3).alias("total_value"),
        )
    )


HOURLY_EVENTS_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour,
       event_type,
       count(*) AS n,
       round(sum(value), 3) AS total_value
FROM events GROUP BY 1, 2
"""


def validation_counts(spark, sf_dir):
    """F7 analog (label-row validation with per-reason counters,
    reference: _trba/data/dataset.py:214-260): classify documents rows by the
    first failed check, count per reason."""
    d = _t(spark, sf_dir, "documents")
    reason = (
        F.when(F.col("text").isNull() | (F.length(F.trim("text")) == 0), "empty_text")
        .when(F.length("text") > 2000, "too_long")
        .when(F.col("lang").isNull(), "missing_lang")
        .when(F.col("n_chars") != F.length("text"), "bad_n_chars")
        .otherwise("ok")
    )
    return d.groupBy(reason.alias("reason")).agg(
        F.count("*").cast("long").alias("n")
    )


VALIDATION_SQL = """
SELECT CASE
         WHEN text IS NULL OR length(trim(text)) = 0 THEN 'empty_text'
         WHEN length(text) > 2000 THEN 'too_long'
         WHEN lang IS NULL THEN 'missing_lang'
         WHEN n_chars <> length(text) THEN 'bad_n_chars'
         ELSE 'ok'
       END AS reason,
       count(*) AS n
FROM documents GROUP BY 1
"""


QUERIES = {
    "rel_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "rel_anomaly_filter": (anomaly_filter, ANOMALY_FILTER_SQL),
    "rel_get_text_analog": (get_text_analog, GET_TEXT_SQL),
    "rel_window_rank": (window_rank, WINDOW_RANK_SQL),
    "rel_join_revenue": (join_revenue, JOIN_REVENUE_SQL),
    "rel_hourly_events": (hourly_events, HOURLY_EVENTS_SQL),
    "rel_validation_counts": (validation_counts, VALIDATION_SQL),
}
