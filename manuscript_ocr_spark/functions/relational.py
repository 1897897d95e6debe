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
- rel_asof_join         → as-of (most-recent-at-or-before) join via tagged
                          union + running last(ignorenulls) — one sort-merge
                          pass, no range-join explosion
- rel_rollup_revenue    → multi-granularity ROLLUP in a single shuffle
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


def sessionize(spark, sf_dir):
    """Gap-based sessionization over events (30-min inactivity): the
    order-dependent grouping family (A4 LANMS merge / W1 line clustering are
    the in-UDF members; this is the relational member — a running sum of
    new-session flags over an ordered window)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.unix_timestamp(F.col("ts"))
    gap = epoch - F.lag(epoch).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    sess = flagged.withColumn(
        "session_idx", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        sess.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.sum("value"), 3).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("long").alias("session_idx"),
            "n_events",
            "session_value",
        )
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER w IS NULL
                OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       count(*) AS n_events,
       round(sum(value), 3) AS session_value
FROM sess GROUP BY 1, 2
"""


def quantize_dedup(spark, sf_dir):
    """A1 analog (quantization dedup, utils.py:347-364): snap event values to
    a grid cell (value//0.5, hour) and keep one representative per cell —
    GROUP BY on quantized keys with a deterministic min() pick."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.floor(F.col("value") / 0.5).cast("long").alias("value_cell"),
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH").alias("hour_cell"),
        )
        .agg(
            F.min("event_id").alias("rep_event_id"),
            F.count("*").cast("long").alias("n_in_cell"),
        )
    )


QUANTIZE_DEDUP_SQL = """
SELECT CAST(floor(value / 0.5) AS BIGINT) AS value_cell,
       strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour_cell,
       min(event_id) AS rep_event_id,
       count(*) AS n_in_cell
FROM events GROUP BY 1, 2
"""


def length_percentiles(spark, sf_dir):
    """Exact percentiles of doc length per lang (distribution profiling for
    corpus curation)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.9)").alias("p90"),
        F.count("*").cast("long").alias("n"),
    )


LENGTH_PERCENTILES_SQL = """
SELECT lang,
       quantile_cont(n_chars, 0.5) AS p50,
       quantile_cont(n_chars, 0.9) AS p90,
       count(*) AS n
FROM documents GROUP BY 1
"""


def asof_join(spark, sf_dir):
    """As-of join: each purchase event matched to the user's most recent
    view event at-or-before its timestamp (attribution shape). Spark lacks a
    native ASOF JOIN, so this is the scalable composition: tag both sides,
    union, ONE shuffle on (user_id, ts), then last(ignorenulls) over a
    running window carries the latest view forward. No broadcast, no
    per-row Python, no O(n²) range join — at 10^12 rows this is a single
    sort-merge pass per user partition. Views are deduped to one per
    (user_id, ts) (max event_id) so ties are deterministic; at equal ts the
    view sorts before the purchase (inclusive >= semantics, matching the
    DuckDB ASOF JOIN oracle)."""
    ev = _t(spark, sf_dir, "events")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_id"))
        .select(
            "user_id", "ts", F.lit(0).alias("side"),
            "view_id", F.col("ts").alias("view_ts"),
            F.lit(None).cast("long").alias("purchase_id"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(1).alias("side"),
        F.lit(None).cast("long").alias("view_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "purchase_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = views.unionByName(purchases).select(
        "user_id", "ts", "side", "purchase_id",
        F.last("view_id", ignorenulls=True).over(w).alias("matched_view_id"),
        F.last("view_ts", ignorenulls=True).over(w).alias("matched_view_ts"),
    )
    return merged.filter(F.col("side") == 1).select(
        F.col("purchase_id").alias("event_id"),
        "user_id",
        F.coalesce("matched_view_id", F.lit(-1)).cast("long").alias("view_id"),
        F.coalesce(
            F.expr("timestampdiff(MICROSECOND, matched_view_ts, ts)"),
            F.lit(-1),
        ).cast("long").alias("gap_us"),
    )


ASOF_JOIN_SQL = """
WITH v AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view' GROUP BY 1, 2
),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id,
       p.user_id,
       CAST(coalesce(v.view_id, -1) AS BIGINT) AS view_id,
       CAST(coalesce(epoch_us(p.ts) - epoch_us(v.ts), -1) AS BIGINT) AS gap_us
FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def rollup_revenue(spark, sf_dir):
    """Multi-granularity rollup (hypertable-rollup shape): order count and
    revenue at (priority, status), (priority), and grand-total levels in one
    pass — Spark ROLLUP is a single shuffle with partial aggregation at every
    level (map-side combine), not three separate scans."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "revenue",
        )
    )


ROLLUP_REVENUE_SQL = """
SELECT coalesce(o_orderpriority, 'ALL') AS priority,
       coalesce(o_orderstatus, 'ALL') AS status,
       count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
"""


def regional_revenue(spark, sf_dir):
    """TPC-H Q5 shape: 4-way join chain lineitem ⋈ orders ⋈ customer ⋈
    nation ⋈ region with the dimension chain broadcast end-to-end — the
    declarative form Catalyst reorders freely; only the fact table
    (lineitem) ever shuffles, and with every dim broadcast not even that."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey", "n_name")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


REGIONAL_REVENUE_SQL = """
SELECT r_name, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2
"""


N_SALTS = 16


def salted_type_stats(spark, sf_dir):
    """Explicit two-phase salted aggregation (skew defusal, axes A+B): the
    events table has only 5 event_type keys, so a naive groupBy(event_type)
    funnels 1/5 of 10^12 rows into each of 5 reducers. Phase 1 pre-aggregates
    on (event_type, salt=pmod(xxhash64(event_id), 16)) — 80 evenly-sized
    partial groups — phase 2 merges the 16 partials per key. Result is
    EXACTLY the plain GROUP BY (sum/count/max are reassociative), which is
    the DuckDB oracle. (Spark's partial_ aggregation does this implicitly
    per-task; the explicit salt keeps the reduce side balanced too, the same
    defusal the checkpoint layer applies to doc_id.)"""
    ev = _t(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.xxhash64("event_id"), F.lit(N_SALTS)))
        .groupBy("event_type", "salt")
        .agg(
            F.count("*").alias("pn"),
            F.sum("value").alias("psum"),
            F.max("value").alias("pmax"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("long").alias("n"),
        F.round(F.sum("psum"), 3).alias("total_value"),
        F.round(F.max("pmax"), 3).alias("max_value"),
    )


SALTED_TYPE_STATS_SQL = """
SELECT event_type,
       count(*) AS n,
       round(sum(value), 3) AS total_value,
       round(max(value), 3) AS max_value
FROM events GROUP BY 1
"""


def anti_join_window_shoppers(spark, sf_dir):
    """LEFT ANTI join at (user, day) grain: view-days with no purchase by
    that user on that day — the set-difference family (EXCEPT / NOT EXISTS)
    as one shuffle-pruned anti join instead of a distinct-then-except double
    shuffle."""
    ev = _t(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", day.alias("day"), "value"
    )
    buy_days = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", day.alias("day"))
        .distinct()
    )
    return (
        views.join(buy_days, ["user_id", "day"], "left_anti")
        .groupBy("user_id", "day")
        .agg(
            F.count("*").cast("long").alias("n_views"),
            F.round(F.sum("value"), 3).alias("view_value"),
        )
    )


ANTI_JOIN_SQL = """
SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n_views, round(sum(value), 3) AS view_value
FROM events v
WHERE event_type = 'view'
  AND NOT EXISTS (SELECT 1 FROM events p
                  WHERE p.event_type = 'purchase' AND p.user_id = v.user_id
                    AND date_trunc('day', p.ts) = date_trunc('day', v.ts))
GROUP BY 1, 2
"""


def distinct_user_counts(spark, sf_dir):
    """COUNT(DISTINCT) family: exact distinct users + events per type in one
    aggregation (Spark expands distinct aggs to a two-stage expand+agg plan;
    at 10^12 rows swap in approx_count_distinct for the HLL path)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.count("*").cast("long").alias("n_events"),
    )


DISTINCT_USERS_SQL = """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_events
FROM events GROUP BY 1
"""


# --- ordered event funnel ------------------------------------------------------

def event_funnel(spark, sf_dir):
    """Ordered funnel view → click → purchase per user: first view, first
    click strictly after it, first purchase strictly after that, and the
    stage reached (0-3).

    Single-shuffle shape: three stacked whole-partition window minima share
    one hash partitioning on user_id (one exchange + one sort feed all
    three), and the final per-user collapse reuses the same partitioning —
    no self-joins, no per-step re-scans of the event table. The standard
    product-analytics sequence-match, scale-safe because per-user state
    never materializes as an array."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    df = ev.select("user_id", "ts", "event_type", v.alias("v_ts"))
    c = F.min(
        F.when((F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")), F.col("ts"))
    ).over(w)
    df = df.select("user_id", "ts", "event_type", "v_ts", c.alias("c_ts"))
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
            F.col("ts"),
        )
    ).over(w)
    df = df.select("user_id", "v_ts", "c_ts", p.alias("p_ts"))
    out = df.groupBy("user_id").agg(
        F.max("v_ts").alias("view_ts"),
        F.max("c_ts").alias("click_ts"),
        F.max("p_ts").alias("purchase_ts"),
    )
    stage = (
        F.when(F.col("purchase_ts").isNotNull(), 3)
        .when(F.col("click_ts").isNotNull(), 2)
        .when(F.col("view_ts").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id", "view_ts", "click_ts", "purchase_ts",
        stage.cast("int").alias("stage"),
    )


EVENT_FUNNEL_SQL = """
WITH w1 AS (
  SELECT user_id, ts, event_type,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS v_ts
  FROM events
),
w2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND ts > v_ts THEN ts END)
              OVER (PARTITION BY user_id) AS c_ts
  FROM w1
),
w3 AS (
  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > c_ts THEN ts END)
              OVER (PARTITION BY user_id) AS p_ts
  FROM w2
)
SELECT user_id,
       max(v_ts) AS view_ts,
       max(c_ts) AS click_ts,
       max(p_ts) AS purchase_ts,
       CAST(CASE WHEN max(p_ts) IS NOT NULL THEN 3
                 WHEN max(c_ts) IS NOT NULL THEN 2
                 WHEN max(v_ts) IS NOT NULL THEN 1
                 ELSE 0 END AS INT) AS stage
FROM w3
GROUP BY user_id
"""


def json_props_stats(spark, sf_dir):
    """Semi-structured extraction: parse the events.props JSON payload
    JVM-side (get_json_object — codegen'd Jackson path, no UDF) and
    aggregate per event_type. The shape every clickstream/props pipeline
    needs; one map-side-combined hash agg, same plan as pricing_summary."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    avg_k = F.sum(k) / F.count("*")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(k).cast("long").alias("sum_k"),
            (F.floor(avg_k * 10000 + F.lit(0.5)) / 10000).alias("avg_k"),
            F.max(k).cast("int").alias("max_k"),
        )
    )


JSON_PROPS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       floor(sum(k) * 1.0 / count(*) * 10000 + 0.5) / 10000 AS avg_k,
       CAST(max(k) AS INT) AS max_k
FROM (SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k
      FROM events)
GROUP BY 1
"""


def source_lang_cube(spark, sf_dir):
    """CUBE(lang, source) corpus profile: doc counts + mean length at every
    aggregation granularity (total / per-lang / per-source / per-pair) in
    ONE pass — Spark expands the grouping sets inside a single shuffle, the
    profile a corpus dashboard reads at 10^12 docs without 4 scans."""
    docs = _t(spark, sf_dir, "documents")
    avg_chars = F.sum("n_chars") / F.count("*")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.floor(avg_chars * 100 + F.lit(0.5)) / 100).alias("avg_chars"),
        )
    )


SOURCE_LANG_CUBE_SQL = """
SELECT lang, source,
       count(*) AS n_docs,
       floor(sum(n_chars) * 1.0 / count(*) * 100 + 0.5) / 100 AS avg_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


def promo_revenue(spark, sf_dir):
    """TPC-H Q14-style promo-revenue share per month: lineitem ⋈ part with
    the part dim BROADCAST (dims are small by definition; the fact scan
    never shuffles), conditional aggregation inside one map-side-combined
    hash agg. Cross-partition double sums are not order-stable, so revenue
    is quantized per ROW to exact int64 cents (floor(x·100 + 0.5) — one
    deterministic IEEE expression per row) and summed exactly; the promo
    percentage then comes from integer arithmetic — the engine's standard
    fixed-point determinism device."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev_cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    j = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    month = F.date_format("l_shipdate", "yyyy-MM")
    promo = F.when(F.col("p_type").startswith("PROMO"), rev_cents).otherwise(
        F.lit(0).cast("long")
    )
    out = (
        j.groupBy(month.alias("month"))
        .agg(
            F.sum(promo).alias("promo_cents"),
            F.sum(rev_cents).alias("total_cents"),
        )
    )
    return out.select(
        "month",
        (F.floor(F.col("promo_cents") * 10000 / F.col("total_cents")) / 100.0
         ).alias("promo_pct"),
        (F.col("total_cents") / 100.0).alias("revenue"),
    )


PROMO_REVENUE_SQL = """
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS month,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
           AS cents,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
)
SELECT month,
       floor(sum(CASE WHEN p_type LIKE 'PROMO%' THEN cents ELSE 0 END)
             * 10000.0 / sum(cents)) / 100.0 AS promo_pct,
       sum(cents) / 100.0 AS revenue
FROM j GROUP BY month
"""


def supplier_value(spark, sf_dir):
    """Supplier revenue concentration (TPC-H Q11-flavored): per-supplier
    exact-cents revenue ⋈ broadcast supplier/nation dims, keeping suppliers
    above 1/1000th of total — the two-pass total uses a scalar subquery
    (one extra narrow agg, no second fact shuffle: AQE reuses the exchange)."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("long")
    per_sup = li.groupBy("l_suppkey").agg(F.sum(cents).alias("cents"))
    total = per_sup.agg(F.sum("cents").alias("t"))
    out = (
        per_sup.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cents") * 1000 > F.col("t"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("n_name").alias("nation"),
            (F.col("cents") / 100.0).alias("revenue"),
        )
    )
    return out


SUPPLIER_VALUE_SQL = """
WITH per_sup AS (
  SELECT l_suppkey,
         sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT))
           AS cents
  FROM lineitem GROUP BY 1
)
SELECT s_suppkey, s_name, n_name AS nation, cents / 100.0 AS revenue
FROM per_sup
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON n_nationkey = s_nationkey
WHERE cents * 1000 > (SELECT sum(cents) FROM per_sup)
"""


SESSION_GAP_S = 1800


def session_windows(spark, sf_dir):
    """Gap sessions via Spark's NATIVE session_window operator (the same
    semantics rel_sessionize builds from window functions, expressed with
    the built-in streaming-capable operator — one aggregation, mergeable
    session state, no ordering window): per (user, session) the start/end
    bounds, event count, and value sum. The batch form here is the exact
    plan the streaming variant runs with a watermark."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_S} seconds"))
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("value"), 3).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


# session_window semantics: a session's end = last event + gap; events with
# ts < prev_ts + gap merge. The SQL mirror rebuilds exactly that with the
# classic gaps-and-islands pattern.
SESSION_WINDOWS_SQL = f"""
WITH o AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN ts >= lag(ts) OVER w + INTERVAL {SESSION_GAP_S} SECOND
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS grp
  FROM o
)
SELECT user_id,
       min(ts) AS session_start,
       max(ts) + INTERVAL {SESSION_GAP_S} SECOND AS session_end,
       CAST(count(*) AS INT) AS n_events,
       round(sum(value), 3) AS session_value
FROM g GROUP BY user_id, grp
"""


QUERIES = {
    "rel_pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "rel_promo_revenue": (promo_revenue, PROMO_REVENUE_SQL),
    "rel_supplier_value": (supplier_value, SUPPLIER_VALUE_SQL),
    "rel_session_windows": (session_windows, SESSION_WINDOWS_SQL),
    "rel_json_props_stats": (json_props_stats, JSON_PROPS_SQL),
    "rel_source_lang_cube": (source_lang_cube, SOURCE_LANG_CUBE_SQL),
    "rel_anti_join_window_shoppers": (anti_join_window_shoppers, ANTI_JOIN_SQL),
    "rel_distinct_user_counts": (distinct_user_counts, DISTINCT_USERS_SQL),
    "rel_asof_join": (asof_join, ASOF_JOIN_SQL),
    "rel_rollup_revenue": (rollup_revenue, ROLLUP_REVENUE_SQL),
    "rel_regional_revenue": (regional_revenue, REGIONAL_REVENUE_SQL),
    "rel_salted_type_stats": (salted_type_stats, SALTED_TYPE_STATS_SQL),
    "rel_sessionize": (sessionize, SESSIONIZE_SQL),
    "rel_quantize_dedup": (quantize_dedup, QUANTIZE_DEDUP_SQL),
    "rel_length_percentiles": (length_percentiles, LENGTH_PERCENTILES_SQL),
    "rel_anomaly_filter": (anomaly_filter, ANOMALY_FILTER_SQL),
    "rel_get_text_analog": (get_text_analog, GET_TEXT_SQL),
    "rel_window_rank": (window_rank, WINDOW_RANK_SQL),
    "rel_join_revenue": (join_revenue, JOIN_REVENUE_SQL),
    "rel_hourly_events": (hourly_events, HOURLY_EVENTS_SQL),
    "rel_validation_counts": (validation_counts, VALIDATION_SQL),
    "rel_event_funnel": (event_funnel, EVENT_FUNNEL_SQL),
}
