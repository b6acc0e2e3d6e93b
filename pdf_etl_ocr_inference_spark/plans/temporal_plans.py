"""Temporal operator catalog: as-of join, range join, gap
sessionization, session windows, percentiles — the time-series surface
a training-data/event pipeline needs beyond the reference (which only
string-slices timestamps, SURVEY §1.1).

Scale notes: every operator here shuffles once on the entity key
(user_id) and is linear in events per key; no range-explosion
formulations (see ``operators.joins.asof_join``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.joins import asof_join, range_join
from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op49_asof_join",
    "SELECT p.event_id, p.user_id, p.value AS purchase_value, "
    "c.value AS last_click_value "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND c.ts <= p.ts",
    doc="as-of join: each purchase picks up the latest click value "
    "at-or-before it per user. Union-scan construction — one shuffle "
    "on user_id, linear per key (no per-key range explosion); Spark "
    "lacks a native as-of join (DuckDB oracle uses ASOF JOIN).",
)
def op49_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("last_click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["last_click_value"],
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "last_click_value"
    )


@register(
    "op50_range_join",
    "SELECT p.event_id AS purchase_id, c.event_id AS click_id "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id "
    "AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts",
    doc="interval/range join: clicks within the 30 minutes before each "
    "purchase, same user. Equi-key (user_id) keeps it hash/sort-merge; "
    "the range predicate evaluates post-match.",
)
def op50_range_join(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
    )
    cond = (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES")) & (
        F.col("c_ts") < F.col("p_ts")
    )
    joined = p.join(c, (p["user_id"] == c["c_user"]) & cond)
    return joined.select("purchase_id", "click_id")


@register(
    "op51_sessionize",
    "WITH gaps AS ("
    "  SELECT user_id, ts, value, CASE WHEN ts - LAG(ts) OVER w "
    "    > INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END "
    "    AS new_session FROM events WINDOW w AS ("
    "    PARTITION BY user_id ORDER BY ts)), "
    "sess AS ("
    "  SELECT user_id, ts, value, CAST(SUM(new_session) OVER ("
    "    PARTITION BY user_id ORDER BY ts "
    "    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM gaps) "
    "SELECT user_id, session_id, COUNT(*) AS n_events, "
    "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS session_value FROM sess "
    "GROUP BY user_id, session_id",
    doc="gap-based sessionization (30-min inactivity): lag + "
    "cumulative-sum window assigns session ids in one pass — one "
    "shuffle on user_id, then the agg reuses the same partitioning.",
)
def op51_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events = _t(spark, sf, "events")
    # microsecond-exact gap — cast('long') would truncate to seconds
    # and disagree with the oracle's INTERVAL comparison at boundaries
    mics = F.unix_micros(F.col("ts"))
    gap = mics - F.lag(mics).over(w)
    new_session = F.when(
        gap.isNull() | (gap > 30 * 60 * 1_000_000), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        events.withColumn("_new", new_session)
        .withColumn("session_id", F.sum("_new").over(wc))
        .groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(
                F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                / 100.0,
                2,
            ).alias("session_value"),
        )
    )


@register(
    "op52_session_window",
    "WITH gaps AS ("
    "  SELECT user_id, ts, CASE WHEN ts - LAG(ts) OVER w "
    "    > INTERVAL 30 MINUTE OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END "
    "    AS new_session FROM events WINDOW w AS ("
    "    PARTITION BY user_id ORDER BY ts)), "
    "sess AS ("
    "  SELECT user_id, ts, SUM(new_session) OVER ("
    "    PARTITION BY user_id ORDER BY ts "
    "    ROWS UNBOUNDED PRECEDING) AS sid FROM gaps) "
    "SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start, "
    "COUNT(*) AS n_events FROM sess GROUP BY user_id, sid",
    doc="native session_window aggregation (the Structured-Streaming "
    "session operator, batch-executed); oracle mirrors the gap-merge "
    "semantics with window SQL. Boundary (verified empirically, "
    "tests/test_operators.py): an event EXACTLY gap after the "
    "previous one still MERGES — new session only when gap is "
    "strictly exceeded, hence > in the oracle.",
)
def op52_session_window(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    return (
        events.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("sw.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "n_events",
        )
    )


@register(
    "op53_percentiles",
    "SELECT event_type, "
    "ROUND(QUANTILE_CONT(value, 0.25), 4) AS p25, "
    "ROUND(QUANTILE_CONT(value, 0.50), 4) AS p50, "
    "ROUND(QUANTILE_CONT(value, 0.75), 4) AS p75, "
    "ROUND(QUANTILE_CONT(value, 0.99), 4) AS p99 "
    "FROM events GROUP BY event_type",
    doc="exact interpolated percentiles per group (Spark `percentile` "
    "≡ DuckDB quantile_cont). The approx_percentile/HLL sketch path "
    "is the scale alternative (op54, rows-only: sketches aren't "
    "cross-engine comparable).",
)
def op53_percentiles(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.round(F.percentile("value", 0.25), 4).alias("p25"),
        F.round(F.percentile("value", 0.50), 4).alias("p50"),
        F.round(F.percentile("value", 0.75), 4).alias("p75"),
        F.round(F.percentile("value", 0.99), 4).alias("p99"),
    )


@register(
    "op54_approx_sketches",
    None,  # sketch outputs are engine-specific → rows-only; bounds
    # asserted in pytest
    doc="approximate aggregates for the 100TB path: approx_percentile "
    "(t-digest-style) + approx_count_distinct (HyperLogLog++) per "
    "event_type — fixed-size sketch state instead of exact "
    "sort/distinct shuffles.",
)
def op54_approx_sketches(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    return events.groupBy("event_type").agg(
        F.round(F.approx_percentile("value", 0.5, 10000), 4).alias("ap50"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    )


@register(
    "op49b_asof_forward",
    "SELECT p.event_id, p.user_id, p.value AS purchase_value, "
    "e.value AS next_error_value "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e "
    "ON p.user_id = e.user_id AND e.ts >= p.ts",
    doc="FORWARD as-of join: each purchase picks up the EARLIEST "
    "error at-or-after it per user (did the flow break right after "
    "checkout?). Same union-scan construction as op49 mirrored — "
    "first(ignorenulls) over a current-row→following frame; one "
    "shuffle on the key, linear per key.",
)
def op49b_asof_forward(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", "ts", F.col("value").alias("next_error_value")
    )
    out = asof_join(
        purchases,
        errors,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["next_error_value"],
        direction="forward",
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "next_error_value"
    )


@register(
    "op49c_asof_tolerance",
    "SELECT event_id, user_id, purchase_value, "
    "CASE WHEN last_click_ts IS NOT NULL AND "
    "ts - last_click_ts <= INTERVAL 1 HOUR THEN last_click_value "
    "END AS last_click_value FROM ("
    "SELECT p.event_id, p.user_id, p.ts, p.value AS purchase_value, "
    "c.value AS last_click_value, c.ts AS last_click_ts "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id AND c.ts <= p.ts)",
    doc="as-of join with a TOLERANCE: the latest click counts only "
    "within 1 hour of the purchase (attribution-window semantics). "
    "Equivalent to nearest-within-tolerance: every non-matched "
    "candidate is even farther out, so a too-far match means no "
    "candidate is in range — the match nulls rather than the row "
    "dropping.",
)
def op49c_asof_tolerance(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("last_click_value")
    )
    out = asof_join(
        purchases,
        clicks,
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["last_click_value"],
        tolerance_seconds=3600.0,
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "last_click_value"
    )
