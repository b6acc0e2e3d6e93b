"""Event-analytics catalog: funnel conversion, retention cohorts,
per-entity outlier scoring, gap-filled resampling.

The product-analytics query family every event table grows — and at
engine level, four shapes worth value-checking: ordered-step joins
(funnel), self-derived calendar joins (cohorts, gap fill), and
grouped standardization (z-scores).  All native Column code, all
DuckDB-oracled.

Scale notes: every aggregation here is combinable (partial map-side);
the funnel's step joins key on the entity id, so they co-partition
with the per-entity aggs; the resample calendar derives from a 1-row
agg and cross-joins broadcast (bounded: hours × types, independent
of event count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import load_table as _t


@register(
    "op76_funnel",
    "WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e "
    "JOIN s1 USING (user_id) WHERE event_type = 'click' AND ts > t1 "
    "GROUP BY e.user_id), "
    "s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e "
    "JOIN s2 USING (user_id) WHERE event_type = 'purchase' AND ts > t2 "
    "GROUP BY e.user_id) "
    "SELECT 1 AS step_idx, 'view' AS step, "
    "(SELECT COUNT(*) FROM s1) AS n_users "
    "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) "
    "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)",
    doc="ordered funnel conversion (view -> click -> purchase): each "
    "step's entry time is the first qualifying event STRICTLY AFTER "
    "the previous step's — the temporal-order constraint that "
    "separates a funnel from three independent counts. r12 perf "
    "pass (guide §2.4 — operations keyed the same way share one "
    "exchange): the three step times are chained conditional-MIN "
    "windows over ONE user_id partitioning (t2's predicate "
    "references the t1 window column, so ts > NULL nulls out users "
    "that never reached the prior step — identical semantics to the "
    "r11 step JOINS, which re-derived the whole events scan per "
    "step and per count: 22 Exchanges → 2, one events pass.",
)
def op76_funnel(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id")
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    t1 = F.min(F.when(is_("view"), F.col("ts"))).over(w)
    per = ev.withColumn("t1", t1)
    t2 = F.min(
        F.when(is_("click") & (F.col("ts") > F.col("t1")), F.col("ts"))
    ).over(w)
    per = per.withColumn("t2", t2)
    t3 = F.min(
        F.when(
            is_("purchase") & (F.col("ts") > F.col("t2")), F.col("ts")
        )
    ).over(w)
    per = per.withColumn("t3", t3)
    # one row per user (reuses the window's partitioning — no new
    # exchange), then a 1-row global count agg fans out to the three
    # step rows
    users = per.groupBy("user_id").agg(
        F.max("t1").alias("t1"),
        F.max("t2").alias("t2"),
        F.max("t3").alias("t3"),
    )
    counts = users.agg(
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    steps = F.array(
        F.struct(
            F.lit(1).alias("step_idx"),
            F.lit("view").alias("step"),
            F.col("n1").alias("n_users"),
        ),
        F.struct(
            F.lit(2).alias("step_idx"),
            F.lit("click").alias("step"),
            F.col("n2").alias("n_users"),
        ),
        F.struct(
            F.lit(3).alias("step_idx"),
            F.lit("purchase").alias("step"),
            F.col("n3").alias("n_users"),
        ),
    )
    return counts.select(F.explode(steps).alias("_s")).select(
        "_s.step_idx", "_s.step", "_s.n_users"
    )


@register(
    "op99_ewma",
    "SELECT user_id, COUNT(*) AS n_events, "
    "ROUND(LIST_REDUCE(LIST(CAST(value AS DOUBLE) "
    "ORDER BY ts, event_id), (acc, x) -> 0.3*x + 0.7*acc), 4) AS ewma "
    "FROM events GROUP BY user_id",
    doc="per-key RECURSIVE fold — exponentially weighted moving "
    "average (alpha 0.3) of each user's value stream in event order: "
    "the sequential-state shape window functions cannot express "
    "(EWMA_t depends on EWMA_{t-1}) and the closed-form rewrite "
    "overflows ((1-a)^-t) — done natively via aggregate() over the "
    "time-ordered value array, identical fold order in both engines "
    "so the doubles agree bitwise. Per-key state is the key's own "
    "history (op61's collect_list caveat): bounded by per-user "
    "activity, not the corpus; unbounded keys take the "
    "applyInPandasWithState path (op55) instead.",
)
def op99_ewma(spark: SparkSession, sf: str) -> DataFrame:
    events = _t(spark, sf, "events")
    per_user = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("s")
    )
    vals = F.transform("s", lambda r: r["value"].cast("double"))
    per_user = per_user.withColumn("v", vals)
    first = F.element_at("v", 1)
    rest = F.slice("v", 2, F.greatest(F.size("v") - 1, F.lit(0)))
    ew = F.aggregate(
        rest,
        first,
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return per_user.select(
        "user_id",
        F.size("v").alias("n_events"),
        F.round(ew, 4).alias("ewma"),
    )


@register(
    "op77_retention",
    "WITH first AS (SELECT user_id, "
    "DATE_TRUNC('week', MIN(ts))::DATE AS cohort FROM events "
    "GROUP BY user_id), "
    "act AS (SELECT DISTINCT e.user_id, f.cohort, "
    "DATE_TRUNC('week', e.ts)::DATE AS wk "
    "FROM events e JOIN first f USING (user_id)) "
    "SELECT cohort, DATE_DIFF('day', cohort, wk) // 7 AS week_offset, "
    "COUNT(*) AS n_users FROM act GROUP BY cohort, week_offset",
    doc="weekly retention cohorts: users grouped by first-activity "
    "week, counted in each later activity week (offset in weeks). "
    "The DISTINCT collapses to (user, week) before counting, so the "
    "wide exchange carries at most users x weeks rows.",
)
def op77_retention(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    act = (
        ev.join(first, "user_id")
        .select(
            "user_id",
            "cohort",
            F.to_date(F.date_trunc("week", "ts")).alias("wk"),
        )
        .distinct()
    )
    return act.groupBy(
        "cohort",
        F.floor(F.datediff("wk", "cohort") / 7).alias("week_offset"),
    ).agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "op78_outlier_zscore",
    "WITH s AS (SELECT user_id, AVG(value) AS m, STDDEV(value) AS sd "
    "FROM events GROUP BY user_id) "
    "SELECT event_id, e.user_id, ROUND((value - m) / sd, 4) AS z "
    "FROM events e JOIN s USING (user_id) "
    "WHERE ABS((value - m) / sd) > 2.5",
    doc="grouped standardization outliers: per-user mean/stddev "
    "(sample, n-1 — both engines' default), events scored |z| > 2.5. "
    "One combinable stats shuffle; the stats join back on the same "
    "key, so AQE plans it local. Zero-variance users drop out via "
    "NULL comparison semantics in both engines.",
)
def op78_outlier_zscore(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    s = ev.groupBy("user_id").agg(
        F.avg("value").alias("m"), F.stddev("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(s, "user_id")
        .filter(F.abs(z) > 2.5)
        .select("event_id", "user_id", F.round(z, 4).alias("z"))
    )


@register(
    "op79_resample_gapfill",
    "WITH cal AS (SELECT UNNEST(GENERATE_SERIES(mn, mx, "
    "INTERVAL 1 HOUR)) AS h FROM (SELECT "
    "DATE_TRUNC('hour', MIN(ts)) AS mn, "
    "DATE_TRUNC('hour', MAX(ts)) AS mx FROM events)), "
    "types AS (SELECT DISTINCT event_type FROM events), "
    "c AS (SELECT DATE_TRUNC('hour', ts) AS h, event_type, "
    "COUNT(*) AS n FROM events GROUP BY 1, 2) "
    "SELECT cal.h, t.event_type, COALESCE(c.n, 0) AS n "
    "FROM cal CROSS JOIN types t "
    "LEFT JOIN c ON c.h = cal.h AND c.event_type = t.event_type",
    doc="time-series resampling with gap fill: hourly counts per "
    "event type over a calendar DERIVED from the data (1-row min/max "
    "agg -> sequence explode), zero-filled via left join so "
    "downstream window math never sees missing buckets. The "
    "calendar x types frame is bounded (hours x types, independent "
    "of event count) and broadcasts; 215 of 3600 cells are "
    "zero-filled at sf0.01.",
)
def op79_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("mn"),
        F.date_trunc("hour", F.max("ts")).alias("mx"),
    )
    cal = bounds.select(
        F.explode(
            F.sequence("mn", "mx", F.expr("interval 1 hour"))
        ).alias("h")
    )
    types = ev.select("event_type").distinct()
    c = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    grid = cal.crossJoin(types)
    return (
        grid.join(c, ["h", "event_type"], "left")
        .select("h", "event_type", F.coalesce("n", F.lit(0)).alias("n"))
    )


@register(
    "op76b_funnel_windowed",
    "WITH s1 AS (SELECT user_id, MIN(ts) AS t1 FROM events "
    "WHERE event_type = 'view' GROUP BY user_id), "
    "s2 AS (SELECT e.user_id, MIN(ts) AS t2 FROM events e "
    "JOIN s1 USING (user_id) WHERE event_type = 'click' "
    "AND ts > t1 AND ts <= t1 + INTERVAL 24 HOURS GROUP BY e.user_id), "
    "s3 AS (SELECT e.user_id, MIN(ts) AS t3 FROM events e "
    "JOIN s2 USING (user_id) WHERE event_type = 'purchase' "
    "AND ts > t2 AND ts <= t2 + INTERVAL 24 HOURS GROUP BY e.user_id) "
    "SELECT 1 AS step_idx, 'view' AS step, "
    "(SELECT COUNT(*) FROM s1) AS n_users "
    "UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2) "
    "UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)",
    doc="CONVERSION-WINDOW funnel (op76 with the constraint real "
    "funnel analytics always carry): each step must happen within 24 "
    "hours of the previous step's entry, so stale cross-session "
    "coincidences stop counting as conversions. Same co-partitioned "
    "step-join shape; the window is one extra predicate riding the "
    "existing join, not a new shuffle.",
)
def op76b_funnel_windowed(spark: SparkSession, sf: str) -> DataFrame:
    ev = _t(spark, sf, "events")
    win = F.expr("INTERVAL 24 HOURS")

    def first_within(event_type, prev, prev_col):
        step = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            step = step.join(prev, "user_id").filter(
                (F.col("ts") > F.col(prev_col))
                & (F.col("ts") <= F.col(prev_col) + win)
            )
        return step.groupBy("user_id").agg(
            F.min("ts").alias(f"t_{event_type}")
        )

    s1 = first_within("view", None, "")
    s2 = first_within("click", s1, "t_view")
    s3 = first_within("purchase", s2, "t_click")
    rows = []
    for idx, (name, df) in enumerate(
        [("view", s1), ("click", s2), ("purchase", s3)], start=1
    ):
        rows.append(
            df.agg(F.count(F.lit(1)).alias("n_users")).select(
                F.lit(idx).alias("step_idx"),
                F.lit(name).alias("step"),
                "n_users",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "op100_scd2_history",
    "SELECT user_id, ts AS valid_from, "
    "LEAD(ts) OVER w AS valid_to, "
    "ROUND(value, 2) AS v, "
    "(LEAD(ts) OVER w IS NULL) AS is_current, "
    "ROW_NUMBER() OVER w AS version "
    "FROM events WHERE event_type = 'purchase' "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
    doc="SCD Type-2 history build: each user's purchase stream becomes "
    "versioned dimension rows with [valid_from, valid_to) validity "
    "intervals — valid_to = LEAD(ts), the open current version keeps "
    "NULL, plus a per-user version number. ONE window over the "
    "(user_id)-partitioned stream: the shuffle keys on the entity id "
    "and each partition sorts locally, so the history build is a "
    "single pass at any scale — the warehouse pattern for "
    "slowly-changing dimensions built from an append-only change "
    "log (composes with the engine's change feed: op10's CDF rows "
    "are exactly this input shape). Tie-safe ordering (ts, event_id) "
    "keeps versions deterministic under equal timestamps.",
)
def op100_scd2_history(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w).alias("valid_to"),
            F.round("value", 2).alias("v"),
            F.lead("ts").over(w).isNull().alias("is_current"),
            F.row_number().over(w).alias("version"),
        )
    )


@register(
    "op101_range_frame",
    "SELECT event_id, user_id, "
    "ROUND(SUM(value) OVER w, 2) AS v30, COUNT(*) OVER w AS n30 "
    "FROM events WINDOW w AS (PARTITION BY user_id "
    "ORDER BY epoch_us(ts) RANGE BETWEEN 1800000000 PRECEDING "
    "AND CURRENT ROW)",
    doc="time-RANGE window frame: per-user trailing-30-minute sum and "
    "count — the frame is bounded by event-TIME distance (RANGE "
    "BETWEEN on epoch micros), not row count, so it is insensitive "
    "to event density and totally determined by values (equal "
    "timestamps share one frame — no tie-break needed, unlike ROWS "
    "frames). Complements op34b's ROWS-based moving aggregates and "
    "op99's EWMA; one entity-partitioned window pass at any scale.",
)
def op101_range_frame(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-1_800_000_000, 0)
    )
    return _t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("v30"),
        F.count("*").over(w).alias("n30"),
    )
