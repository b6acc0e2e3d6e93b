"""Streaming / incremental query catalog (OP-45/46).

The tumbling-window aggregation runs as a REAL Structured Streaming
job (availableNow trigger, memory sink) and is still oracle-checked:
in complete output mode every window is emitted, so the streaming
result must equal DuckDB's batch time_bucket aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.plans.registry import register
from pdf_etl_ocr_inference_spark.sources.catalog import TABLES
from pdf_etl_ocr_inference_spark.streaming.incremental import (
    derived_state_partitions,
    run_available_now,
    stream_events_raw,
    stream_events_sliding,
    stream_events_tumbling,
)
from pdf_etl_ocr_inference_spark.streaming.stateful import user_running_totals


@register(
    "op45_stream_tumbling",
    "SELECT TIME_BUCKET(INTERVAL '10 minutes', ts) AS window_start, "
    "event_type, COUNT(*) AS n, ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_value "
    "FROM events GROUP BY 1, 2",
    doc="watermarked 10-min tumbling-window agg over events, run as a "
    "Structured Streaming availableNow job (ref ocr:112 CDC + ocr:149 "
    "triggered sync, engine-native).",
)
def op45_stream_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    path = f"{sf}/events.parquet"
    streaming = stream_events_tumbling(
        spark,
        path,
        TABLES["events"],
        window="10 minutes",
        watermark="30 minutes",
    )
    return run_available_now(
        streaming,
        output_mode="complete",
        state_partitions=derived_state_partitions(path),
    )


@register(
    "op45b_stream_sliding",
    "SELECT window_start, event_type, COUNT(*) AS n, "
    "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS sum_value FROM ("
    "  SELECT UNNEST([TIME_BUCKET(INTERVAL '10 minutes', ts), "
    "    TIME_BUCKET(INTERVAL '10 minutes', ts) - INTERVAL '10 minutes']) "
    "    AS window_start, event_type, value FROM events) "
    "GROUP BY window_start, event_type",
    doc="sliding-window (20min/10min) streaming agg, availableNow. "
    "Oracle expands each event into its two overlapping windows — "
    "exactly the expansion Spark's window() generator performs.",
)
def op45b_stream_sliding(spark: SparkSession, sf: str) -> DataFrame:
    path = f"{sf}/events.parquet"
    streaming = stream_events_sliding(
        spark,
        path,
        TABLES["events"],
        window="20 minutes",
        slide="10 minutes",
    )
    return run_available_now(
        streaming,
        output_mode="complete",
        state_partitions=derived_state_partitions(path),
    )


@register(
    "op55_stateful_running_totals",
    "SELECT user_id, COUNT(*) AS n_events, "
    "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value FROM events GROUP BY user_id",
    doc="custom stateful operator via applyInPandasWithState: per-user "
    "running totals in GroupState. Under availableNow the caught-up "
    "state equals the batch aggregation — which is what the oracle "
    "verifies. O(1) state per key.",
)
def op55_stateful_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    path = f"{sf}/events.parquet"
    stream = stream_events_raw(spark, path, TABLES["events"])
    totals = user_running_totals(stream)
    out = run_available_now(
        totals,
        output_mode="update",
        state_partitions=derived_state_partitions(path),
    )
    # one emitted row per (user, micro-batch); the LAST emission per
    # user is the caught-up state.  n_events is strictly monotone per
    # user across emissions (each micro-batch a user appears in adds
    # >=1 event), so max_by(total_value, n_events) deterministically
    # selects the final state.  max(total_value) would NOT: value is
    # only monotone when event values are non-negative.
    return (
        out.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.round(F.max_by("total_value", "n_events"), 2).alias("total_value"),
        )
    )


@register(
    "op10_change_data_feed",
    "SELECT _change_type, COUNT(*) AS n FROM ("
    "  SELECT CASE "
    "    WHEN doc_id % 10 = 7 THEN 'delete' "
    "    WHEN doc_id % 10 = 3 THEN 'update_postimage' END AS _change_type "
    "  FROM documents WHERE doc_id % 10 IN (3, 7) "
    "  UNION ALL "
    "  SELECT 'update_preimage' FROM documents WHERE doc_id % 10 = 3 "
    "  UNION ALL SELECT 'insert' FROM documents) "
    "GROUP BY _change_type",
    doc="change data feed on plain parquet (ref ocr:112 "
    "delta.enableChangeDataFeed, engine-native): commit v0 = full "
    "insert, commit v1 = diff of an updated snapshot (doc_id%10==3 "
    "updated, %10==7 deleted) via full-outer reconciliation; "
    "read_changes(since=0) prunes to v1's directory only. Oracle "
    "derives the same change-row counts arithmetically.",
)
def op10_change_data_feed(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from pdf_etl_ocr_inference_spark.streaming.changefeed import (
        commit_changes,
        diff_snapshots,
        read_changes,
    )

    cdf_dir = tempfile.mkdtemp(prefix="cdf_")
    shutil.rmtree(cdf_dir, ignore_errors=True)

    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "n_chars"
    )
    # v0: initial full load
    commit_changes(
        docs.withColumn("_change_type", F.lit("insert")), cdf_dir, 0
    )
    # v1: an updated snapshot — %10==3 rows get new text, %10==7 dropped
    after = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 3, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
    )
    commit_changes(diff_snapshots(docs, after, "doc_id"), cdf_dir, 1)
    incremental = read_changes(spark, cdf_dir, since_version=-1)
    return incremental.groupBy("_change_type").agg(F.count("*").alias("n"))


@register(
    "op10b_cdf_compaction",
    # final state after v0 insert-all, v1 (update %10==3 / delete
    # %10==7), compact-through-1, v2 (delete %10==5): rows whose
    # doc_id%10 ∉ {5,7}, with %10==3 texts carrying the update marker
    "SELECT doc_id, (doc_id % 10 = 3) AS updated, n_chars "
    "FROM documents WHERE doc_id % 10 NOT IN (5, 7)",
    doc="change-feed compaction: fold v<=1 into a base snapshot, then "
    "apply a post-compaction commit. snapshot() over [base + v2] must "
    "equal the never-compacted state — the oracle derives that state "
    "arithmetically from documents. Proves compaction preserves "
    "reconstruction while bounding snapshot cost by current size, not "
    "history length.",
)
def op10b_cdf_compaction(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile

    from pdf_etl_ocr_inference_spark.streaming.changefeed import (
        commit_changes,
        compact,
        diff_snapshots,
        snapshot,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    cdf_dir = tempfile.mkdtemp(prefix="cdfc_")
    shutil.rmtree(cdf_dir, ignore_errors=True)

    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "n_chars"
    )
    commit_changes(
        docs.withColumn("_change_type", F.lit("insert")), cdf_dir, 0
    )
    v1 = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 3, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
    )
    commit_changes(diff_snapshots(docs, v1, "doc_id"), cdf_dir, 1)
    compact(spark, cdf_dir, key="doc_id", through_version=1)
    # post-compaction incremental commit: delete %10==5 survivors
    v2 = v1.filter(F.col("doc_id") % 10 != 5)
    commit_changes(diff_snapshots(v1, v2, "doc_id"), cdf_dir, 2)
    snap = snapshot(spark, cdf_dir, key="doc_id")
    return snap.select(
        "doc_id", F.col("text").endswith(" v2").alias("updated"), "n_chars"
    )


@register(
    "op45d_stream_stream_join",
    "SELECT p.event_id AS purchase_id, c.event_id AS click_id "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id "
    "AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts",
    doc="stream-stream interval join (watermarked both sides, state "
    "bounded by the 30-min time constraint + watermark horizon): "
    "purchases joined to preceding clicks per user as BOTH sides "
    "stream in. availableNow catch-up result equals the batch "
    "interval join (op50's oracle).",
)
def op45d_stream_stream_join(spark: SparkSession, sf: str) -> DataFrame:
    events_path = f"{sf}/events.parquet"
    purchases = (
        stream_events_raw(spark, events_path, TABLES["events"])
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    clicks = (
        stream_events_raw(spark, events_path, TABLES["events"])
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
    ).select("purchase_id", "click_id")
    return run_available_now(joined, output_mode="append")


@register(
    "op45g_stream_left_outer_join",
    "SELECT p.event_id AS purchase_id, c.event_id AS click_id "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id "
    "AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts",
    doc="stream-stream LEFT OUTER interval join — the semantics that "
    "only exist across micro-batch boundaries: an unmatched purchase "
    "emits its NULL-completed row only when BOTH sides' watermarks "
    "pass its join window (before that, a matching click could still "
    "arrive). The fixture replays as ordered micro-batches "
    "(maxFilesPerTrigger=1 over mtime-ordered files) with two "
    "far-future sentinel batches (user_id −1, filtered from the "
    "result) that push the watermark past every real event, so the "
    "availableNow run deterministically flushes ALL pending state "
    "and the result equals the batch LEFT JOIN (the oracle) exactly "
    "— matched rows AND null completions.",
)
def op45g_stream_left_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    import datetime as dt

    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        stage_ordered_files_stream,
    )

    events = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    maxts = events.agg(F.max("ts")).first()[0]
    sentinels = [
        spark.createDataFrame(
            [
                (-(2 * i), maxts + dt.timedelta(days=days), -1, "purchase", 0.0),
                (-(2 * i + 1), maxts + dt.timedelta(days=days), -1, "click", 0.0),
            ],
            schema=events.schema,
        )
        for i, days in enumerate((10, 20), start=1)
    ]
    safe = sf.strip("/").replace("/", "_")
    staged = f"{scratch_dir(f'louter_{safe}')}/feed"
    stage_ordered_files_stream(spark, [events, *sentinels], staged)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "left_outer",
    ).select("purchase_id", "click_id")
    out = run_available_now(joined, output_mode="append")
    return out.filter(F.col("purchase_id") >= 0)


@register(
    "op45h_stream_full_outer_join",
    "SELECT p.event_id AS purchase_id, c.event_id AS click_id "
    "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
    "FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c "
    "ON p.user_id = c.user_id "
    "AND c.ts >= p.ts - INTERVAL 30 MINUTE AND c.ts < p.ts",
    doc="stream-stream FULL OUTER interval join — both sides "
    "NULL-complete: an unmatched purchase emits (id, NULL) and an "
    "unmatched click emits (NULL, id), each only once BOTH "
    "watermarks pass its join window. Same sentinel-batch replay "
    "harness as op45g; the availableNow catch-up equals the batch "
    "FULL JOIN exactly. Completes the streaming join matrix "
    "(inner / left-outer / full-outer / stream-static).",
)
def op45h_stream_full_outer_join(spark: SparkSession, sf: str) -> DataFrame:
    import datetime as dt

    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        stage_ordered_files_stream,
    )

    events = load_table(spark, sf, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    maxts = events.agg(F.max("ts")).first()[0]
    sentinels = [
        spark.createDataFrame(
            [
                (-(2 * i), maxts + dt.timedelta(days=days), -1, "purchase", 0.0),
                (-(2 * i + 1), maxts + dt.timedelta(days=days), -1, "click", 0.0),
            ],
            schema=events.schema,
        )
        for i, days in enumerate((10, 20), start=1)
    ]
    safe = sf.strip("/").replace("/", "_")
    staged = f"{scratch_dir(f'fouter_{safe}')}/feed"
    stage_ordered_files_stream(spark, [events, *sentinels], staged)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 minute")
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 minute")
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("c_ts") < F.col("p_ts")),
        "full_outer",
    ).select("purchase_id", "click_id")
    out = run_available_now(joined, output_mode="append")
    # drop sentinel emissions from EITHER side (they are unmatched by
    # construction, so they surface as single-sided rows)
    return out.filter(
        (F.coalesce(F.col("purchase_id"), F.lit(0)) >= 0)
        & (F.coalesce(F.col("click_id"), F.lit(0)) >= 0)
    )


@register(
    "op45e_stream_static_join",
    "SELECT e.event_id, u.first_seen FROM events e JOIN ("
    "  SELECT user_id, STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS first_seen "
    "  FROM events GROUP BY user_id) u ON e.user_id = u.user_id "
    "WHERE e.event_type = 'purchase'",
    doc="stream-static enrichment join: the streaming side joins a "
    "batch dimension (per-user first-seen) — the static side is "
    "re-read per micro-batch, no state needed (vs stream-stream's "
    "stateful buffering).",
)
def op45e_stream_static_join(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table

    static_users = (
        load_table(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_seen"
            )
        )
    )
    stream = (
        stream_events_raw(spark, f"{sf}/events.parquet", TABLES["events"])
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id")
    )
    joined = stream.join(static_users, "user_id").select(
        "event_id", "first_seen"
    )
    return run_available_now(joined, output_mode="append")


@register(
    "op45f_stream_dedup",
    "SELECT COUNT(*) AS n_unique FROM ("
    "  SELECT DISTINCT event_id FROM events)",
    doc="streaming deduplication: dropDuplicates on the id within the "
    "watermark horizon — state holds one entry per id inside the "
    "horizon, expiring as the watermark advances (exactly-once-style "
    "ingestion dedup).",
)
def op45f_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    stream = (
        stream_events_raw(spark, f"{sf}/events.parquet", TABLES["events"])
        .withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .select("event_id")
    )
    deduped = run_available_now(stream, output_mode="append")
    return deduped.agg(F.count("*").alias("n_unique"))


@register(
    "op45c_foreachbatch_sink",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    doc="foreachBatch custom sink: each micro-batch lands in a parquet "
    "dir via arbitrary writer code (the escape hatch for sinks "
    "Structured Streaming lacks — upserts, JDBC, external indexes). "
    "availableNow catch-up, then the landed data is re-read and "
    "aggregated; oracle = batch aggregation of the same events.",
)
def op45c_foreachbatch_sink(spark: SparkSession, sf: str) -> DataFrame:
    import shutil
    import tempfile
    import uuid

    out_dir = tempfile.mkdtemp(prefix="fb_sink_")
    shutil.rmtree(out_dir, ignore_errors=True)

    stream = stream_events_raw(spark, f"{sf}/events.parquet", TABLES["events"])

    def _write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df.select("event_id", "event_type").write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_write_batch)
        .queryName(f"fb_{uuid.uuid4().hex[:8]}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out_dir)
    return landed.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "op46_incremental_sessionize",
    "SELECT user_id, COUNT(*) AS n_events, "
    "COUNT(DISTINCT event_type) AS n_types, "
    "ROUND(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) / 100.0, 2) AS total_value "
    "FROM events GROUP BY user_id",
    doc="per-user incremental rollup (the 'triggered sync' shape): "
    "batch-equivalent aggregation the availableNow refresh maintains.",
)
def op46_incremental_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    events = spark.read.parquet(f"{sf}/events.parquet")
    return events.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("event_type").alias("n_types"),
        F.round(
            F.sum(F.round(F.col("value") * 100, 0).cast("long")) / 100.0,
            2,
        ).alias("total_value"),
    )


@register(
    "op10c_time_travel",
    # as-of v0 must reproduce the ORIGINAL table exactly, even though
    # v1 later updated %10==3 and deleted %10==7 — the oracle is the
    # untouched source restricted to the same columns
    "SELECT doc_id, text, n_chars FROM documents",
    doc="time travel on the engine-native change feed: "
    "snapshot(as_of_version=0) reconstructs the table as of commit "
    "v0 by pruning later commit directories — read cost ∝ history "
    "up to N, not total history. The feed's v1 commit updated and "
    "deleted rows, so a leak of any later directory into the read "
    "would break the value-for-value match with the pristine "
    "source (the oracle).",
)
def op10c_time_travel(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table
    from pdf_etl_ocr_inference_spark.streaming.changefeed import (
        commit_changes,
        diff_snapshots,
        snapshot,
    )

    safe = sf.strip("/").replace("/", "_")
    cdf_dir = f"{scratch_dir(f'timetravel_{safe}')}/feed"
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "text", "n_chars"
    )
    commit_changes(
        docs.withColumn("_change_type", F.lit("insert")), cdf_dir, 0
    )
    after = (
        docs.filter(F.col("doc_id") % 10 != 7)
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 3,
                F.concat(F.col("text"), F.lit(" v2")),
            ).otherwise(F.col("text")),
        )
    )
    commit_changes(diff_snapshots(docs, after, "doc_id"), cdf_dir, 1)
    return snapshot(spark, cdf_dir, "doc_id", as_of_version=0)


@register(
    "op45i_dedup_within_watermark",
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type",
    doc="exactly-once ingestion from an AT-LEAST-ONCE feed: the whole "
    "events fixture replays as a SECOND micro-batch (duplicate "
    "delivery, the failure mode every queue/retry pipeline has) and "
    "dropDuplicatesWithinWatermark(event_id) collapses it — state "
    "keeps one entry per id only within the watermark horizon "
    "(bounded, unlike dropDuplicates' forever-state on an unbounded "
    "stream), and replayed rows older than the watermark are "
    "dropped as late rather than re-emitted, so EITHER path yields "
    "exactly one copy. Oracle = per-type counts of the ORIGINAL "
    "events: if dedup failed the stream would emit 2x and the "
    "row-count/hash check would catch it.",
)
def op45i_dedup_within_watermark(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.sources.catalog import load_table
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        stage_ordered_files_stream,
    )

    events = load_table(spark, sf, "events").select(
        "event_id", "ts", "event_type"
    )
    safe = sf.strip("/").replace("/", "_")
    staged = f"{scratch_dir(f'dedup_wm_{safe}')}/feed"
    # batch 0: the feed; batch 1: the SAME feed again (replay)
    stage_ordered_files_stream(spark, [events, events], staged)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out = run_available_now(stream, output_mode="append")
    return out.groupBy("event_type").agg(F.count("*").alias("n"))


@register(
    "op45j_state_store_reader",
    "SELECT CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 1800) AS BIGINT) "
    "* 1800) AS TIMESTAMP) AS window_start, "
    "event_type, COUNT(*) AS n FROM events GROUP BY 1, 2",
    doc="checkpoint STATE introspection (Spark 4's statestore data "
    "source): a watermarked 30-minute windowed aggregation runs with "
    "a checkpoint, then the state store itself is READ BACK as a "
    "DataFrame and oracled against the batch aggregation — proving "
    "the checkpoint holds exactly the per-(window, type) counts the "
    "batch computes, the debugging/ops surface for 'what is my "
    "streaming job remembering' (state bloat, skewed keys, stuck "
    "windows) without ever attaching a debugger to a running query. "
    "spark.read.format('state-metadata') rides alongside for the "
    "operator inventory.",
)
def op45j_state_store_reader(spark: SparkSession, sf: str) -> DataFrame:
    from pdf_etl_ocr_inference_spark.scratch import scratch_dir
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        stream_events_raw,
    )
    from pdf_etl_ocr_inference_spark.sources.catalog import TABLES

    safe = sf.strip("/").replace("/", "_")
    ckpt = f"{scratch_dir(f'ss_read_{safe}')}/ckpt"
    stream = (
        stream_events_raw(spark, f"{sf}/events.parquet", TABLES["events"])
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    import uuid

    q = (
        stream.writeStream.format("memory")
        .queryName(f"ssr_{uuid.uuid4().hex[:8]}")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    state = spark.read.format("statestore").load(ckpt)
    return state.select(
        F.col("key.window.start").alias("window_start"),
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").alias("n"),
    )
