"""Incremental / streaming layer (SURVEY.md §2.9, OP-45/46).

The reference's only incremental constructs are Delta Change Data Feed
(``ocr:112``) and a TRIGGERED vector-index sync (``ocr:149``).  The
open-source Spark-native equivalents:

- file-source ``readStream`` over a table directory = the change feed
  (new files are the appended changes);
- ``trigger(availableNow=True)`` = the triggered, catch-up-then-stop
  incremental refresh;
- watermark + tumbling window = bounded-state late-data aggregation
  for the ``events`` stream.

State scale note: watermarks bound the window-state store, so the agg
state at 100 TB/day is proportional to (windows in watermark horizon ×
keys), not to history.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


# One wrapper dir per resolved source file, created lazily and reused
# for the process lifetime — repeated catalog/bench/gate passes must
# not leak a fresh mkdtemp per call.
_STREAM_DIR_CACHE: dict = {}


def _as_stream_dir(path: str) -> str:
    """The file streaming source requires a *directory*.  A production
    table is a directory of parquet files already; the single-file
    testdata fixtures get symlinked into a (cached, per-source) temp
    dir."""
    if os.path.isdir(path):
        return path
    key = os.path.abspath(path)
    d = _STREAM_DIR_CACHE.get(key)
    if d is None or not os.path.isdir(d):
        d = tempfile.mkdtemp(prefix="stream_src_")
        os.symlink(key, os.path.join(d, os.path.basename(path)))
        _STREAM_DIR_CACHE[key] = d
    return d


def _read_events_stream(
    spark: SparkSession, events_path: str, schema: T.StructType
) -> DataFrame:
    """Streaming scan of events with ``ts`` as a proper timestamp,
    whatever precision the parquet carries.

    Micro-precision files read natively; nano-precision files (which
    Spark's vectorized reader only surfaces as long under
    ``spark.sql.legacy.parquet.nanosAsLong``) are read as long nanos
    and floor-converted post-read.
    """
    from pdf_etl_ocr_inference_spark.sources.catalog import (
        event_ts_unit,
        normalize_event_ts,
    )

    if event_ts_unit(events_path) != "ns":
        return (
            spark.readStream.schema(schema)
            .parquet(_as_stream_dir(events_path))
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_fields = [
        T.StructField(f.name, T.LongType() if f.name == "ts" else f.dataType)
        for f in schema.fields
    ]
    stream = (
        spark.readStream.schema(T.StructType(raw_fields))
        .parquet(_as_stream_dir(events_path))
    )
    return normalize_event_ts(stream)


def stream_events_tumbling(
    spark: SparkSession,
    events_path: str,
    schema: T.StructType,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming tumbling-window aggregation over the events table.

    Returns the *streaming* DataFrame (caller attaches the sink).
    """
    stream = _read_events_stream(spark, events_path, schema).withWatermark(
        "ts", watermark
    )
    return (
        stream.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact integer cents summed in state, divided once: a
            # float sum's accumulation order (state merge order) is
            # engine-specific, and one group at a ROUND boundary
            # flips the driver's full-precision hash (tpch_q9, r5)
            F.round(
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("long")
                )
                / 100.0,
                2,
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_events_raw(
    spark: SparkSession,
    events_path: str,
    schema: T.StructType,
) -> DataFrame:
    """Streaming scan of the events fixture (ts normalized to a proper
    timestamp whatever the file precision), no aggregation attached —
    the building block for custom stateful operators."""
    return _read_events_stream(spark, events_path, schema)


def stream_events_sliding(
    spark: SparkSession,
    events_path: str,
    schema: T.StructType,
    window: str = "20 minutes",
    slide: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Sliding-window streaming aggregation: each event lands in
    window/slide overlapping windows (2 here).  State size is bounded
    by (windows in watermark horizon × groups), not history."""
    stream = stream_events_raw(spark, events_path, schema).withWatermark(
        "ts", watermark
    )
    return (
        stream.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            # exact integer cents summed in state, divided once: a
            # float sum's accumulation order (state merge order) is
            # engine-specific, and one group at a ROUND boundary
            # flips the driver's full-precision hash (tpch_q9, r5)
            F.round(
                F.sum(
                    F.round(F.col("value") * 100, 0).cast("long")
                )
                / 100.0,
                2,
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stage_ordered_files_stream(
    spark: SparkSession, dfs: list[DataFrame], path: str
) -> None:
    """Write each DataFrame as exactly ONE parquet file under ``path``
    with strictly increasing names AND mtimes, so a file stream read
    with ``maxFilesPerTrigger=1`` replays them as ordered
    micro-batches — the harness for semantics that only materialize
    across batch BOUNDARIES (watermark advancement, state eviction,
    outer-join NULL completion).

    All DataFrames must share a schema; callers append sentinel
    batches (far-future rows on the watermark column) to push the
    watermark past the real data deterministically — without them an
    availableNow run ends with real rows still pending in state.
    """
    import glob
    import shutil
    import time as _time

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path)
    for i, df in enumerate(dfs):
        tmp = f"{path}/_stage_{i}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        shutil.move(part, f"{path}/batch_{i:05d}.parquet")
        shutil.rmtree(tmp)
    now = _time.time()
    for i, f in enumerate(sorted(os.listdir(path))):
        os.utime(f"{path}/{f}", (now + i, now + i))


# Don't default onto a tmpfs that can't hold a state store: Docker's
# default /dev/shm is 64 MB and a windowed agg's checkpoint can
# exceed it mid-batch, failing the micro-batch where the plain /tmp
# default would have worked.
_SHM_MIN_FREE_BYTES = 256 * 1024 * 1024


def _tmpfs_checkpoint_dir(spark, name: str) -> str | None:
    """Resolve the run-to-completion checkpoint's tmpfs default, or
    ``None`` for the engine-managed /tmp default.  tmpfs is used only
    when ALL of these hold (r11 advisory — each guard is a real
    failure mode):

    - ``spark.master`` is local: on a cluster, executors don't share
      the driver's /dev/shm, and a RAM-backed checkpoint on the
      driver is the wrong durability/locality call anyway;
    - /dev/shm exists with ≥ ``_SHM_MIN_FREE_BYTES`` free;
    - a USER-SCOPED ``mkdtemp`` succeeds (0700, collision-free — a
      fixed shared parent would EACCES for the second user on a
      multi-tenant host)."""
    try:
        master = str(spark.conf.get("spark.master", ""))
    except Exception:
        master = ""
    if not master.startswith("local"):
        return None
    if not os.path.isdir("/dev/shm"):
        return None
    try:
        st = os.statvfs("/dev/shm")
        if st.f_bavail * st.f_frsize < _SHM_MIN_FREE_BYTES:
            return None
        return tempfile.mkdtemp(
            prefix=f"spark_graft_ckpt_{name}_", dir="/dev/shm"
        )
    except OSError:
        return None


# Scale-adaptive state-store sizing for one-shot availableNow runs.
# AQE coalesces BATCH shuffle partitions at runtime but cannot touch
# STREAMING state partitions: their count is fixed by
# spark.sql.shuffle.partitions at first query start and pinned into
# the checkpoint.  So derive the count from INPUT SIZE the way AQE
# would — one state partition per ~32 MB of source input, floored at
# 8 (parallelism for tiny fixtures) and capped at 2048 (state-store
# file-count sanity at 100 TB).  Overridable for deployments via
# $SPARK_GRAFT_STATE_PART_TARGET_BYTES; measured locally (sf0.1
# events, 32 cores): 32 state partitions → 8 cut the whole op45
# entry 1.4 → 0.87 s, all of it addBatch (state-store init + commit
# of 4× more stores than groups warrant).
_STATE_PART_TARGET_BYTES = int(
    os.environ.get(
        "SPARK_GRAFT_STATE_PART_TARGET_BYTES", str(32 * 1024 * 1024)
    )
)
_STATE_PART_MIN = 8
_STATE_PART_MAX = 2048


def derived_state_partitions(path: str) -> int:
    """State-partition count for an availableNow aggregation over the
    file source at ``path`` (file or directory), derived from input
    bytes — see the module constant block above."""
    import math

    try:
        if os.path.isdir(path):
            size = sum(
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if not f.startswith((".", "_"))
            )
        else:
            size = os.path.getsize(path)
    except OSError:
        return _STATE_PART_MIN
    return max(
        _STATE_PART_MIN,
        min(_STATE_PART_MAX, math.ceil(size / _STATE_PART_TARGET_BYTES)),
    )


def run_available_now(
    streaming_df: DataFrame,
    output_mode: str = "complete",
    timeout_s: int = 120,
    checkpoint_dir: str | None = None,
    state_partitions: int | None = None,
) -> DataFrame:
    """OP-46: run a streaming plan to completion on currently-available
    data (``trigger(availableNow=True)``) into a memory sink; return
    the result as a batch DataFrame.

    ``complete`` mode emits every window regardless of watermark
    position — the right semantics for a catch-up batch refresh.

    ``checkpoint_dir`` overrides the checkpoint location (bench
    attribution uses it to A/B the checkpoint/state-store
    filesystem).  When unset, the run-to-completion checkpoint +
    state store go on tmpfs (``/dev/shm``) — LOCAL MASTERS ONLY,
    via a user-scoped mkdtemp, and only when tmpfs has headroom
    (see :func:`_tmpfs_checkpoint_dir`) — falling back to the
    engine-managed /tmp temp dir otherwise: this checkpoint is
    DISCARDED at the end of the call (one-shot catch-up into a
    memory sink — recovery durability buys nothing), and /tmp IO is
    the headline set's most contention-sensitive surface (r10
    verdict #1: op45 2.06× on byte-unchanged code under fs
    contention; the r11 attribution block measured the shm variant
    23% faster even at its calm baseline).  Incremental-ingestion
    checkpoints that must SURVIVE across calls (the *_stream_sync
    at-least-once watermarks) pass their own durable directory and
    are untouched by this default.
    """
    import shutil

    spark = streaming_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    tmp_ckpt = None
    if checkpoint_dir is None:
        tmp_ckpt = _tmpfs_checkpoint_dir(spark, name)
        checkpoint_dir = tmp_ckpt
    writer = (
        streaming_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    # r13 (verdict-r12 #3, guide §5): ``state_partitions`` (callers
    # derive it from input size via derived_state_partitions) is
    # applied through spark.sql.shuffle.partitions EXACTLY around
    # query start — the only point where streaming state-partition
    # count can be set — and restored after termination.  The
    # checkpoint is per-run (one-shot catch-up), so the pinned count
    # never conflicts with a prior incarnation.
    _SP = "spark.sql.shuffle.partitions"
    sp_prev = None
    if state_partitions is not None:
        sp_prev = spark.conf.get(_SP)
        spark.conf.set(_SP, str(state_partitions))
    q = None
    try:
        q = writer.start()
        q.awaitTermination(timeout_s)
    finally:
        # rmtree must run even when start() raises or stop() throws
        # (review-r11: a leaked tmpfs checkpoint is RAM held until
        # reboot) — sequence the teardowns independently
        try:
            if q is not None and q.isActive:
                q.stop()
        finally:
            if sp_prev is not None:
                spark.conf.set(_SP, sp_prev)
            if tmp_ckpt is not None:
                shutil.rmtree(tmp_ckpt, ignore_errors=True)
    return spark.table(name)
