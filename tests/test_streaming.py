"""Streaming semantics tests that the batch-equals-stream oracle can't
cover: watermark late-data dropping and multi-batch stateful catch-up.

Both tests force MULTIPLE micro-batches (maxFilesPerTrigger=1) so the
cross-batch behavior — watermark advancement, GroupState persistence —
actually executes; a single availableNow batch would hide it.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.streaming.stateful import user_running_totals

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, dirpath: str, name: str, rows: list[tuple]):
    df = spark.createDataFrame(rows, SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(dirpath, "_stage", name)
    )
    # move the part file in atomically so the stream sees whole files
    import glob as _glob
    import shutil

    part = _glob.glob(os.path.join(dirpath, "_stage", name, "part-*.parquet"))[0]
    shutil.move(part, os.path.join(dirpath, f"{name}.parquet"))


@pytest.fixture()
def stream_dir(tmp_path):
    return str(tmp_path / f"stream_{uuid.uuid4().hex[:8]}")


def _ts(s: str):
    import datetime as dt

    return dt.datetime.fromisoformat(s)


def test_append_mode_emits_closed_windows_once(spark, stream_dir):
    """Append-mode watermark semantics across micro-batches.

    Spark's watermark is a LOWER bound: aggregation state accepts late
    rows until the window is evicted (numRowsDroppedByWatermark stays 0
    for agg state that still exists / can be recreated) — so the test
    asserts what append mode actually guarantees: each window is
    emitted exactly once, after the watermark passes its end, with the
    totals accumulated up to eviction.
    """
    os.makedirs(stream_dir, exist_ok=True)
    # batch 1: 10:00-10:09 → watermark after batch = 10:04
    _write_batch(
        spark,
        stream_dir,
        "b1",
        [
            (_ts("2024-01-01T10:00:00"), 1, 1.0),
            (_ts("2024-01-01T10:09:00"), 1, 2.0),
        ],
    )
    # batch 2: 10:30 → watermark 10:25 closes the 10:00 window
    _write_batch(
        spark,
        stream_dir,
        "b2",
        [(_ts("2024-01-01T10:30:00"), 1, 4.0)],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
        .withWatermark("ts", "5 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.sum("value").alias("total"))
        .select(F.col("w.start").alias("ws"), "total")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")  # append emits only watermark-closed windows
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    emitted = [r["ws"].isoformat() for r in rows]
    # exactly-once emission of the closed window, with full totals
    assert emitted.count("2024-01-01T10:00:00") == 1
    got = {r["ws"].isoformat(): r["total"] for r in rows}
    assert got["2024-01-01T10:00:00"] == 3.0
    # the 10:30 window is still open (watermark 10:25 < 10:40) → held back
    assert "2024-01-01T10:30:00" not in got


def test_stateful_totals_accumulate_across_batches(spark, stream_dir):
    os.makedirs(stream_dir, exist_ok=True)
    _write_batch(
        spark,
        stream_dir,
        "b1",
        [
            (_ts("2024-01-01T10:00:00"), 7, 1.0),
            (_ts("2024-01-01T10:01:00"), 7, 2.0),
        ],
    )
    _write_batch(
        spark,
        stream_dir,
        "b2",
        [(_ts("2024-01-01T10:02:00"), 7, 4.0)],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    totals = user_running_totals(stream)
    name = f"st_{uuid.uuid4().hex[:8]}"
    q = (
        totals.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table(name).collect()
    # two micro-batches → two emissions for user 7; state carried the
    # first batch's totals into the second
    emitted = sorted(
        (r["n_events"], r["total_value"]) for r in rows if r["user_id"] == 7
    )
    assert emitted == [(2, 3.0), (3, 7.0)]


def test_left_outer_null_completion_waits_for_watermark(spark, stream_dir):
    """Outer-join state semantics across micro-batches: an unmatched
    left row NULL-completes only after both watermarks pass its join
    window; rows the watermark never passes stay pending (which is why
    op45g's fixture appends far-future sentinel batches)."""
    from pdf_etl_ocr_inference_spark.streaming.incremental import (
        stage_ordered_files_stream,
    )

    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("side", T.StringType()),
            T.StructField("k", T.LongType()),
        ]
    )
    b0 = spark.createDataFrame(
        [
            (_ts("2024-01-01T10:00:00"), "L", 1),  # will match
            (_ts("2024-01-01T10:00:00"), "L", 2),  # never matches
            (_ts("2024-01-01T10:00:30"), "R", 1),
        ],
        schema,
    )
    # sentinel far past b0 (watermark pushes past every b0 row), then
    # a second sentinel so the first one's watermark effect flushes
    b1 = spark.createDataFrame([(_ts("2024-01-02T10:00:00"), "X", -1)], schema)
    b2 = spark.createDataFrame([(_ts("2024-01-03T10:00:00"), "X", -1)], schema)
    stage_ordered_files_stream(spark, [b0, b1, b2], stream_dir)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    left = (
        stream.filter(F.col("side") != "R")
        .select(F.col("k").alias("lk"), F.col("ts").alias("l_ts"))
        .withWatermark("l_ts", "1 second")
    )
    right = (
        stream.filter(F.col("side") != "L")
        .select(F.col("k").alias("rk"), F.col("ts").alias("r_ts"))
        .withWatermark("r_ts", "1 second")
    )
    joined = left.join(
        right,
        (F.col("lk") == F.col("rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") < F.col("l_ts") + F.expr("INTERVAL 1 MINUTE")),
        "left_outer",
    ).select("lk", "rk")

    name = f"lo_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {(r["lk"], r["rk"]) for r in spark.table(name).collect() if r["lk"] > 0}
    assert rows == {(1, 1), (2, None)}


class _FakeConf:
    def __init__(self, master):
        self._m = master

    def get(self, key, default=None):
        return self._m if key == "spark.master" else default


class _FakeSpark:
    def __init__(self, master):
        self.conf = _FakeConf(master)


def test_tmpfs_checkpoint_local_masters_only(tmp_path, monkeypatch):
    """r11 verdict #2 / advisory: the run-to-completion checkpoint
    defaults to /dev/shm ONLY on a local master, via a user-scoped
    mkdtemp, with a free-space floor — a cluster master, a missing
    or full tmpfs, or an mkdtemp failure (multi-tenant EACCES) all
    fall back to the engine-managed /tmp default (None)."""
    import pdf_etl_ocr_inference_spark.streaming.incremental as inc

    # cluster masters: never tmpfs, regardless of /dev/shm state
    for master in ("spark://host:7077", "yarn", "k8s://https://api"):
        assert inc._tmpfs_checkpoint_dir(_FakeSpark(master), "x") is None

    if not __import__("os").path.isdir("/dev/shm"):
        return  # remaining arms need a real tmpfs

    # local master on a healthy tmpfs: a private 0700 dir under shm
    got = inc._tmpfs_checkpoint_dir(_FakeSpark("local[32]"), "x")
    assert got is not None and got.startswith("/dev/shm/")
    import os as _os

    assert _os.stat(got).st_mode & 0o777 == 0o700
    _os.rmdir(got)

    # low free space: fall back
    class _St:
        f_bavail = 1
        f_frsize = 4096

    monkeypatch.setattr(inc.os, "statvfs", lambda p: _St())
    assert inc._tmpfs_checkpoint_dir(_FakeSpark("local[4]"), "x") is None
    monkeypatch.undo()

    # mkdtemp failure (another user's same-named parent): fall back
    def _boom(*a, **k):
        raise OSError(13, "Permission denied")

    monkeypatch.setattr(inc.tempfile, "mkdtemp", _boom)
    assert inc._tmpfs_checkpoint_dir(_FakeSpark("local[4]"), "x") is None
