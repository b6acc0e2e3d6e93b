"""Layout helpers: minimum-parallelism guard and adaptive lineage
truncation (reliable checkpoint when a checkpoint dir is configured,
localCheckpoint otherwise)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.layout import (
    ensure_min_parallelism,
    truncate_lineage,
)


def test_ensure_min_parallelism_widens_narrow_input(spark):
    narrow = spark.range(0, 1000, 1, 1)
    assert narrow.rdd.getNumPartitions() == 1
    wide = ensure_min_parallelism(narrow)
    assert wide.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    already = ensure_min_parallelism(wide)
    assert already is wide  # no extra shuffle when wide enough


def test_truncate_lineage_local_and_reliable(spark, tmp_path):
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    sc = spark.sparkContext
    assert not sc._jsc.sc().getCheckpointDir().isDefined()
    local = truncate_lineage(df)
    assert local.count() == 10
    # configure a checkpoint dir → the reliable branch engages and
    # actually materializes files there
    ckpt = str(tmp_path / "ckpt")
    sc.setCheckpointDir(ckpt)
    try:
        reliable = truncate_lineage(df)
        assert reliable.count() == 10
        assert any(os.scandir(ckpt))  # something was written
    finally:
        # reset for other tests in the shared session ($eq setter is
        # not valid Python syntax — go through getattr)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None)
        )
