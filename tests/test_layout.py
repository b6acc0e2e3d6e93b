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


def test_worker_sidecar_cache_evicts_by_bytes():
    """The worker chunk cache is BYTE-budgeted (r9, advice): a Bloom
    chunk holds up to 256 bit arrays that are MBs each at scale, so
    an entry-count bound could pin tens of GB.  Coldest entries
    evict once accumulated payload bytes exceed the budget; the
    entry just inserted always survives (a single over-budget chunk
    is used once, not thrash-evicted)."""
    import pdf_etl_ocr_inference_spark.operators.layout as L

    saved_cache = dict(L._WORKER_SIDECAR_CACHE)
    saved_budget = L._WORKER_SIDECAR_BUDGET_BYTES
    try:
        L._WORKER_SIDECAR_CACHE.clear()
        L._WORKER_SIDECAR_BUDGET_BYTES = 100
        L._worker_cache_put("a", "va", 40)
        L._worker_cache_put("b", "vb", 40)
        L._worker_cache_put("c", "vc", 40)  # 120 > 100: evict "a"
        assert set(L._WORKER_SIDECAR_CACHE) == {"b", "c"}
        # an entry larger than the whole budget still lands (used
        # once) and evicts everything colder
        L._worker_cache_put("big", "vbig", 500)
        assert "big" in L._WORKER_SIDECAR_CACHE
        assert set(L._WORKER_SIDECAR_CACHE) == {"big"}
        # LRU touch on hit: reinsertion order decides eviction
        L._WORKER_SIDECAR_CACHE.clear()
        L._worker_cache_put("x", "vx", 40)
        L._worker_cache_put("y", "vy", 40)
        L._WORKER_SIDECAR_CACHE["x"] = L._WORKER_SIDECAR_CACHE.pop("x")
        L._worker_cache_put("z", "vz", 40)  # evicts "y", not "x"
        assert set(L._WORKER_SIDECAR_CACHE) == {"x", "z"}
    finally:
        L._WORKER_SIDECAR_CACHE.clear()
        L._WORKER_SIDECAR_CACHE.update(saved_cache)
        L._WORKER_SIDECAR_BUDGET_BYTES = saved_budget
