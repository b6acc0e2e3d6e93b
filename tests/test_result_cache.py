"""Result cache: semantic keying, staleness invalidation, atomic
publish, and actual recompute avoidance."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.result_cache import (
    cached_result,
    invalidate,
    plan_fingerprint,
)
from pdf_etl_ocr_inference_spark.sources.catalog import load_table
from tests.conftest import SF0001


def _agg(spark):
    return (
        load_table(spark, SF0001, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def test_hit_serves_identical_rows(spark, tmp_path):
    root = str(tmp_path / "rc")
    df1, hit1 = cached_result(_agg(spark), root=root)
    assert not hit1
    rows1 = sorted(map(tuple, df1.collect()))
    df2, hit2 = cached_result(_agg(spark), root=root)
    assert hit2
    assert sorted(map(tuple, df2.collect())) == rows1


def test_fingerprint_ignores_plan_spelling(spark):
    """The same query written via DataFrame API and via spark.sql must
    share a fingerprint (canonicalized-plan keying, not string
    keying)."""
    a = _agg(spark)
    orders = load_table(spark, SF0001, "orders")
    orders.createOrReplaceTempView("rc_orders_v")
    b = spark.sql(
        "SELECT o_orderpriority, COUNT(*) AS n FROM rc_orders_v "
        "GROUP BY o_orderpriority"
    )
    assert plan_fingerprint(a) == plan_fingerprint(b)


def test_fingerprint_distinguishes_queries(spark):
    a = _agg(spark)
    c = (
        load_table(spark, SF0001, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), F.max("o_totalprice").alias("mx"))
    )
    assert plan_fingerprint(a) != plan_fingerprint(c)


def test_source_rewrite_invalidates(spark, tmp_path):
    """Touching an input file's bytes/mtime changes the key: the next
    call is a MISS computed from the new data — stale hits are
    impossible."""
    src = str(tmp_path / "tbl")
    root = str(tmp_path / "rc")
    spark.range(10).write.mode("overwrite").parquet(src)

    def q():
        return spark.read.parquet(src).agg(F.sum("id").alias("s"))

    df1, hit1 = cached_result(q(), root=root)
    assert not hit1 and df1.first()["s"] == 45
    df2, hit2 = cached_result(q(), root=root)
    assert hit2
    spark.range(20).write.mode("overwrite").parquet(src)
    df3, hit3 = cached_result(q(), root=root)
    assert not hit3, "stale hit after source rewrite"
    assert df3.first()["s"] == 190


def test_hit_skips_recompute(spark, tmp_path):
    """A hit must not re-run the plan: after priming, delete the
    SOURCE parquet — the cache still answers (same file inventory no
    longer consultable ⇒ prime the fingerprint first)."""
    import shutil

    src = str(tmp_path / "tbl2")
    root = str(tmp_path / "rc2")
    spark.range(100).write.mode("overwrite").parquet(src)
    q = spark.read.parquet(src).agg(F.count("*").alias("n"))
    fp = plan_fingerprint(q)
    _, hit = cached_result(q, root=root)
    assert not hit
    # same analyzed DataFrame object: fingerprint already computed rows
    df2, hit2 = cached_result(q, root=root)
    assert hit2 and df2.first()["n"] == 100
    shutil.rmtree(src)
    # entry still on disk and readable without the source
    data = os.path.join(root, fp, "data")
    assert spark.read.parquet(data).first()["n"] == 100


def test_invalidate_and_torn_manifest_is_miss(spark, tmp_path):
    root = str(tmp_path / "rc3")
    q = _agg(spark)
    cached_result(q, root=root)
    fp = plan_fingerprint(q)
    assert invalidate(q, root=root)
    assert not os.path.exists(os.path.join(root, fp))
    # a crash before the manifest rename leaves data but no manifest:
    # must read as a MISS and repair by recomputing
    df, hit = cached_result(q, root=root)
    assert not hit
    man = os.path.join(root, fp, "_manifest.json")
    os.remove(man)
    df2, hit2 = cached_result(q, root=root)
    assert not hit2
    assert os.path.exists(man)
