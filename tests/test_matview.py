"""Materialized-view rewrite: spelling-invariant matching, stale
fall-through, IVM refresh ≡ recompute, guard-rail pass-through."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.matview import (
    create_materialized_view,
    matview_rewrite,
    refresh_materialized_view,
)
from pdf_etl_ocr_inference_spark.streaming.changefeed import diff_snapshots


def _mk_base(spark, path: str, n: int = 100):
    spark.range(n).select(
        F.col("id"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 3).alias("val"),
    ).write.mode("overwrite").parquet(path)


def _define(spark, path: str):
    return (
        spark.read.parquet(path)
        .groupBy("grp")
        .agg(F.count("*").alias("n_rows"), F.sum("val").alias("sum_val"))
    )


def test_rewrite_hits_and_matches_recompute(spark, tmp_path):
    base = str(tmp_path / "base")
    root = str(tmp_path / "mv")
    _mk_base(spark, base)
    create_materialized_view(spark, _define(spark, base), "v", root=root)
    q = _define(spark, base)
    served = matview_rewrite(q, root=root)
    assert served is not q
    assert sorted(f for f in served.inputFiles() if "/mv/" in f)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, q.collect())
    )


def test_rewrite_is_spelling_invariant_and_renames(spark, tmp_path):
    base = str(tmp_path / "base")
    root = str(tmp_path / "mv")
    _mk_base(spark, base)
    create_materialized_view(spark, _define(spark, base), "v", root=root)
    spark.read.parquet(base).createOrReplaceTempView("mv_base_v")
    q = spark.sql(
        "SELECT grp, COUNT(*) AS cnt, SUM(val) AS s FROM mv_base_v "
        "GROUP BY grp"
    )
    served = matview_rewrite(q, root=root)
    assert served is not q
    # the query's OWN aliases, not the view definition's
    assert served.columns == ["grp", "cnt", "s"]


def test_unrefreshed_view_falls_through_after_base_rewrite(spark, tmp_path):
    base = str(tmp_path / "base")
    root = str(tmp_path / "mv")
    _mk_base(spark, base, n=50)
    create_materialized_view(spark, _define(spark, base), "v", root=root)
    _mk_base(spark, base, n=80)  # base evolves, view NOT refreshed
    q = _define(spark, base)
    served = matview_rewrite(q, root=root)
    assert served is q, "stale view must not serve a changed base"
    assert q.agg(F.sum("n_rows")).first()[0] == 80


def test_ivm_refresh_restores_hit_and_equals_recompute(spark, tmp_path):
    import shutil

    base = str(tmp_path / "base")
    root = str(tmp_path / "mv")
    _mk_base(spark, base)
    create_materialized_view(spark, _define(spark, base), "v", root=root)

    before = spark.read.parquet(base)
    after = before.filter(F.col("id") % 10 != 0).withColumn(
        "val",
        F.when(F.col("id") % 10 == 1, F.col("val") + 5).otherwise(
            F.col("val")
        ),
    )
    changes = str(tmp_path / "changes")
    diff_snapshots(before, after, "id").write.parquet(changes)
    staged = str(tmp_path / "base_next")
    after.write.parquet(staged)
    shutil.rmtree(base)
    os.replace(staged, base)

    refresh_materialized_view(
        spark,
        "v",
        _define(spark, base),
        spark.read.parquet(changes),
        keys=["grp"],
        sum_cols={"sum_val": "val"},
        root=root,
    )
    q = _define(spark, base)
    served = matview_rewrite(q, root=root)
    assert served is not q
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, q.collect())
    )


def test_non_matching_query_passes_through(spark, tmp_path):
    base = str(tmp_path / "base")
    root = str(tmp_path / "mv")
    _mk_base(spark, base)
    create_materialized_view(spark, _define(spark, base), "v", root=root)
    q = (
        spark.read.parquet(base)
        .groupBy("grp")
        .agg(F.max("val").alias("mx"))  # different aggregate
    )
    assert matview_rewrite(q, root=root) is q
