"""Bucketed global ranking (operators/ranking.py) vs real window
functions on constructed edge cases the sf fixtures don't cover:
uneven ntile split, duplicate sort keys (tiebreak column), and a
single-bucket degenerate input."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.ranking import (
    global_rank_metrics,
    with_global_rank,
)


def _window_ref(df, ntiles=4):
    w = Window.orderBy("x", "id")
    return df.select(
        "id",
        F.ntile(ntiles).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("id", "quartile", "pct_rank", "cume").collect()
    )


def test_matches_window_uneven_ntile_and_dup_keys(spark):
    # 13 rows (13 % 4 = 1: first tile gets the extra row) with
    # duplicate x values — the id tiebreak must decide deterministically
    xs = [5.0, 3.0, 8.0, 1.0, 9.0, 2.0, 7.0, 4.0, 6.0, 5.0, 3.0, 9.0, 0.0]
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "id long, x double"
    )
    out = global_rank_metrics(df, ["x", "id"], ntiles=4, num_buckets=3)
    assert _rows(out) == _rows(_window_ref(df))


def test_matches_window_single_bucket(spark):
    # constant x: every row lands in one quantile bucket (bounds empty
    # after dedup) — degenerates to the plain window, still correct
    df = spark.createDataFrame(
        [(i, 7.0) for i in range(9)], "id long, x double"
    )
    out = global_rank_metrics(df, ["x", "id"], ntiles=4, num_buckets=4)
    assert _rows(out) == _rows(_window_ref(df))


def test_global_rank_is_dense_permutation(spark):
    df = spark.createDataFrame(
        [(i, float((i * 37) % 11)) for i in range(25)], "id long, x double"
    )
    ranked, total = with_global_rank(df, ["x", "id"], num_buckets=5)
    assert total == 25
    got = sorted(r["_global_rn"] for r in ranked.collect())
    assert got == list(range(1, 26))
