"""Cost-based probe planning (optimizer.plan_hamming_radius): the
radius follows the occupancy model, index statistics are maintained by
build (observed during the write) and by incremental refresh, and
knn_join's "auto" mode matches the planner's explicit choice.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.optimizer import (
    IndexCatalog,
    build_lsh_index,
    knn_join,
    plan_hamming_radius,
    refresh_lsh_index,
)


def _idx(n_rows, n_planes=8, n_tables=3):
    return {"n_rows": n_rows, "n_planes": n_planes, "n_tables": n_tables}


def test_radius_model():
    # dense corpus: floored at the single-flip probe — candidate
    # volume is a cost bound, not a collision-probability model, so
    # the planner never narrows below radius 1
    assert plan_hamming_radius(_idx(1_000_000), k=5) == 1
    # 500 rows: r1 gives 3*9*500/256 ~ 53 >= 15
    assert plan_hamming_radius(_idx(500), k=5) == 1
    # 50 rows: need r2 (3*37*50/256 ~ 22 >= 15)
    assert plan_hamming_radius(_idx(50), k=5) == 2
    # tiny corpus: capped at max_radius
    assert plan_hamming_radius(_idx(3), k=5) == 3
    # missing statistics (pre-v5 index): the radius-1 floor
    assert plan_hamming_radius({"n_planes": 8, "n_tables": 3}, k=5) == 1


def test_build_and_refresh_maintain_n_rows(spark, tmp_path):
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(100)).cast(
            "double"
        )
        / 50.0
        - 1.0,
    )
    corpus = spark.range(0, 40).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )
    cat = IndexCatalog(root=str(tmp_path))
    key = "test/planner_stats"
    build_lsh_index(
        spark, corpus, key, n_planes=8, n_tables=3, catalog=cat
    )
    assert cat.lookup(key)["n_rows"] == 40

    # v1: 5 inserts + 2 deletes -> net +3
    inserts = (
        spark.range(100, 105)
        .select(F.col("id").alias("vec_id"), emb.alias("embedding"))
        .withColumn("_change_type", F.lit("insert"))
    )
    deletes = (
        corpus.filter(F.col("vec_id") < 2)
        .withColumn("_change_type", F.lit("delete"))
    )
    refresh_lsh_index(
        spark, key, inserts.unionByName(deletes), version=1, catalog=cat
    )
    assert cat.lookup(key)["n_rows"] == 43


def test_knn_join_auto_matches_planned_radius(spark, tmp_path):
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(7)),
        lambda j: F.pmod(F.xxhash64(F.col("id"), j), F.lit(100)).cast(
            "double"
        )
        / 50.0
        - 1.0,
    )
    corpus = spark.range(0, 60).select(
        F.col("id").alias("vec_id"), emb.alias("embedding")
    )
    cat = IndexCatalog(root=str(tmp_path))
    key = "test/planner_auto"
    build_lsh_index(spark, corpus, key, n_planes=8, n_tables=3, catalog=cat)
    queries = corpus.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), "embedding"
    )
    r = plan_hamming_radius(cat.lookup(key), k=3)
    auto = knn_join(
        queries, key, k=3, hamming_radius="auto", catalog=cat,
        exclude_self=True,
    ).collect()
    explicit = knn_join(
        queries, key, k=3, hamming_radius=r, catalog=cat,
        exclude_self=True,
    ).collect()
    assert sorted(map(tuple, auto)) == sorted(map(tuple, explicit))
    assert auto  # widened probe actually finds neighbors

    import pytest

    with pytest.raises(ValueError, match="auto"):
        knn_join(queries, key, k=3, hamming_radius="AUTO", catalog=cat)
