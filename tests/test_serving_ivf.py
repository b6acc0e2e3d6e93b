"""IVF serving (kind='ivf'): probed-cell task scheduling matches the
batch topk_ivf path exactly; refresh re-assigns moved vectors to
their new cells (touching both) and invalidates the pinned state.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.similarity import (
    ivf_assign,
    topk_ivf,
)
from pdf_etl_ocr_inference_spark.operators.serving import (
    build_ivf_serving_index,
    refresh_ivf_serving_index,
    serve_topk,
)

SF = "/root/testdata/sf0.001"


def _centroids(emb):
    rows = (
        emb.filter(F.col("vec_id") % 4 == 0)
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vals")
        )
        .select(F.transform("vals", lambda s: s["m"]).alias("centroid"))
        .orderBy("centroid")
        .collect()
    )
    return [list(r["centroid"]) for r in rows]


def test_served_ivf_equals_batch(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = _centroids(emb)
    path = str(tmp_path / "ivf")
    build_ivf_serving_index(spark, emb, path, cents)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    batch = [
        (r["vec_id"], r["score"])
        for r in topk_ivf(
            ivf_assign(emb, "embedding", cents),
            "embedding",
            qvec,
            cents,
            k=5,
            n_probe=2,
        ).collect()
    ]
    served = [
        (r["vec_id"], r["score"])
        for r in serve_topk(
            spark, path, [(0, qvec)], k=5, kind="ivf", n_probe=2
        )
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    ]
    assert served == batch


def test_ivf_refresh_moves_vector_between_cells(spark, tmp_path):
    # two well-separated centroids; vectors cluster around them
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    corpus = vecs(
        [(i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(10)]
        + [(100 + i, [0.01 * i, 1.0, 0.0, 0.0]) for i in range(10)]
    )
    path = str(tmp_path / "ivf")
    build_ivf_serving_index(spark, corpus, path, cents)

    # move vector 5 from cell 0 to cell 1 via an update pair
    changes = (
        vecs([(5, [1.0, 0.05, 0.0, 0.0])]).withColumn(
            "_change_type", F.lit("update_preimage")
        )
    ).unionByName(
        vecs([(5, [0.0, 1.0, 0.5, 0.0])]).withColumn(
            "_change_type", F.lit("update_postimage")
        )
    )
    touched = refresh_ivf_serving_index(spark, path, changes, version=1)
    assert touched == [0, 1]  # preimage cell AND postimage cell

    # query near centroid 1 must now find vec 5 in cell 1
    q = [0.0, 1.0, 0.4, 0.0]
    got = serve_topk(
        spark, path, [(0, q)], k=3, kind="ivf", n_probe=1
    ).collect()
    assert 5 in {r["vec_id"] for r in got}
    # and cell 0 no longer contains it (probe only cell 0)
    got0 = serve_topk(
        spark, path, [(0, [1.0, 0.0, 0.0, 0.0])], k=20, kind="ivf",
        n_probe=1,
    ).collect()
    assert 5 not in {r["vec_id"] for r in got0}
    # retry is a no-op
    assert refresh_ivf_serving_index(spark, path, changes, version=1) == []
