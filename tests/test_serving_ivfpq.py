"""IVF-PQ serving (kind='ivfpq'): residual ADC on pinned cells equals
the batch IVFADC path in the exhaustive-rerank regime, schedules tasks
only for probed cells, and refresh invalidates pinned state."""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.pq import (
    ivfpq_encode,
    topk_ivfpq,
    train_ivfpq_codebooks,
)
from pdf_etl_ocr_inference_spark.operators.serving import (
    build_ivfpq_serving_index,
    refresh_ivfpq_serving_index,
    serve_topk,
)
from pdf_etl_ocr_inference_spark.operators.similarity import ivf_assign

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
        .select("label", F.transform("vals", lambda s: s["m"]).alias("c"))
        .orderBy("label")
        .collect()
    )
    return [list(r["c"]) for r in rows]


def test_served_ivfpq_equals_batch_exhaustive(spark, tmp_path):
    """With rerank >= corpus, both paths degrade to exact search of
    the probed cells — results must be identical, which pins the
    residual-LUT arithmetic of the served path to the batch one."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = _centroids(emb)
    books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    corpus = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_serving_index(spark, corpus, path, cents, books)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    assigned = ivf_assign(corpus, "embedding", cents)
    enc = ivfpq_encode(assigned, "embedding", cents, books)
    batch = [
        (r["vec_id"], r["score"])
        for r in topk_ivfpq(
            enc, "embedding", qvec, cents, books,
            k=5, n_probe=2, rerank=1000,
        ).collect()
    ]
    served = [
        (r["vec_id"], r["score"])
        for r in serve_topk(
            spark, path, [(0, qvec)], k=5, kind="ivfpq",
            n_probe=2, rerank=1000,
        )
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    ]
    assert served == batch


def test_served_ivfpq_candidates_only_from_probed_cells(spark, tmp_path):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cents = _centroids(emb)
    books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    corpus = emb.filter(F.col("vec_id") != 0)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_serving_index(spark, corpus, path, cents, books)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    q = np.asarray(qvec, dtype="float64")
    q = q / np.sqrt((q * q).sum())
    order = sorted(
        range(len(cents)),
        key=lambda ci: -float(np.dot(q, np.asarray(cents[ci]))),
    )
    probed = set(order[:2])
    got = serve_topk(
        spark, path, [(0, qvec)], k=5, kind="ivfpq", n_probe=2, rerank=50,
    ).collect()
    ids = [r["vec_id"] for r in got]
    cell_of = {
        r["vec_id"]: r["cell"]
        for r in ivf_assign(corpus, "embedding", cents)
        .select("vec_id", "cell")
        .collect()
    }
    assert {cell_of[i] for i in ids} <= probed


def test_ivfpq_refresh_invalidates_and_reencodes(spark, tmp_path):
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]

    def vecs(rows):
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    corpus = vecs(
        [(i, [1.0, 0.01 * i, 0.02 * i, 0.0]) for i in range(12)]
        + [(100 + i, [0.01 * i, 1.0, 0.0, 0.03 * i]) for i in range(12)]
    )
    books = train_ivfpq_codebooks(
        corpus, "embedding", "vec_id", cents, m=2, k=4, sample_mod=1
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_serving_index(spark, corpus, path, cents, books)

    # insert a new vector into cell 1, then query near centroid 1
    changes = vecs([(500, [0.0, 1.0, 0.0, 0.0])]).withColumn(
        "_change_type", F.lit("insert")
    )
    touched = refresh_ivfpq_serving_index(spark, path, changes, version=1)
    assert touched == [1]
    got = serve_topk(
        spark, path, [(0, [0.0, 1.0, 0.0, 0.0])], k=2, kind="ivfpq",
        n_probe=1, rerank=100,
    ).collect()
    # vec 100 is exactly [0,1,0,0] too — both tie at 1.0, id breaks it
    assert [(r["vec_id"], r["score"]) for r in got] == [
        (100, 1.0),
        (500, 1.0),
    ]
