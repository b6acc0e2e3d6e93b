"""Deterministic distributed PCA: exact parity of the quantized
covariance with a single-machine numpy replica, partition-layout
invariance, projection correctness, and variance ordering."""

import numpy as np
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
SCALE = 1 << 20


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _mat(spark):
    rows = _emb(spark).orderBy("vec_id").collect()
    return np.stack([np.array(r["embedding"]) for r in rows]).astype(
        np.float64
    )


def test_gram_matches_numpy_replica(spark):
    from pdf_etl_ocr_inference_spark.operators.pca import gram_table

    got = {
        (r["i"], r["j"]): int(r["s"])
        for r in gram_table(_emb(spark), "embedding", 8).collect()
    }
    q = np.floor(_mat(spark)[:, :8] * SCALE).astype(object)
    ref = q.T @ q
    for (i, j), s in got.items():
        assert s == int(ref[i][j]), (i, j)
    assert len(got) == 36


def test_fit_partition_invariant_and_ordered(spark):
    from pdf_etl_ocr_inference_spark.operators.pca import fit_pca

    emb = _emb(spark)
    c1, e1, m1 = fit_pca(emb, "embedding", k=4)
    c2, e2, m2 = fit_pca(emb.repartition(17), "embedding", k=4)
    # integer covariance -> bit-identical decomposition input -> all
    # outputs exactly equal regardless of partitioning
    assert np.array_equal(c1, c2) and np.array_equal(e1, e2)
    assert np.array_equal(m1, m2)
    assert all(e1[i] >= e1[i + 1] for i in range(len(e1) - 1))
    # orthonormal rows
    assert np.allclose(c1 @ c1.T, np.eye(4), atol=1e-9)


def test_projection_matches_numpy(spark):
    from pdf_etl_ocr_inference_spark.operators.pca import (
        fit_pca,
        project_pca,
    )

    emb = _emb(spark)
    comps, _e, mean = fit_pca(emb, "embedding", k=4)
    got = {
        r["vec_id"]: np.array(r["proj"])
        for r in project_pca(
            emb, "embedding", "vec_id", comps, mean
        ).collect()
    }
    mat = _mat(spark)
    ref = (mat - np.asarray(mean)) @ np.asarray(comps).T
    ids = sorted(got)
    for idx, vid in enumerate(ids):
        assert np.allclose(got[vid], ref[idx], atol=1e-6), vid


def test_pca_captures_variance(spark):
    """Top-k reconstruction must capture more variance than a random
    axis-aligned k-subset — sanity that the eigvecs are real."""
    from pdf_etl_ocr_inference_spark.operators.pca import fit_pca

    emb = _emb(spark)
    comps, evals, mean = fit_pca(emb, "embedding", k=4)
    mat = _mat(spark)
    centered = mat - mat.mean(axis=0)
    total_var = centered.var(axis=0).sum()
    top_var = float(np.sum(evals))
    axis_var = np.sort(centered.var(axis=0))[-4:].sum()
    assert top_var >= axis_var * 0.999  # eigenbasis >= any axis subset
    assert top_var <= total_var * 1.001


def test_project_q_matches_float_path_and_is_native(spark):
    """The r8 exact-integer projection (project_pca_q) must agree
    with the float mapInPandas path to quantization precision
    (~2^-20 per coordinate -> <1e-4 on a 64-dim dot) AND contain no
    Python evaluation in its plan."""
    from pdf_etl_ocr_inference_spark.operators.pca import (
        fit_pca,
        fit_pca_q,
        project_pca,
        project_pca_q,
    )

    emb = _emb(spark)
    cq, mq = fit_pca_q(emb, "embedding", k=4)
    q = project_pca_q(emb, "embedding", "vec_id", cq, mq)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    got = {
        r["vec_id"]: [r[f"pc{i}"] for i in range(4)] for r in q.collect()
    }
    comps, _e, mean = fit_pca(emb, "embedding", k=4)
    ref = {
        r["vec_id"]: list(r["proj"])
        for r in project_pca(
            emb, "embedding", "vec_id", comps, mean
        ).collect()
    }
    for vid, pcs in got.items():
        assert np.allclose(pcs, ref[vid], atol=1e-3), vid


def test_project_q_partition_invariant(spark):
    from pdf_etl_ocr_inference_spark.operators.pca import (
        fit_pca_q,
        project_pca_q,
    )

    emb = _emb(spark)
    cq1, mq1 = fit_pca_q(emb, "embedding", k=4)
    cq2, mq2 = fit_pca_q(emb.repartition(17), "embedding", k=4)
    assert cq1 == cq2 and mq1 == mq2
    a = sorted(map(tuple, project_pca_q(
        emb, "embedding", "vec_id", cq1, mq1).collect()))
    b = sorted(map(tuple, project_pca_q(
        emb.repartition(17), "embedding", "vec_id", cq2, mq2).collect()))
    assert a == b  # exact ints + one exact division -> bit-equal
