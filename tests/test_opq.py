"""OPQ (operators/pq.train_opq): the learned rotation is orthonormal,
strictly reduces quantization error vs plain PQ on dimension-correlated
data (the regime it exists for), and the rotated query path returns
exact-score results.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.pq import (
    _normalize,
    _reconstruct,
    pq_encode,
    topk_pq,
    train_opq,
    train_pq_codebooks,
)


@pytest.fixture(scope="module")
def correlated_df(spark):
    # 16-dim vectors whose variance lives in a few mixed directions:
    # z (4 informative dims) embedded through a fixed random mixing
    # matrix — the case where PQ's fixed split straddles correlated
    # coordinates and a learned rotation helps
    rng = np.random.default_rng(11)
    a = rng.normal(size=(4, 16))
    z = rng.normal(size=(400, 4))
    x = z @ a + 0.05 * rng.normal(size=(400, 16))
    rows = [
        (i, [float(v) for v in x[i]]) for i in range(len(x))
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def _quant_error(df, books, rotation=None):
    rows = df.select("embedding").collect()
    x = np.stack([_normalize(r["embedding"]) for r in rows])
    if rotation is not None:
        x = x @ np.asarray(rotation)
    y = _reconstruct(x, books)
    return float(((x - y) ** 2).sum(axis=1).mean())


def test_rotation_is_orthonormal(correlated_df):
    rot, _ = train_opq(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1,
        opq_iters=2,
    )
    r = np.asarray(rot)
    np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-9)


def test_opq_beats_pq_quantization_error(correlated_df):
    books_pq = train_pq_codebooks(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1
    )
    rot, books_opq = train_opq(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1,
        opq_iters=3,
    )
    e_pq = _quant_error(correlated_df, books_pq)
    e_opq = _quant_error(correlated_df, books_opq, rotation=rot)
    assert e_opq < e_pq, (e_opq, e_pq)


def test_rotated_query_path_scores_exact(spark, correlated_df):
    rot, books = train_opq(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1,
        opq_iters=2,
    )
    qvec = correlated_df.filter(F.col("vec_id") == 0).first()["embedding"]
    encoded = pq_encode(
        correlated_df.filter(F.col("vec_id") != 0),
        "embedding",
        books,
        rotation=rot,
    )
    got = topk_pq(
        encoded, "embedding", list(qvec), books, k=3, rerank=30,
        rotation=rot,
    ).collect()
    assert len(got) == 3
    # re-rank scores are EXACT cosine on the original vectors
    emb = {
        r["vec_id"]: np.asarray(r["embedding"])
        for r in correlated_df.collect()
    }
    q = np.asarray(qvec)
    for r in got:
        v = emb[r["vec_id"]]
        expect = float(
            (q @ v) / (np.linalg.norm(q) * np.linalg.norm(v))
        )
        assert abs(r["score"] - expect) < 5e-4


def test_training_is_partition_invariant(correlated_df):
    # the sample matrix is sorted by id before training, so codebooks
    # and rotation cannot depend on collect() row order
    r1, b1 = train_opq(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1,
        opq_iters=2,
    )
    r2, b2 = train_opq(
        correlated_df.repartition(9), "embedding", "vec_id", m=4, k=8,
        sample_mod=1, opq_iters=2,
    )
    assert r1 == r2
    assert b1 == b2
    p1 = train_pq_codebooks(
        correlated_df, "embedding", "vec_id", m=4, k=8, sample_mod=1
    )
    p2 = train_pq_codebooks(
        correlated_df.repartition(9), "embedding", "vec_id", m=4, k=8,
        sample_mod=1,
    )
    assert p1 == p2
