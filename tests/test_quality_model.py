"""Deterministic distributed logistic regression: exact parity with a
single-machine numpy replica, partition invariance, loss descent, and
separation on a separable fixture."""

import numpy as np
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.quality_model import (
    feature_frame,
    fit_quality_lr,
    score_quality_lr,
)

SF = "/root/testdata/sf0.001"
GS = 1 << 24


def _feats(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return feature_frame(
        docs, "text", (F.col("lang") == "en").cast("int"), "doc_id"
    )


def _numpy_replica(x, y, iterations, lr=1.0):
    """Independent driver-side reimplementation with the same
    quantization contract."""
    d = x.shape[1]
    w = np.zeros(d)
    b = 0.0
    hist = []
    n = len(y)
    for _ in range(iterations):
        z = x @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.floor(err[:, None] * x * GS).astype(np.int64).sum(axis=0)
        gb = int(np.floor(err * GS).astype(np.int64).sum())
        eps = 1e-12
        ll = -(y * np.log(np.maximum(p, eps))
               + (1 - y) * np.log(np.maximum(1 - p, eps)))
        loss = int(np.floor(ll * GS).astype(np.int64).sum())
        w = w - lr * (g.astype(np.float64) / (GS * n))
        b = b - lr * (gb / (GS * n))
        hist.append(loss / (GS * n))
    return w, b, hist


def test_fit_matches_numpy_replica_exactly(spark):
    feats = _feats(spark).cache()
    w, b, hist = fit_quality_lr(feats, iterations=6)
    pdf = feats.orderBy("doc_id").toPandas()
    x = pdf[[f"f{i}" for i in range(6)]].to_numpy(dtype=np.float64)
    y = pdf["label"].to_numpy(dtype=np.float64)
    rw, rb, rhist = _numpy_replica(x, y, iterations=6)
    feats.unpersist()
    assert np.array_equal(w, rw), (w, rw)
    assert b == rb
    assert hist == rhist


def test_fit_partition_invariant(spark):
    feats = _feats(spark)
    w1, b1, h1 = fit_quality_lr(feats.repartition(3), iterations=4)
    w2, b2, h2 = fit_quality_lr(feats.repartition(23), iterations=4)
    assert np.array_equal(w1, w2) and b1 == b2 and h1 == h2


def test_loss_descends(spark):
    _w, _b, hist = fit_quality_lr(_feats(spark), iterations=8)
    assert hist[-1] < hist[0]


def test_separable_fixture_learns(spark):
    """Planted separable corpus: long alpha-heavy docs labeled 1,
    digit-noise docs labeled 0 — the trained scorer must rank every
    positive above every negative."""
    good = [(i, "the quick brown fox jumps over the lazy dog " * 8, 1)
            for i in range(40)]
    bad = [(100 + i, "00 11 22 33 44 55 66 77 88 99 " * 3, 0)
           for i in range(40)]
    df = spark.createDataFrame(good + bad, ["id", "text", "y"])
    feats = feature_frame(df, "text", F.col("y"), "id").cache()
    w, b, _ = fit_quality_lr(feats, iterations=30, lr=2.0)
    scores = {
        r["id"]: r["p_good"]
        for r in score_quality_lr(feats, w, b, "id").collect()
    }
    feats.unpersist()
    worst_pos = min(v for k, v in scores.items() if k < 100)
    best_neg = max(v for k, v in scores.items() if k >= 100)
    assert worst_pos > best_neg, (worst_pos, best_neg)
