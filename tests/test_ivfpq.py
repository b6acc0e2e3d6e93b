"""IVF-PQ (IVFADC): residual-ADC exactness, recall floor vs exact
search, the residual-quantization accuracy gain over raw PQ, and
cell-pruning of the probe scan."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.pq import (
    _normalize,
    ivfpq_encode,
    pq_encode,
    topk_ivfpq,
    train_ivfpq_codebooks,
    train_pq_codebooks,
)
from pdf_etl_ocr_inference_spark.operators.similarity import (
    ivf_assign,
    topk_exact,
)

from .conftest import SF0001


def _emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


def _centroids(emb):
    rows = (
        emb.filter(F.col("vec_id") % 4 == 0)
        .select("label", F.posexplode("embedding").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("vals"))
        .select("label", F.transform("vals", lambda s: s["m"]).alias("c"))
        .orderBy("label")
        .collect()
    )
    return [list(r["c"]) for r in rows]


def _qvec(emb):
    return [
        float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_residual_adc_is_exact_for_quantization(spark):
    """For each encoded row, the per-cell ADC must equal the true
    squared L2 between the normalized query and (centroid + decoded
    residual) — verified driver-side."""
    emb = _emb(spark)
    cents = _centroids(emb)
    books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    sub = emb.filter(F.col("vec_id").between(1, 40))
    assigned = ivf_assign(sub, "embedding", cents)
    enc = ivfpq_encode(assigned, "embedding", cents, books).collect()
    q = _normalize(_qvec(emb))
    cents_np = np.asarray(cents, dtype="float64")
    books_np = [np.asarray(b, dtype="float64") for b in books]
    m = len(books_np)
    dim = len(q)
    sub_d = dim // m
    for r in enc:
        recon = cents_np[r["cell"]].copy()
        for j, code in enumerate(r["pq_codes"]):
            recon[j * sub_d : (j + 1) * sub_d] += books_np[j][code]
        true_d2 = float(((q - recon) ** 2).sum())
        # replicate the query-side residual LUT sum
        q_res = q - cents_np[r["cell"]]
        adc = sum(
            float(
                (
                    (books_np[j][r["pq_codes"][j]]
                     - q_res[j * sub_d : (j + 1) * sub_d]) ** 2
                ).sum()
            )
            for j in range(m)
        )
        assert abs(adc - true_d2) < 1e-9


def test_ivfpq_recall_floor_vs_exact(spark):
    emb = _emb(spark)
    cents = _centroids(emb)
    books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    corpus = emb.filter(F.col("vec_id") != 0)
    assigned = ivf_assign(corpus, "embedding", cents)
    enc = ivfpq_encode(assigned, "embedding", cents, books)
    qvec = _qvec(emb)
    got = {
        r["vec_id"]
        for r in topk_ivfpq(
            enc, "embedding", qvec, cents, books,
            k=5, n_probe=3, rerank=100,
        ).collect()
    }
    truth = {
        r["vec_id"]
        for r in topk_exact(corpus, "embedding", qvec, k=5).collect()
    }
    assert len(got & truth) / 5 >= 0.6


def test_residual_quantization_beats_raw_pq(spark):
    """The point of IVF-PQ: residual codebooks reconstruct with lower
    error than same-size raw-PQ codebooks (residuals concentrate near
    the origin).  Compare mean squared reconstruction error over the
    corpus, driver-side."""
    emb = _emb(spark)
    cents = _centroids(emb)
    cents_np = np.asarray(cents, dtype="float64")
    r_books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    p_books = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    corpus = emb.filter(F.col("vec_id") != 0)
    assigned = ivf_assign(corpus, "embedding", cents)
    renc = ivfpq_encode(assigned, "embedding", cents, r_books).collect()
    penc = {
        r["vec_id"]: r["pq_codes"]
        for r in pq_encode(corpus, "embedding", p_books).collect()
    }
    rb = [np.asarray(b, dtype="float64") for b in r_books]
    pb = [np.asarray(b, dtype="float64") for b in p_books]
    m = len(rb)
    dim = len(renc[0]["embedding"])
    sd = dim // m

    def _recon(codes, books, base):
        y = base.copy()
        for j, c in enumerate(codes):
            y[j * sd : (j + 1) * sd] += books[j][c]
        return y

    err_r, err_p = 0.0, 0.0
    for r in renc:
        x = _normalize(r["embedding"])
        yr = _recon(r["pq_codes"], rb, cents_np[r["cell"]].copy())
        yp = _recon(penc[r["vec_id"]], pb, np.zeros(dim))
        err_r += float(((x - yr) ** 2).sum())
        err_p += float(((x - yp) ** 2).sum())
    assert err_r < err_p


def test_probe_scans_only_probed_cells(spark):
    """The candidate union must touch n_probe cells, not the corpus:
    every ADC-scored candidate row carries a probed cell id."""
    emb = _emb(spark)
    cents = _centroids(emb)
    books = train_ivfpq_codebooks(emb, "embedding", "vec_id", cents)
    corpus = emb.filter(F.col("vec_id") != 0)
    assigned = ivf_assign(corpus, "embedding", cents)
    enc = ivfpq_encode(assigned, "embedding", cents, books)
    qvec = _qvec(emb)
    q = _normalize(qvec)
    order = sorted(
        range(len(cents)),
        key=lambda ci: -float(np.dot(q, np.asarray(cents[ci]))),
    )
    probed = set(order[:2])
    got = topk_ivfpq(
        enc, "embedding", qvec, cents, books, k=5, n_probe=2, rerank=50,
    )
    ids = [r["vec_id"] for r in got.collect()]
    cells = {
        r["cell"]
        for r in enc.filter(F.col("vec_id").isin(ids)).select("cell").collect()
    }
    assert cells <= probed
