"""Product quantization: encode shape/determinism, ADC agreement with
true distances, recall floors (fixture + design regime), and the
native-query-path property."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.pq import (
    adc_distance,
    pq_encode,
    topk_pq,
    train_pq_codebooks,
)
from pdf_etl_ocr_inference_spark.operators.similarity import topk_exact

from .conftest import SF0001


def _emb(spark):
    return spark.read.parquet(f"{SF0001}/embeddings.parquet")


def _qvec(emb):
    return [
        float(v) for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]


def test_encode_shape_and_determinism(spark):
    emb = _emb(spark)
    books = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    enc = pq_encode(emb, "embedding", books)
    rows = {r["vec_id"]: tuple(r["pq_codes"]) for r in enc.collect()}
    assert all(len(c) == 8 for c in rows.values())
    assert all(0 <= x < 16 for c in rows.values() for x in c)
    # retrain + re-encode: byte-identical (seeded k-means, fixed sample)
    books2 = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    rows2 = {
        r["vec_id"]: tuple(r["pq_codes"])
        for r in pq_encode(emb, "embedding", books2).collect()
    }
    assert rows == rows2


def test_adc_approximates_true_distance(spark):
    """ADC distance must equal the TRUE squared L2 between the
    normalized vector's quantization and the normalized query —
    reconstruct driver-side and compare."""
    import numpy as np

    emb = _emb(spark)
    books = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    qvec = _qvec(emb)
    enc = pq_encode(emb.filter(F.col("vec_id") < 50), "embedding", books)
    got = enc.select(
        "vec_id",
        "pq_codes",
        adc_distance("pq_codes", qvec, books).alias("adc"),
    ).collect()
    q = np.asarray(qvec, float)
    q = q / np.sqrt((q * q).sum())
    sub = 64 // 8
    for r in got:
        recon = np.concatenate(
            [np.asarray(books[j][r["pq_codes"][j]]) for j in range(8)]
        )
        expect = float(((recon - q) ** 2).sum())
        assert abs(r["adc"] - expect) < 1e-9, (r["vec_id"], r["adc"], expect)


def test_pq_recall_floor_on_fixture(spark):
    """Fixture embeddings are RANDOM gaussians — PQ's worst case (no
    cluster structure for codebooks to exploit), so the floor is a
    machinery check at a 20% rerank pool; the semantic guarantee
    lives in test_pq_recall_design_regime."""
    emb = _emb(spark)
    books = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    qvec = _qvec(emb)
    corpus = emb.filter(F.col("vec_id") != 0)
    exact = {r["vec_id"] for r in topk_exact(
        corpus, "embedding", qvec, k=5).collect()}
    got = {
        r["vec_id"]
        for r in topk_pq(
            pq_encode(corpus, "embedding", books),
            "embedding", qvec, books, k=5, rerank=100,
        ).collect()
    }
    recall = len(got & exact) / 5
    assert recall >= 0.6, f"recall {recall}: {got} vs {exact}"


def test_pq_recall_design_regime(spark):
    """True near-dups (cos ≈ 0.99): PQ + re-rank must recover the
    exact top-k — quantization noise is far smaller than the gap
    between cluster members and random vectors."""
    rng = random.Random(5)
    dim = 64

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    base = unit([rng.gauss(0, 1) for _ in range(dim)])
    rows = [(0, base)] + [
        (i, unit([x + rng.gauss(0, 0.02) for x in base])) for i in range(1, 6)
    ]
    rows += [
        (i, unit([rng.gauss(0, 1) for _ in range(dim)])) for i in range(6, 300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = train_pq_codebooks(df, "embedding", id_col="vec_id", sample_mod=1)
    corpus = df.filter(F.col("vec_id") != 0)
    got = [
        r["vec_id"]
        for r in topk_pq(
            pq_encode(corpus, "embedding", books),
            "embedding", base, books, k=5, rerank=40,
        ).collect()
    ]
    assert set(got) == {1, 2, 3, 4, 5}, got


def test_pq_query_path_is_jvm_native(spark):
    """The ADC scan plan must contain no Python evaluation — only the
    build-time encode is a pandas UDF."""
    emb = _emb(spark)
    books = train_pq_codebooks(emb, "embedding", id_col="vec_id")
    qvec = _qvec(emb)
    encoded = pq_encode(emb, "embedding", books)
    # materialize codes so the query plan starts from stored codes
    path = "/tmp/spark_graft_scratch/pq_codes_test"
    encoded.select("vec_id", "embedding", "pq_codes").write.mode(
        "overwrite"
    ).parquet(path)
    stored = spark.read.parquet(path)
    q = topk_pq(stored, "embedding", qvec, books, k=5, rerank=50)
    plan = spark._sc._jvm.PythonSQLUtils.explainString(
        q._jdf.queryExecution(), "formatted"
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_training_sample_is_fixed_size(spark):
    """The r8 scale contract: the derived sample modulus collects a
    corpus-size-INDEPENDENT number of vectors.  Corpora 4x apart in
    size must both sample inside [target, 2*target) — a fixed
    FRACTION (the pre-r8 sample_mod=4) would scale 4x here."""
    from pdf_etl_ocr_inference_spark.operators.pq import derive_sample_mod

    target = 64
    counts = []
    for n in (1024, 4096):
        df = spark.range(n).select(F.col("id").alias("vec_id"))
        mod = derive_sample_mod(df, "vec_id", target=target)
        sample_n = df.filter(F.col("vec_id") % mod == 0).count()
        assert target <= sample_n < 2 * target, (n, mod, sample_n)
        counts.append(sample_n)
    assert max(counts) < 2 * min(counts), counts


def test_sample_pred_sql_matches_engine_derivation(spark):
    """The oracle predicate (plans/pq_sql._sample_pred) must pick the
    SAME modulus as derive_sample_mod for any corpus size."""
    import duckdb

    from pdf_etl_ocr_inference_spark.operators.pq import (
        PQ_TRAIN_TARGET,
        derive_sample_mod,
    )
    from pdf_etl_ocr_inference_spark.plans.pq_sql import _sample_pred

    for n in (500, 2000, 5000, 100000):
        df = spark.range(n).select(F.col("id").alias("vec_id"))
        mod = derive_sample_mod(df, "vec_id")
        got = duckdb.sql(
            f"SELECT GREATEST(1, (SELECT COUNT(*) FROM range({n})) "
            f"// {PQ_TRAIN_TARGET})"
        ).fetchone()[0]
        assert int(got) == mod, (n, got, mod)
    # and the predicate string is the derived form, not a baked mod
    assert "GREATEST(1, (SELECT COUNT(*) FROM qn)" in _sample_pred(
        "vec_id", None
    )
