"""PQ serving (kind='pq'): pinned-codebook ADC + exact re-rank
matches the batch topk_pq path, refresh re-encodes touched shards
with the persisted codebooks and invalidates the cache.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pdf_etl_ocr_inference_spark.operators.pq import (
    pq_encode,
    topk_pq,
    train_pq_codebooks,
)
from pdf_etl_ocr_inference_spark.operators.serving import (
    build_pq_serving_index,
    refresh_pq_serving_index,
    serve_topk,
)

SF = "/root/testdata/sf0.001"


def test_served_pq_dominates_batch_and_matches_exhaustive(spark, tmp_path):
    """Served PQ reranks top-`rerank` PER SHARD (n_shards × the batch
    path's global rerank budget), so at equal `rerank` its results
    must be at least as good rank-for-rank; with rerank covering the
    whole corpus both paths degenerate to exact top-k and must agree
    exactly."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, k=16)
    path = str(tmp_path / "pq")
    build_pq_serving_index(spark, emb, path, books, n_shards=4)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]

    def batch(rerank):
        return [
            (r["vec_id"], r["score"])
            for r in topk_pq(
                pq_encode(emb, "embedding", books),
                "embedding",
                qvec,
                books,
                k=5,
                rerank=rerank,
            ).collect()
        ]

    def served(rerank):
        return [
            (r["vec_id"], r["score"])
            for r in serve_topk(
                spark, path, [(0, qvec)], k=5, kind="pq", rerank=rerank
            )
            .orderBy(F.desc("score"), "vec_id")
            .collect()
        ]

    # NOTE topk_pq does not exclude the query row; neither do we
    s50, b50 = served(50), batch(50)
    assert len(s50) == len(b50) == 5
    for (_, ss), (_, bs) in zip(s50, b50):
        assert ss >= bs - 1e-9  # per-shard rerank never loses to global

    n = emb.count()
    assert served(n) == batch(n)  # exhaustive regime: exact equality


def test_served_opq_rotation_roundtrip(spark, tmp_path):
    """OPQ serving = PQ serving with the learned rotation persisted in
    the meta: encode and ADC must apply the SAME rotation, and the
    exhaustive regime equals exact top-k."""
    from pdf_etl_ocr_inference_spark.operators.pq import train_opq

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rot, books = train_opq(emb, "embedding", "vec_id", m=8, k=16)
    path = str(tmp_path / "opq")
    build_pq_serving_index(spark, emb, path, books, rotation=rot,
                           n_shards=4)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]
    n = emb.count()
    served = [
        (r["vec_id"], r["score"])
        for r in serve_topk(
            spark, path, [(0, qvec)], k=5, kind="pq", rerank=n
        )
        .orderBy(F.desc("score"), "vec_id")
        .collect()
    ]
    batch = [
        (r["vec_id"], r["score"])
        for r in topk_pq(
            pq_encode(emb, "embedding", books, rotation=rot),
            "embedding",
            qvec,
            books,
            k=5,
            rerank=n,
            rotation=rot,
        ).collect()
    ]
    assert served == batch


def test_pq_refresh_invalidates(spark, tmp_path):
    def vecs(ids, shift=0.0):
        rows = [
            (
                i,
                [float((i * 7 + j * 3) % 11) - 5.0 + shift for j in range(8)],
            )
            for i in ids
        ]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    corpus = vecs(range(40))
    books = train_pq_codebooks(corpus, "embedding", "vec_id", m=4, k=8,
                               sample_mod=1)
    path = str(tmp_path / "pq")
    build_pq_serving_index(spark, corpus, path, books, n_shards=4)
    q = [float(v) for v in corpus.filter("vec_id = 8").first()["embedding"]]
    before = serve_topk(
        spark, path, [(0, q)], k=3, kind="pq", rerank=40
    ).collect()
    assert 8 in {r["vec_id"] for r in before}  # itself: cosine 1.0

    changes = vecs([8]).withColumn("_change_type", F.lit("delete"))
    touched = refresh_pq_serving_index(spark, path, changes, version=1)
    assert touched == [0]
    after = serve_topk(
        spark, path, [(0, q)], k=3, kind="pq", rerank=40
    ).collect()
    assert 8 not in {r["vec_id"] for r in after}
    # retry re-delivery is a no-op
    assert refresh_pq_serving_index(spark, path, changes, version=1) == []


def test_pq_serving_derived_shards(spark, tmp_path, monkeypatch):
    """n_shards=None derives the shard count from the corpus at the
    PIN-size target (graph_ann doctrine; sharding is result-neutral
    here), records it in meta, and the served answer equals the
    explicit-shard build's exactly."""
    import json

    from pdf_etl_ocr_inference_spark.operators import serving as S
    from pdf_etl_ocr_inference_spark.operators.graph_ann import (
        derive_n_shards,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    n = emb.count()
    books = train_pq_codebooks(emb, "embedding", "vec_id", m=8, k=16)
    monkeypatch.setattr(S, "_PQ_SHARD_TARGET_ROWS", 100)
    pd_ = str(tmp_path / "pq_derived")
    build_pq_serving_index(spark, emb, pd_, books, n_shards=None)
    meta = json.load(open(f"{pd_}/_pqserve_meta.json"))
    assert meta["n_shards"] == derive_n_shards(n, target=100) > 1
    shards = {
        r["shard"]
        for r in spark.read.parquet(pd_).select("shard").collect()
    }
    assert shards == set(range(meta["n_shards"]))

    pe = str(tmp_path / "pq_explicit")
    build_pq_serving_index(spark, emb, pe, books, n_shards=4)
    qvec = [
        float(v)
        for v in emb.filter(F.col("vec_id") == 0).first()["embedding"]
    ]

    def top(path):
        return [
            (r["vec_id"], round(r["score"], 6))
            for r in serve_topk(
                spark, path, [(0, qvec)], k=5, kind="pq"
            ).collect()
        ]

    assert top(pd_) == top(pe)
