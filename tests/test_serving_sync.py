"""Triggered streaming maintenance of the SERVING indexes: an
availableNow stream over the change feed folds commits into the
pinned NSW layout via serving_refresh_fn; sync ≡ direct refreshes,
re-running the sync is a no-op, and served queries see the result.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pdf_etl_ocr_inference_spark.operators.graph_ann import (
    build_nsw_index,
)
from pdf_etl_ocr_inference_spark.operators.serving import (
    serve_topk,
    serving_refresh_fn,
)
from pdf_etl_ocr_inference_spark.optimizer import sync_index_from_feed
from pdf_etl_ocr_inference_spark.streaming.changefeed import commit_changes


def _vecs(spark, ids, shift=0.0):
    rows = [
        (i, [float((i * 7 + j * 3) % 11) - 5.0 + shift for j in range(8)])
        for i in ids
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_stream_sync_maintains_serving_index(spark, tmp_path):
    path = str(tmp_path / "graph")
    feed = str(tmp_path / "feed")
    corpus = _vecs(spark, range(40))
    build_nsw_index(spark, corpus, path, n_shards=4, m_neighbors=4)

    # two commits: v1 inserts 100..103 (shifted => unique embeddings,
    # no cosine-1.0 tie with the base corpus's mod-11 classes),
    # v2 deletes 8
    commit_changes(
        _vecs(spark, [100, 101, 102, 103], shift=2.5).withColumn(
            "_change_type", F.lit("insert")
        ),
        feed,
        1,
    )
    commit_changes(
        _vecs(spark, [8]).withColumn("_change_type", F.lit("delete")),
        feed,
        2,
    )
    change_schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("_change_type", T.StringType()),
        ]
    )
    sync_index_from_feed(
        spark,
        feed,
        "serving/nsw",
        change_schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        refresh_fn=serving_refresh_fn(path, "nsw"),
    )

    import json

    with open(f"{path}/_nsw_meta.json") as f:
        assert json.load(f)["last_version"] == 2

    # the synced graph equals a fresh build of the post-change corpus
    post = corpus.filter(F.col("vec_id") != 8).unionByName(
        _vecs(spark, [100, 101, 102, 103], shift=2.5)
    )
    full = str(tmp_path / "full")
    build_nsw_index(spark, post, full, n_shards=4, m_neighbors=4)
    canon = lambda p: sorted(  # noqa: E731
        (r["vec_id"], tuple(sorted(r["neighbors"])))
        for r in spark.read.parquet(p).collect()
    )
    assert canon(path) == canon(full)

    # served query reflects the synced state (version-keyed cache)
    q = [
        float(v)
        for v in _vecs(spark, [100], shift=2.5).first()["embedding"]
    ]
    got = serve_topk(spark, path, [(0, q)], k=3, kind="nsw").collect()
    assert 100 in {r["vec_id"] for r in got}
    # and the deleted vector can no longer be served anywhere
    q8 = [float(v) for v in _vecs(spark, [8]).first()["embedding"]]
    got8 = serve_topk(spark, path, [(0, q8)], k=10, kind="nsw").collect()
    assert 8 not in {r["vec_id"] for r in got8}

    # re-running the sync ingests nothing new (checkpoint) and folds
    # nothing (version watermark) — state unchanged
    sync_index_from_feed(
        spark,
        feed,
        "serving/nsw",
        change_schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        refresh_fn=serving_refresh_fn(path, "nsw"),
    )
    assert canon(path) == canon(full)


def test_stream_sync_ivfpq_fold_changes_results(spark, tmp_path):
    """The ivfpq serving kind through the SAME sync loop: an arrival
    vector identical to the query lands via the stream fold and must
    win the served top-1 — proving the fold materially changed the
    pinned index (not just ran without error)."""
    from pdf_etl_ocr_inference_spark.operators.pq import (
        train_ivfpq_codebooks,
    )
    from pdf_etl_ocr_inference_spark.operators.serving import (
        build_ivfpq_serving_index,
    )

    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    base = spark.createDataFrame(
        [(i, [1.0, 0.01 * i, 0.0, 0.0]) for i in range(8)]
        + [(100 + i, [0.02 * i, 1.0, 0.0, 0.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    books = train_ivfpq_codebooks(
        base, "embedding", "vec_id", cents, m=2, k=4, sample_mod=1
    )
    path = str(tmp_path / "ivfpq")
    build_ivfpq_serving_index(spark, base, path, cents, books)

    qvec = [0.6, 0.8, 0.0, 0.0]
    before = serve_topk(
        spark, path, [(0, qvec)], k=1, kind="ivfpq", n_probe=2, rerank=100,
    ).collect()
    assert before[0]["score"] < 1.0

    feed = str(tmp_path / "feed")
    arrival = spark.createDataFrame(
        [(500, qvec)], "vec_id long, embedding array<double>"
    ).withColumn("_change_type", F.lit("insert"))
    # v=1: the freshly built index's watermark is 0, so a v=0 commit
    # would (correctly) be skipped as already-applied state
    commit_changes(arrival, feed, 1)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("_change_type", T.StringType()),
        ]
    )
    sync_index_from_feed(
        spark,
        feed,
        "ivfpq/test",
        schema,
        checkpoint_dir=str(tmp_path / "ckpt"),
        refresh_fn=serving_refresh_fn(path, "ivfpq"),
    )
    after = serve_topk(
        spark, path, [(0, qvec)], k=1, kind="ivfpq", n_probe=2, rerank=100,
    ).collect()
    assert after[0]["vec_id"] == 500 and after[0]["score"] == 1.0
